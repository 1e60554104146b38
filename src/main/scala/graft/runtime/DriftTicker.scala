package graft.runtime

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

import graft.model.SchemaMismatchException

/** Periodic schema-drift poll attached to a running stream — the
  * reference's `schemaUpdateInterval` timer
  * (CdmChangeFeedSource.cs:374-417: re-read the declared schema every
  * interval, SchemaMismatchException on structural change).
  *
  * `check` runs on a daemon scheduler thread; the first failure invokes
  * `onDrift` exactly once and stops the ticker. Wire `onDrift` to stop
  * the StreamingQuery so the runner can map the drift to its exit code
  * (see [[CdmStreamGraphBuilder]]).
  */
final class DriftTicker(
    intervalMillis: Long,
    check: () => Unit,
    onDrift: Throwable => Unit,
    activeCheck: () => Boolean = () => true) {

  private var exec: Option[ScheduledExecutorService] = None

  def start(): Unit = synchronized {
    if (exec.isEmpty) {
      val e = Executors.newSingleThreadScheduledExecutor(r => {
        val t = new Thread(r, "graft-drift-ticker")
        t.setDaemon(true)
        t
      })
      e.scheduleWithFixedDelay(() => {
        if (!activeCheck()) e.shutdown() // stream gone: stop polling
        else try check()
        catch {
          case drift: Throwable =>
            try onDrift(drift) finally e.shutdown()
        }
      }, intervalMillis, intervalMillis, TimeUnit.MILLISECONDS)
      exec = Some(e)
    }
  }

  def stop(): Unit = synchronized {
    exec.foreach(_.shutdownNow())
    exec = None
  }
}

/** End-to-end wiring of the CDM incremental stream (SURVEY.md §3.1):
  * CdmSource file stream → arcane-layout Parquet sink, with the frozen
  * feed schema re-polled by a [[DriftTicker]]. On drift the query is
  * stopped and the mismatch surfaces from `onCompleted`, so the runner
  * reports schema-mismatch and exits SUCCESS — without ever publishing
  * the COMPLETED token (reference: CdmChangeFeedSource.cs:374-404 +
  * ArcaneExceptionHandler.cs:29-48).
  */
final class CdmStreamGraphBuilder(
    cdm: graft.sources.CdmSource,
    sink: graft.sinks.ArcaneParquetSink,
    checkpoint: String,
    schemaUpdateIntervalMillis: Long = 60000L) extends StreamGraphBuilder {

  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

  @volatile private var driftError: Option[SchemaMismatchException] = None
  @volatile private var lastDf: Option[DataFrame] = None
  private var ticker: Option[DriftTicker] = None

  override def build(ctx: graft.model.StreamContext, spark: SparkSession): DataFrame = {
    val df = cdm.stream()
    lastDf = Some(df)
    df
  }

  override def start(ctx: graft.model.StreamContext, df: DataFrame,
      trigger: Trigger): StreamingQuery = {
    val frozen = cdm.feedSchema()
    val query = sink.start(df, checkpoint, trigger)
    val t = new DriftTicker(
      schemaUpdateIntervalMillis,
      () => cdm.checkDrift(frozen),
      drift => {
        driftError = Some(drift match {
          case m: SchemaMismatchException => m
          case other => new SchemaMismatchException(other.getMessage)
        })
        query.stop()
      },
      activeCheck = () => query.isActive)
    t.start()
    ticker = Some(t)
    query
  }

  override def onCompleted(ctx: graft.model.StreamContext): Unit = {
    ticker.foreach(_.stop())
    driftError.foreach(throw _) // before the token: drift never publishes
    lastDf.foreach(sink.complete)
  }
}
