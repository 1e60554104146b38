package graft.runtime

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

import graft.model.{ExitCodes, StreamContext}

/** One declared member of a stream fleet: its identity/spec context,
  * its graph builder, and its lifecycle knobs (each spec carries its
  * OWN `checkpointPath`/sink — checkpoints are per-stream by
  * construction). */
final case class StreamDecl(
    ctx: StreamContext,
    builder: StreamGraphBuilder,
    processingInterval: java.time.Duration = java.time.Duration.ofSeconds(15),
    stopAfterBackfill: Boolean = false)

/** Per-stream exit codes plus the combined process code. */
final case class FleetResult(statuses: Map[String, Int]) {
  /** The operator contract for a multi-stream process: the WORST
    * stream decides. FATAL (unrecoverable — operator counts a retry)
    * outranks RESTART (transient — restart without counting), which
    * outranks SUCCESS; a schema-mismatch stream already surfaces as
    * SUCCESS per the single-stream contract (operator restarts it in
    * backfill mode from its reported status, not from the code). */
  def exitCode: Int = {
    def sev(c: Int): Int = c match {
      case ExitCodes.Fatal => 2
      case ExitCodes.Restart => 1
      case _ => 0
    }
    if (statuses.isEmpty) ExitCodes.Success
    else statuses.values.maxBy(sev)
  }
}

/** Multi-stream fleet host (VERDICT r5 #7): the reference runs ONE
  * stream per Kubernetes Job (Program.cs hosts a single
  * StreamRunnerService); on Spark, concurrent streaming queries share
  * one application and its executors, so N declared streams — CT, CDM,
  * REST, any registered kind — run in one app with per-stream
  * checkpoints and INDEPENDENT lifecycles: each stream gets its own
  * [[StreamRunner]] (same backfill→stream flip, same exception
  * taxonomy) on its own thread, failures never propagate across
  * streams, statuses are reported per stream id, and the process exit
  * code is the worst stream's ([[FleetResult.exitCode]]).
  *
  * SIGTERM fans out: [[requestStopAll]] flips every runner's stop
  * flag, and each stream applies the single-stream interruption rules
  * (backfill → RESTART, incremental → SUCCESS, token suppressed). */
final class FleetRunner(
    spark: SparkSession,
    statusReporter: (String, String) => Unit =
      (id, s) => System.err.println(s"[stream-status][$id] $s")) {

  @volatile private var runners: Seq[StreamRunner] = Nil

  def requestStopAll(): Unit = runners.foreach(_.requestStop())

  /** Run every declared stream to completion; returns per-stream codes
    * and the combined process code. */
  def run(decls: Seq[StreamDecl]): FleetResult = {
    require(decls.map(_.ctx.streamId).distinct.size == decls.size,
      "stream ids in a fleet must be unique")
    val codes = new ConcurrentHashMap[String, Int]()
    val started = decls.map { d =>
      val runner = new StreamRunner(spark, d.processingInterval,
        s => statusReporter(d.ctx.streamId, s))
      val thread = new Thread(
        () => {
          val code =
            try runner.runWithFlip(d.ctx, d.builder, d.stopAfterBackfill)
            catch {
              case NonFatal(e) =>
                // StreamRunner maps expected failures itself; anything
                // escaping (builder constructor errors etc.) is FATAL
                statusReporter(d.ctx.streamId, s"fatal: ${e.getMessage}")
                ExitCodes.Fatal
            }
          codes.put(d.ctx.streamId, code)
          statusReporter(d.ctx.streamId, s"exit-code: $code")
        },
        s"graft-stream-${d.ctx.streamId}")
      (runner, thread)
    }
    runners = started.map(_._1)
    started.foreach(_._2.start())
    started.foreach(_._2.join())
    FleetResult(codes.asScala.toMap)
  }
}

/** Fleet composition root: `GRAFT_FLEET__SPECS` holds a JSON ARRAY of
  * single-stream contexts (`{"streamId": …, "streamKind": …,
  * "backfill": …, "spec": {…}}` — the same fields the single-stream
  * `STREAMCONTEXT__*` env contract carries), dispatched through the
  * same kind registry as [[GraftMain]]. */
object GraftFleetMain {

  val SpecsVar = "GRAFT_FLEET__SPECS"

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def parseFleet(json: String): Seq[StreamContext] = {
    val root = mapper.readTree(json)
    require(root != null && root.isArray, s"$SpecsVar must be a JSON array")
    val b = Vector.newBuilder[StreamContext]
    root.forEach { n =>
      b += StreamContext(
        streamId = n.path("streamId").asText("local"),
        streamKind = n.path("streamKind").asText("unknown"),
        isBackfilling = n.path("backfill").asBoolean(false),
        spec = if (n.path("spec").isObject) n.path("spec").toString else "{}")
    }
    b.result()
  }

  /** Testable core mirroring [[GraftMain.run]]: unknown kinds surface
    * as per-stream FATAL without stopping the rest of the fleet. */
  def run(spark: SparkSession, env: Map[String, String],
      extraKinds: Map[String, StreamGraphBuilder] = Map.empty,
      statusReporter: (String, String) => Unit =
        (id, s) => System.err.println(s"[stream-status][$id] $s")): Int = {
    val kinds = GraftMain.builtinKinds ++ extraKinds
    val ctxs = parseFleet(env.getOrElse(SpecsVar, "[]"))
    val (known, unknown) = ctxs.partition(c => kinds.contains(c.streamKind))
    unknown.foreach(c =>
      statusReporter(c.streamId, s"fatal: unknown stream kind '${c.streamKind}'"))
    val decls = known.map { c =>
      val spec = graft.model.StreamSpec.fromContext(c)
      StreamDecl(c, kinds(c.streamKind),
        processingInterval = spec.secondsDuration("changeCaptureIntervalSeconds")
          .getOrElse(java.time.Duration.ofSeconds(15)),
        stopAfterBackfill = spec.boolean("stopAfterBackfill").getOrElse(false))
    }
    val result = new FleetRunner(spark, statusReporter).run(decls)
    FleetResult(result.statuses ++
      unknown.map(_.streamId -> ExitCodes.Fatal)).exitCode
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-fleet",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt).getOrCreate()
    // in a cluster each stream annotates its OWN Job on schema mismatch
    // (per-stream ids → per-stream Jobs), like the single-stream main
    val svc: Option[StreamStatusService] =
      if (K8sStreamStatusService.inCluster()) Some(new K8sStreamStatusService())
      else None
    val reporter: (String, String) => Unit = (id, s) => {
      System.err.println(s"[stream-status][$id] $s")
      if (s.startsWith(graft.runtime.StreamAnnotations.SchemaMismatchStateAnnotationValue + ":"))
        svc.foreach(_.reportSchemaMismatch(id))
    }
    val code = try run(spark, sys.env, statusReporter = reporter) finally spark.stop()
    sys.exit(code)
  }
}
