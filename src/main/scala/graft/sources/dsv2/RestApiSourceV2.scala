package graft.sources.dsv2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.RestSource

/** DataSource v2 streaming REST source — the SURVEY §7.1-module-5 /
  * §2.10 design: a `MicroBatchStream` whose offsets are sweep epochs
  * (JSON in the checkpoint WAL, so recovery is Spark-native), with the
  * per-sweep PAGE FETCHING DISTRIBUTED across executors. This is the
  * 100 TB shape the driver-loop [[graft.sources.RestSource]] cannot
  * reach: with a page-count paginated API, the driver probes one page
  * to learn the page count, then executors fetch disjoint page ranges
  * in parallel.
  *
  * {{{
  * spark.readStream
  *   .format("graft.sources.dsv2.RestApiTableProvider")
  *   .option("uriTemplate", "https://api/items?page=@page")
  *   .option("totalPagesKeyChain", "meta.totalPages")
  *   .option("recordKeyChain", "items")
  *   .option("fetcherClass", "com.example.JdkHttpFetch") // HttpFetch with no-arg ctor
  *   .load()                                              // → value: STRING (one JSON record per row)
  * }}}
  *
  * Output rows are raw JSON strings; apply `from_json(schema)` (e.g.
  * from [[graft.schema.OpenApiSchema]]) downstream. Delivery is
  * at-least-once per the engine contract (the sizing probe's page is
  * re-fetched by the partition that owns it).
  *
  * Options: `uriTemplate` (with `@page`), `recordKeyChain`,
  * `totalPagesKeyChain` (dot-separated), `fetcherClass`,
  * `pagesPerPartition` (default 8), `maxSweeps` (stop advancing offsets
  * after N sweeps — backfill/test bound; default unbounded),
  * `startPage` (default 1), `forceSweepEvery` (run a full sweep after N
  * consecutive idle-skipped triggers even if the probe signature is
  * unchanged — bounds the staleness window of the idle guard; default
  * 10, ≤ 0 disables the idle guard entirely so every trigger sweeps).
  */
class RestApiTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestApiTableV2.OutputSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestApiTableV2(properties)
  override def supportsExternalMetadata(): Boolean = false
}

object RestApiTableV2 {
  val OutputSchema: StructType = StructType(Seq(StructField("value", StringType)))

  /** Instantiate the executor-side fetcher from its class name. */
  def fetcher(className: String): RestSource.HttpFetch =
    Class.forName(className).getDeclaredConstructor()
      .newInstance().asInstanceOf[RestSource.HttpFetch]
}

final class RestApiTableV2(properties: util.Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"rest(${properties.get("uriTemplate")})"
  override def schema(): StructType = RestApiTableV2.OutputSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = RestApiTableV2.OutputSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new RestMicroBatchStream(options.asCaseSensitiveMap())
      }
    }
}

/** Offset = number of completed pagination sweeps. */
final case class RestSweepOffset(sweep: Long) extends Offset {
  override def json(): String = s"""{"sweep":$sweep}"""
}

/** One executor task: fetch pages [firstPage, lastPage] of one sweep. */
final case class RestPageRangePartition(
    sweep: Long, firstPage: Long, lastPage: Long) extends InputPartition

final class RestMicroBatchStream(props: util.Map[String, String])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val uriTemplate = require("uriTemplate")
  private val fetcherClass = require("fetcherClass")
  private val recordKeyChain = chain(props.get("recordKeyChain"))
  private val totalPagesKeyChain = chain(props.get("totalPagesKeyChain"))
  private val pagesPerPartition =
    Option(props.get("pagesPerPartition")).map(_.toLong).getOrElse(8L)
  private val maxSweeps =
    Option(props.get("maxSweeps")).map(_.toLong).getOrElse(Long.MaxValue)
  private val startPage = Option(props.get("startPage")).map(_.toLong).getOrElse(1L)
  private val forceSweepEvery =
    Option(props.get("forceSweepEvery")).map(_.toInt).getOrElse(10)

  private def require(key: String): String =
    Option(props.get(key)).getOrElse(
      throw new IllegalArgumentException(s"rest source option '$key' is required"))
  private def chain(v: String): Seq[String] =
    Option(v).map(_.split('.').toSeq.filter(_.nonEmpty)).getOrElse(Nil)

  // highest sweep this stream has advanced its end offset to. NOT the
  // Spark-committed offset: the engine only delivers commit(N) when
  // batch N+1 starts running, so waiting on commit() before advancing
  // would deadlock an idle stream. Floored from planInputPartitions /
  // commit for WAL recovery.
  @volatile private var advanced = 0L
  // signature of the API when the last sweep was planned: (totalPages,
  // md5(first page) + md5(LAST page)) — an unchanged signature means an
  // idle API, so the next trigger plans NO sweep instead of re-fetching
  // everything. The last page is part of the signature because
  // oldest-first APIs append new items to the final page while page 1
  // and the page count stay byte-identical (ADVICE r3); the 128-bit
  // digest replaces the collision-prone 32-bit String.hashCode.
  @volatile private var lastSweepSignature: Option[(Long, String)] = None
  // consecutive triggers the idle guard suppressed; at forceSweepEvery
  // a full sweep runs regardless, bounding how long a signature-blind
  // change (digest collision, mid-range page edit) can be missed
  @volatile private var idleSkips = 0
  // sweep → (page count, probe digest): Spark may plan the same batch
  // several times (planning, execution, recovery); the sizing probe runs
  // once per sweep. Entries ≤ the committed sweep are evicted in commit().
  private val probeCache =
    new java.util.concurrent.ConcurrentHashMap[Long, (Long, String)]()

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def probe(sweep: Long): (Long, String) =
    probeCache.computeIfAbsent(sweep, _ => {
      val fetch = RestApiTableV2.fetcher(fetcherClass)
      def page(p: Long): String = fetch
        .fetch(RestSource.resolveTemplate(uriTemplate,
          Map("page" -> p.toString)), Map.empty, None)
        .getOrElse(throw new graft.sources.TransientFetchException(uriTemplate, 1))
      val firstBody = page(startPage)
      val totalPages = RestSource.keyChain(RestSource.parseJson(firstBody), totalPagesKeyChain)
        .map(_.asLong(1L)).getOrElse(1L)
      val lastDigest =
        if (totalPages > 1) md5Hex(page(startPage + totalPages - 1)) else ""
      (totalPages, md5Hex(firstBody) + lastDigest)
    })

  override def initialOffset(): Offset = RestSweepOffset(0L)

  // Trigger.AvailableNow: drain exactly ONE full sweep beyond wherever
  // the stream restored to, then terminate — the reference's backfill
  // contract (one complete pagination pass). Capping latestOffset at
  // the captured target is what makes the query terminate instead of
  // re-sweeping forever under a continuously-changing API.
  @volatile private var availableNowTarget: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(math.min(advanced + 1, maxSweeps))

  /** Each trigger runs one more sweep, up to `maxSweeps` — unless the
    * sizing probe shows the API unchanged since the last planned sweep
    * (same page count AND same first-page body), in which case the
    * offset does not advance and Spark skips the batch entirely (VERDICT
    * r2 #9: an idle API must not burn a full re-sweep per trigger). */
  override def latestOffset(): Offset = {
    availableNowTarget.foreach { target =>
      if (advanced >= target) return RestSweepOffset(advanced)
    }
    if (advanced >= maxSweeps) return RestSweepOffset(advanced)
    val next = advanced + 1
    val sig = probe(next)
    val guardEnabled = forceSweepEvery > 0
    val mustSweep = !guardEnabled || idleSkips + 1 >= forceSweepEvery
    if (guardEnabled && !mustSweep && advanced >= 1 && lastSweepSignature.contains(sig)) {
      probeCache.remove(next) // stale by next trigger: re-probe then
      idleSkips += 1
      RestSweepOffset(advanced)
    } else {
      idleSkips = 0
      lastSweepSignature = Some(sig)
      advanced = next
      RestSweepOffset(next)
    }
  }

  // admission-control form (the engine calls this one when the trait is
  // present); sweeps are all-or-nothing, so limits are advisory
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset = {
    val m = "\"sweep\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(json)
    RestSweepOffset(m.map(_.group(1).toLong).getOrElse(0L))
  }

  override def commit(end: Offset): Unit = {
    // monotonic: on checkpoint recovery Spark re-commits the restored
    // offset; never let a stale in-memory counter regress past it
    val sweep = end.asInstanceOf[RestSweepOffset].sweep
    advanced = math.max(advanced, sweep)
    // the cache must not grow for the life of the stream (ADVICE r2).
    // Keep the just-committed sweep: Spark can still re-plan that batch
    // (progress reporting, recovery) after commit; anything older is
    // dead. Bounded at ~2 entries.
    probeCache.keySet.removeIf(_ < sweep)
  }

  /** Driver-side sizing probe: fetch the first page once to learn the
    * page count, then hand executors disjoint page ranges. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[RestSweepOffset].sweep
    val to = end.asInstanceOf[RestSweepOffset].sweep
    // a planned range was durably logged in the offset WAL (recovery
    // replays the last batch with its original range), so recover the
    // in-memory floor from it
    advanced = math.max(advanced, to)
    // a batch (from → to] covers sweeps from+1..to — the same numbering
    // latestOffset probes under, so its cached probe is reused here
    ((from + 1) to to).flatMap { sweep =>
      val totalPages = probe(sweep)._1
      val lastPage = startPage + math.max(totalPages, 1L) - 1
      (startPage to lastPage by pagesPerPartition).map { first =>
        RestPageRangePartition(sweep, first,
          math.min(first + pagesPerPartition - 1, lastPage))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val template = uriTemplate
    val fc = fetcherClass
    val rk = recordKeyChain
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[RestPageRangePartition]
        new PartitionReader[InternalRow] {
          private val fetch = RestApiTableV2.fetcher(fc)
          private var page = p.firstPage
          private var records: Iterator[String] = Iterator.empty
          private var current: String = _

          override def next(): Boolean = {
            while (!records.hasNext && page <= p.lastPage) {
              val uri = RestSource.resolveTemplate(template, Map("page" -> page.toString))
              val body = fetch.fetch(uri, Map.empty, None).getOrElse(
                throw new graft.sources.TransientFetchException(uri, 1))
              records = RestSource.extractRecords(body, rk).iterator
              page += 1
            }
            if (records.hasNext) { current = records.next(); true } else false
          }
          override def get(): InternalRow =
            InternalRow(UTF8String.fromString(current))
          override def close(): Unit = ()
        }
      }
    }
  }

  override def stop(): Unit = ()
}
