package graft.sources.dsv2

import java.util.concurrent.ConcurrentLinkedQueue

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** An in-JVM fake SQL Server CT surface, instantiable by class name on
  * executors (no-arg ctor). It answers the EXACT SQL shapes the source
  * generates — version probes and bounded striped deltas — from a
  * static change log, applying the same stripe arithmetic the T-SQL
  * would (ABS(CHECKSUM(pk)) % n emulated as pk % n ≥ 0). */
class FakeCtServer extends CtGateway {
  import FakeCtServer._

  override def scalar(sql: String): Option[Long] = {
    queries.add(sql)
    if (sql.contains("CHANGE_TRACKING_CURRENT_VERSION")) Some(version.get())
    else if (sql.contains("dm_tran_commit_table")) Option(lookbackSeek.get())
    else None
  }

  override def rows(sql: String): Iterator[Seq[Any]] = {
    queries.add(sql)
    if (sql.contains("INFORMATION_SCHEMA.COLUMNS"))
      return serverColumns.get().iterator.map(c => Seq[Any](c))
    val m = DeltaShape.findFirstMatchIn(sql).getOrElse(
      throw new IllegalArgumentException(s"unexpected delta SQL: $sql"))
    val from = m.group(1).toLong
    val to = m.group(2).toLong
    val (stripe, nStripes) = StripeShape.findFirstMatchIn(sql)
      .map(s => (s.group(2).toLong, s.group(1).toLong)).getOrElse((0L, 1L))
    import scala.jdk.CollectionConverters._
    changeLog.asScala.toSeq
      .filter(c => c.version > from && c.version <= to)
      .filter(c => math.abs(c.id) % nStripes == stripe)
      .sortBy(_.version)
      .iterator
      .map(c => Seq[Any](
        c.id, c.total,
        c.version, c.op, to,
        FakeCtServer.mergeKeyOf(Seq(c.id.toString))))
  }
}

object FakeCtServer {
  final case class Change(id: Long, total: Double, version: Long, op: String)
  val version = new java.util.concurrent.atomic.AtomicLong(0L)
  val lookbackSeek = new java.util.concurrent.atomic.AtomicReference[java.lang.Long](null)
  val changeLog = new ConcurrentLinkedQueue[Change]()
  val queries = new ConcurrentLinkedQueue[String]()
  val serverColumns =
    new java.util.concurrent.atomic.AtomicReference[Seq[String]](Seq("id", "total"))

  val DeltaShape =
    """CHANGETABLE\(CHANGES \[dbo\]\.\[orders\], (\d+)\) ct\s*\n\s*WHERE ct\.SYS_CHANGE_VERSION <= (\d+)""".r
  val StripeShape = """% (\d+) = (\d+)""".r

  def reset(): Unit = {
    version.set(0L); lookbackSeek.set(null); changeLog.clear(); queries.clear()
    serverColumns.set(Seq("id", "total"))
  }
  def commit(id: Long, total: Double, op: String = "U"): Long = {
    val v = version.incrementAndGet()
    changeLog.add(Change(id, total, v, op))
    v
  }

  /** What the server's HashBytes('SHA2_256', nvarchar) would return:
    * sha-256 over UTF-16LE of the '#'-joined PK values, lower hex —
    * byte-compatible with [[graft.ops.ColumnOps.mergeKeyExpr]]. */
  def mergeKeyOf(parts: Seq[String]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(parts.mkString("#").getBytes("UTF-16LE"))
      .map("%02x".format(_)).mkString
}

object CtRecoverySink {
  val rows = new ConcurrentLinkedQueue[(Long, Long)]()
}

class CtSourceV2Spec extends AnyFlatSpec with Matchers with SparkFixture {

  behavior of "CtTableProvider (DSv2 MicroBatchStream)"

  private def ctStream(extra: (String, String)*) = {
    val base = spark.readStream
      .format(classOf[CtTableProvider].getName)
      .option("gatewayClass", classOf[FakeCtServer].getName)
      .option("schemaName", "dbo").option("tableName", "orders")
      .option("pkColumns", "id")
      .option("schemaDdl", "id BIGINT, total DOUBLE")
    extra.foldLeft(base) { case (b, (k, v)) => b.option(k, v) }.load()
  }

  it should "expose base columns plus the CT metadata contract" in {
    FakeCtServer.reset()
    ctStream().schema.fieldNames.toSeq shouldBe Seq(
      "id", "total", "SYS_CHANGE_VERSION", "SYS_CHANGE_OPERATION",
      "ChangeTrackingVersion", "ARCANE_MERGE_KEY")
  }

  it should "deliver each version window exactly once across striped batches" in {
    import spark.implicits._
    FakeCtServer.reset()
    FakeCtServer.commit(1L, 10.0)
    FakeCtServer.commit(2L, 20.0)
    val q = ctStream("numStripes" -> "2", "startVersion" -> "0")
      .writeStream.format("memory").queryName("ct_v2_out")
      .option("checkpointLocation", tempDir("ctv2-ckpt"))
      .start()
    try {
      q.processAllAvailable()
      val batch1 = spark.table("ct_v2_out")
        .select("id", "total", "SYS_CHANGE_VERSION", "ChangeTrackingVersion")
        .as[(Long, Double, Long, Long)].collect().sortBy(_._1)
      batch1 shouldBe Array((1L, 10.0, 1L, 2L), (2L, 20.0, 2L, 2L))

      // idle triggers probe ONE scalar, never a delta query
      val deltasBefore = deltaQueryCount
      q.processAllAvailable()
      deltaQueryCount shouldBe deltasBefore

      // new commits: ONLY the new window is delivered (no redelivery of 1-2)
      FakeCtServer.commit(3L, 30.0)
      FakeCtServer.commit(1L, 11.0) // row 1 changes again at v4
      q.processAllAvailable()
      val all = spark.table("ct_v2_out")
        .select("id", "total", "SYS_CHANGE_VERSION")
        .as[(Long, Double, Long)].collect().sortBy(r => (r._3, r._1))
      all shouldBe Array(
        (1L, 10.0, 1L), (2L, 20.0, 2L), (3L, 30.0, 3L), (1L, 11.0, 4L))

      // the WAL carries our offset JSON
      q.lastProgress.sources.head.endOffset should include("\"version\":4")

      // every batch fanned out over both stripes, and the bounded SQL
      // shape (upper version + stripe predicate) is what actually ran
      val stripes = deltaQueries.flatMap(s =>
        FakeCtServer.StripeShape.findFirstMatchIn(s).map(_.group(2)))
      stripes.toSet shouldBe Set("0", "1")
    } finally q.stop()
  }

  it should "recover from the checkpoint WAL and resume at the committed version" in {
    FakeCtServer.reset()
    CtRecoverySink.rows.clear()
    FakeCtServer.commit(1L, 10.0)
    val ckpt = tempDir("ctv2-recover-ckpt")
    def start() = ctStream("startVersion" -> "0")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("id", "SYS_CHANGE_VERSION").collect()
          .foreach(r => CtRecoverySink.rows.add((r.getLong(0), r.getLong(1))))
      }
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    import scala.jdk.CollectionConverters._
    CtRecoverySink.rows.asScala.toSeq shouldBe Seq((1L, 1L))

    // stream is DOWN; the table keeps changing
    FakeCtServer.commit(2L, 20.0)
    FakeCtServer.commit(3L, 30.0)

    val q2 = start()
    try {
      q2.processAllAvailable()
      // ONLY versions after the WAL-committed offset arrive — recovery
      // came from Spark's checkpoint, not a side-car file
      CtRecoverySink.rows.asScala.toSeq.sortBy(_._2) shouldBe
        Seq((1L, 1L), (2L, 2L), (3L, 3L))
    } finally q2.stop()
  }

  it should "seed the initial offset from the lookback window" in {
    FakeCtServer.reset()
    FakeCtServer.commit(1L, 10.0) // v1
    FakeCtServer.commit(2L, 20.0) // v2
    FakeCtServer.commit(3L, 30.0) // v3
    FakeCtServer.lookbackSeek.set(2L) // lookback window starts at v2
    val q = ctStream()
      .writeStream.format("memory").queryName("ct_v2_seek")
      .option("checkpointLocation", tempDir("ctv2-seek-ckpt"))
      .start()
    try {
      q.processAllAvailable()
      import spark.implicits._
      spark.table("ct_v2_seek").select("SYS_CHANGE_VERSION")
        .as[Long].collect().sorted shouldBe Array(3L)
    } finally q.stop()
  }

  it should "drain existing changes and terminate under Trigger.AvailableNow" in {
    import spark.implicits._
    FakeCtServer.reset()
    FakeCtServer.commit(1L, 10.0)
    FakeCtServer.commit(2L, 20.0)
    FakeCtServer.commit(3L, 30.0)
    val q = ctStream("startVersion" -> "0")
      .writeStream.format("memory").queryName("ct_v2_an")
      .option("checkpointLocation", tempDir("ctv2-an-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // the query must TERMINATE on its own (the AvailableNow contract) …
    q.awaitTermination(60000) shouldBe true
    // … having drained every version that existed at start
    spark.table("ct_v2_an").select("SYS_CHANGE_VERSION")
      .as[Long].collect().sorted shouldBe Array(1L, 2L, 3L)
  }

  it should "fail the stream with SchemaMismatchException when the table drifts" in {
    FakeCtServer.reset()
    FakeCtServer.commit(1L, 10.0)
    val q = ctStream("startVersion" -> "0", "validateSchemaEvery" -> "1")
      .writeStream.format("memory").queryName("ct_v2_drift")
      .option("checkpointLocation", tempDir("ctv2-drift-ckpt"))
      .start()
    try {
      q.processAllAvailable()
      spark.table("ct_v2_drift").count() shouldBe 1 // matching schema streams fine

      // the table gains a column while the stream is live
      FakeCtServer.serverColumns.set(Seq("id", "total", "discount"))
      FakeCtServer.commit(2L, 20.0)
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(30000)
      }
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(e => e +: chain(e.getCause))
      chain(ex).exists(_.isInstanceOf[graft.model.SchemaMismatchException]) shouldBe true
    } finally q.stop()
  }

  it should "convert JDBC-shaped values per the declared schema" in {
    CtTableV2.toCatalyst(java.lang.Integer.valueOf(7), org.apache.spark.sql.types.LongType) shouldBe 7L
    CtTableV2.toCatalyst("x", org.apache.spark.sql.types.StringType).toString shouldBe "x"
    assert(CtTableV2.toCatalyst(null, org.apache.spark.sql.types.StringType) == null)
    CtTableV2.toCatalyst(java.math.BigDecimal.valueOf(12.5),
      org.apache.spark.sql.types.DecimalType(10, 2)).toString shouldBe "12.50"
    an[IllegalArgumentException] should be thrownBy
      CtTableV2.toCatalyst(new Object, org.apache.spark.sql.types.LongType)
  }

  private def deltaQueries: Seq[String] = {
    import scala.jdk.CollectionConverters._
    FakeCtServer.queries.asScala.toSeq.filter(_.contains("CHANGETABLE"))
  }
  private def deltaQueryCount: Int = deltaQueries.size
}
