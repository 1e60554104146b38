package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture
import graft.model.Constants

class ColumnOpsSpec extends AnyFlatSpec with Matchers with SparkFixture {

  import scala.jdk.CollectionConverters._

  behavior of "mergeKeyExpr"

  // golden value from the reference's integration test
  // (test/Sources/SqlServerChangeTrackingSourceTests.cs:74): single PK
  // 88888 under T-SQL nvarchar (UTF-16LE) hashing
  it should "reproduce the reference's SHA-256 for PK 88888" in {
    import spark.implicits._
    val df = Seq(88888).toDF("x")
    val key = ColumnOps.withMergeKey(df, Seq("x"))
      .select(Constants.MergeKeyColumn).as[String].head()
    key shouldBe "cc2b36e9f63cdbf5baa90d8eeb0d8edfae3017b137ff2c94ef9d9436bac760f0"
  }

  it should "join composite keys with '#' before hashing" in {
    import spark.implicits._
    val df = Seq((1, "a")).toDF("k1", "k2")
    val expected = java.security.MessageDigest.getInstance("SHA-256")
      .digest("1#a".getBytes("UTF-16LE")).map(b => f"$b%02x").mkString
    ColumnOps.withMergeKey(df, Seq("k1", "k2"))
      .select(Constants.MergeKeyColumn).as[String].head() shouldBe expected
  }

  behavior of "withDatePartition"

  it should "evaluate an arbitrary SQL expression as string" in {
    import spark.implicits._
    val df = Seq("2024-03-15").toDF("d")
      .withColumn("d", col("d").cast("timestamp"))
    ColumnOps.withDatePartition(df, "date_format(d, 'yyyyMM')")
      .select(Constants.DatePartitionKeyColumn).as[String].head() shouldBe "202403"
  }

  behavior of "cdmBackfillNormalize"

  it should "rename LSN, drop _SysRowId, inject feed constants, reorder" in {
    import spark.implicits._
    val base = Seq(("lsn1", "sys1", 42L, "alice")).toDF("LSN", "_SysRowId", "RECID", "NAME")
    val out = ColumnOps.cdmBackfillNormalize(
      ColumnOps.withMergeKeyFrom(base, "RECID"),
      Seq("Start_LSN", "End_LSN", "DML_Action", "Seq_Val", "Update_Mask",
        "RECID", "NAME", Constants.MergeKeyColumn))
    out.columns.toSeq shouldBe Seq("Start_LSN", "End_LSN", "DML_Action",
      "Seq_Val", "Update_Mask", "RECID", "NAME", Constants.MergeKeyColumn)
    val row = out.collect().head
    row.getString(0) shouldBe "lsn1"
    row.getString(2) shouldBe "INSERT"
    row.getLong(5) shouldBe 42L
    row.getString(7) shouldBe "42"
  }

  behavior of "latestByKey"

  it should "keep exactly the highest version per key with deterministic ties" in {
    import spark.implicits._
    val df = Seq(
      ("k1", 1L, "old"), ("k1", 3L, "new"), ("k1", 2L, "mid"),
      ("k2", 5L, "only"),
      ("k3", 7L, "tie-a"), ("k3", 7L, "tie-b")).toDF("key", "ver", "payload")
    val out = ColumnOps.latestByKey(df, "key", "ver", tieBreakers = Seq("payload"))
      .orderBy("key")
      .select("key", "payload").as[(String, String)].collect().toSeq
    out shouldBe Seq(("k1", "new"), ("k2", "only"), ("k3", "tie-b"))
  }

  behavior of "applyDeletes"

  it should "drop rows with operation D" in {
    import spark.implicits._
    val df = Seq(("a", "I"), ("b", "D"), ("c", "U"))
      .toDF("k", Constants.ChangeOperationColumn)
    ColumnOps.applyDeletes(df).select("k").as[String].collect().toSeq shouldBe Seq("a", "c")
  }

  behavior of "asOfJoin"

  it should "pick the latest right row at-or-before each left time, nulls when none" in {
    import spark.implicits._
    val events = Seq(
      (1L, "u1", 10L), // after both versions: latest wins
      (2L, "u1", 5L),  // exactly ON version 5: inclusive
      (3L, "u1", 1L),  // before any version: null
      (4L, "u2", 10L)  // key with no right rows at all: null
    ).toDF("event_id", "k", "t")
    val versions = Seq(
      ("u1", 2L, "v@2"), ("u1", 5L, "v@5"), ("u3", 1L, "other"))
      .toDF("vk", "vt", "payload")
    val out = ColumnOps.asOfJoin(events, versions,
        "k", "vk", "t", "vt", "event_id", rightTieBreakers = Seq("payload"))
      .select("event_id", "payload").as[(Long, Option[String])]
      .collect().sortBy(_._1)
    out.toSeq shouldBe Seq(
      (1L, Some("v@5")), (2L, Some("v@5")), (3L, None), (4L, None))
  }

}
