package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Port of the reference's CSV parser cases
  * (test/Operations/CsvOperationsTests.cs:9-31) through the engine's
  * actual read path — Spark's CSV reader with the CdmSource options
  * (quote=escape='"', multiLine, FAILFAST). The reference hand-rolls a
  * quote-aware splitter; we must match its observable parse of the
  * same lines. */
class CsvParitySpec extends AnyFlatSpec with Matchers with SparkFixture {

  private def readLine(line: String, arity: Int): Seq[String] = {
    val dir = tempDir("csv-parity")
    Files.writeString(Paths.get(dir, "case.csv"), line)
    val schema = StructType((0 until arity).map(i => StructField(s"c$i", StringType)))
    val rows = spark.read
      .options(Map("multiLine" -> "true", "quote" -> "\"", "escape" -> "\"",
        "header" -> "false", "mode" -> "FAILFAST"))
      .schema(schema).csv(dir).collect()
    rows.length shouldBe 1
    (0 until arity).map(i => rows.head.getString(i))
  }

  behavior of "CSV parsing parity (CsvOperationsTests.cs cases)"

  it should "parse quoted values with empty unquoted fields as nulls" in {
    readLine("\"qv1\",\"qv2\",\"qv3\",,\"qv4\",\"qv5\",\"qv6\",123,,0.12345", 10) shouldBe
      Seq("qv1", "qv2", "qv3", null, "qv4", "qv5", "qv6", "123", null, "0.12345")
  }

  it should "parse mixed bare/quoted with trailing empties" in {
    readLine("123,,\"qv1\",,,,", 7) shouldBe
      Seq("123", null, "qv1", null, null, null, null)
  }

  it should "parse leading empties" in {
    readLine(",,123,341,5", 5) shouldBe Seq(null, null, "123", "341", "5")
  }

  it should "keep delimiters inside quoted fields" in {
    readLine("\"q\",,\"13,21\"", 3) shouldBe Seq("q", null, "13,21")
    readLine("123,,\", abc def\"", 3) shouldBe Seq("123", null, ", abc def")
  }

  it should "parse the reference's real-world row shape" in {
    readLine("5637144576,\"NFO\",,0,", 5) shouldBe
      Seq("5637144576", "NFO", null, "0", null)
  }

  it should "handle quoted embedded newlines via multiLine" in {
    readLine("\"line1\nline2\",x", 2) shouldBe Seq("line1\nline2", "x")
  }

  it should "handle doubled-quote escapes inside quoted fields" in {
    readLine("\"say \"\"hi\"\"\",y", 2) shouldBe Seq("say \"hi\"", "y")
  }

  it should "fail loudly on arity mismatch in FAILFAST mode" in {
    an[Exception] should be thrownBy readLine("a,b,c,d", 3)
  }

  it should "skip empty lines in the feed, per reference CdmChangeFeedSource.cs:325" in {
    // the reference drops IsNullOrEmpty lines from the raw blob text
    // before parsing; Spark's CSV reader skips truly empty lines
    // natively, even under FAILFAST — this locks that platform behavior
    // as the parity guarantee (the standalone filter helper was removed)
    val dir = tempDir("csv-empty-lines")
    Files.writeString(Paths.get(dir, "feed.csv"), "a,1\n\nb,2\n\n\nc,3\n")
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", StringType)))
    val rows = spark.read
      .options(Map("multiLine" -> "true", "quote" -> "\"", "escape" -> "\"",
        "header" -> "false", "mode" -> "FAILFAST"))
      .schema(schema).csv(dir).collect()
    rows.map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq shouldBe
      Seq(("a", "1"), ("b", "2"), ("c", "3"))
  }
}
