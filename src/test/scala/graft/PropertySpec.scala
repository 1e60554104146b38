package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.ops.ColumnOps
import graft.sinks.KeyedJsonSink
import graft.sources.RestSource

/** Property-based coverage (SURVEY §5: ScalaCheck for the pure
  * hash/schema/codec functions). The offline cache carries scalacheck
  * without the scalatest bridge, so generators are sampled explicitly
  * from a fixed seed (deterministic CI); Spark-evaluated properties
  * batch all samples into ONE DataFrame per property. */
class PropertySpec extends AnyFlatSpec with Matchers with SparkFixture {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))

  behavior of "merge-key hashing"

  it should "equal the MessageDigest reference for any PK values (both encodings)" in {
    import spark.implicits._
    val pairs = samples(
      Gen.zip(Gen.alphaNumStr, Gen.choose(Long.MinValue, Long.MaxValue)), 60)
    val df = pairs.toDF("s", "n")
    Seq("UTF-16LE", "UTF-8").foreach { enc =>
      val got = df.select(ColumnOps.mergeKeyExpr(Seq("s", "n"), enc)).as[String].collect()
      val want = pairs.map { case (s, n) =>
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s"$s#$n".getBytes(enc)).map(b => f"$b%02x").mkString
      }
      got.toSeq shouldBe want
      all(got) should fullyMatch regex "[0-9a-f]{64}"
    }
  }

  behavior of "PageState JSON codec"

  it should "round-trip any pointer, including unicode and quotes" in {
    val genState = for {
      ptr <- Gen.option(Gen.oneOf(Gen.alphaNumStr,
        Gen.const("""with "quotes" and \backslash"""), Gen.const("页码/τimé")))
      pages <- Gen.choose(0, Int.MaxValue)
      done <- Gen.oneOf(true, false)
    } yield RestSource.PageState(ptr, pages, done)
    samples(genState, 100).foreach { s =>
      RestSource.PageState.fromJson(RestSource.PageState.toJson(s)) shouldBe s
    }
  }

  behavior of "hive path unescaping"

  it should "invert Spark's partition-value escaping for any path" in {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val genPath = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('/', ':', '%', ' ', '#', '=', 'é')))
      .map(_.mkString)
    samples(genPath, 200).foreach { p =>
      KeyedJsonSink.unescapePathName(ExternalCatalogUtils.escapePathName(p)) shouldBe p
    }
  }

  behavior of "rolling hash"

  it should "equal the pure byte fold for arbitrary strings" in {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val strs = samples(Gen.asciiPrintableStr, 150)
    val got = strs.toDF("s")
      .select(expr("graft_rolling_hash(s)")).as[Long].collect()
    val want = strs.map(_.getBytes("UTF-8")
      .foldLeft(0L)((h, b) => (h * 257L + (b & 0xff)) % 1000000007L))
    got.toSeq shouldBe want
  }

  behavior of "StreamPartition json"

  it should "emit parseable JSON for any field content" in {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    samples(Gen.zip(Gen.asciiStr, Gen.asciiStr), 100).foreach { case (name, exprStr) =>
      val json = graft.model.StreamPartition(name, "fmt", exprStr,
        isDatePartition = false).toJson
      val node = mapper.readTree(json)
      node.get("field_name").asText() shouldBe name
      node.get("field_expression").asText() shouldBe exprStr
    }
  }
}
