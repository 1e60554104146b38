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

  behavior of "substring duplication profile"

  it should "equal a brute-force reference on random small corpora" in {
    import spark.implicits._
    // random corpora over a tiny vocabulary (forces genuine cross-doc
    // window collisions) — the distributed windowed/gaps-and-islands
    // plan must agree with the obvious in-memory computation on every
    // (n_windows, n_dup_windows, dup_ratio_e4, max_dup_run) row
    val w = 3
    val genDoc = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    val corpora = samples(Gen.listOfN(6, genDoc), 10)
    corpora.zipWithIndex.foreach { case (docsList, ci) =>
      val df = docsList.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.ext.Dedup.substringDupProfile(df, "doc_id", "text", w)
        .orderBy("doc_id")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      // reference: windows as raw strings, per-doc flags, island scan
      val toks = docsList.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      }.filter(_._2.size >= w)
      val wins = toks.map { case (id, tk) =>
        id -> tk.sliding(w).map(_.mkString(" ")).toVector
      }
      val owners = wins.flatMap { case (id, ws) => ws.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val want = wins.map { case (id, ws) =>
        val flags = ws.map(s => owners(s).exists(_ != id))
        val runs = flags.foldLeft(List.empty[Int]) {
          case (acc, true)  => if (acc.nonEmpty && acc.head > 0) (acc.head + 1) :: acc.tail else 1 :: acc
          case (acc, false) => 0 :: acc
        }.filter(_ > 0)
        val nDup = flags.count(identity).toLong
        (id, ws.size.toLong, nDup, nDup * 10000 / ws.size,
          if (runs.isEmpty) 0L else runs.max.toLong)
      }.sortBy(_._1)
      withClue(s"corpus #$ci: $docsList: ") { got shouldBe want }
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
