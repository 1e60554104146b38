package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Trained char-bigram language ID (round 18, VERDICT r17 #5): planted
  * non-Latin docs get a real verdict exactly where the stopword-marker
  * heuristic degrades to `unk`, and the Latin languages keep working. */
class LangIdSpec extends AnyFlatSpec with Matchers with SparkFixture {

  behavior of "LangId"

  // held-out sentences — NOT the training seeds
  private val samples = Seq(
    1L -> ("en", "the children are walking to the river in the morning and " +
      "the dog is running over the quiet field near the house"),
    2L -> ("es", "los amigos juegan en la calle por la manana y el pan que " +
      "compra la senora esta caliente mientras hablan del pueblo"),
    3L -> ("de", "die frau kauft frisches brot und der hund spielt nicht im " +
      "park sondern lauft durch die strasse zur arbeit"),
    4L -> ("fr", "les amis jouent dans la rue pendant que le chien court " +
      "dans le parc et la femme achete du pain pour le dejeuner"),
    5L -> ("ru", "дети играют на улице утром и собака бежит по парку пока " +
      "женщина покупает хлеб возле реки и говорит о погоде"),
    6L -> ("zh", "孩子们早上在街上玩耍狗在公园里跑女士在河边买面包和朋友聊天"))

  it should "classify held-out sentences in all six trained languages" in {
    import spark.implicits._
    val df = samples.map { case (id, (_, t)) => (id, t) }.toDF("doc_id", "text")
    val got = LangId.classify(df, "doc_id", "text")
      .select("doc_id", "lang_id2").as[(Long, String)].collect().toMap
    samples.foreach { case (id, (lang, _)) =>
      withClue(s"doc $id: ")(got(id) shouldBe lang)
    }
  }

  it should "give real verdicts where the stopword heuristic returns unk (non-Latin scripts)" in {
    import spark.implicits._
    val nonLatin = samples.filter { case (_, (l, _)) => l == "ru" || l == "zh" }
    val df = nonLatin.map { case (id, (_, t)) => (id, t) }.toDF("doc_id", "text")
    // the OLD path: ASCII tokenization + per-language marker hits
    val withHits = TextOps.LangMarkers.foldLeft(
      df.withColumn("toks", TextOps.tokens(col("text")))) {
      case (d, (lang, words)) =>
        d.withColumn(s"hits_$lang", TextOps.wordListHits(col("toks"), words))
    }
    val old = withHits.withColumn("lang_guess",
        TextOps.langGuess(TextOps.LangMarkers.map { case (l, _) => l -> col(s"hits_$l") }))
      .select("doc_id", "lang_guess").as[(Long, String)].collect().toMap
    old.values.toSet shouldBe Set("unk") // the ASCII wall, demonstrated
    val neu = LangId.classify(df, "doc_id", "text")
      .select("doc_id", "lang_id2").as[(Long, String)].collect().toMap
    nonLatin.foreach { case (id, (lang, _)) =>
      withClue(s"doc $id: ")(neu(id) shouldBe lang)
    }
  }

  it should "return unk for text with no trained grams and handle sub-bigram inputs" in {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "q"), (3L, "0123456789~~~~")).toDF("doc_id", "text")
    val got = LangId.classify(df, "doc_id", "text")
      .select("doc_id", "lang_id2").as[(Long, String)].collect().toMap
    got(1L) shouldBe "unk"
    got(2L) shouldBe "unk"
    got(3L) shouldBe "unk" // digits/tilde bigrams are in no seed
  }

  it should "score through one codegen'd native expression (no per-bigram table scan)" in {
    import spark.implicits._
    val dir = tempDir("langid-plan")
    samples.map { case (id, (_, t)) => (id, t) }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    val plan = LangId.classify(spark.read.parquet(dir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the scorer is the single native node, inside whole-stage codegen
    plan should include("graft_lang_scores")
    plan.linesIterator.exists(l =>
      l.contains("Project") && l.trim.startsWith("*")) shouldBe true
    // astral-plane text (surrogate pairs) must score by CODE POINTS —
    // the native walk must equal the code-point bigram arithmetic the
    // SQL substring form (and the DuckDB oracle) uses
    val astral = "😀на😀 улице дети играют утром"
    val cps = astral.codePoints().toArray
    val expected = (0 until cps.length - 1).map { i =>
      new String(cps, i, 2)
    }.flatMap(g => LangId.weights.get(g))
      .collect { case (o, r) if LangId.LangOrder(o) == "ru" => r }.sum
    expected should be > 0L // the Cyrillic grams still land around the emoji
    val native = LangId.classify(
        Seq((1L, astral)).toDF("doc_id", "text"), "doc_id", "text")
      .select("s_ru").as[Long].head()
    native shouldBe expected
  }

  it should "train a deterministic integer-weight table (BMP-only seeds, packed range)" in {
    val w = LangId.weights
    w should not be empty
    // every (ownerIdx, r) packs into the 2^20 scheme the scorer unpacks
    w.values.foreach { case (o, r) =>
      o should (be >= 0 and be < LangId.LangOrder.size)
      r should (be >= 0L and be < 1048576L)
    }
    // distinctive grams land with their language
    w("th")._1 shouldBe LangId.LangOrder.indexOf("en")
    w("ж.".take(1) + "е")._1 shouldBe LangId.LangOrder.indexOf("ru")
  }

  // ----------------------------------------------------------------
  // OPERATOR-TRAINED MODELS (round 19, VERDICT r18 #5)
  // ----------------------------------------------------------------

  behavior of "LangId.train (operator-supplied labeled corpus)"

  it should "add a language as DATA, not a source edit" in {
    import spark.implicits._
    // the seed model's six languages as labeled rows PLUS Portuguese —
    // a language the in-repo seed literals do not know
    val pt = "o cachorro corre pela rua e as criancas brincam no parque " +
      "enquanto uma senhora compra pao fresco de manha e conversa com " +
      "as suas amigas sobre a vida da aldeia toda semana perto do rio"
    val labeled = (LangId.Seeds :+ ("pt" -> pt))
      .toDF("lang", "text")
    val model = LangId.train(labeled, "lang", "text")
    model.order shouldBe (LangId.LangOrder :+ "pt").sorted
    // every weight packs into the scorer's 2^20 scheme
    model.weights.values.foreach { case (o, r) =>
      o should (be >= 0 and be < model.order.size)
      r should (be >= 0L and be < 1048576L)
    }

    // held-out sentences (the fixture samples + a Portuguese one)
    // classify under the trained model exactly like the seed model —
    // and Portuguese gets a real verdict
    val ptHeldOut = "as criancas caminham para o rio de manha e o cachorro " +
      "corre pelo campo perto da casa enquanto a senhora fala da aldeia"
    val df = (samples.map { case (id, (_, t)) => (id, t) } :+
      (7L -> ptHeldOut)).toDF("doc_id", "text")
    val got = LangId.classifyWith(model, df, "doc_id", "text")
      .select("doc_id", "lang_id3").as[(Long, String)].collect().toMap
    samples.foreach { case (id, (lang, _)) =>
      withClue(s"doc $id: ")(got(id) shouldBe lang)
    }
    got(7L) shouldBe "pt"
    // the seed model cannot know Portuguese — it must NOT say pt
    // (it reads the Romance bigrams as es; the point is the contrast:
    // pt required retraining source literals before round 19)
    LangId.classify(Seq((7L, ptHeldOut)).toDF("doc_id", "text"),
        "doc_id", "text")
      .select("lang_id2").as[String].head() should not be "pt"
  }

  it should "cap profiles at top-K grams deterministically" in {
    import spark.implicits._
    val labeled = LangId.Seeds.toDF("lang", "text")
    val small = LangId.train(labeled, "lang", "text", topK = 5)
    // every language owns at most 5 grams (ownership can only shrink
    // the per-language count below the cap)
    small.weights.groupBy(_._2._1).foreach { case (_, grams) =>
      grams.size should be <= 5
    }
    // deterministic: retraining yields the identical table
    LangId.train(labeled, "lang", "text", topK = 5) shouldBe small
  }

  it should "persist and reload a trained model bit-for-bit (profile store)" in {
    import spark.implicits._
    val pt = "o cachorro corre pela rua e as criancas brincam no parque " +
      "enquanto uma senhora compra pao fresco de manha"
    val model = LangId.train(
      (LangId.Seeds :+ ("pt" -> pt)).toDF("lang", "text"), "lang", "text")
    val root = tempDir("langid-store")
    LangId.save(spark, model, root)
    val loaded = LangId.loadModel(spark, root)
    loaded shouldBe model
    // a non-store root refuses loudly
    val e = intercept[IllegalArgumentException] {
      LangId.loadModel(spark, tempDir("langid-notastore"))
    }
    e.getMessage should include("langid.json")
  }

  it should "exclude sub-bigram rows from training" in {
    import spark.implicits._
    val labeled = Seq(("en", "the house and the river"), ("en", "a"),
      ("xx", "z")).toDF("lang", "text")
    val model = LangId.train(labeled, "lang", "text")
    // the 1-char rows contribute no grams: 'xx' trains nothing and
    // must not appear in the order or weights
    model.order shouldBe Seq("en")
    model.weights.keySet.exists(_.contains("z")) shouldBe false
  }
}
