package graft.ext

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** Distributed BPE training semantics on a hand-computed corpus:
  * weighted pair counts, count-then-lexicographic argmax, greedy
  * leftmost merge application (self-runs merge at even offsets only),
  * and end-of-word-marker participation. */
class BpeTrainSpec extends AnyFlatSpec with Matchers with SparkFixture {

  behavior of "BpeTrain.trainMerges"

  it should "learn the hand-computed merge sequence with exact counts and tie-breaks" in {
    import spark.implicits._
    // vocabulary: aaa ×2, ab ×3
    // step 1: (a,a)=4 (TWO positions per 'aaa'), (a,b)=3, (b,_)=3, (a,_)=2 → (a,a) c=4
    //         greedy leftmost: <a><a><a><_> → <aa><a><_> (even offsets only)
    // step 2: (aa,a)=2, (a,_)=2, (a,b)=3, (b,_)=3 → TIE at 3 → lexicographic: (a,b)
    // step 3: (aa,a)=2, (a,_)=2, (ab,_)=3 → (ab,_) c=3 — the marker merges like any symbol
    // step 4: (aa,a)=2, (a,_)=2 → tie at 2 → 'a' < 'aa' → (a,_)
    val docs = Seq("aaa aaa ab", "ab ab").toDF("text")
    val got = BpeTrain.trainMerges(docs, "text", steps = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    got shouldBe Array(
      (1L, "a", "a", 4L),
      (2L, "a", "b", 3L),
      (3L, "ab", "_", 3L),
      (4L, "a", "_", 2L))
  }

  it should "merge adjacent non-overlapping occurrences in one step and stop when fully merged" in {
    import spark.implicits._
    // single word 'abab': step 1 best is (a,b)=2 — BOTH occurrences must
    // merge in the same step (each symbol carries its own delimiters, so
    // <a><b><a><b> matches twice, non-overlapping)
    val docs = Seq("abab").toDF("text")
    val got = BpeTrain.trainMerges(docs, "text", steps = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    got(0) shouldBe ((1L, "a", "b", 2L))
    // after (a,b): <ab><ab><_> → (ab,ab)=1, (ab,_)=1 → tie → b: 'ab' < '_'?
    // lexicographic on (a, b): ("ab","_") vs ("ab","ab") → '_' < 'a' → (ab,_)...
    got(1)._1 shouldBe 2L
    // the word collapses to one symbol in a bounded number of steps and
    // training stops early rather than erroring on an empty pair set
    got.length should be < 10
    got.last._1 shouldBe got.length.toLong
  }
}
