package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** HTML → text extraction semantics (VERDICT r11 #3): invisible
  * elements vanish, boilerplate dies by the length + link-density
  * rule, prose survives (inline anchors included), entities decode
  * once, whitespace normalizes. */
class HtmlExtractSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private def extract(html: String, minLen: Int = 40): (Long, Long, String) = {
    import spark.implicits._
    val r = Seq(html).toDF("html")
      .select(TextOps.htmlExtract(col("html"), minLen).as("x"))
      .select("x.n_blocks", "x.n_kept", "x.extracted").head()
    (r.getLong(0), r.getLong(1), r.getString(2))
  }

  behavior of "TextOps.htmlExtract"

  private val prose =
    "the migration runbook describes how partitioned tables move between clusters without downtime today"

  it should "keep prose and drop nav, promo, footer, script and style" in {
    val html =
      "<html><head><style>p{x}</style><script>var a=1;</script></head><body>" +
        "<nav><a href=\"/\">Home</a> <a href=\"/x\">About</a></nav>" +
        s"<p>$prose</p>" +
        "<div><a href=\"/p\">Click here</a> for <a href=\"/d\">deals</a></div>" +
        "<footer>Copyright <a href=\"/t\">Terms</a></footer></body></html>"
    val (nBlocks, nKept, text) = extract(html)
    nBlocks shouldBe 4L // nav, p, promo, footer (head residue is empty)
    nKept shouldBe 1L
    text shouldBe prose
  }

  it should "not let a small inline anchor kill a long prose block" in {
    val html = s"<p>$prose see <a href=\"/ref\">reference</a></p>"
    val (_, nKept, text) = extract(html)
    nKept shouldBe 1L
    text shouldBe s"$prose see reference"
  }

  it should "drop a link-dense block even when it is long" in {
    val links = (1 to 12).map(i => s"<a href=\"/$i\">section number $i</a>").mkString(" ")
    extract(s"<div>$links</div>")._2 shouldBe 0L
  }

  it should "drop short prose below minLen" in {
    extract("<p>too short</p>")._2 shouldBe 0L
    extract("<p>too short</p>", minLen = 5) shouldBe ((1L, 1L, "too short"))
  }

  it should "decode entities exactly once and normalize whitespace" in {
    val html = s"<p>Fish &amp; chips &lt;tasty&gt;&nbsp;&quot;x&quot; &amp;lt;   $prose</p>"
    val (_, _, text) = extract(html)
    // &amp;lt; decodes to the literal text '&lt;', never twice to '<'
    text shouldBe s"""Fish & chips <tasty> "x" &lt; $prose"""
  }

  it should "count script/style content as no block at all" in {
    val html = "<script>function f(){return 1}</script><style>.c{a:b}</style>" +
      s"<p>$prose</p>"
    extract(html)._1 shouldBe 1L
  }
}
