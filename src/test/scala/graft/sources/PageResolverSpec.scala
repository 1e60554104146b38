package graft.sources

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.sources.RestSource._

/** Port of the reference's PageResolverTests.cs:13-79 sequences plus
  * auth-provider coverage (FixedHeader / DynamicBearer — the
  * reference's AuthenticatedMessageProvider pair). */
class PageResolverSpec extends AnyFlatSpec with Matchers {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def json(s: String) = Some(mapper.readTree(s))

  behavior of "PageOffsetResolver (PageResolverTests.cs:13-22 sequence)"

  it should "replay the reference's counter sequence" in {
    val r = PageOffsetResolver(3, Seq("data"), 0)
    val empty = json("""{"data": []}""")
    val filled = json("""{"data": [{}, {}, {}]}""")
    // (response, expected continue) — exactly the reference's table
    var s = PageState.initial
    s = r.next(s, empty); s.exhausted shouldBe false   // first empty: start
    s.pointer shouldBe Some("0")
    s = r.next(s, filled); s.exhausted shouldBe false  // advance by size
    s.pointer shouldBe Some("3")
    s = r.next(s, filled); s.exhausted shouldBe false
    s.pointer shouldBe Some("6")
    s = r.next(s, empty); s.exhausted shouldBe true    // empty mid-run: done
  }

  it should "continue past a short (non-empty) final page, per reference semantics" in {
    val r = PageOffsetResolver(3, Seq("data"), 0)
    var s = PageState(Some("0"), 1, exhausted = false)
    s = r.next(s, json("""{"data": [{}]}""")) // short page: still continues
    s.exhausted shouldBe false
    s.pointer shouldBe Some("3")
  }

  it should "honor a non-zero start offset" in {
    val r = PageOffsetResolver(5, Seq("data"), startOffset = 100)
    val s = r.next(PageState.initial, None)
    s.pointer shouldBe Some("100")
  }

  behavior of "PageNextTokenResolver"

  // Documented divergence from PageResolverTests.cs:64-72: the
  // reference's guard reads the token property with ARRAY semantics, so
  // a string-valued token is treated as absent and pagination stops
  // after one page. We follow the IPageResolver contract instead
  // (IPageResolver.cs:12-14: false only when no pages are left).
  it should "continue on a present string token and stop when it disappears" in {
    val r = PageNextTokenResolver(Seq("next"))
    var s = r.next(PageState.initial, None)
    s.exhausted shouldBe false // before the first request: continue
    s = r.next(s, json("""{"next": "http://example.com/next_page"}"""))
    s.exhausted shouldBe false
    s.pointer shouldBe Some("http://example.com/next_page")
    s = r.next(s, json("""{"next": null}"""))
    s.exhausted shouldBe true
  }

  behavior of "PageCountingResolver"

  it should "walk 1..totalPages then stop" in {
    val r = PageCountingResolver(Seq("meta", "totalPages"))
    val resp = json("""{"meta": {"totalPages": 3}, "items": [1]}""")
    var s = r.next(PageState.initial, None)
    s.pointer shouldBe Some("1")
    s = r.next(s, resp); s.pointer shouldBe Some("2"); s.exhausted shouldBe false
    s = r.next(s, resp); s.pointer shouldBe Some("3"); s.exhausted shouldBe false
    s = r.next(s, resp); s.exhausted shouldBe true
  }

  behavior of "auth providers"

  it should "pass fixed headers through" in {
    FixedHeaderAuth(Map("X-Api-Key" -> "k")).headers() shouldBe Map("X-Api-Key" -> "k")
  }

  it should "fetch, cache, and renew bearer tokens 60s before expiry" in {
    var now = 0L
    var calls = 0
    val fetcher = new HttpFetch {
      override def fetch(uri: String, h: Map[String, String], b: Option[String]) = {
        calls += 1
        Some(s"""{"token": "t$calls", "expiresIn": 120}""")
      }
    }
    val auth = new DynamicBearerAuth(fetcher, "http://auth", None, clock = () => now)
    auth.headers() shouldBe Map("Authorization" -> "Bearer t1")
    now = 30000L // within (120-60)s: cached
    auth.headers() shouldBe Map("Authorization" -> "Bearer t1")
    calls shouldBe 1
    now = 61000L // past the renew-early point
    auth.headers() shouldBe Map("Authorization" -> "Bearer t2")
    calls shouldBe 2
  }

  it should "fail loudly when the auth response lacks the token field" in {
    val fetcher = new HttpFetch {
      override def fetch(uri: String, h: Map[String, String], b: Option[String]) =
        Some("""{"something_else": true}""")
    }
    val auth = new DynamicBearerAuth(fetcher, "http://auth", None)
    a[RuntimeException] should be thrownBy auth.headers()
  }
}
