package graft.sources

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.sources.RestSource._

/** Port of the reference's PageResolverTests.cs:13-79 sequences plus
  * auth-provider coverage (FixedHeader / DynamicBearer — the
  * reference's AuthenticatedMessageProvider pair). */
class PageResolverSpec extends AnyFlatSpec with Matchers with graft.SparkFixture {

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

  it should "send the token request form-encoded when configured (reference .cs:110-119)" in {
    val seen = new java.util.concurrent.atomic.AtomicReference[(Map[String, String], Option[String])]()
    val fetcher = new HttpFetch {
      override def fetch(uri: String, h: Map[String, String], b: Option[String]) = {
        seen.set((h, b))
        Some("""{"token": "T1", "expiresIn": 600}""")
      }
    }
    val auth = new DynamicBearerAuth(fetcher, "http://auth",
      tokenRequestBody = Some("""{"client_id": "c 1", "grant_type": "client_credentials"}"""),
      tokenRequestContentType = "application/x-www-form-urlencoded")
    auth.headers() shouldBe Map("Authorization" -> "Bearer T1")
    val (hdrs, body) = seen.get()
    hdrs shouldBe Map("Content-Type" -> "application/x-www-form-urlencoded")
    body shouldBe Some("client_id=c+1&grant_type=client_credentials")
  }

  it should "reject an unsupported token content type, like the reference" in {
    val fetcher = new HttpFetch {
      override def fetch(uri: String, h: Map[String, String], b: Option[String]) =
        Some("""{"token": "T"}""")
    }
    val auth = new DynamicBearerAuth(fetcher, "http://auth",
      tokenRequestBody = Some("""{"a":"b"}"""), tokenRequestContentType = "text/plain")
    an[IllegalArgumentException] should be thrownBy auth.headers()
  }

  it should "use the fixed TTL without consulting the response (reference .cs:79-99)" in {
    var calls = 0
    val fetcher = new HttpFetch {
      override def fetch(uri: String, h: Map[String, String], b: Option[String]) = {
        calls += 1
        Some(s"""{"token": "T$calls", "expiresIn": 999999}""")
      }
    }
    var now = 0L
    val auth = new DynamicBearerAuth(fetcher, "http://auth", None,
      fixedTtlSeconds = Some(120L), clock = () => now)
    auth.headers() shouldBe Map("Authorization" -> "Bearer T1")
    now = 59 * 1000L // within fixed TTL − 60s renewal margin
    auth.headers() shouldBe Map("Authorization" -> "Bearer T1")
    now = 61 * 1000L // past it — expiresIn:999999 must NOT have extended the cache
    auth.headers() shouldBe Map("Authorization" -> "Bearer T2")
  }

  it should "cover the reference header-emission matrix (GetRequest, .cs:134-153)" in {
    def fetcher = new HttpFetch {
      override def fetch(uri: String, h: Map[String, String], b: Option[String]) =
        Some("""{"token": "TK", "expiresIn": 600}""")
    }
    def auth(headerName: String, scheme: String) =
      new DynamicBearerAuth(fetcher, "http://auth", None,
        headerName = headerName, scheme = scheme)
    // null/empty/"Authorization" header name → Authorization, scheme
    // defaulting to Bearer when unset
    auth(null, null).headers() shouldBe Map("Authorization" -> "Bearer TK")
    auth("", "").headers() shouldBe Map("Authorization" -> "Bearer TK")
    auth("Authorization", "Token").headers() shouldBe Map("Authorization" -> "Token TK")
    // custom header name: "<scheme> <token>", or the BARE token when
    // the scheme is empty (API-key-style header, .cs:143)
    auth("X-Auth", "Custom").headers() shouldBe Map("X-Auth" -> "Custom TK")
    auth("X-Api-Key", "").headers() shouldBe Map("X-Api-Key" -> "TK")
    auth("X-Api-Key", null).headers() shouldBe Map("X-Api-Key" -> "TK")
  }

  it should "attach additional headers to every authenticated request (.cs:147-150)" in {
    var calls = 0
    val fetcher = new HttpFetch {
      override def fetch(uri: String, h: Map[String, String], b: Option[String]) = {
        calls += 1
        Some(s"""{"token": "T$calls", "expiresIn": 600}""")
      }
    }
    val auth = new DynamicBearerAuth(fetcher, "http://auth", None,
      additionalHeaders = Map("X-Trace" -> "on", "X-Tenant" -> "t1"))
    val h1 = auth.headers()
    h1 shouldBe Map("Authorization" -> "Bearer T1", "X-Trace" -> "on", "X-Tenant" -> "t1")
    // cached token, additional headers still present
    auth.headers() shouldBe h1
    calls shouldBe 1
  }

  it should "never let an additionalHeaders key drop the computed auth header (ADVICE r11)" in {
    val fetcher = new HttpFetch {
      override def fetch(uri: String, h: Map[String, String], b: Option[String]) =
        Some("""{"token": "REAL", "expiresIn": 600}""")
    }
    // the reference APPENDS colliding headers (GetRequest.cs:147-150);
    // a Map carries one value per key, so the auth value must win
    val auth = new DynamicBearerAuth(fetcher, "http://auth", None,
      additionalHeaders = Map("Authorization" -> "Bearer STALE", "X-Trace" -> "on"))
    auth.headers() shouldBe Map("Authorization" -> "Bearer REAL", "X-Trace" -> "on")
  }

  it should "read seconds-to-expiry from a custom response property (.cs:127-129)" in {
    var now = 0L
    var calls = 0
    val fetcher = new HttpFetch {
      override def fetch(uri: String, h: Map[String, String], b: Option[String]) = {
        calls += 1
        // the DEFAULT expiresIn field carries a decoy: only the custom
        // property may drive the TTL
        Some(s"""{"token": "T$calls", "expires_in_seconds": 120, "expiresIn": 999999}""")
      }
    }
    val auth = new DynamicBearerAuth(fetcher, "http://auth", None,
      expiresInField = "expires_in_seconds", clock = () => now)
    auth.headers() shouldBe Map("Authorization" -> "Bearer T1")
    now = 59 * 1000L // within 120s − 60s renewal margin
    auth.headers() shouldBe Map("Authorization" -> "Bearer T1")
    calls shouldBe 1
    now = 61 * 1000L // past it — the decoy must not have extended the cache
    auth.headers() shouldBe Map("Authorization" -> "Bearer T2")
    calls shouldBe 2
  }

  behavior of "template resolution (RestApiTemplate.cs:33-106)"

  it should "short-circuit to an absolute URI returned by a resolver (.cs:72-79)" in {
    RestSource.resolveTemplate("http://api/items?page=@page",
      Map("page" -> "http://api/items?cursor=abc&page=2")) shouldBe
      "http://api/items?cursor=abc&page=2"
    // only fields the template references can override it
    RestSource.resolveTemplate("http://api/items?page=@page",
      Map("page" -> "7", "unrelated" -> "http://elsewhere/")) shouldBe
      "http://api/items?page=7"
    // date-shaped values are NOT absolute URIs
    RestSource.resolveTemplate("http://api?from=@dateFrom",
      Map("dateFrom" -> "2026-01-01T00:00:00Z")) shouldBe
      "http://api?from=2026-01-01T00:00:00Z"
  }

  behavior of "reference templated-field vocabulary (SimpleUriProvider.cs:47-108)"

  it should "bind declared field names by FIELD TYPE with the reference's date selection" in {
    import java.time.{Duration, Instant}
    val fields = Seq(
      RestSource.TemplatedField("startDate", RestSource.TemplatedFieldType.FilterDateBetweenFrom),
      RestSource.TemplatedField("endDate", RestSource.TemplatedFieldType.FilterDateBetweenTo),
      RestSource.TemplatedField("pageNum", RestSource.TemplatedFieldType.ResponsePage))
    val now = Instant.parse("2026-08-12T10:00:00Z")

    // backfill: from = backFillStartDate
    RestSource.templatedFieldValues(fields, isBackfilling = true,
      backfillStart = Instant.parse("2020-01-01T00:00:00Z"),
      lookBack = Duration.ofHours(6), changeCapture = Duration.ofMinutes(15),
      isFirstPoll = true, now = now, page = Some("3")) shouldBe Map(
      "startDate" -> "2020-01-01T00:00:00Z",
      "endDate" -> "2026-08-12T10:00:00Z",
      "pageNum" -> "3")

    // first stream poll: from = now − lookBack; later polls: now − changeCapture
    RestSource.templatedFieldValues(fields, isBackfilling = false,
      backfillStart = Instant.EPOCH, lookBack = Duration.ofHours(6),
      changeCapture = Duration.ofMinutes(15), isFirstPoll = true,
      now = now)("startDate") shouldBe "2026-08-12T04:00:00Z"
    RestSource.templatedFieldValues(fields, isBackfilling = false,
      backfillStart = Instant.EPOCH, lookBack = Duration.ofHours(6),
      changeCapture = Duration.ofMinutes(15), isFirstPoll = false,
      now = now)("startDate") shouldBe "2026-08-12T09:45:00Z"

    an[IllegalArgumentException] should be thrownBy
      RestSource.TemplatedField("x", "NOT_A_TYPE")
  }

  it should "resolve and send a templated request body per page (SimpleUriProvider.cs:32-41)" in {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Option[String])]()
    val fetcher = new HttpFetch {
      override def fetch(uri: String, h: Map[String, String], b: Option[String]) = {
        seen.add((uri, b))
        val p = uri.split("page=")(1).toLong
        Some(s"""{"meta": {"totalPages": 2}, "items": [{"p": $p}]}""")
      }
    }
    val src = new graft.sources.RestSource(spark, fetcher,
      RestSource.FixedHeaderAuth(Map.empty),
      "http://api/search?page=@page",
      Some(RestSource.PageCountingResolver(Seq("meta", "totalPages"))),
      recordKeyChain = Seq("items"),
      bodyTemplate = Some("""{"from": "@dateFrom", "page": @page}"""))
    src.sweep(Map("dateFrom" -> "2026-01-01T00:00:00Z")).count() shouldBe 2
    import scala.jdk.CollectionConverters._
    seen.asScala.toSeq shouldBe Seq(
      ("http://api/search?page=1",
        Some("""{"from": "2026-01-01T00:00:00Z", "page": 1}""")),
      ("http://api/search?page=2",
        Some("""{"from": "2026-01-01T00:00:00Z", "page": 2}""")))
  }

  it should "drive a sweep through a custom RESPONSE_PAGE field name" in {
    val fetched = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fetcher = new HttpFetch {
      override def fetch(uri: String, h: Map[String, String], b: Option[String]) = {
        fetched.add(uri)
        val p = uri.split("pageNum=")(1).toLong
        Some(s"""{"meta": {"totalPages": 2}, "items": [{"p": $p}]}""")
      }
    }
    val src = new graft.sources.RestSource(spark, fetcher,
      RestSource.FixedHeaderAuth(Map.empty),
      "http://api/items?pageNum=@pageNum",
      Some(RestSource.PageCountingResolver(Seq("meta", "totalPages"))),
      recordKeyChain = Seq("items"), pageFieldName = "pageNum")
    src.sweep(Map.empty).count() shouldBe 2
    import scala.jdk.CollectionConverters._
    fetched.asScala.toSeq shouldBe Seq(
      "http://api/items?pageNum=1", "http://api/items?pageNum=2")
  }
}
