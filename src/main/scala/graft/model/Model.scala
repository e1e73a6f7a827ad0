package graft.model

/** Typed data model for the crawl engine (SURVEY §1.2).
  * Case classes double as Dataset encoders and as the oracle's in-memory
  * records — one schema definition for both sides.
  */

/** One interleaved text/media span; mirrors BASELINE.json input_hint.
  * Reference analog: the (kind, text) pairs goquery extracts in document
  * order (/root/reference/pkg/crawler/crawler.go:87,91-113,196-199). */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** One synthetic web page: doc_id is the page's canonical URL. */
final case class WebDoc(doc_id: String, spans: Array[Span])

/** Crawl job spec; mirrors CrawlRequest (crawler.go:44-51) including the
  * validation surface (serving/handlers.go:41-69). */
final case class CrawlRequest(
    index: String,
    url: String,
    on_domain: Boolean,
    engine: String,
    `type`: String)

/** Frontier row. `parent_ord` is an order-isomorphic stand-in for the
  * parent's global visit rank (dense ranks are only materialized at
  * emission — computing a dense rank every wave would serialize on a
  * single partition at 10^10 scale). */
final case class FrontierEntry(
    url: String,
    url_hash: Long,
    host: String,
    depth: Int,
    parent_ord: Long,
    link_index: Int)

/** robots.txt rule row (FIXTURES.md §3): longest-prefix-match wins;
  * crawl_delay in virtual-time units drives the per-wave host budget. */
final case class RobotsRule(host: String, path_prefix: String, allow: Boolean, crawl_delay: Int)

/** Per-wave counters (north_star: fetched, deferred, robots-blocked,
  * dedup-hits; plus fetch_miss for dangling links). */
final case class WaveMetrics(
    wave: Int,
    fetched: Long,
    deferred: Long,
    robots_blocked: Long,
    dedup_hits: Long,
    fetch_miss: Long,
    retried: Long = 0L)

/** Extracted document — mirrors RenderedPage (crawler.go:36-41) flattened
  * to the ES mapping shape (conf/mappings/english_mapping.json:38-95). */
final case class CrawlDoc(
    id: String,           // md5(uri), crawler.go:228-229
    uri: String,
    title: String,        // concatenated title spans, crawler.go:87
    description: String,  // meta.description, crawler.go:96-99
    keywords: String,     // meta.keywords, crawler.go:100-103
    ogimage: String,      // og:image, crawler.go:104-107
    source: Map[String, Seq[String]]) // kind → texts in document order, crawler.go:109-113

/** A visited URL with its golden rank. */
final case class Visit(rank: Long, wave: Int, url: String)

/** Seen-set row. */
final case class SeenUrl(url_hash: Long, url: String, wave: Int)
