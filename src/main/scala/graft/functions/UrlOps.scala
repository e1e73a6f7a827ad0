package graft.functions

/** Pure URL algebra shared by the Catalyst expressions
  * ([[UrlExpressions]]), the single-threaded golden oracle
  * ([[graft.oracle.CrawlOracle]]) and the Spark crawl engine — one
  * implementation, so oracle/engine equality is structural, not luck.
  *
  * Semantics (reference + north-rule superset):
  *  - fragment strip: reference `trimHash` (/root/reference/pkg/crawler/
  *    crawler.go:245-257) cuts at the first '#'; colly does the same on
  *    Visit (u.Fragment = "").
  *  - RFC 3986 reference resolution: reference `fixURL`/`AbsoluteURL`
  *    (crawler.go:198, 213-224) delegate to Go net/url ResolveReference;
  *    we implement §5.2.2/§5.2.4 directly (merge + remove_dot_segments).
  *  - north-rule canonicalization extensions the reference lacks:
  *    lowercase scheme+host, strip default ports (:80 http / :443 https),
  *    stable-sort query parameters.
  */
object UrlOps {

  /** Parsed absolute-or-relative URI. All fields may be null (absent);
    * path is never null (may be empty string). */
  final case class UriParts(
      scheme: String,     // null if relative reference
      authority: String,  // null if no authority ("//" part); includes userinfo+host+port
      path: String,
      query: String,      // null if no '?'
      fragment: String)   // null if no '#'

  /** Split a URI string into parts per RFC 3986 appendix B (manual scan,
    * no regex backtracking — this sits in the per-link hot path). */
  def parse(uri: String): UriParts = {
    var s = uri
    var fragment: String = null
    val hashIdx = s.indexOf('#')
    if (hashIdx >= 0) { fragment = s.substring(hashIdx + 1); s = s.substring(0, hashIdx) }
    var query: String = null
    val qIdx = s.indexOf('?')
    if (qIdx >= 0) { query = s.substring(qIdx + 1); s = s.substring(0, qIdx) }
    // scheme = [A-Za-z][A-Za-z0-9+.-]* ':'  before any '/'
    var scheme: String = null
    val colonIdx = s.indexOf(':')
    if (colonIdx > 0) {
      val slashIdx = s.indexOf('/')
      if (slashIdx < 0 || colonIdx < slashIdx) {
        val cand = s.substring(0, colonIdx)
        if (cand.nonEmpty && cand.charAt(0).isLetter &&
            cand.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.')) {
          scheme = cand
          s = s.substring(colonIdx + 1)
        }
      }
    }
    var authority: String = null
    if (s.startsWith("//")) {
      val rest = s.substring(2)
      val end0 = rest.indexOf('/')
      val end = if (end0 < 0) rest.length else end0
      authority = rest.substring(0, end)
      s = rest.substring(end)
    }
    UriParts(scheme, authority, s, query, fragment)
  }

  def format(p: UriParts): String = {
    val sb = new StringBuilder(64)
    if (p.scheme != null) { sb.append(p.scheme).append(':') }
    if (p.authority != null) { sb.append("//").append(p.authority) }
    sb.append(p.path)
    if (p.query != null) { sb.append('?').append(p.query) }
    if (p.fragment != null) { sb.append('#').append(p.fragment) }
    sb.toString
  }

  /** Host (without port/userinfo), lowercased; null if no authority. */
  def hostOf(authority: String): String = {
    if (authority == null) return null
    var h = authority
    val at = h.lastIndexOf('@')
    if (at >= 0) h = h.substring(at + 1)
    if (h.startsWith("[")) { // IPv6 literal
      val close = h.indexOf(']')
      if (close >= 0) return h.substring(0, close + 1).toLowerCase
      return h.toLowerCase
    }
    val c = h.indexOf(':')
    if (c >= 0) h = h.substring(0, c)
    h.toLowerCase
  }

  private def portOf(authority: String): String = {
    if (authority == null) return null
    var h = authority
    val at = h.lastIndexOf('@')
    if (at >= 0) h = h.substring(at + 1)
    if (h.startsWith("[")) {
      val close = h.indexOf(']')
      if (close < 0) return null
      h = h.substring(close + 1)
      if (h.startsWith(":")) return h.substring(1) else return null
    }
    val c = h.indexOf(':')
    if (c >= 0) h.substring(c + 1) else null
  }

  private def userinfoOf(authority: String): String = {
    if (authority == null) return null
    val at = authority.lastIndexOf('@')
    if (at >= 0) authority.substring(0, at) else null
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String](8)
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "/..") { in = "/"; if (out.nonEmpty) out.remove(out.length - 1) }
      else if (in == "." || in == "..") in = ""
      else {
        var end = in.indexOf('/', 1)
        if (in.startsWith("/")) () else { val e0 = in.indexOf('/'); end = e0 }
        if (end < 0) end = in.length
        out += in.substring(0, end)
        in = in.substring(end)
      }
    }
    out.mkString
  }

  private def mergePaths(base: UriParts, refPath: String): String = {
    if (base.authority != null && base.path.isEmpty) "/" + refPath
    else {
      val i = base.path.lastIndexOf('/')
      if (i < 0) refPath else base.path.substring(0, i + 1) + refPath
    }
  }

  /** RFC 3986 §5.2.2 strict reference resolution (Go ResolveReference
    * equivalent — crawler.go:222). Returns null if base is not absolute. */
  def resolve(base: String, ref: String): String = {
    if (base == null || ref == null) return null
    val b = parse(base.trim)
    if (b.scheme == null) return null
    val r = parse(ref.trim)
    val t =
      if (r.scheme != null)
        UriParts(r.scheme, r.authority, removeDotSegments(r.path), r.query, r.fragment)
      else if (r.authority != null)
        UriParts(b.scheme, r.authority, removeDotSegments(r.path), r.query, r.fragment)
      else if (r.path.isEmpty) {
        val q = if (r.query != null) r.query else b.query
        UriParts(b.scheme, b.authority, b.path, q, r.fragment)
      } else if (r.path.startsWith("/"))
        UriParts(b.scheme, b.authority, removeDotSegments(r.path), r.query, r.fragment)
      else
        UriParts(b.scheme, b.authority, removeDotSegments(mergePaths(b, r.path)), r.query, r.fragment)
    format(t)
  }

  /** North-rule canonical form. Returns null for invalid / non-http(s)
    * URLs (the crawl engine drops those rows — reference analog:
    * `validateURI` crawler.go:272-278 + colly http-only fetch).
    *
    * Steps: strip fragment; lowercase scheme+host; strip default port;
    * empty path → "/"; stable-sort query params (duplicates preserved in
    * first-seen order); drop empty query.
    */
  def canonicalize(url: String): String = {
    if (url == null) return null
    val p = parse(url.trim)
    if (p.scheme == null || p.authority == null) return null
    val scheme = p.scheme.toLowerCase
    if (scheme != "http" && scheme != "https") return null
    val host = hostOf(p.authority)
    if (host == null || host.isEmpty) return null
    val port0 = portOf(p.authority)
    val port =
      if (port0 == null || port0.isEmpty) null
      else if (scheme == "http" && port0 == "80") null
      else if (scheme == "https" && port0 == "443") null
      else port0
    val ui = userinfoOf(p.authority)
    val auth = (if (ui != null) ui + "@" else "") + host + (if (port != null) ":" + port else "")
    val path = if (p.path.isEmpty) "/" else p.path
    val query =
      if (p.query == null || p.query.isEmpty) null
      else {
        val parts = p.query.split("&", -1).filter(_.nonEmpty)
        if (parts.isEmpty) null
        else {
          // stable sort on the full "k=v" token: deterministic, preserves
          // duplicate keys' relative order
          val sorted = parts.toSeq.sortWith { (a, b) => a.compareTo(b) < 0 }
          sorted.mkString("&")
        }
      }
    format(UriParts(scheme, auth, path, query, null))
  }

  /** resolve then canonicalize — the per-link frontier transform. */
  def resolveAndCanonicalize(base: String, href: String): String = {
    val abs = resolve(base, href)
    if (abs == null) null else canonicalize(abs)
  }

  /** 64-bit URL-seen key: Spark-builtin-compatible xxhash64 (seed 42)
    * over UTF-8 bytes — same value as `functions.xxhash64(col)`, and the
    * moral twin of colly's 64-bit FNV visited key (go.mod:12). */
  def urlHash64(url: String): Long = {
    val utf8 = org.apache.spark.unsafe.types.UTF8String.fromString(url)
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      utf8, org.apache.spark.sql.types.StringType, 42L)
  }

  /** Document id: lowercase-hex md5 of the canonical URI
    * (crawler.go:228-229). */
  def md5Id(url: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(url.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
  }

  /** Media-extension filter, substring semantics kept faithfully
    * (crawler.go:295-306 checks `strings.Contains`, not suffix). */
  val MediaExts: Array[String] = Array(
    ".png", ".jpeg", ".jpg", ".ogg", ".woff", ".pdf", ".gif", ".tiff", ".svg")

  def isMediaUrl(url: String): Boolean = {
    if (url == null) return false
    var i = 0
    while (i < MediaExts.length) {
      if (url.contains(MediaExts(i))) return true
      i += 1
    }
    false
  }
}
