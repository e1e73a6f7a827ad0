package graft.synth

import graft.functions.UrlOps
import graft.model.{RobotsRule, Span, WebDoc}

/** Deterministic synthetic web-graph generator (FIXTURES.md §1).
  * Pure LCG (no wall clock, no Math.random) so every run — oracle, Spark
  * engine, tests, bench — sees byte-identical data.
  *
  * Span kinds/order mirror what the reference extracts
  * (/root/reference/pkg/crawler/crawler.go:87,91-113,196-199): title,
  * meta.*, h1..h4, p, a (text = raw href), img (media_ref set).
  *
  * Generator guarantees (exercised by tests):
  *  - hrefs come in messy forms: relative paths, ./ and ../ segments,
  *    fragments, mixed-case hosts, explicit default ports, unsorted and
  *    duplicate query params  → exercises CanonicalizeUrl/ResolveUrl;
  *  - some links duplicate (dedup hits), some point at media extensions
  *    (substring semantics), some are off-domain, some dangle (fetch_miss);
  *  - one "hot" host receives ~30% of all cross links (skew fixture).
  */
object Corpus {

  final case class Config(
      nHosts: Int = 8,
      pagesPerHost: Int = 16,
      linksPerPage: Int = 6,
      seed: Long = 42L,
      hotHostShare: Double = 0.3, // share of cross-host links aimed at host 0
      danglingShare: Double = 0.08,
      mediaShare: Double = 0.10,
      offDomainShare: Double = 0.05)

  /** Multiplicative LCG (Numerical Recipes constants); deterministic. */
  final class Lcg(seed: Long) {
    private var s: Long = seed
    def nextLong(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    def nextInt(bound: Int): Int = {
      val v = (nextLong() >>> 33).toInt
      math.floorMod(v, bound)
    }
    def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble
  }

  def hostName(cfg: Config, h: Int): String =
    if (h == 0) "hot.example.com" else s"site$h.example.org"

  /** Canonical URL of page p on host h. */
  def pageUrl(cfg: Config, h: Int, p: Int): String =
    s"http://${hostName(cfg, h)}/p/$p"

  private val words = Array(
    "spark", "frontier", "crawl", "shuffle", "catalyst", "parquet", "span",
    "media", "robots", "host", "queue", "hash", "bloom", "wave", "seed",
    "anchor", "politeness", "scale", "skew", "partition")

  private def sentence(r: Lcg, n: Int): String =
    (0 until n).map(_ => words(r.nextInt(words.length))).mkString(" ")

  /** A messy (non-canonical) variant of a canonical page URL; the
    * canonicalizer must map it back to `pageUrl(h, p)`. */
  private def messyHref(r: Lcg, cfg: Config, fromHost: Int, toHost: Int, toPage: Int): String = {
    val host = hostName(cfg, toHost)
    r.nextInt(6) match {
      case 0 => s"http://${host.toUpperCase}/p/$toPage"              // mixed-case host
      case 1 => s"http://$host:80/p/$toPage"                          // default port
      case 2 => s"http://$host/p/$toPage#frag${r.nextInt(10)}"        // fragment
      case 3 => s"http://$host/a/../p/./$toPage"                      // dot segments
      case 4 if toHost == fromHost => s"/p/$toPage"                   // site-relative
      case 5 if toHost == fromHost => s"../p/$toPage"                 // path-relative
      case _ => s"http://$host/p/$toPage"
    }
  }

  /** A messy href whose canonical form carries (sorted) query params —
    * target pages with query params are distinct documents. */
  private def queryHref(r: Lcg, cfg: Config, toHost: Int, toPage: Int): String =
    s"http://${hostName(cfg, toHost)}/p/$toPage?b=${r.nextInt(3)}&a=${r.nextInt(3)}"

  /** Generate the corpus. Pages are identified by canonical URL; every
    * generated href resolves (or not — dangling) inside this set. */
  def generate(cfg: Config): Seq[WebDoc] = {
    val r = new Lcg(cfg.seed)
    val docs = Vector.newBuilder[WebDoc]
    for (h <- 0 until cfg.nHosts; p <- 0 until cfg.pagesPerHost) {
      val spans = Vector.newBuilder[Span]
      var off = 0
      def add(kind: String, text: String, media: String = null): Unit = {
        spans += Span(kind, text, media, off); off += 1
      }
      add("title", s"Page $p of ${hostName(cfg, h)}")
      add("meta.description", sentence(r, 8))
      add("meta.keywords", sentence(r, 4).replace(' ', ','))
      if (r.nextDouble() < 0.5)
        add("meta.ogimage", null, s"http://${hostName(cfg, h)}/img/og$p.jpg")
      add("h1", s"heading $p")
      if (r.nextDouble() < 0.7) add("h2", sentence(r, 3))
      if (r.nextDouble() < 0.4) add("h3", sentence(r, 3))
      if (r.nextDouble() < 0.2) add("h4", sentence(r, 2))
      val nP = 1 + r.nextInt(3)
      for (_ <- 0 until nP) add("p", sentence(r, 12))
      // links
      var li = 0
      while (li < cfg.linksPerPage) {
        val roll = r.nextDouble()
        val href =
          if (roll < cfg.mediaShare) {
            val ext = UrlOps.MediaExts(r.nextInt(UrlOps.MediaExts.length))
            s"http://${hostName(cfg, h)}/file/$li$ext"
          } else if (roll < cfg.mediaShare + cfg.danglingShare) {
            s"http://${hostName(cfg, h)}/missing/${r.nextInt(1000)}"
          } else if (roll < cfg.mediaShare + cfg.danglingShare + cfg.offDomainShare) {
            s"https://external-${r.nextInt(5)}.example.net/x/${r.nextInt(50)}"
          } else {
            val cross = r.nextDouble()
            val toHost =
              if (cross < 0.55) h // intra-host
              else if (cross < 0.55 + cfg.hotHostShare) 0 // hot host skew
              else r.nextInt(cfg.nHosts)
            val toPage = r.nextInt(cfg.pagesPerHost)
            if (r.nextDouble() < 0.15) queryHref(r, cfg, toHost, toPage)
            else messyHref(r, cfg, h, toHost, toPage)
          }
        add("a", href)
        // duplicate some links verbatim → dedup_hits
        if (r.nextDouble() < 0.15) add("a", href)
        li += 1
      }
      if (r.nextDouble() < 0.3)
        add("img", null, s"http://${hostName(cfg, h)}/img/body$p.png")
      docs += WebDoc(pageUrl(cfg, h, p), spans.result().toArray)
    }
    // query-param variants exist as real documents too (canonical targets
    // of queryHref): enumerate the full reachable query grid a=0..2, b=0..2
    for (h <- 0 until cfg.nHosts; p <- 0 until cfg.pagesPerHost; a <- 0 until 3; b <- 0 until 3) {
      if (((h * 31 + p * 7 + a * 3 + b) % 5) == 0) { // deterministic subset
        val spans = Array(
          Span("title", s"Query page $p?a=$a&b=$b", null, 0),
          Span("p", s"variant $a $b of page $p", null, 1))
        docs += WebDoc(s"http://${hostName(cfg, h)}/p/$p?a=$a&b=$b", spans)
      }
    }
    docs.result()
  }

  /** The corpus as a distributed DataFrame. A driver-generated Seq must
    * NOT ride task binaries through a LocalTableScan (the bench's one
    * "task of very large size" warning, round 2): slice it so each task
    * closure stays well under Spark's 1000 KiB recommendation, sized off
    * the actual span payload (~1.5 KB/doc). */
  def toDf(spark: org.apache.spark.sql.SparkSession, cfg: Config): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val docs = generate(cfg)
    val slices = math.max(spark.sparkContext.defaultParallelism,
      (docs.size * 1500L / (256L * 1024)).toInt + 1)
    spark.sparkContext.parallelize(docs, slices).toDF()
  }

  /** robots rules for the corpus: hot host gets a disallowed subtree and a
    * crawl delay (budget pressure); one host fully disallowed. */
  def robotsRules(cfg: Config): Seq[RobotsRule] = Seq(
    RobotsRule(hostName(cfg, 0), "/", allow = true, crawl_delay = 2),
    RobotsRule(hostName(cfg, 0), "/p/1", allow = false, crawl_delay = 2),
    RobotsRule(hostName(cfg, math.min(2, cfg.nHosts - 1)), "/", allow = false, crawl_delay = 1)
  ) ++ (1 until cfg.nHosts).filter(_ != math.min(2, cfg.nHosts - 1)).map { h =>
    RobotsRule(hostName(cfg, h), "/", allow = true, crawl_delay = 1)
  }
}
