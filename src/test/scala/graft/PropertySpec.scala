package graft

import graft.functions.UrlOps
import graft.oracle.CrawlOracle
import graft.synth.Corpus
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class PropertySpec extends AnyFunSuite {

  /** Deterministic property check: sample n values from gen (fixed seed)
    * and assert the predicate on each (scalatestplus bridge is not on the
    * offline classpath; this is the same coverage, reproducible). */
  private def forAllSampled[A](gen: Gen[A], n: Int = 300)(p: A => Boolean): Unit = {
    var seed = Seed(42L)
    (1 to n).foreach { i =>
      val v = gen.pureApply(Gen.Parameters.default, seed)
      assert(p(v), s"property failed for sample #$i: $v")
      seed = seed.next
    }
  }

  private val genHost = Gen.oneOf("Example.COM", "a.b.c", "X.Y", "hot.example.com")
  private val genPath = Gen.listOfN(3, Gen.oneOf("a", "b", "..", ".", "p1")).map(_.mkString("/"))
  private val genQuery = Gen.listOfN(3, Gen.oneOf("a=1", "b=2", "c=3", "a=0"))
    .map(_.mkString("&"))
  private val genUrl = for {
    scheme <- Gen.oneOf("http", "HTTP", "https")
    host <- genHost
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- genPath
    q <- Gen.oneOf("", "?") // with or without query
    query <- genQuery
    frag <- Gen.oneOf("", "#frag")
  } yield s"$scheme://$host$port/$path${if (q.isEmpty) "" else "?" + query}$frag"

  test("canonicalize is idempotent on arbitrary URLs") {
    forAllSampled(genUrl) { u =>
      val c = UrlOps.canonicalize(u)
      c == null || UrlOps.canonicalize(c) == c
    }
  }

  test("resolve output is always canonicalize-idempotent") {
    val genHref = Gen.oneOf(genUrl, genPath, genPath.map("/" + _),
      Gen.const(""), Gen.const("#x"), Gen.const("?q=1"))
    forAllSampled(Gen.zip(genUrl, genHref)) { case (base, href) =>
      val r = UrlOps.resolveAndCanonicalize(base, href)
      r == null || UrlOps.canonicalize(r) == r
    }
  }

  test("canonical URLs never carry fragments, default ports, or unsorted queries") {
    forAllSampled(genUrl) { u =>
      val c = UrlOps.canonicalize(u)
      c == null || {
        val p = UrlOps.parse(c)
        val qSorted = p.query == null ||
          p.query.split("&").toSeq == p.query.split("&").toSeq.sorted
        // default ports are scheme-relative: only http:80 / https:443 strip
        !c.contains("#") &&
          !(p.scheme == "http" && p.authority.endsWith(":80")) &&
          !(p.scheme == "https" && p.authority.endsWith(":443")) && qSorted &&
          UrlOps.hostOf(p.authority) == UrlOps.hostOf(p.authority).toLowerCase
      }
    }
  }

  test("oracle: politeness budget is never exceeded in any wave") {
    val cfgs = Seq(
      Corpus.Config(nHosts = 3, pagesPerHost = 5, linksPerPage = 4, seed = 5L),
      Corpus.Config(nHosts = 5, pagesPerHost = 7, linksPerPage = 5, seed = 21L),
      Corpus.Config(nHosts = 4, pagesPerHost = 6, linksPerPage = 6, seed = 77L))
    cfgs.foreach { cfg =>
      val corpus = Corpus.generate(cfg)
      val rules = Corpus.robotsRules(cfg)
      val res = CrawlOracle.run(corpus, rules,
        CrawlOracle.CrawlConfig(Seq(Corpus.pageUrl(cfg, 0, 0)), hostBudget = 3))
      // group visits by wave, count per host
      res.visits.groupBy(_.wave).foreach { case (_, vs) =>
        vs.groupBy(v => UrlOps.hostOf(UrlOps.parse(v.url).authority))
          .foreach { case (host, hv) =>
            val b = CrawlOracle.budgetOf(rules, host, 3)
            assert(hv.size <= b, s"host $host exceeded budget $b in a wave")
          }
      }
    }
  }

  test("oracle: seen set is key-unique and contains every visited URL") {
    val cfg = Corpus.Config(nHosts = 4, pagesPerHost = 6, linksPerPage = 5, seed = 11L)
    val res = CrawlOracle.run(Corpus.generate(cfg), Corpus.robotsRules(cfg),
      CrawlOracle.CrawlConfig(Seq(Corpus.pageUrl(cfg, 1, 0))))
    val hashes = res.seen.map(_.url_hash)
    assert(hashes.distinct.size == hashes.size, "duplicate url_hash in seen")
    val seenUrls = res.seen.map(_.url).toSet
    res.visits.foreach(v => assert(seenUrls.contains(v.url), s"${v.url} visited but not seen"))
  }

  test("oracle: visit ranks are dense and strictly wave-ordered") {
    val cfg = Corpus.Config(nHosts = 4, pagesPerHost = 5, linksPerPage = 4, seed = 31L)
    val res = CrawlOracle.run(Corpus.generate(cfg), Corpus.robotsRules(cfg),
      CrawlOracle.CrawlConfig(Seq(Corpus.pageUrl(cfg, 0, 1)), hostBudget = 2))
    assert(res.visits.map(_.rank) == (1L to res.visits.size).toVector)
    assert(res.visits.map(_.wave) == res.visits.map(_.wave).sorted)
  }

  test("corpus generation is deterministic") {
    val cfg = Corpus.Config(nHosts = 3, pagesPerHost = 4)
    val a = Corpus.generate(cfg)
    val b = Corpus.generate(cfg)
    assert(a.map(_.doc_id) == b.map(_.doc_id))
    assert(a.flatMap(_.spans.map(s => (s.kind, s.text, s.media_ref, s.offset))) ==
      b.flatMap(_.spans.map(s => (s.kind, s.text, s.media_ref, s.offset))))
  }
}
