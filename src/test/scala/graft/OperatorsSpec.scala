package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the training-data + crawl-query operators (the
  * cross-engine value equality is enforced by the driver's DuckDB gate;
  * these assert the properties that make the operators *right*). */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("d4: triangle join equals plain all-pairs on one deliberately skewed block") {
    import spark.implicits._
    import graft.operators.DedupOps
    // 900 docs, ALL in one (lang, len-bucket) block — the web-corpus skew
    // case where a plain block join computes 900²/2 pairs in one task
    val d = spark.range(0, 900)
      .select($"id".as("doc_id"), lit("en").as("lang"), lit(1).as("lb"),
        array($"id" % 7, $"id" % 11, $"id" % 13).as("hs"))
      .persist()
    val tri = DedupOps.triangleJaccardPairs(d, cap = 100)
    val plain = {
      val l = d.select($"lang", $"lb", $"doc_id".as("a"), $"hs".as("hs_a"))
      val r = d.select($"lang", $"lb", $"doc_id".as("b"), $"hs".as("hs_b"))
      l.join(r, Seq("lang", "lb")).filter($"a" < $"b")
        .select($"lang", $"a", $"b",
          size(array_intersect($"hs_a", $"hs_b")).cast("long").as("inter"),
          size(array_union($"hs_a", $"hs_b")).cast("long").as("uni"))
        .filter($"inter" * 10 >= $"uni")
    }
    def key(df: org.apache.spark.sql.DataFrame) = df.select("a", "b", "inter", "uni")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(key(tri) == key(plain), "triangle decomposition is not pair-exact")
    assert(key(tri).nonEmpty)
    // skew bound: with cap=100 over 900 docs → G=9 groups; no triangle
    // cell's side exceeds ~2×cap docs (hash split), so no task computes
    // more than ~(2·cap)² pairs instead of 900²/2
    val cellWidths = d.withColumn("__g", pmod(xxhash64($"doc_id"), lit(9)))
      .groupBy("__g").count().collect().map(_.getLong(1))
    assert(cellWidths.max < 200, s"group split badly skewed: ${cellWidths.toSeq}")
    d.unpersist()
  }

  test("c1: canonicalized URLs are idempotent under the canonicalizer") {
    import graft.functions.UrlExpressions._
    val df = SparkEntry.queries("c1_canonicalize")(spark, sf)
    val bad = df.filter(
      canonicalize_url(col("canonical_url")) =!= col("canonical_url")).count()
    assert(bad == 0)
  }

  test("c6: politeness never exceeds the host budget") {
    val df = SparkEntry.queries("c6_host_budget")(spark, sf)
    val over = df.filter(col("state") === "fetch")
      .groupBy("host").count().filter(col("count") > 5).count()
    assert(over == 0)
  }

  test("c8: waves are disjoint and reachable") {
    val df = SparkEntry.queries("c8_wave_expansion")(spark, sf)
    val byNode = df.groupBy("node").count().filter(col("count") > 1).count()
    assert(byNode == 0, "a node appeared in two waves")
  }

  test("t5/d1: minhash signature entries are true minima of shingle hashes") {
    val df = SparkEntry.queries("t5_fingerprint")(spark, sf)
    assert(df.filter(col("n_shingles") < 1).count() == 0)
  }

  test("d2: LSH candidate pairs have high estimated similarity vs random") {
    val pairs = SparkEntry.queries("d2_minhash_lsh_pairs")(spark, sf)
    // every candidate pair shares at least one of 4 bands = 2 matching
    // minhashes; all emitted pairs must have inter > 0 (shared shingles
    // is what equal minhashes imply with overwhelming probability)
    val n = pairs.count()
    if (n > 0) {
      val zero = pairs.filter(col("inter") === 0).count()
      assert(zero <= n / 2, s"too many zero-overlap LSH candidates: $zero/$n")
    }
  }

  test("d3: simhash bands recompose to the fingerprint") {
    val df = SparkEntry.queries("d3_simhash")(spark, sf)
    val bad = df.filter(
      col("band0") + shiftleft(col("band1"), 15) + shiftleft(col("band2"), 30) +
        shiftleft(col("band3"), 45) =!= col("simhash")).count()
    assert(bad == 0)
    assert(df.count() > 0)
  }

  test("a1 vs a3: LSH top-k neighbors all sit within the query's probe ring") {
    val buckets = SparkEntry.queries("a2_ann_lsh_buckets")(spark, sf)
      .select(col("vec_id"), col("bucket"))
    val topk = SparkEntry.queries("a3_ann_lsh_topk")(spark, sf)
    val nb = buckets.select(col("vec_id").as("nid"), col("bucket").as("nbkt"))
    val qb = buckets.select(col("vec_id").as("qid"), col("bucket").as("qbkt"))
    val joined = topk
      .join(nb, topk("neighbor_id") === nb("nid"))
      .join(qb, topk("query_id") === qb("qid"))
      .filter(bit_count(col("nbkt").bitwiseXOR(col("qbkt"))) >
        graft.operators.AnnOps.QueryProbeRadius)
    assert(joined.count() == 0, "a neighbor outside the hamming-radius probe ring")
  }

  test("a1: brute-force cosine values are within [-1, 1]") {
    val df = SparkEntry.queries("a1_ann_brute_topk")(spark, sf)
    assert(df.filter(abs(col("cosine")) > 1.000001).count() == 0)
  }

  test("a4: IVF neighbors live in the query's cell and never beat brute force") {
    val ivf = SparkEntry.queries("a4_ann_ivf_topk")(spark, sf)
    // rank-1 IVF cosine can't exceed the global brute-force rank-1 cosine
    // (IVF searches a subset of the corpus)
    val bruteBest = SparkEntry.queries("a1_ann_brute_topk")(spark, sf)
      .filter(col("rank") === 1)
      .select(col("query_id"), col("cosine").as("best"))
    val viol = ivf.filter(col("rank") === 1)
      .join(bruteBest, "query_id")
      .filter(col("cosine") > col("best") + 1e-9).count()
    assert(viol == 0, "IVF found a better neighbor than brute force")
    // ranks are dense per query and neighbors never include the query
    assert(ivf.filter(col("neighbor_id") === col("query_id")).count() == 0)
    val badRank = ivf.groupBy("query_id")
      .agg(max(col("rank")).as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(badRank == 0)
  }

  test("d5: embedding near-dup pairs are hamming-1 bucket mates, deduped, above threshold") {
    val pairs = SparkEntry.queries("d5_embedding_neardup")(spark, sf)
    assert(pairs.filter(col("cosine") < graft.operators.DedupOps.CosineThreshold).count() == 0)
    assert(pairs.filter(col("a") >= col("b")).count() == 0, "unordered or self pair")
    assert(pairs.groupBy("a", "b").count().filter(col("count") > 1).count() == 0,
      "duplicate pair emitted by multi-probe")
    val buckets = SparkEntry.queries("a2_ann_lsh_buckets")(spark, sf)
      .select(col("vec_id"), col("bucket"))
    val ab = buckets.select(col("vec_id").as("aid"), col("bucket").as("abkt"))
    val bb = buckets.select(col("vec_id").as("bid"), col("bucket").as("bbkt"))
    val cross = pairs
      .join(ab, pairs("a") === ab("aid"))
      .join(bb, pairs("b") === bb("bid"))
      .filter(bit_count(col("abkt").bitwiseXOR(col("bbkt"))) > 1).count()
    assert(cross == 0, "pair outside the hamming-1 probe ring")
  }

  test("m2: frame digests are stable and stride-spaced") {
    val df = SparkEntry.queries("m2_frame_sample")(spark, sf)
    val bad = df.filter(pmod(col("frame_no"), lit(4)) =!= 0).count()
    assert(bad == 0)
  }

  test("explain: q1 scan prunes columns and pushes the filter") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"no pushed filter in:\n${plan.take(2000)}")
  }
}
