package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the training-data + crawl-query operators (the
  * cross-engine value equality is enforced by the driver's DuckDB gate;
  * these assert the properties that make the operators *right*). */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

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

  test("a1 vs a3: LSH top-k neighbors are a subset of candidates sharing the bucket") {
    val buckets = SparkEntry.queries("a2_ann_lsh_buckets")(spark, sf)
      .select(col("vec_id"), col("bucket"))
    val topk = SparkEntry.queries("a3_ann_lsh_topk")(spark, sf)
    val joined = topk.join(buckets,
        topk("neighbor_id") === buckets("vec_id"))
      .filter(topk("bucket") =!= buckets("bucket"))
    assert(joined.count() == 0, "a neighbor outside the query's bucket")
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
    // each query's cell is unique: all its neighbors carry the same cell
    val cells = ivf.groupBy("query_id")
      .agg(countDistinct(col("cell")).as("nc")).filter(col("nc") > 1).count()
    assert(cells == 0)
  }

  test("d5: embedding near-dup pairs are same-bucket, deduped, above threshold") {
    val pairs = SparkEntry.queries("d5_embedding_neardup")(spark, sf)
    assert(pairs.filter(col("cosine") < graft.operators.DedupOps.CosineThreshold).count() == 0)
    assert(pairs.filter(col("a") >= col("b")).count() == 0, "unordered or self pair")
    val buckets = SparkEntry.queries("a2_ann_lsh_buckets")(spark, sf)
      .select(col("vec_id"), col("bucket").as("vb"))
    val cross = pairs.join(buckets, pairs("a") === buckets("vec_id"))
      .filter(col("bucket") =!= col("vb")).count()
    assert(cross == 0, "pair bucket disagrees with member bucket")
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
