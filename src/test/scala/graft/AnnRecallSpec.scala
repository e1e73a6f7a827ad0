package graft

import graft.operators.{AnnOps, DedupOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall of the pruned ANN paths against brute-force ground truth.
  * Everything here is deterministic (fixed data, fixed hashes), so the
  * asserted floors are exact regression gates, not statistical hopes.
  *
  * Context for the absolute numbers: the synthetic embeddings are
  * ISOTROPIC (measured same-label avg cosine ≈ 0.0008 — no cluster
  * structure), which is SRP-LSH's worst case: the true top-10 sit at
  * cosine ≈ 0.35, so P(one hyperplane agrees) ≈ 1 − arccos(0.35)/π ≈
  * 0.61 and hamming distances spread almost uniformly. On a real
  * embedding corpus (near-dups at cosine ≥ 0.9 → P(agree) ≈ 0.86) the
  * same probe radius yields far higher recall at far less probing.
  * BENCH.md carries the measured numbers per scale factor. */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def topSets(df: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Set[Long]] =
    df.filter(col("rank") <= k).select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  test("a3 multi-probe LSH recall@10 vs a1 brute force") {
    val gt = topSets(AnnOps.bruteForceTopK(spark, sf), AnnOps.TopK)
    val lsh = topSets(AnnOps.lshTopK(spark, sf), AnnOps.TopK)
    val recalls = gt.map { case (q, want) =>
      want.intersect(lsh.getOrElse(q, Set.empty)).size.toDouble / want.size
    }
    val recall = recalls.sum / recalls.size
    println(f"[recall] a3_lsh_recall_at_10 sf0.01 = $recall%.3f " +
      s"(np=4, radius=${AnnOps.QueryProbeRadius})")
    assert(recall >= 0.95, f"a3 recall regressed: $recall%.3f")
  }

  test("a3 recall on a CLUSTERED corpus (the realistic regime) with real pruning") {
    import spark.implicits._
    // plant 10k vectors in 64 clusters: center c = unit-ish vector from a
    // seeded LCG, members = center + small noise → near neighbors at
    // cosine ≈ 0.9+, which is what actual embedding corpora look like.
    // 10k vectors → np=8 (256 buckets), radius-3 probes 93/256 ≈ 36%.
    val rng = new java.util.Random(42)
    val dim = 64
    val centers = Array.fill(64)(Array.fill(dim)(rng.nextGaussian().toFloat))
    val rows = (0 until 10000).map { i =>
      val c = centers(i % 64)
      val v = c.map(x => x + 0.15f * rng.nextGaussian().toFloat)
      (i.toLong, v.toSeq, (i % 64))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-clustered").toString
    rows.toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"), $"label")
      .repartition(4).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val gt = topSets(AnnOps.bruteForceTopK(spark, dir), AnnOps.TopK)
    val lsh = topSets(AnnOps.lshTopK(spark, dir), AnnOps.TopK)
    val recalls = gt.map { case (q, want) =>
      want.intersect(lsh.getOrElse(q, Set.empty)).size.toDouble / want.size
    }
    val recall = recalls.sum / recalls.size
    println(f"[recall] a3_lsh_recall_at_10 clustered(10k,64 clusters) = $recall%.3f " +
      "(np=8, radius-3 probes 93/256 buckets)")
    assert(recall >= 0.9, f"clustered recall below the target: $recall%.3f")
  }

  test("a4 trained-IVF recall@3 vs brute force") {
    val gt = topSets(AnnOps.bruteForceTopK(spark, sf), AnnOps.IvfK)
    val ivf = topSets(AnnOps.ivfTopK(spark, sf), AnnOps.IvfK)
    val recalls = gt.map { case (q, want) =>
      want.intersect(ivf.getOrElse(q, Set.empty)).size.toDouble / want.size
    }
    val recall = recalls.sum / recalls.size
    println(f"[recall] a4_ivf_recall_at_3 sf0.01 = $recall%.3f " +
      s"(k=${AnnOps.nCentroidsFor(500)} trained cells, " +
      s"nprobe=${AnnOps.nProbeFor(AnnOps.nCentroidsFor(500))})")
    assert(recall >= 0.3, f"a4 recall regressed: $recall%.3f")
  }

  test("a4 cell/probe ladders scale with the corpus (integer-exact)") {
    // fixed 8 cells made every cell 12.5% of ANY corpus; the ladder keeps
    // cells ~TargetCellSize and the probed fraction ~sqrt(c)/c
    assert(AnnOps.nCentroidsFor(500) == 8)      // sf-test operating point
    assert(AnnOps.nCentroidsFor(32768) == 8)
    assert(AnnOps.nCentroidsFor(36000) == 9)
    assert(AnnOps.nCentroidsFor(1000000) == 245)
    assert(AnnOps.nCentroidsFor(1000000000L) == 4096) // capped
    assert(AnnOps.nProbeFor(8) == 2)            // round-2 operating point
    assert(AnnOps.nProbeFor(9) == 3)
    assert(AnnOps.nProbeFor(245) == 15)
    assert(AnnOps.nProbeFor(4096) == 64)        // 1.6% of cells probed
  }

  test("a4 scaled cells on a 36k corpus: literal and join assignment agree; recall holds") {
    import spark.implicits._
    // 36k vectors → 9 trained cells (past the 8-cell floor), nprobe 3.
    // Clustered like a real embedding corpus (see the clustered a3 test).
    val rng = new java.util.Random(7)
    val dim = 64
    val centers = Array.fill(48)(Array.fill(dim)(rng.nextGaussian().toFloat))
    val rows = (0 until 36000).map { i =>
      val c = centers(i % 48)
      (i.toLong, c.map(x => x + 0.15f * rng.nextGaussian().toFloat).toSeq, i % 48)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-ann-scaled").toString
    rows.toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"), $"label")
      .repartition(8).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val lit = AnnOps.ivfTopKImpl(spark, dir, forceJoin = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val join = AnnOps.ivfTopKImpl(spark, dir, forceJoin = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(lit == join, "literal-centroid and broadcast-join assignment paths diverge")
    val gt = topSets(AnnOps.bruteForceTopK(spark, dir), AnnOps.IvfK)
    val ivf = lit.filter(_._4 <= AnnOps.IvfK).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val recalls = gt.map { case (q, want) =>
      want.intersect(ivf.getOrElse(q, Set.empty)).size.toDouble / want.size
    }
    val recall = recalls.sum / recalls.size
    println(f"[recall] a4_ivf_recall_at_3 scaled(36k,9 cells,nprobe 3) = $recall%.3f")
    assert(recall >= 0.5, f"scaled a4 recall below target: $recall%.3f")
  }

  test("d5 near-dup pair recall vs brute-force threshold pairs") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding")
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val withN = e.withColumn("nrm", sqrt(dot($"embedding", $"embedding")))
    val l = withN.select($"vec_id".as("a"), $"embedding".as("ea"), $"nrm".as("na"))
    val r = withN.select($"vec_id".as("b"), $"embedding".as("eb"), $"nrm".as("nb"))
    val brute = l.join(r, $"a" < $"b")
      .filter(round(dot($"ea", $"eb") / ($"na" * $"nb"), 6) >= DedupOps.CosineThreshold)
      .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val found = DedupOps.embeddingNearDup(spark, sf)
      .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val recall = found.intersect(brute).size.toDouble / math.max(1, brute.size)
    println(f"[recall] d5_pair_recall sf0.01 = $recall%.3f " +
      s"(${brute.size} true pairs; radius-1 probing — the self-join side " +
      "multiplies corpus shuffle, so d5 trades recall for volume; " +
      "banded MinHash (d2) is the high-recall text path)")
    assert(recall >= 0.5, f"d5 recall regressed: $recall%.3f")
    // and zero false positives by construction (exact cosine verification)
    assert(found.subsetOf(brute))
  }
}
