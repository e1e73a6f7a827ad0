package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embeddings table
  * (vec_id, embedding: array<float>, label).
  *
  * Two paths, as a 100 TB pipeline needs both:
  *  - brute-force cosine top-k (the correctness baseline) — a broadcast
  *    join of the (tiny) query set against the full vector table, dot
  *    products as codegen'd array expressions, per-query top-k via
  *    window over the query partition;
  *  - LSH-bucketed (sign-random-projection) — deterministic pseudo-random
  *    hyperplanes derived from (dim, plane) indices; vectors hash into
  *    2^P sign buckets, search touches one bucket (the scale path:
  *    bucket-partitioned, prunes ~2^P of the corpus per query).
  */
object AnnOps {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
      .repartition(s.sparkContext.defaultParallelism)

  /** Sequential-order dot product in double precision — both engines
    * accumulate left-to-right, so results are bit-identical. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  val TopK = 10
  val NQueries = 5

  /** a1: brute-force cosine top-k for the first NQueries vectors.
    * Similarity is rounded to 6 dp for cross-engine hash stability; ties
    * break by neighbor id. */
  def bruteForceTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // norms are per-vector, computed ONCE before the pair join (O(n)) —
    // inlining norm(...) into the cosine would recompute it per pair
    // (O(n·q)); sqrt(dot(v,v)) is bit-identical either way
    val e = emb(s, dir).withColumn("nrm", norm($"embedding"))
    val q = e.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q"), $"nrm".as("qnrm"))
    val joined = e.join(broadcast(q), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        round(dot($"q", $"embedding") / ($"qnrm" * $"nrm"), 6)
          .as("cosine"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id".asc)
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= TopK)
      .orderBy($"query_id", $"rank")
  }

  val bruteForceTopKSql: String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < $NQueries),
       |sims AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    round(list_dot_product(q.qv::DOUBLE[], e.embedding::DOUBLE[]) /
       |      (sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])) *
       |       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6)
       |    AS cosine
       |  FROM embeddings e, q WHERE e.vec_id != q.query_id)
       |SELECT query_id, neighbor_id, cosine, rank FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM sims) WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  val NPlanes = 4

  /** Deterministic pseudo-random hyperplane weight for (dim i, plane p):
    * integer in [-3, 3] derived from index arithmetic — reproducible in
    * any engine, no RNG state. */
  private def planeWeight(i: Column, p: Int): Column =
    pmod(i * 31 + lit(p) * 17 + 7, lit(7)) - 3

  /** Sign-random-projection bucket id for an embedding column.
    * Projections run on floor-quantized integer components (×1000) so the
    * sign is exact integer arithmetic — no float-summation-order drift
    * between engines. Shared by a2/a3 and DedupOps.embeddingNearDup. */
  def srpBucket(embCol: Column): Column = {
    val dims = sequence(lit(0), size(embCol) - 1)
    val bucketBits = (0 until NPlanes).map { p =>
      val proj = aggregate(dims, lit(0L),
        (acc, i) => acc +
          floor(element_at(embCol, (i + 1).cast("int")).cast("double") * 1000).cast("long") *
          planeWeight(i, p).cast("long"))
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bucketBits.reduce(_ + _)
  }

  /** DuckDB twin of [[srpBucket]] over a column named `embedding`. */
  val srpBucketSql: String = (0 until NPlanes).map { p =>
    s"""CASE WHEN list_sum(list_transform(generate_series(0, len(embedding) - 1),
       |  i -> CAST(floor(embedding[i + 1]::DOUBLE * 1000) AS BIGINT) * (((i * 31 + $p * 17 + 7) % 7) - 3))) > 0
       |  THEN ${1L << p} ELSE 0 END""".stripMargin
  }.mkString(" + ")

  /** a2: sign-random-projection bucket id per vector (the LSH partition
    * step; search = same hash on the query + a bucket-local scan). */
  def lshBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    emb(s, dir).select(
      $"vec_id",
      srpBucket($"embedding").as("bucket"),
      $"label".cast("long").as("label"))
      .orderBy($"vec_id")
  }

  val lshBucketsSql: String =
    s"""SELECT vec_id, ($srpBucketSql)::BIGINT AS bucket, label::BIGINT AS label
       |FROM embeddings ORDER BY vec_id""".stripMargin

  /** a3: bucketed ANN — top-3 cosine neighbors within each query's LSH
    * bucket (the pruned search path; compares against a1 for recall). */
  def lshTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = lshBuckets(s, dir).select($"vec_id", $"bucket")
    val e = emb(s, dir).join(b, "vec_id").withColumn("nrm", norm($"embedding"))
    val q = e.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q"), $"nrm".as("qnrm"), $"bucket")
    val joined = e.join(broadcast(q), Seq("bucket"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"bucket", $"vec_id".as("neighbor_id"),
        round(dot($"q", $"embedding") / ($"qnrm" * $"nrm"), 6)
          .as("cosine"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id".asc)
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .orderBy($"query_id", $"rank")
  }

  val lshTopKSql: String =
    s"""WITH b AS (SELECT vec_id, embedding, ($srpBucketSql)::BIGINT AS bucket FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < $NQueries),
       |sims AS (
       |  SELECT q.query_id, b.bucket, b.vec_id AS neighbor_id,
       |    round(list_dot_product(q.qv::DOUBLE[], b.embedding::DOUBLE[]) /
       |      (sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])) *
       |       sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)
       |    AS cosine
       |  FROM b JOIN q ON b.bucket = q.bucket AND b.vec_id != q.query_id)
       |SELECT query_id, bucket, neighbor_id, cosine, rank FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM sims) WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin

  val NCentroids = 8

  /** a4: IVF (inverted-file) ANN — the second scale path next to LSH.
    * Deterministic coarse quantizer: the first NCentroids vectors act as
    * centroids; every vector is assigned to its max-cosine centroid (tie →
    * lowest centroid id), giving an inverted list per cell. Search probes
    * only the query's cell (nprobe=1): centroids broadcast, assignment is
    * a narrow map stage, and the candidate join shuffles one cell — at
    * 100 TB the cell assignment is the partition key, so each query
    * touches ~1/NCentroids of the corpus. */
  def ivfTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).withColumn("nrm", norm($"embedding"))
    val cents = e.filter($"vec_id" < NCentroids)
      .select($"vec_id".as("cent_id"), $"embedding".as("cv"), $"nrm".as("cnrm"))
    val wAssign = Window.partitionBy($"vec_id")
      .orderBy($"cc".desc, $"cent_id".asc)
    val cells = e.join(broadcast(cents))
      .select($"vec_id", $"embedding", $"nrm", $"cent_id",
        round(dot($"cv", $"embedding") / ($"cnrm" * $"nrm"), 6)
          .as("cc"))
      .withColumn("rn", row_number().over(wAssign)).filter($"rn" === 1)
      .select($"vec_id", $"embedding", $"nrm", $"cent_id".as("cell"))
    val q = cells.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q"), $"nrm".as("qnrm"), $"cell")
    val joined = cells.join(broadcast(q), Seq("cell"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"cell", $"vec_id".as("neighbor_id"),
        round(dot($"q", $"embedding") / ($"qnrm" * $"nrm"), 6)
          .as("cosine"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id".asc)
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .orderBy($"query_id", $"rank")
  }

  val ivfTopKSql: String =
    s"""WITH c AS (
       |  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id < $NCentroids),
       |assign AS (
       |  SELECT e.vec_id, e.embedding, c.cent_id,
       |    round(list_dot_product(c.cv::DOUBLE[], e.embedding::DOUBLE[]) /
       |      (sqrt(list_dot_product(c.cv::DOUBLE[], c.cv::DOUBLE[])) *
       |       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6) AS cc
       |  FROM embeddings e, c),
       |cells AS (
       |  SELECT vec_id, embedding, cent_id AS cell FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY cc DESC, cent_id ASC) AS rn
       |    FROM assign) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, cell FROM cells WHERE vec_id < $NQueries),
       |sims AS (
       |  SELECT q.query_id, e.cell, e.vec_id AS neighbor_id,
       |    round(list_dot_product(q.qv::DOUBLE[], e.embedding::DOUBLE[]) /
       |      (sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])) *
       |       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 6) AS cosine
       |  FROM cells e JOIN q ON e.cell = q.cell AND e.vec_id != q.query_id)
       |SELECT query_id, cell, neighbor_id, cosine, rank FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
       |  FROM sims) WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin
}
