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
    val e = emb(s, dir)
    val q = e.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q"))
    val joined = e.join(broadcast(q), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        round(dot($"q", $"embedding") / (norm($"q") * norm($"embedding")), 6)
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

  /** a2: sign-random-projection bucket id per vector (the LSH partition
    * step; search = same hash on the query + a bucket-local scan).
    * Projections run on floor-quantized integer components (×1000) so the
    * sign is exact integer arithmetic — no float-summation-order drift
    * between engines. */
  def lshBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dims = sequence(lit(0), size($"embedding") - 1)
    val bucketBits = (0 until NPlanes).map { p =>
      val proj = aggregate(dims, lit(0L),
        (acc, i) => acc +
          floor(element_at($"embedding", (i + 1).cast("int")).cast("double") * 1000).cast("long") *
          planeWeight(i, p).cast("long"))
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    emb(s, dir).select(
      $"vec_id",
      bucketBits.reduce(_ + _).as("bucket"),
      $"label".cast("long").as("label"))
      .orderBy($"vec_id")
  }

  val lshBucketsSql: String = {
    val bits = (0 until NPlanes).map { p =>
      s"""CASE WHEN list_sum(list_transform(generate_series(0, len(embedding) - 1),
         |  i -> CAST(floor(embedding[i + 1]::DOUBLE * 1000) AS BIGINT) * (((i * 31 + $p * 17 + 7) % 7) - 3))) > 0
         |  THEN ${1L << p} ELSE 0 END""".stripMargin
    }.mkString(" + ")
    s"""SELECT vec_id, ($bits)::BIGINT AS bucket, label::BIGINT AS label
       |FROM embeddings ORDER BY vec_id""".stripMargin
  }

  /** a3: bucketed ANN — top-3 cosine neighbors within each query's LSH
    * bucket (the pruned search path; compares against a1 for recall). */
  def lshTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val b = lshBuckets(s, dir).select($"vec_id", $"bucket")
    val e = emb(s, dir).join(b, "vec_id")
    val q = e.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("q"), $"bucket")
    val joined = e.join(broadcast(q), Seq("bucket"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"bucket", $"vec_id".as("neighbor_id"),
        round(dot($"q", $"embedding") / (norm($"q") * norm($"embedding")), 6)
          .as("cosine"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id".asc)
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .orderBy($"query_id", $"rank")
  }

  val lshTopKSql: String = {
    val bits = (0 until NPlanes).map { p =>
      s"""CASE WHEN list_sum(list_transform(generate_series(0, len(embedding) - 1),
         |  i -> CAST(floor(embedding[i + 1]::DOUBLE * 1000) AS BIGINT) * (((i * 31 + $p * 17 + 7) % 7) - 3))) > 0
         |  THEN ${1L << p} ELSE 0 END""".stripMargin
    }.mkString(" + ")
    s"""WITH b AS (SELECT vec_id, embedding, ($bits)::BIGINT AS bucket FROM embeddings),
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
  }
}
