package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for a training-data pipeline: MinHash+LSH,
  * SimHash, and n-gram Jaccard — the dedup family a 100 TB corpus needs
  * beyond exact hashing (TextOps.exactDedup).
  *
  * Scale shapes:
  *  - MinHash signatures are per-row array expressions (no shuffle);
  *    LSH banding explodes only (doc, band) pairs — the candidate join is
  *    a self-join on (band, band_hash) buckets, never all-pairs;
  *  - SimHash is a per-row 64-bit reduce; near-dup pairs join on
  *    16-bit sub-bands (pigeonhole: hamming ≤ 3 ⇒ one of 4 bands equal);
  *  - Jaccard verification runs only on LSH/band candidates.
  *
  * Cross-engine determinism: every hash is md5-derived (DuckDB twin
  * exists); "random" permutations are seeded by the hash-function index.
  */
object DedupOps {

  // the driver's parquet is a single file (one scan partition); fan the
  // per-row hashing work across the executor threads
  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .repartition(s.sparkContext.defaultParallelism)

  private def words(c: Column): Column = split(c, " ")

  /** Shingle set over a MATERIALIZED token-array column: the slice lambda
    * references the array attribute, so the split never re-runs per
    * element (an inlined split(text) in the lambda body is re-evaluated
    * once per shingle — measured ~2x on the shingle-bearing queries). */
  private def shinglesOf(w: Column): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(w) - 2, lit(1))),
      i => concat_ws(" ", slice(w, i, lit(3)))))

  val NumHashes = 8
  val Bands = 4 // 2 rows per band

  /** MinHash signature: h_k(doc) = min over shingles of the k-th affine
    * transform of the shingle's md5-derived 60-bit hash (one-hash MinHash).
    * One row per doc, signature as a CSV of NumHashes integers. */
  // One-hash MinHash: md5 runs ONCE per shingle; the NumHashes "random
  // permutations" are affine transforms of that single 60-bit value —
  // h_k(u) = (a_k * (u & 2^30-1) + b_k) mod P. The a_k/b_k stay < 2^31 so
  // every product fits in 62 bits (no BIGINT overflow in DuckDB, no wrap
  // divergence in Spark). 8× less hashing than md5-per-(k, shingle) —
  // the dominant cost of minhash at corpus scale.
  private val MinhashP = 1073741789L // largest prime < 2^30
  private val MinhashMask = 0x3FFFFFFFL // 2^30 - 1
  private def affineA(k: Int): Long = 2L * (k * 40503L + 1234577L) + 1L // odd
  private def affineB(k: Int): Long = k * 9176L + 281L

  /** Per-shingle base hash: 60-bit integer from the md5 hex prefix
    * (cross-engine: DuckDB ('0x' || prefix)::BIGINT == Spark conv). */
  private def shingleHash(sh: Column): Column =
    transform(sh, x => conv(substring(md5(x), 1, 15), 16, 10).cast("long"))

  /** Signature over a pre-materialized base-hash array column: Catalyst
    * substitutes a shared expression tree into every consumer, so the
    * md5 array must cross a projection boundary before the k transforms. */
  private def sigOver(hs: Column): Column =
    array((0 until NumHashes).map { k =>
      array_min(transform(hs,
        u => (u.bitwiseAND(lit(MinhashMask)) * lit(affineA(k)) + lit(affineB(k)))
          % lit(MinhashP)))
    }: _*)

  def minhashSignature(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select($"doc_id", words($"text").as("__w"))
      .select($"doc_id", shingleHash(shinglesOf($"__w")).as("hs"))
      .select($"doc_id",
        concat_ws(",", transform(sigOver($"hs"), v => v.cast("string"))).as("sig"))
      .orderBy($"doc_id")
  }

  private val shinglesSqlCte: String =
    """sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
      |      i -> array_to_string(string_split(text,' ')[i:i+2], ' '))) AS shingles
      |  FROM documents),
      |hs AS (
      |  SELECT doc_id, shingles,
      |    list_transform(shingles,
      |      x -> ('0x' || substring(md5(x), 1, 15))::BIGINT) AS hv
      |  FROM sh)""".stripMargin

  private def minhashKSql: String = (0 until NumHashes).map { k =>
    s"list_min(list_transform(hv, u -> ((u & $MinhashMask) * ${affineA(k)} + ${affineB(k)}) % $MinhashP))"
  }.mkString("[", ", ", "]")

  val minhashSignatureSql: String =
    s"""WITH $shinglesSqlCte
       |SELECT doc_id,
       |  array_to_string(list_transform($minhashKSql, v -> v::VARCHAR), ',') AS sig
       |FROM hs ORDER BY doc_id""".stripMargin

  /** MinHash-LSH candidate pairs: band the signature (4 bands × 2 hashes),
    * bucket-join on (band, band_key), emit distinct candidate pairs.
    * Verified Jaccard (on the true shingle sets) is attached so callers
    * can threshold. */
  /** Candidate rows carry the HASHED shingle set (8-byte longs), not the
    * shingle strings — the band join shuffles ~2.5× less and the Jaccard
    * set ops compare longs. Counts are identical (the 60-bit hash is
    * injective up to ~2^-61-probability collisions, applied identically
    * in the DuckDB twin). */
  def minhashLshPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // banded feeds BOTH sides of the self-join below: an eager
    // localCheckpoint computes the shingle/md5/signature chain ONCE per
    // row instead of once per join side (each invocation still computes
    // from the parquet input — nothing survives across calls)
    val banded = docs(s, dir)
      .select($"doc_id", words($"text").as("__w"))
      .select($"doc_id", shingleHash(shinglesOf($"__w")).as("hs"))
      .select($"doc_id", $"hs", sigOver($"hs").as("sig"))
      .select($"doc_id", $"hs", posexplode(transform(
        sequence(lit(0), lit(Bands - 1)),
        b => md5(concat_ws("|", transform(
          slice(col("sig"), b * (NumHashes / Bands) + 1, lit(NumHashes / Bands)),
          v => v.cast("string")))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      .localCheckpoint(true)
    val l = banded.select($"doc_id".as("a"), $"hs".as("hs_a"), $"band", $"band_key")
    val r = banded.select($"doc_id".as("b"), $"hs".as("hs_b"), $"band", $"band_key")
    l.join(r, Seq("band", "band_key"))
      .filter($"a" < $"b")
      .select($"a", $"b",
        size(array_intersect($"hs_a", $"hs_b")).cast("long").as("inter"),
        size(array_union($"hs_a", $"hs_b")).cast("long").as("uni"))
      .distinct()
      .orderBy($"a", $"b")
  }

  val minhashLshPairsSql: String =
    s"""WITH $shinglesSqlCte,
       |sig AS (
       |  SELECT doc_id, hv,
       |    list_transform($minhashKSql, v -> v::VARCHAR) AS sg
       |  FROM hs),
       |banded AS (
       |  SELECT doc_id, hv, b.band AS band,
       |    md5(array_to_string(sg[(b.band * 2 + 1):(b.band * 2 + 2)], '|')) AS band_key
       |  FROM sig, (SELECT unnest(generate_series(0, 3)) AS band) b)
       |SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
       |  len(list_intersect(l.hv, r.hv)) AS inter,
       |  len(list_distinct(list_concat(l.hv, r.hv))) AS uni
       |FROM banded l JOIN banded r ON l.band = r.band AND l.band_key = r.band_key
       |WHERE l.doc_id < r.doc_id
       |ORDER BY a, b""".stripMargin

  /** SimHash-64: per token, md5 → first 16 hex chars → 64 bits; bit j of
    * the fingerprint = majority vote over tokens. Emitted as 4× 16-bit
    * sub-bands (integers) — the pigeonhole join key for hamming ≤ 3. */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = array_distinct(words(lower($"text")))
    // per-token 64-bit value from the md5 hex prefix — materialized ONCE
    // through a projection boundary: the 60 bit-vote aggregates below each
    // reference the array, and an inlined tree would re-run md5 60× per
    // token (measured 7.2s → sub-second at sf0.1 for 5k docs)
    val tokBits = transform(toks, t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    val base = docs(s, dir).select($"doc_id", tokBits.as("tb"))
    // majority vote per bit via sum over sign contributions
    val bitCols = (0 until 60).map { j =>
      val votes = aggregate($"tb", lit(0L),
        (acc, v) => acc + when(shiftright(v, j).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(votes > 0, lit(1L)).otherwise(lit(0L)) * lit(1L << j)
    }
    val sim = bitCols.reduce(_ + _)
    base.select($"doc_id", sim.as("simhash"))
      .select(
        $"doc_id", $"simhash",
        ($"simhash".bitwiseAND(lit(0x7FFFL))).as("band0"),
        (shiftright($"simhash", 15).bitwiseAND(lit(0x7FFFL))).as("band1"),
        (shiftright($"simhash", 30).bitwiseAND(lit(0x7FFFL))).as("band2"),
        (shiftright($"simhash", 45).bitwiseAND(lit(0x7FFFL))).as("band3"))
      .orderBy($"doc_id")
  }

  /** DuckDB twin of [[simhash]]: the per-token 64-bit value is
    * `('0x' || md5-prefix)::BIGINT` (== Spark's `conv(…,16,10)` for the
    * 15-hex-char prefix, 60 bits, no sign), and the majority vote is the
    * same ±1 list_sum per bit. */
  val simhashSql: String = {
    val bits = (0 until 60).map { j =>
      s"CASE WHEN list_sum(list_transform(tb, v -> CASE WHEN (v >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS toks
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, list_transform(toks, t -> ('0x' || substring(md5(t), 1, 15))::BIGINT) AS tb
       |  FROM d),
       |s AS (SELECT doc_id, ($bits)::BIGINT AS simhash FROM h)
       |SELECT doc_id, simhash,
       |  simhash & 32767 AS band0,
       |  (simhash >> 15) & 32767 AS band1,
       |  (simhash >> 30) & 32767 AS band2,
       |  (simhash >> 45) & 32767 AS band3
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Max docs per triangle-join cell side: a (lang, len-bucket) block of
    * n docs fans its O(n²) pair work across ceil(n/K)·(ceil(n/K)+1)/2
    * cells of ≤ K² pairs each, instead of one task computing all of it. */
  val BlockCap = 256

  /** n-gram Jaccard within same-lang blocks. Blocking key = (lang,
    * length-bucket): near-dups have near-equal length, so blocks bound
    * the quadratic term without losing pairs; shingle sets travel hashed
    * (longs) — cheaper shuffle + set ops.
    *
    * Skew defense (exact, not approximate): real corpora put millions of
    * docs into one (en, short) block, and a join keyed on the block alone
    * computes that block's entire O(n²) in ONE task. Here each block is
    * hash-split into G = ceil(n/BlockCap) groups and the self-join runs
    * over TRIANGLE CELLS (i ≤ j): a doc in group g joins cell (g, j) on
    * the left for j ≥ g and cell (i, g) on the right for i ≤ g, so every
    * unordered pair lands in exactly one cell and no task sees more than
    * BlockCap² pairs. Work is unchanged — this is parallelization of an
    * exact semantics, which is why the oracle twin stays the plain
    * all-pairs SQL. */
  def ngramJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // d feeds both sides of the triangle self-join (plus the block-size
    // aggregate): one eager localCheckpoint computes the shingle hashing
    // once per row instead of once per consumer
    val d = docs(s, dir)
      .select($"doc_id", $"lang", $"text", words($"text").as("__w"))
      .select($"doc_id", $"lang",
        (length($"text") / 100).cast("int").as("lb"),
        shingleHash(shinglesOf($"__w")).as("hs"))
      .localCheckpoint(true)
    triangleJaccardPairs(d, BlockCap)
  }

  /** The exact triangle-join core over a (doc_id, lang, lb, hs) frame —
    * factored out so the skew property (no cell wider than cap) is
    * directly testable. */
  private[graft] def triangleJaccardPairs(d: DataFrame, cap: Int): DataFrame = {
    // NOTE: the group and group-count column names must differ in more
    // than case — Spark resolves column names case-insensitively, so a
    // "__g" withColumn would silently REPLACE a "__G" column.
    val sizes = d.groupBy(col("lang"), col("lb")).agg(count(lit(1)).as("__bn"))
      .select(col("lang"), col("lb"),
        ceil(col("__bn") / lit(cap.toDouble)).cast("int").as("__ngroups"))
    val dg = d.join(broadcast(sizes), Seq("lang", "lb"))
      .withColumn("__grp", pmod(xxhash64(col("doc_id")), col("__ngroups")).cast("int"))
    val l = dg.select(col("lang"), col("lb"), col("doc_id").as("da"), col("hs").as("hs_a"),
      col("__grp").as("i"), explode(sequence(col("__grp"), col("__ngroups") - 1)).as("j"))
    val r = dg.select(col("lang"), col("lb"), col("doc_id").as("db"), col("hs").as("hs_b"),
      explode(sequence(lit(0), col("__grp"))).as("i"), col("__grp").as("j"))
    l.join(r, Seq("lang", "lb", "i", "j"))
      .filter((col("i") =!= col("j")) || (col("da") < col("db"))) // diagonal dedups ordered pairs
      .select(col("lang"),
        least(col("da"), col("db")).as("a"), greatest(col("da"), col("db")).as("b"),
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("long").as("inter"),
        size(array_union(col("hs_a"), col("hs_b"))).cast("long").as("uni"))
      .filter(col("inter") * 10 >= col("uni") * 1) // keep pairs with jaccard >= 0.1
      .orderBy(col("lang"), col("a"), col("b"))
  }

  val ngramJaccardPairsSql: String =
    """WITH d AS (
      |  SELECT doc_id, lang, CAST(length(text) // 100 AS INT) AS lb,
      |    list_transform(
      |      list_distinct(list_transform(
      |        generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
      |        i -> array_to_string(string_split(text,' ')[i:i+2], ' '))),
      |      x -> ('0x' || substring(md5(x), 1, 15))::BIGINT) AS hv
      |  FROM documents)
      |SELECT l.lang AS lang, l.doc_id AS a, r.doc_id AS b,
      |  len(list_intersect(l.hv, r.hv)) AS inter,
      |  len(list_distinct(list_concat(l.hv, r.hv))) AS uni
      |FROM d l JOIN d r ON l.lang = r.lang AND l.lb = r.lb AND l.doc_id < r.doc_id
      |WHERE len(list_intersect(l.hv, r.hv)) * 10 >= len(list_distinct(list_concat(l.hv, r.hv)))
      |ORDER BY lang, a, b""".stripMargin

  /** Exact left-to-right double dot product (same accumulation order as
    * DuckDB's list_dot_product → cross-engine stable to 6 dp). */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  val CosineThreshold = 0.40

  /** d5: embedding-cosine near-duplicate pairs — the semantic-dedup path
    * of the family (exact → minhash → simhash → embedding space).
    * Candidate generation is SRP-LSH bucketing (AnnOps.srpBucket) with
    * the CORPUS-SCALED plane count (buckets track corpus size instead of
    * a fixed 16 — AnnOps.nPlanesFor) plus a hamming-1 MULTI-PROBE on the
    * left side: a pair is compared iff their buckets differ in ≤1 plane,
    * which buys back the recall narrower buckets cost. Each unordered
    * pair lands in the join exactly once (the probe list is distinct and
    * the right side's bucket is unique). Survivors get the exact cosine;
    * pairs at/above the threshold emit. */
  def embeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val raw = s.read.parquet(s"$dir/embeddings.parquet")
    val np = AnnOps.nPlanesFor(raw.count())
    // e feeds both sides of the bucket self-join: the eager
    // localCheckpoint computes the SRP planes + norm ONCE per vector
    // instead of once per join side; the quantized components cross a
    // projection boundary so the per-plane integer dot products share
    // one float quantization pass
    val e = raw
      .repartition(s.sparkContext.defaultParallelism)
      .select($"vec_id", $"embedding", AnnOps.srpQuantized($"embedding").as("__q"),
        norm($"embedding").as("nrm")) // per-vector, once — not per pair
      .select($"vec_id", $"embedding", AnnOps.srpBucketQ($"__q", np).as("bucket"),
        $"nrm")
      .localCheckpoint(true)
    val probes = array((Seq($"bucket") ++
      (0 until np).map(p => $"bucket".bitwiseXOR(lit(1L << p)))): _*)
    val l = e.select($"vec_id".as("a"), $"embedding".as("ea"), $"nrm".as("na"),
      explode(probes).as("bucket"))
    val r = e.select($"bucket", $"vec_id".as("b"), $"embedding".as("eb"), $"nrm".as("nb"))
    l.join(r, Seq("bucket")).filter($"a" < $"b")
      .select($"a", $"b",
        round(dot($"ea", $"eb") / ($"na" * $"nb"), 6).as("cosine"))
      .filter($"cosine" >= CosineThreshold)
      .orderBy($"a", $"b")
  }

  val embeddingNearDupSql: String =
    s"""WITH np AS (SELECT ${AnnOps.nPlanesSqlExpr} AS np FROM embeddings),
       |e AS (
       |  SELECT vec_id, embedding, (${AnnOps.srpBucketSqlMasked})::BIGINT AS bucket
       |  FROM embeddings, np),
       |lp AS (
       |  SELECT vec_id, embedding,
       |    unnest(list_prepend(bucket, list_transform(generate_series(1, np.np),
       |      i -> xor(bucket, (1::BIGINT << (i-1)))))) AS bucket
       |  FROM e, np)
       |SELECT l.vec_id AS a, r.vec_id AS b,
       |  round(list_dot_product(l.embedding::DOUBLE[], r.embedding::DOUBLE[]) /
       |    (sqrt(list_dot_product(l.embedding::DOUBLE[], l.embedding::DOUBLE[])) *
       |     sqrt(list_dot_product(r.embedding::DOUBLE[], r.embedding::DOUBLE[]))), 6) AS cosine
       |FROM lp l JOIN e r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
       |WHERE round(list_dot_product(l.embedding::DOUBLE[], r.embedding::DOUBLE[]) /
       |    (sqrt(list_dot_product(l.embedding::DOUBLE[], l.embedding::DOUBLE[])) *
       |     sqrt(list_dot_product(r.embedding::DOUBLE[], r.embedding::DOUBLE[]))), 6) >= $CosineThreshold
       |ORDER BY a, b""".stripMargin
}
