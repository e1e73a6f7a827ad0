package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table — language ID (stopword heuristic), quality scoring,
  * token counting, and rolling-hash fingerprinting. All pure `functions._`
  * column expressions (whole-stage codegen, no UDFs), all narrow
  * (shuffle-free) per-document projections — at 100 TB these run at scan
  * speed with column pruning (only `doc_id`, `text` are read).
  */
object TextOps {

  // the driver's parquet is a single file (one scan partition); fan the
  // per-row hashing work across the executor threads
  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .repartition(s.sparkContext.defaultParallelism)

  private def words(c: Column): Column = split(c, " ")

  /** t1: exact dedup — canonical-form hash (lower+trim), group, first-id
    * wins, duplicate count. The 100 TB plan: hash-partitioned group-agg
    * with map-side partial aggregation; no sort, one shuffle of
    * (hash, id) pairs only. */
  def exactDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select($"doc_id", md5(lower(trim($"text"))).as("text_hash"))
      .groupBy($"text_hash")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy($"text_hash")
  }

  val exactDedupSql: String =
    """SELECT md5(lower(trim(text))) AS text_hash,
      |  min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin

  /** t2: token counting — whitespace tokens, distinct tokens, and a
    * BPE-ish subword estimate (4 chars ≈ 1 token, ceiling). The token
    * array crosses a projection boundary so the split runs once per row
    * (HOF-bearing trees are excluded from codegen subexpression
    * elimination, so inlined twins each pay the split). */
  def tokenCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .select($"doc_id", words($"text").as("__w"), length($"text").as("__len"))
      .select(
        $"doc_id",
        size($"__w").cast("long").as("n_tokens"),
        size(array_distinct($"__w")).cast("long").as("n_distinct_tokens"),
        ceil($"__len" / lit(4.0)).cast("long").as("n_subword_est"))
      .orderBy($"doc_id")
  }

  val tokenCountSql: String =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
      |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_subword_est
      |FROM documents ORDER BY doc_id""".stripMargin

  private val Stopwords = Seq("the", "a", "of", "and", "in", "to", "is")

  /** t3: quality scoring — integer signals only (cross-engine exact):
    * char length, token count, stopword hits, mean token length ×100. */
  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = words($"text")
    // integer signals materialize once (projection boundary): the split
    // and the stopword HOF otherwise re-evaluate per consuming column
    docs(s, dir)
      .select($"doc_id",
        length($"text").as("__nc"),
        size(w).as("__nt"),
        size(filter(w, t => t.isin(Stopwords: _*))).as("__sh"))
      .select(
        $"doc_id",
        $"__nc".cast("long").as("n_chars"),
        $"__nt".cast("long").as("n_tokens"),
        $"__sh".cast("long").as("stopword_hits"),
        // mean token length in hundredths, integer-exact in both engines
        (($"__nc" - $"__nt" + 1) * lit(100L) / $"__nt").cast("long")
          .as("mean_token_len_x100"),
        ($"__sh" * lit(1000L) / $"__nt").cast("long").as("stopword_ratio_x1000"))
      .orderBy($"doc_id")
  }

  val qualityScoreSql: String =
    s"""SELECT doc_id,
       |  length(text) AS n_chars,
       |  len(string_split(text, ' ')) AS n_tokens,
       |  len(list_filter(string_split(text, ' '),
       |      t -> t IN ('the','a','of','and','in','to','is'))) AS stopword_hits,
       |  CAST((length(text) - len(string_split(text, ' ')) + 1) * 100
       |    // len(string_split(text, ' ')) AS BIGINT) AS mean_token_len_x100,
       |  CAST(len(list_filter(string_split(text, ' '),
       |      t -> t IN ('the','a','of','and','in','to','is'))) * 1000
       |    // len(string_split(text, ' ')) AS BIGINT) AS stopword_ratio_x1000
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Per-language marker lists for the n-gram/stopword language-ID
    * heuristic (deterministic, tiny — a real system swaps in fastText). */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "die", "und", "ist"),
    "es" -> Seq("el", "la", "que", "es"),
    "fr" -> Seq("le", "la", "et", "est"))

  /** t4: language ID — argmax of per-language marker hits with a fixed
    * tie-break order (en > de > es > fr), 'und' (undetermined) when no
    * marker hits at all. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = words(lower($"text"))
    // per-language hit counts materialize ONCE (projection boundary):
    // the argmax fold below duplicates its operand trees (acc appears in
    // both branches of every `when`), so folding over the raw HOF counts
    // re-evaluated each marker filter up to ~2^4 times per row
    val hitCols = LangMarkers.map { case (lang, ms) =>
      size(filter(w, t => t.isin(ms: _*))).cast("long").as(s"__h_$lang")
    }
    val hits = LangMarkers.map { case (lang, _) => lang -> col(s"__h_$lang") }
    val best = hits.tail.foldLeft(
      struct(hits.head._2.as("n"), lit(hits.head._1).as("lang"))) { case (acc, (lang, n)) =>
      when(n > acc.getField("n"), struct(n.as("n"), lit(lang).as("lang"))).otherwise(acc)
    }
    docs(s, dir)
      .select(($"doc_id" +: hitCols): _*)
      .select(
        $"doc_id",
        when(best.getField("n") > 0, best.getField("lang")).otherwise(lit("und"))
          .as("lang_pred"),
        best.getField("n").as("marker_hits"))
      .orderBy($"doc_id")
  }

  val langIdSql: String = {
    def hit(ms: Seq[String]) =
      s"len(list_filter(string_split(lower(text), ' '), t -> t IN (${ms.map(m => s"'$m'").mkString(",")})))"
    val en = hit(LangMarkers(0)._2); val de = hit(LangMarkers(1)._2)
    val es = hit(LangMarkers(2)._2); val fr = hit(LangMarkers(3)._2)
    s"""WITH h AS (SELECT doc_id, $en AS en, $de AS de, $es AS es, $fr AS fr FROM documents)
       |SELECT doc_id,
       |  CASE WHEN greatest(en, de, es, fr) = 0 THEN 'und'
       |    WHEN en >= de AND en >= es AND en >= fr THEN 'en'
       |    WHEN de >= es AND de >= fr THEN 'de'
       |    WHEN es >= fr THEN 'es'
       |    ELSE 'fr' END AS lang_pred,
       |  greatest(en, de, es, fr) AS marker_hits
       |FROM h ORDER BY doc_id""".stripMargin
  }

  /** t5: document fingerprint — min-hash over word 3-gram shingles
    * (the 1-permutation MinHash; md5 as the cross-engine hash). Pure
    * array expressions: shingle enumeration happens inside the row, no
    * explode, no shuffle. */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the token array crosses a projection boundary: the shingle lambda
    // otherwise embeds split(text) in its body and re-splits per element;
    // n_shingles = the sequence length directly (size∘transform ≡ size of
    // the generating sequence — same value, zero second shingle build)
    docs(s, dir)
      .select($"doc_id", words($"text").as("__w"))
      .select(
        $"doc_id",
        array_min(transform(
          transform(sequence(lit(1), greatest(size($"__w") - 2, lit(1))),
            i => concat_ws(" ", slice($"__w", i, lit(3)))),
          sh => md5(sh))).as("min_shingle_hash"),
        greatest(size($"__w") - 2, lit(1)).cast("long").as("n_shingles"))
      .orderBy($"doc_id")
  }

  val fingerprintSql: String =
    """SELECT doc_id,
      |  list_min(list_transform(
      |    list_transform(generate_series(1, greatest(len(string_split(text,' ')) - 2, 1)),
      |      i -> array_to_string(string_split(text,' ')[i:i+2], ' ')),
      |    sh -> md5(sh))) AS min_shingle_hash,
      |  len(generate_series(1, greatest(len(string_split(text,' ')) - 2, 1))) AS n_shingles
      |FROM documents ORDER BY doc_id""".stripMargin
}
