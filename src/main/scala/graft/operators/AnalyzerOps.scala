package graft.operators

import graft.functions.AnalyzerExpressions.{cjk_analyze, porter_stem}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ES-mapping analyzer chains as Spark column pipelines (VERDICT r3
  * "What's missing" #3; reference
  * `conf/mappings/{english,cjk,autocomplete}_mapping.json` — the
  * index-side analysis config the reference ships to Elasticsearch at
  * index-creation, `pkg/elasticsearch/indices.go`).
  *
  * Spark-first re-expression: an analyzer is a token pipeline
  * `tokenize → filter*` where every stage is a column expression over
  * `array<string>` — narrow, shuffle-free, whole-stage-codegen'd (the two
  * pieces plain functions can't express — Porter2 stemming and the CJK
  * width+bigram tokenizer — are native Catalyst expressions backed by
  * static helpers, [[graft.functions.AnalyzerExpressions]]). At 100 TB
  * the analyzed projection runs at scan speed with only (doc_id, text)
  * read.
  *
  * Config fidelity: [[fromMappingJson]] parses the `settings.analysis`
  * block of a real ES mapping file (tokenizer + filter chain, stopword
  * lists, keyword markers, edge-ngram params) into the same
  * [[Analyzer]] model the built-ins use — `AnalyzerSpec` (the test
  * suite) proves the parsed reference files drive chains identical to
  * the built-in [[english]]/[[cjk]]/[[autocomplete]] definitions.
  */
object AnalyzerOps {

  // ---- chain model --------------------------------------------------------

  sealed trait TokenFilter
  /** `lowercase` */
  case object Lowercase extends TokenFilter
  /** `stop` — drop tokens in the set (applied AFTER lowercase in every
    * reference chain, so matching is on the lowercased form). */
  final case class Stop(words: Set[String]) extends TokenFilter
  /** `stemmer: possessive_english` — strip trailing 's. */
  case object PossessiveEnglish extends TokenFilter
  /** `stemmer: english` (Porter2), skipping `keyword_marker` tokens. */
  final case class StemEnglish(keywords: Set[String]) extends TokenFilter
  /** `edge_ngram` — each token expands to its prefixes of length
    * min_gram..max_gram. */
  final case class EdgeNgram(minGram: Int, maxGram: Int) extends TokenFilter

  /** `tokenizer` ∈ {standard, cjk} (cjk = standard + cjk_width + bigram
    * folded into one native expression). */
  final case class Analyzer(name: String, tokenizer: String,
      filters: Seq[TokenFilter])

  /** The Lucene `_english_` stop set (what `stopwords: "_english_"` in
    * english_mapping.json:5-7 expands to). */
  val EnglishStop: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  // ---- built-in analyzers (cited to the reference mapping files) ----------

  /** english_mapping.json:24-34 `rebuilt_english`: standard tokenizer,
    * possessive stemmer, lowercase, english stop, keyword_marker
    * ("example", :10-14), Porter2 stemmer. */
  val english: Analyzer = Analyzer("english", "standard", Seq(
    PossessiveEnglish, Lowercase, Stop(EnglishStop),
    StemEnglish(keywords = Set("example"))))

  /** cjk_mapping.json:46-56 `rebuilt_cjk`: cjk tokenizer chain
    * (cjk_width, lowercase, bigrams) + the file's explicit stop list
    * (:4-43 — `_english_` minus "an", plus s/t/www). */
  val cjk: Analyzer = Analyzer("cjk", "cjk", Seq(
    Stop(EnglishStop - "an" ++ Set("s", "t", "www"))))

  /** autocomplete_mapping.json:4-19 `autocomplete`: standard tokenizer,
    * lowercase, edge_ngram(1, 20). */
  val autocomplete: Analyzer = Analyzer("autocomplete", "standard", Seq(
    Lowercase, EdgeNgram(1, 20)))

  /** The ES built-in `standard` analyzer — the mappings' search_analyzer
    * (english_mapping.json:51): standard tokenizer + lowercase. */
  val standard: Analyzer = Analyzer("standard", "standard", Seq(Lowercase))

  // ---- column pipeline ----------------------------------------------------

  /** Standard-tokenizer approximation (UAX#29 word boundaries): split on
    * non-(letter|digit|apostrophe) runs, trim edge apostrophes, drop
    * empties. Exact for the corpus alphabet; apostrophes are kept
    * in-token so the possessive stemmer sees "dog's". */
  private def tokensStd(text: Column): Column =
    filter(
      transform(split(text, "[^\\p{L}\\p{N}'’]+"),
        t => regexp_replace(t, "^['’]+|['’]+$", "")),
      t => length(t) > 0)

  private def applyFilter(tokens: Column, f: TokenFilter): Column = f match {
    case Lowercase => transform(tokens, t => lower(t))
    case Stop(words) =>
      filter(tokens, t => !t.isin(words.toSeq.sorted: _*))
    case PossessiveEnglish =>
      transform(tokens, t => regexp_replace(t, "['’][sS]$", ""))
    case StemEnglish(keywords) =>
      if (keywords.isEmpty) transform(tokens, t => porter_stem(t))
      else transform(tokens,
        t => when(t.isin(keywords.toSeq.sorted: _*), t).otherwise(porter_stem(t)))
    case EdgeNgram(minG, maxG) =>
      // ES edge_ngram drops tokens shorter than min_gram entirely (it
      // never emits a gram shorter OR longer than the token), so filter
      // first — the clamped sequence otherwise fabricates a whole-token
      // gram for short tokens when min_gram > 1.
      flatten(transform(filter(tokens, t => length(t) >= lit(minG)), t =>
        transform(sequence(lit(minG), least(length(t), lit(maxG))),
          i => substring(t, lit(1), i))))
  }

  /** `analyze(text, analyzer)` → array<string> of tokens. */
  def analyze(text: Column, a: Analyzer): Column = {
    val toks = a.tokenizer match {
      case "cjk" => cjk_analyze(text)
      case _ => tokensStd(text)
    }
    a.filters.foldLeft(toks)(applyFilter)
  }

  // ---- mapping-JSON parser (jackson rides the Spark classpath) ------------

  /** Parse the `settings.analysis` block of an ES mapping file into
    * [[Analyzer]]s. Supports the filter types the reference mappings use:
    * stop (explicit list or `_english_`), keyword_marker, stemmer
    * (english / possessive_english), edge_ngram, plus the built-in names
    * lowercase / cjk_width / cjk_bigram. A `cjk_width`+`cjk_bigram` pair
    * (or the standard tokenizer inside a `rebuilt_cjk`-style chain)
    * selects the cjk tokenizer path. */
  def fromMappingJson(json: String): Map[String, Analyzer] = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    import scala.jdk.CollectionConverters._
    val root = new ObjectMapper().readTree(json)
    val analysis = root.path("settings").path("analysis")
    val filterDefs: Map[String, JsonNode] =
      if (analysis.path("filter").isObject)
        analysis.path("filter").properties().asScala
          .map(e => e.getKey -> e.getValue).toMap
      else Map.empty

    def stopWordsOf(n: JsonNode): Set[String] = {
      val sw = n.path("stopwords")
      if (sw.isTextual && sw.asText() == "_english_") EnglishStop
      else if (sw.isArray) sw.elements().asScala.map(_.asText()).toSet
      else EnglishStop
    }

    val analyzers = analysis.path("analyzer")
    if (!analyzers.isObject) return Map.empty
    analyzers.properties().asScala.map { e =>
      val name = e.getKey
      val node = e.getValue
      val declaredFilters = node.path("filter").elements().asScala.map(_.asText()).toVector
      var tokenizer = node.path("tokenizer").asText("standard")
      var pendingKeywords = Set.empty[String]
      val chain = Vector.newBuilder[TokenFilter]
      declaredFilters.foreach { fname =>
        val fdef = filterDefs.get(fname)
        val ftype = fdef.map(_.path("type").asText(fname)).getOrElse(fname)
        ftype match {
          case "lowercase" => chain += Lowercase
          case "stop" => chain += Stop(fdef.map(stopWordsOf).getOrElse(EnglishStop))
          case "keyword_marker" =>
            pendingKeywords = fdef.map(_.path("keywords").elements().asScala
              .map(_.asText()).toSet).getOrElse(Set.empty)
          case "stemmer" =>
            fdef.map(_.path("language").asText("english")).getOrElse("english") match {
              case "possessive_english" => chain += PossessiveEnglish
              case _ =>
                chain += StemEnglish(pendingKeywords); pendingKeywords = Set.empty
            }
          case "edge_ngram" =>
            chain += EdgeNgram(
              fdef.map(_.path("min_gram").asInt(1)).getOrElse(1),
              fdef.map(_.path("max_gram").asInt(20)).getOrElse(20))
          case "cjk_width" => tokenizer = "cjk" // folded into the cjk tokenizer
          case "cjk_bigram" => tokenizer = "cjk"
          case _ => () // unknown filter: skip (forward-compatible)
        }
      }
      // the cjk tokenizer path already lowercases; drop the redundant stage
      val filters0 = chain.result()
      val filters =
        if (tokenizer == "cjk") filters0.filterNot(_ == Lowercase) else filters0
      name -> Analyzer(name, tokenizer, filters)
    }.toMap
  }

  // ---- driver-gated queries over the documents table ----------------------

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .repartition(s.sparkContext.defaultParallelism)

  /** x1: autocomplete analyzer (lowercase + edge_ngram 1..20) — full
    * fidelity, oracle-gated; grams joined to one string for the
    * cross-engine hash. */
  def analyzeAutocomplete(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir).select(
      $"doc_id",
      concat_ws(" ", analyze($"text", autocomplete)).as("grams"),
      size(analyze($"text", autocomplete)).cast("long").as("n_grams"))
      .orderBy($"doc_id")
  }

  val analyzeAutocompleteSql: String =
    """SELECT doc_id,
      |  array_to_string(flatten(list_transform(
      |    list_filter(list_transform(regexp_split_to_array(text, '[^a-zA-Z0-9''’]+'),
      |      t -> lower(regexp_replace(t, '^[''’]+|[''’]+$', ''))), t -> len(t) > 0),
      |    t -> list_transform(generate_series(1, greatest(least(length(t), 20), 1)),
      |      i -> t[1:i]))), ' ') AS grams,
      |  len(flatten(list_transform(
      |    list_filter(list_transform(regexp_split_to_array(text, '[^a-zA-Z0-9''’]+'),
      |      t -> lower(regexp_replace(t, '^[''’]+|[''’]+$', ''))), t -> len(t) > 0),
      |    t -> list_transform(generate_series(1, greatest(least(length(t), 20), 1)),
      |      i -> t[1:i])))) AS n_grams
      |FROM documents ORDER BY doc_id""".stripMargin

  /** x2: the mappings' search analyzer (`standard`: tokenize +
    * lowercase) — oracle-gated. */
  def analyzeStandard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir).select(
      $"doc_id",
      concat_ws(" ", analyze($"text", standard)).as("tokens"),
      size(analyze($"text", standard)).cast("long").as("n_tokens"))
      .orderBy($"doc_id")
  }

  val analyzeStandardSql: String =
    """SELECT doc_id,
      |  array_to_string(list_filter(list_transform(
      |    regexp_split_to_array(text, '[^a-zA-Z0-9''’]+'),
      |    t -> lower(regexp_replace(t, '^[''’]+|[''’]+$', ''))),
      |    t -> len(t) > 0), ' ') AS tokens,
      |  len(list_filter(list_transform(
      |    regexp_split_to_array(text, '[^a-zA-Z0-9''’]+'),
      |    t -> lower(regexp_replace(t, '^[''’]+|[''’]+$', ''))),
      |    t -> len(t) > 0)) AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** x3: the english chain up to the stop filter (possessive → lowercase
    * → `_english_` stop) — oracle-gated. The Porter2 stemmer stage on top
    * is gated by AnalyzerSpec instead: DuckDB's `stem()` lives in the fts
    * extension, unavailable offline, so the stemmed chain has no SQL
    * twin here. */
  def analyzeEnglishStop(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val chain = Analyzer("english_stop", "standard",
      english.filters.filterNot(_.isInstanceOf[StemEnglish]))
    docs(s, dir).select(
      $"doc_id",
      concat_ws(" ", analyze($"text", chain)).as("tokens"),
      size(analyze($"text", chain)).cast("long").as("n_tokens"))
      .orderBy($"doc_id")
  }

  val analyzeEnglishStopSql: String = {
    val stops = EnglishStop.toSeq.sorted.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id,
       |  array_to_string(list_filter(list_transform(
       |    regexp_split_to_array(text, '[^a-zA-Z0-9''’]+'),
       |    t -> lower(regexp_replace(regexp_replace(t, '^[''’]+|[''’]+$$', ''),
       |                              '[''’][sS]$$', ''))),
       |    t -> len(t) > 0 AND t NOT IN ($stops)), ' ') AS tokens,
       |  len(list_filter(list_transform(
       |    regexp_split_to_array(text, '[^a-zA-Z0-9''’]+'),
       |    t -> lower(regexp_replace(regexp_replace(t, '^[''’]+|[''’]+$$', ''),
       |                              '[''’][sS]$$', ''))),
       |    t -> len(t) > 0 AND t NOT IN ($stops))) AS n_tokens
       |FROM documents ORDER BY doc_id""".stripMargin
  }
}
