package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis Column functions for the training-data pipeline.
  *
  * All pure compositions of codegen'd builtins, so they run inside
  * whole-stage codegen at the parquet scan — no UDF serialization cost,
  * and every formula is reproducible in ANSI SQL for the oracle.
  */
object TextFunctions {

  /** Whitespace tokens, raw (may contain leading empty on untrimmed text). */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** Canonical token form used by every registered query: trim first,
    * drop empties — `string_split_regex`/`split` edge behavior around
    * leading/trailing whitespace differs between engines otherwise.
    */
  def cleanTokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** BPE-ish sub-token count: alpha runs, single digits, single
    * punctuation marks — a cheap deterministic proxy for a BPE vocab.
    */
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"), lit(0))

  /** Word n-gram shingles (space-joined) over a token array. */
  def shingles(toks: Column, n: Int): Column =
    when(
      size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i => concat_ws(" ", slice(toks, i + lit(1), lit(n))))
    ).otherwise(array(concat_ws(" ", toks)))

  /** Distinct shingles — the set form used by Jaccard / MinHash. */
  def shingleSet(text: Column, n: Int): Column = array_distinct(shingles(cleanTokens(text), n))

  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "pour", "dans", "que"),
    "es" -> Seq("el", "la", "de", "y", "un", "una", "es", "para", "en", "que"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "für", "in", "nicht")
  )

  /** zh profile characters — counted at CHARACTER level because Chinese
    * text is unspaced (whitespace tokenization never matches it).
    */
  val zhChars: Seq[String] = Seq("的", "是", "了", "在", "和", "有", "我", "不", "这", "人")

  /** Stopword hit count for one language profile over a token array. */
  def stopwordHits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(stopwords(lang): _*)))

  /** Character-level zh profile hits over the raw text. */
  def zhHits(text: Column): Column =
    size(regexp_extract_all(text, lit(zhChars.mkString("|")), lit(0)))

  /** Language-ID: argmax of profile hits with a fixed-order (en, fr, es,
    * de, zh) tie-break, written as a CASE chain so the oracle SQL is the
    * literally identical decision procedure. Classic Cavnar-Trenkle-style
    * profile heuristic; zh counted at char level (see zhHits).
    */
  def langId(text: Column): Column = {
    val toks = cleanTokens(lower(text))
    val en = stopwordHits(toks, "en"); val fr = stopwordHits(toks, "fr")
    val es = stopwordHits(toks, "es"); val de = stopwordHits(toks, "de")
    val zh = zhHits(text)
    when(en >= fr && en >= es && en >= de && en >= zh, "en")
      .when(fr >= es && fr >= de && fr >= zh, "fr")
      .when(es >= de && es >= zh, "es")
      .when(de >= zh, "de")
      .otherwise("zh")
  }

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0))).cast("double") / length(text)
    ).otherwise(lit(0.0))

  /** Ratio of (english) stopword tokens to all tokens. */
  def stopwordRatio(text: Column): Column = {
    val toks = cleanTokens(lower(text))
    when(size(toks) > 0, stopwordHits(toks, "en").cast("double") / size(toks)).otherwise(lit(0.0))
  }

  /** Mean token length. */
  def meanTokenLen(text: Column): Column = {
    val toks = cleanTokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks)
    ).otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: favors mid-length docs, low
    * punctuation density, moderate stopword mass — the standard cheap
    * pre-filter shape for LLM corpus curation.
    */
  def qualityScore(text: Column): Column = {
    val lenScore  = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val punctPen  = greatest(lit(1.0) - punctRatio(text) * 5, lit(0.0))
    val stopScore = least(stopwordRatio(text) * 5, lit(1.0))
    lenScore * 0.4 + punctPen * 0.4 + stopScore * 0.2
  }
}
