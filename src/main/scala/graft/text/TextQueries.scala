package graft.text

import graft.{Query, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis queries (SURVEY §2.5) over the documents table. Every
  * formula is a codegen'd builtin composition (graft.functions
  * .TextFunctions) with a literally-mirrored DuckDB oracle.
  */
object TextQueries {

  private def cleanToks: Column = TextFunctions.cleanTokens(col("text"))

  /** Winnowing stage 1: per-doc 3-gram shingle stream keyed as
    * hash*2^20 + (2^20-1 - pos) — min picks (min hash, rightmost pos)
    * as ONE integer compare. Shared by text_winnowing and
    * dedup_winnowing_pairs.
    */
  private def winnowKeyed(s: org.apache.spark.sql.SparkSession,
                          d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(cleanToks).as(Seq("pos", "t")))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    tok
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", col("t"), lead(col("t"), 1).over(wd),
          lead(col("t"), 2).over(wd)).as("s"),
        lead(col("t"), 2).over(wd).as("t2"))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), col("pos"),
        (graft.functions.Hashing.md5Long32(col("s")) * 1048576L
          + (lit(1048575L) - col("pos"))).as("key"))
  }

  /** Winnowing stage 2: the selected fingerprint per full-width w=4
    * window (one frame min per window start).
    */
  private def winnowSelected(sh: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    sh.select(col("doc_id"),
        min(col("key")).over(wd.rowsBetween(0, 3)).as("fp"),
        lead(col("key"), 3).over(wd).as("k3"))
      .filter(col("k3").isNotNull)
  }

  /** DSIR hashed-bucket scoring shared by text_dsir_weight and
    * pipeline_dsir_sample: (doc_id, n_tokens, dsir_logratio) with the
    * weight already rounded 4dp (identical bits cross-engine).
    */
  private def dsirScored(s: org.apache.spark.sql.SparkSession,
                         d: String): org.apache.spark.sql.DataFrame = {
    val t = Tables.documents(s, d).select(col("doc_id"), col("lang"),
      explode(TextFunctions.cleanTokens(lower(col("text")))).as("term"))
    val b = t.select(col("doc_id"), col("lang"),
      (graft.functions.Hashing.md5Long32(col("term")) % 1024).as("bk"))
    val cr = b.groupBy(col("bk")).agg(count(lit(1)).as("cr"))
    val ct = b.filter(col("lang") === "en")
      .groupBy(col("bk")).agg(count(lit(1)).as("ct"))
    val tot = b.agg(count(lit(1)).as("nr"),
      sum((col("lang") === "en").cast("long")).as("nt"))
    val model = cr.join(ct, Seq("bk"), "left")
      .select(col("bk"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
    val dc = b.groupBy(col("doc_id"), col("bk")).agg(count(lit(1)).as("c"))
    dc.join(broadcast(model), Seq("bk"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        round(sum((col("c").cast("double") *
            (log(((col("ct") + 1) * (col("nr") + 1024)).cast("double"))
              - log(((col("cr") + 1) * (col("nt") + 1024)).cast("double"))))
          .cast("decimal(18,12)")).cast("double") / sum(col("c")), 4)
          .as("dsir_logratio"))
  }

  /** DuckDB mirror of dsirScored, ending in
    * `sc(doc_id, n_tokens, dsir_logratio)`.
    */
  private lazy val dsirCteSql =
    s"""t AS (SELECT doc_id, lang, unnest($lowToksSql) AS term FROM documents),
       |b AS (SELECT doc_id, lang,
       |        CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) % 1024 AS bk FROM t),
       |cr AS (SELECT bk, COUNT(*) AS cr FROM b GROUP BY 1),
       |ct AS (SELECT bk, COUNT(*) AS ct FROM b WHERE lang = 'en' GROUP BY 1),
       |tot AS (SELECT COUNT(*) AS nr,
       |          SUM(CAST(lang = 'en' AS BIGINT)) AS nt FROM b),
       |m AS (SELECT cr.bk, cr.cr, COALESCE(ct.ct, 0) AS ct FROM cr LEFT JOIN ct USING (bk)),
       |dc AS (SELECT doc_id, bk, COUNT(*) AS c FROM b GROUP BY 1, 2),
       |sc AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |         ROUND(CAST(SUM(CAST(CAST(c AS DOUBLE) *
       |             (ln(CAST((m.ct + 1) * (tot.nr + 1024) AS DOUBLE))
       |              - ln(CAST((m.cr + 1) * (tot.nt + 1024) AS DOUBLE)))
       |           AS DECIMAL(18,12))) AS DOUBLE) / SUM(c), 4) AS dsir_logratio
       |       FROM dc JOIN m USING (bk) CROSS JOIN tot
       |       GROUP BY doc_id)""".stripMargin

  /** DuckDB mirror of winnowKeyed + winnowSelected, ending in
    * `v(doc_id, fp)`.
    */
  private val winnowCteSql =
    """t AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
      |          FROM documents),
      |sh AS (SELECT doc_id, i - 1 AS pos,
      |         CAST('0x' || substr(md5(concat_ws(' ', tk[i], tk[i+1], tk[i+2])), 1, 8) AS BIGINT)
      |           * 1048576 + (1048575 - (i - 1)) AS key
      |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) AS i
      |             FROM t WHERE len(tk) >= 3)),
      |w AS (SELECT doc_id,
      |        MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
      |        LEAD(key, 3) OVER (PARTITION BY doc_id ORDER BY pos) AS k3
      |      FROM sh),
      |v AS (SELECT doc_id, fp FROM w WHERE k3 IS NOT NULL)""".stripMargin

  /** Row types for the deflate-ratio mapPartitions pass. */
  final case class Doc(doc_id: Long, text: String)
  final case class DeflateRatio(doc_id: Long, n_raw: Long, n_deflated: Long,
                                ratio_bp: Long)

  /** Full per-doc deflate frame (doc_id, raw_len, deflate_len,
    * ratio_bp) — the operator text_compression_ratio projects its
    * oracle-checkable columns from; PipelineOpsSpec pins the
    * engine-specific ratio columns here. Level-6 Deflater, one
    * instance per row (fixed level => deterministic bytes), no
    * shuffle.
    */
  def deflateRatios(s: org.apache.spark.sql.SparkSession,
                    d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Encoders
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[Doc](Encoders.product[Doc])
      .mapPartitions { it =>
        val buf = new Array[Byte](1 << 16)
        it.map { doc =>
          val raw = doc.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val defl = new java.util.zip.Deflater(6)
          defl.setInput(raw); defl.finish()
          var n = 0L
          while (!defl.finished()) n += defl.deflate(buf)
          defl.end()
          DeflateRatio(doc.doc_id, raw.length.toLong, n,
            if (raw.length == 0) 10000L else n * 10000L / raw.length)
        }
      }(Encoders.product[DeflateRatio])
      .toDF("doc_id", "raw_len", "deflate_len", "ratio_bp")
  }

  /** DuckDB mirror of cleanTokens over lower(text). */
  private val lowToksSql =
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')"

  /** DuckDB mirror of cleanTokens over the raw (case-preserving) text. */
  private val toksSql =
    "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')"

  private def hitsSql(lang: String): String = {
    val lst = TextFunctions.stopwords(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter($lowToksSql, x -> list_contains([$lst], x)))"
  }

  val entries: Seq[(String, Query)] = Seq(

    // Whitespace + BPE-ish regex token counting.
    "text_token_count" -> Query(
      (s, d) =>
        Tables.documents(s, d).select(
          col("doc_id"),
          size(cleanToks).cast("long").as("n_tokens"),
          size(TextFunctions.bpeishTokens(col("text"))).cast("long").as("n_bpeish"),
          round(TextFunctions.meanTokenLen(col("text")), 4).as("mean_token_len")),
      Some("""SELECT doc_id,
             |  CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
             |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpeish,
             |  ROUND(CASE WHEN len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) > 0
             |    THEN CAST(list_sum(list_transform(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''), x -> length(x))) AS DOUBLE)
             |         / len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''))
             |    ELSE 0.0 END, 4) AS mean_token_len
             |FROM documents""".stripMargin)
    ),

    // Quality scoring: length/punct/stopword-ratio composite — the
    // standard cheap corpus-curation pre-filter.
    "text_quality" -> Query(
      (s, d) =>
        Tables.documents(s, d).select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars_m"),
          round(TextFunctions.punctRatio(col("text")), 6).as("punct_ratio"),
          round(TextFunctions.stopwordRatio(col("text")), 6).as("stopword_ratio"),
          round(TextFunctions.qualityScore(col("text")), 6).as("quality")),
      Some(s"""WITH c AS (
             |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars_m,
             |    CASE WHEN length(text) > 0
             |      THEN CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) / length(text)
             |      ELSE 0.0 END AS pr,
             |    CASE WHEN len($lowToksSql) > 0
             |      THEN CAST(${hitsSql("en")} AS DOUBLE) / len($lowToksSql)
             |      ELSE 0.0 END AS sr
             |  FROM documents)
             |SELECT doc_id, n_chars_m, ROUND(pr, 6) AS punct_ratio, ROUND(sr, 6) AS stopword_ratio,
             |  ROUND(LEAST(length(text)/500.0, 1.0) * 0.4
             |      + GREATEST(1.0 - pr * 5, 0.0) * 0.4
             |      + LEAST(sr * 5, 1.0) * 0.2, 6) AS quality
             |FROM c""".stripMargin)
    ),

    // Language-ID: stopword-profile argmax (char-level profile for
    // unspaced zh), identical CASE-chain decision procedure both sides.
    "text_langid" -> Query(
      (s, d) => {
        val toks = TextFunctions.cleanTokens(lower(col("text")))
        Tables.documents(s, d).select(
          col("doc_id"),
          TextFunctions.stopwordHits(toks, "en").cast("long").as("en_hits"),
          TextFunctions.stopwordHits(toks, "fr").cast("long").as("fr_hits"),
          TextFunctions.stopwordHits(toks, "es").cast("long").as("es_hits"),
          TextFunctions.stopwordHits(toks, "de").cast("long").as("de_hits"),
          TextFunctions.zhHits(col("text")).cast("long").as("zh_hits"),
          TextFunctions.langId(col("text")).as("lang_pred"))
      },
      Some(s"""WITH h AS (SELECT doc_id,
             |  CAST(${hitsSql("en")} AS BIGINT) AS en_hits,
             |  CAST(${hitsSql("fr")} AS BIGINT) AS fr_hits,
             |  CAST(${hitsSql("es")} AS BIGINT) AS es_hits,
             |  CAST(${hitsSql("de")} AS BIGINT) AS de_hits,
             |  CAST(len(regexp_extract_all(text, '${TextFunctions.zhChars.mkString("|")}')) AS BIGINT) AS zh_hits
             |FROM documents)
             |SELECT doc_id, en_hits, fr_hits, es_hits, de_hits, zh_hits,
             |  CASE WHEN en_hits >= fr_hits AND en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= zh_hits THEN 'en'
             |       WHEN fr_hits >= es_hits AND fr_hits >= de_hits AND fr_hits >= zh_hits THEN 'fr'
             |       WHEN es_hits >= de_hits AND es_hits >= zh_hits THEN 'es'
             |       WHEN de_hits >= zh_hits THEN 'de'
             |       ELSE 'zh' END AS lang_pred
             |FROM h""".stripMargin)
    ),

    // Corpus n-gram statistics: top-3 word bigrams per language by
    // corpus frequency — the "what does this corpus actually say"
    // summary every curation run reports. Bigrams are assembled
    // relationally (posexplode + lead window, fully codegen'd — same
    // shape as the dedup shingling), counted with one map-side-partial
    // shuffle, ranked per language with a deterministic tie-break.
    "text_ngram_topk" -> Query(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = Tables.documents(s, d)
          .select(col("lang"), col("doc_id"), posexplode(cleanToks).as(Seq("pos", "t")))
        val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val bigrams = tok
          .select(col("lang"), col("t"), lead(col("t"), 1).over(wd).as("t2"))
          .filter(col("t2").isNotNull)
          .select(col("lang"), concat_ws(" ", col("t"), col("t2")).as("bigram"))
        val counts = bigrams.groupBy(col("lang"), col("bigram"))
          .agg(count(lit(1)).as("n"))
        val wr = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("bigram"))
        counts.withColumn("rn", row_number().over(wr).cast("long"))
          .filter(col("rn") <= 3)
      },
      Some("""WITH t AS (SELECT lang, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
             |           FROM documents),
             |bg AS (SELECT lang,
             |         unnest(list_transform(generate_series(1, len(tk) - 1),
             |           i -> concat_ws(' ', tk[i], tk[i+1]))) AS bigram
             |       FROM t WHERE len(tk) >= 2),
             |c AS (SELECT lang, bigram, COUNT(*) AS n FROM bg GROUP BY lang, bigram)
             |SELECT lang, bigram, n, CAST(rn AS BIGINT) AS rn FROM (
             |  SELECT lang, bigram, n,
             |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rn
             |  FROM c) WHERE rn <= 3""".stripMargin)
    ),

    // TF-IDF keyword extraction: top-3 terms per document by
    // tf * ln(N/df). Three partial-agg shuffles (term frequency, doc
    // frequency, corpus size) + one term-keyed join — no all-pairs
    // work anywhere, the classic "what is this document about"
    // relevance op. Ordering compares the unrounded double score (both
    // engines compute bigint*ln(double/bigint) identically); term is
    // the tie-break.
    "text_tfidf_topk" -> Query(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val t = Tables.documents(s, d)
          .select(col("doc_id"), explode(cleanToks).as("term"))
        val tf = t.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val df = t.select(col("doc_id"), col("term")).distinct()
          .groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = t.agg(countDistinct(col("doc_id")).as("n"))
        val scored = tf.join(df, "term").crossJoin(broadcast(n))
          .withColumn("score", col("tf") * log(col("n").cast("double") / col("df")))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
        scored.withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("doc_id"), col("term"), col("tf"), col("df"),
            round(col("score"), 6).as("score"), col("rn"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |            unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
             |          FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term),
             |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY term),
             |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM t),
             |s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
             |        tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS score
             |      FROM tf JOIN df USING (term) CROSS JOIN n)
             |SELECT doc_id, term, tf, df, ROUND(score, 6) AS score, CAST(rn AS BIGINT) AS rn
             |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
             |                                   ORDER BY score DESC, term) AS rn FROM s)
             |WHERE rn <= 3""".stripMargin)
    ),

    // Gopher-style repetition filters: duplicate-line fraction,
    // duplicate-token fraction, top-bigram mass — the published
    // repetition signals LLM corpus curation actually gates on
    // (Rae et al. 2021 §A1.1; C4 uses the line-dedup variant). All
    // counts are INTEGER-exact and the keep decision is integer
    // cross-multiplication (dup_lines*10 <= 3*n_lines etc.), so there
    // is no float rounding anywhere for engines to disagree on.
    // Per-doc line/token stats are array ops in the scan; the top-
    // bigram stat is the relational posexplode+lead shape shared with
    // text_ngram_topk — two map-side-partial shuffles on doc_id, no
    // all-pairs work, 100 TB-safe.
    "text_repetition_filter" -> Query(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
        val lines = filter(split(col("text"), "\n"), l => trim(l) =!= "")
        val base = docs.select(col("doc_id"),
          size(lines).cast("long").as("n_lines"),
          (size(lines) - size(array_distinct(lines))).cast("long").as("n_dup_lines"),
          size(cleanToks).cast("long").as("n_tokens"),
          (size(cleanToks) - size(array_distinct(cleanToks))).cast("long").as("n_dup_tokens"))
        val tok = docs.select(col("doc_id"), posexplode(cleanToks).as(Seq("pos", "t")))
        val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val bstats = tok
          .select(col("doc_id"), col("t"), lead(col("t"), 1).over(wd).as("t2"))
          .filter(col("t2").isNotNull)
          .select(col("doc_id"), concat_ws(" ", col("t"), col("t2")).as("bigram"))
          .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("nb"))
          .groupBy(col("doc_id"))
          .agg(max(col("nb")).as("top_bigram_n"), sum(col("nb")).as("n_bigrams"))
        base.join(bstats, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_lines"), col("n_dup_lines"),
            col("n_tokens"), col("n_dup_tokens"),
            coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
          .withColumn("keep",
            (col("n_dup_lines") * 10 <= col("n_lines") * 3 &&
              col("n_dup_tokens") * 2 <= col("n_tokens") &&
              col("top_bigram_n") * 5 <= col("n_bigrams")).cast("long"))
      },
      Some("""WITH ln AS (
             |  SELECT doc_id,
             |    list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS lines,
             |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
             |  FROM documents),
             |base AS (
             |  SELECT doc_id,
             |    CAST(len(lines) AS BIGINT) AS n_lines,
             |    CAST(len(lines) - len(list_distinct(lines)) AS BIGINT) AS n_dup_lines,
             |    CAST(len(tk) AS BIGINT) AS n_tokens,
             |    CAST(len(tk) - len(list_distinct(tk)) AS BIGINT) AS n_dup_tokens
             |  FROM ln),
             |bg AS (SELECT doc_id,
             |         unnest(list_transform(generate_series(1, len(tk) - 1),
             |           i -> concat_ws(' ', tk[i], tk[i+1]))) AS bigram
             |       FROM ln WHERE len(tk) >= 2),
             |bc AS (SELECT doc_id, bigram, COUNT(*) AS nb FROM bg GROUP BY doc_id, bigram),
             |bs AS (SELECT doc_id, CAST(MAX(nb) AS BIGINT) AS top_bigram_n,
             |         CAST(SUM(nb) AS BIGINT) AS n_bigrams
             |       FROM bc GROUP BY doc_id)
             |SELECT base.doc_id, n_lines, n_dup_lines, n_tokens, n_dup_tokens,
             |  COALESCE(top_bigram_n, 0) AS top_bigram_n,
             |  COALESCE(n_bigrams, 0) AS n_bigrams,
             |  CAST(n_dup_lines * 10 <= n_lines * 3
             |   AND n_dup_tokens * 2 <= n_tokens
             |   AND COALESCE(top_bigram_n, 0) * 5 <= COALESCE(n_bigrams, 0) AS BIGINT) AS keep
             |FROM base LEFT JOIN bs ON base.doc_id = bs.doc_id""".stripMargin)
    ),

    // Unigram-LM surprisal scoring: each doc's mean -ln p(token) under
    // the corpus's own unigram model — the cheap perplexity proxy LLM
    // curation uses to rank docs (high surprisal = rare-token-heavy =
    // likely noise; low = boilerplate). Same relational shape as TF-IDF:
    // token explode -> term-count partial agg -> term-keyed join ->
    // per-doc partial agg; the model total is one broadcast scalar.
    // Parity: ln(double) is bit-identical cross-engine on identical
    // operands (proven by text_tfidf_topk); per-doc summation goes
    // through exact DECIMAL so partition order can't move an ulp.
    "text_surprisal" -> Query(
      (s, d) => {
        val t = Tables.documents(s, d).select(col("doc_id"),
          explode(TextFunctions.cleanTokens(lower(col("text")))).as("term"))
        val tf = t.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
        val tc = t.groupBy(col("term")).agg(count(lit(1)).as("ct"))
        val n = tc.agg(sum(col("ct")).as("n"))
        // join per-doc term COUNTS (distinct pairs) against the model,
        // not the raw token stream — several-fold less join input; the
        // weighted c·ln(n/ct) products sum through DECIMAL and the
        // oracle computes the identical shape, so the reshape cannot
        // move an ulp.
        tf.join(tc, "term").crossJoin(broadcast(n))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_tokens"),
            round(sum((col("c").cast("double") * log(col("n").cast("double") / col("ct")))
                .cast("decimal(18,12)")).cast("double") / sum(col("c")), 4)
              .as("mean_surprisal"))
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest($lowToksSql) AS term FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS c FROM t GROUP BY 1, 2),
             |tc AS (SELECT term, COUNT(*) AS ct FROM t GROUP BY term),
             |n AS (SELECT SUM(ct) AS n FROM tc)
             |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             |  ROUND(CAST(SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(n.n AS DOUBLE) / ct) AS DECIMAL(18,12))) AS DOUBLE)
             |        / SUM(c), 4) AS mean_surprisal
             |FROM tf JOIN tc USING (term) CROSS JOIN n
             |GROUP BY doc_id""".stripMargin)
    ),

    // Bigram-LM surprisal: mean -ln p(w2|w1) under the corpus's own
    // add-one-smoothed bigram model — one modeling step up from
    // text_surprisal (context-aware repetition scores low, incoherent
    // word salad scores high even when its unigrams are common).
    // p(w2|w1) = (bc+1)/(uc+V): every operand is an exact integer
    // count, so the ln argument is an identical double cross-engine.
    // Plan: posexplode + one lead window builds the bigram stream, then
    // three shrinking partial aggs (per-doc bigram counts, corpus
    // bigram counts, prefix counts) join on their natural keys — the
    // model tables shuffle once each, the vocab scalar broadcasts.
    "text_bigram_surprisal" -> Query(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(TextFunctions.cleanTokens(lower(col("text")))).as(Seq("pos", "t")))
        val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val bg = tok
          .select(col("doc_id"), col("t").as("w1"), lead(col("t"), 1).over(wd).as("w2"))
          .filter(col("w2").isNotNull)
        val bgf = bg.groupBy(col("doc_id"), col("w1"), col("w2")).agg(count(lit(1)).as("c"))
        val bc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("bc"))
        val uc = bg.groupBy(col("w1")).agg(count(lit(1)).as("uc"))
        val v = tok.agg(countDistinct(col("t")).as("v"))
        val nll = col("c").cast("double") *
          log((col("uc") + col("v")).cast("double") / (col("bc") + lit(1)).cast("double"))
        bgf.join(bc, Seq("w1", "w2")).join(uc, Seq("w1")).crossJoin(broadcast(v))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_bigrams"),
            round(sum(nll.cast("decimal(18,12)")).cast("double") / sum(col("c")), 4)
              .as("mean_surprisal"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $lowToksSql AS tk FROM documents),
             |bg AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
             |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
             |             FROM t WHERE len(tk) >= 2)),
             |bgf AS (SELECT doc_id, w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2, 3),
             |bc AS (SELECT w1, w2, COUNT(*) AS bc FROM bg GROUP BY 1, 2),
             |uc AS (SELECT w1, COUNT(*) AS uc FROM bg GROUP BY 1),
             |v AS (SELECT COUNT(DISTINCT u.tn) AS v
             |      FROM (SELECT unnest(tk) AS tn FROM t) u)
             |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
             |  ROUND(CAST(SUM(CAST(CAST(c AS DOUBLE) *
             |          ln(CAST(uc + v AS DOUBLE) / CAST(bc + 1 AS DOUBLE)) AS DECIMAL(18,12))) AS DOUBLE)
             |        / SUM(c), 4) AS mean_surprisal
             |FROM bgf JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN v
             |GROUP BY doc_id""".stripMargin)
    ),

    // Collocation extraction by pointwise mutual information: bigrams
    // whose parts co-occur far more than independence predicts
    // (PMI = ln(c12·N / (c1·c2)), all exact integer counts), support
    // >= 5 to kill the noise floor, global top-10 by (PMI, pair).
    // Same lead-window bigram stream as the LM queries; prefix/suffix
    // marginals are two shrinking aggs joined back on their keys, and
    // the final ranking is TakeOrdered over ~|bigram types| rows.
    "text_pmi_topk" -> Query(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(TextFunctions.cleanTokens(lower(col("text")))).as(Seq("pos", "t")))
        val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val bg = tok
          .select(col("doc_id"), col("t").as("w1"), lead(col("t"), 1).over(wd).as("w2"))
          .filter(col("w2").isNotNull)
        val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
        val c2 = bg.groupBy(col("w2")).agg(count(lit(1)).as("c2"))
        val n = bg.agg(count(lit(1)).as("n"))
        c12.filter(col("c12") >= 5)
          .join(c1, Seq("w1")).join(c2, Seq("w2")).crossJoin(broadcast(n))
          .withColumn("pmi",
            log((col("c12") * col("n")).cast("double") / (col("c1") * col("c2")).cast("double")))
          .orderBy(col("pmi").desc, col("w1"), col("w2"))
          .limit(10)
          .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
            round(col("pmi"), 6).as("pmi"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $lowToksSql AS tk FROM documents),
             |bg AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
             |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
             |             FROM t WHERE len(tk) >= 2)),
             |c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
             |c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
             |c2 AS (SELECT w2, COUNT(*) AS c2 FROM bg GROUP BY 1),
             |n AS (SELECT COUNT(*) AS n FROM bg)
             |SELECT w1, w2, c12, c1, c2,
             |  ROUND(ln(CAST(c12 * n AS DOUBLE) / CAST(c1 * c2 AS DOUBLE)), 6) AS pmi
             |FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN n
             |WHERE c12 >= 5
             |ORDER BY ln(CAST(c12 * n AS DOUBLE) / CAST(c1 * c2 AS DOUBLE)) DESC, w1, w2
             |LIMIT 10""".stripMargin)
    ),

    // Token-distribution Shannon entropy + type-token ratio: the
    // lexical-diversity signals curation pairs with surprisal (low
    // entropy = repetitive/templated text, TTR near 1 = no reuse).
    // H = ln(n) - (Σ c·ln c)/n from exact integer token counts — ln on
    // identical integer-valued doubles is bit-identical cross-engine,
    // the Σ goes through DECIMAL so partition order can't move an ulp,
    // and both derived doubles round to 4dp. One explode + one
    // two-level agg (map-side partial), no join at all.
    "text_entropy" -> Query(
      (s, d) => {
        val t = Tables.documents(s, d).select(col("doc_id"),
          explode(TextFunctions.cleanTokens(lower(col("text")))).as("term"))
        t.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n"), count(lit(1)).as("n_types"),
            sum((col("c").cast("double") * log(col("c").cast("double")))
              .cast("decimal(18,12)")).as("clnc"))
          .select(col("doc_id"), col("n"), col("n_types"),
            round(log(col("n").cast("double")) -
              col("clnc").cast("double") / col("n"), 4).as("entropy"),
            round(col("n_types").cast("double") / col("n"), 4).as("ttr"))
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest($lowToksSql) AS term FROM documents),
             |tc AS (SELECT doc_id, term, COUNT(*) AS c FROM t GROUP BY 1, 2)
             |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_types,
             |  ROUND(ln(CAST(SUM(c) AS DOUBLE)) -
             |    CAST(SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) AS DECIMAL(18,12))) AS DOUBLE)
             |      / SUM(c), 4) AS entropy,
             |  ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(c), 4) AS ttr
             |FROM tc GROUP BY doc_id""".stripMargin)
    ),

    // Benchmark DECONTAMINATION: flag training docs sharing any 8-gram
    // with a held-out eval set (doc_id % 20 == 0) — the published
    // n-gram-collision test (GPT-3 appx C uses 13-grams; 8 fits the
    // synthetic doc lengths) every serious pretraining corpus runs
    // before training. Shingles are assembled relationally (posexplode
    // + 7 lead frames over ONE doc_id sort — the codegen'd shape shared
    // with dedup shingling), the eval index is distinct 60-bit shingle
    // hashes, and the flagging join is a hash equi-join: O(n_shingles)
    // shuffle rows, never doc x doc. Scale guard (r16 — previously a
    // documented caveat): this gate fixture's eval split is a FIXED
    // FRACTION of the corpus (doc_id % 20), so the broadcast index
    // grows with the corpus; the hint is now SIZE-CONDITIONAL
    // (Hints.broadcastIfBounded — kept while corpus text volume stays
    // under the char budget, dropped past it so AQE picks the
    // strategy; the equi-join stays correct as a shuffle join). A production run swaps in real benchmark suites
    // (truly constant-size). Zero-hit docs come back via the left join
    // so the output is a verdict per training doc.
    "text_decontaminate" -> Query(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(TextFunctions.cleanTokens(lower(col("text")))).as(Seq("pos", "t")))
        val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val leads = (1 until 8).map(i => lead(col("t"), i).over(wd))
        val sh = tok
          .select(col("doc_id"),
            concat_ws(" ", (col("t") +: leads): _*).as("s"), leads.last.as("t7"))
          .filter(col("t7").isNotNull)
          .select(col("doc_id"), graft.functions.Hashing.md5Long60(col("s")).as("h"))
        val ev = sh.filter(col("doc_id") % 20 === 0).select(col("h")).distinct()
        val hits = sh.filter(col("doc_id") % 20 =!= 0)
          .select(col("doc_id"), col("h")).distinct()
          .join(graft.Hints.broadcastIfBounded(s, d, ev), "h")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
        Tables.documents(s, d).filter(col("doc_id") % 20 =!= 0)
          .select(col("doc_id"))
          .join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            (coalesce(col("n_hits"), lit(0L)) > 0).cast("long").as("contaminated"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |            list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS tk
             |          FROM documents),
             |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+7], ' ') AS s
             |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) AS i
             |             FROM t WHERE len(tk) >= 8)),
             |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
             |hits AS (SELECT sh.doc_id, COUNT(*) AS n_hits
             |         FROM sh JOIN ev USING (s) WHERE sh.doc_id % 20 <> 0 GROUP BY 1)
             |SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
             |  CAST(COALESCE(h.n_hits, 0) > 0 AS BIGINT) AS contaminated
             |FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
             |LEFT JOIN hits h ON d.doc_id = h.doc_id""".stripMargin)
    ),

    // Eval-side CONTAMINATION REPORT — the model-card leakage table:
    // for every EVAL doc (text_decontaminate's held-out split), what
    // fraction of its distinct 8-grams also appears in the TRAINING
    // split, and how many training docs carry them. decontaminate
    // answers "which training docs must go"; this answers "how burnt
    // is each benchmark if we don't" — the number leakage studies
    // actually publish per benchmark. Same relational shingle assembly
    // and 60-bit hashes; the join direction flips: the eval index
    // BROADCASTS onto the training shingle stream (same scale guard
    // as text_decontaminate: the doc_id % 20 eval split is corpus-
    // proportional, not constant-size — real benchmark suites are —
    // so the hint is size-conditional via Hints.broadcastIfBounded,
    // dropped past the corpus-chars budget where it degrades to a
    // shuffle join),
    // partial-aggs collapse map-side, and
    // the only shuffle is eval-sized (one row per eval doc). leak_bp
    // is integer basis points, zero-shingle eval docs come back via
    // the left join with leak_bp 0.
    "text_contamination_report" -> Query(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(TextFunctions.cleanTokens(lower(col("text")))).as(Seq("pos", "t")))
        val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val leads = (1 until 8).map(i => lead(col("t"), i).over(wd))
        val sh = tok
          .select(col("doc_id"),
            concat_ws(" ", (col("t") +: leads): _*).as("s"), leads.last.as("t7"))
          .filter(col("t7").isNotNull)
          .select(col("doc_id"), graft.functions.Hashing.md5Long60(col("s")).as("h"))
          .distinct()
        val ev = sh.filter(col("doc_id") % 20 === 0)
          .select(col("doc_id").as("eval_doc_id"), col("h"))
        val tot = ev.groupBy(col("eval_doc_id")).agg(count(lit(1)).as("n_shingles"))
        val hits = sh.filter(col("doc_id") % 20 =!= 0)
          .join(graft.Hints.broadcastIfBounded(s, d, ev), Seq("h"))
          .groupBy(col("eval_doc_id"))
          .agg(count_distinct(col("h")).as("n_leaked"),
            count_distinct(col("doc_id")).as("n_train_docs"))
        Tables.documents(s, d).filter(col("doc_id") % 20 === 0)
          .select(col("doc_id").as("eval_doc_id"))
          .join(tot, Seq("eval_doc_id"), "left")
          .join(hits, Seq("eval_doc_id"), "left")
          .select(col("eval_doc_id"),
            coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
            coalesce(col("n_leaked"), lit(0L)).as("n_leaked"),
            when(coalesce(col("n_shingles"), lit(0L)) > 0,
              expr("coalesce(n_leaked, 0L) * 10000 div n_shingles"))
              .otherwise(lit(0L)).as("leak_bp"),
            coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |            list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS tk
             |          FROM documents),
             |sh AS (SELECT DISTINCT doc_id, array_to_string(tk[i:i+7], ' ') AS s
             |       FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 7)) AS i
             |             FROM t WHERE len(tk) >= 8)),
             |ev AS (SELECT doc_id AS eval_doc_id, s FROM sh WHERE doc_id % 20 = 0),
             |tot AS (SELECT eval_doc_id, COUNT(*) AS n_shingles FROM ev GROUP BY 1),
             |hits AS (SELECT ev.eval_doc_id, COUNT(DISTINCT ev.s) AS n_leaked,
             |           COUNT(DISTINCT sh.doc_id) AS n_train_docs
             |         FROM sh JOIN ev USING (s) WHERE sh.doc_id % 20 <> 0 GROUP BY 1)
             |SELECT d.doc_id AS eval_doc_id,
             |  COALESCE(tot.n_shingles, 0) AS n_shingles,
             |  COALESCE(h.n_leaked, 0) AS n_leaked,
             |  CAST(CASE WHEN COALESCE(tot.n_shingles, 0) > 0
             |    THEN COALESCE(h.n_leaked, 0) * 10000 // tot.n_shingles
             |    ELSE 0 END AS BIGINT) AS leak_bp,
             |  COALESCE(h.n_train_docs, 0) AS n_train_docs
             |FROM (SELECT doc_id FROM documents WHERE doc_id % 20 = 0) d
             |LEFT JOIN tot ON tot.eval_doc_id = d.doc_id
             |LEFT JOIN hits h ON h.eval_doc_id = d.doc_id""".stripMargin)
    ),

    // Context-window SEQUENCE PACKING: greedy first-fit of docs (in
    // doc_id order) into 256-token training sequences — the step that
    // turns a curated corpus into fixed-budget training rows without
    // splitting documents. The fold is inherently sequential, so the
    // parallelism unit is a DETERMINISTIC ≤4096-doc sub-shard
    // (source, doc_id div 4096): one shuffle groups each sub-shard's
    // (doc_id, ntok) structs and the greedy scan runs as a codegen'd
    // aggregate fold over the sorted array. Unlike the former
    // whole-source grouping, the collect_list buffer is now CAPPED at
    // 4096 structs regardless of corpus size — a source at 100 TB is
    // millions of independent sub-shards, not one executor-killing
    // array. Packs never span sub-shards (the ≤budget-token tail of
    // each is padding — the standard locality/packing-efficiency
    // trade); global pack_id = sub*4096 + local (≤4096 packs per
    // sub-shard, one per doc at worst). A doc longer than the budget
    // gets its own pack. The oracle replays the identical greedy
    // recurrence as a per-(source, sub-shard) recursive CTE.
    // Token budgets are REAL BPE counts read from the shared per-doc
    // token-count table (Bpe.ntokTable, materialized once per dir,
    // bucketed on doc_id): the doc_id equi-join against the buckets
    // replaces re-replaying the merge list over the whole corpus per
    // run; the oracle derives the same ntok from the training-replay
    // CTE, so the gate still checks the derivation.
    "text_pack_greedy" -> Query(
      (s, d) => {
        val budget = 256
        val nt = Bpe.ntokTable(s, d).select(col("doc_id"), col("n_bpe"))
        val docs = Tables.documents(s, d).select(col("source"), col("doc_id"))
          .join(nt, Seq("doc_id"), "left")
          .select(col("source"), col("doc_id"),
            coalesce(col("n_bpe"), lit(0L)).as("ntok"))
        val outTy = "array<struct<doc_id:bigint,ntok:bigint,pack_id:bigint,off:bigint>>"
        val packed = aggregate(
          col("ds"),
          struct(
            expr(s"CAST(array() AS $outTy)").as("out"),
            lit(0L).as("cur"), lit(0L).as("acc")),
          (st, x) => {
            val break = st.getField("acc") > 0 &&
              st.getField("acc") + x.getField("ntok") > budget
            val pid = when(break, st.getField("cur") + 1).otherwise(st.getField("cur"))
            val off = when(break, lit(0L)).otherwise(st.getField("acc"))
            struct(
              concat(st.getField("out"), array(struct(
                x.getField("doc_id").as("doc_id"), x.getField("ntok").as("ntok"),
                pid.as("pack_id"), off.as("off")))).as("out"),
              pid.as("cur"),
              (off + x.getField("ntok")).as("acc"))
          },
          st => st.getField("out"))
        docs.groupBy(col("source"), expr("doc_id div 4096").as("sub"))
          .agg(sort_array(collect_list(struct(col("doc_id"), col("ntok")))).as("ds"))
          .select(col("source"), col("sub"), explode(packed).as("p"))
          .select(col("source"), col("p.doc_id").as("doc_id"), col("p.ntok").as("ntok"),
            (col("sub") * 4096 + col("p.pack_id")).as("pack_id"),
            col("p.off").as("off"))
      },
      Some(s"""WITH RECURSIVE ${graft.text.Bpe.wordTokensCteSql},
             |dw AS (SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
             |                  x -> x <> '')) AS word FROM documents),
             |ntc AS (SELECT doc_id, CAST(SUM(wt.nt) AS BIGINT) AS ntok
             |        FROM dw JOIN wt USING (word) GROUP BY 1),
             |t AS MATERIALIZED (
             |  SELECT source, doc_id, doc_id // 4096 AS sub,
             |    COALESCE(ntc.ntok, 0) AS ntok,
             |    ROW_NUMBER() OVER (PARTITION BY source, doc_id // 4096 ORDER BY doc_id) AS rn
             |  FROM documents LEFT JOIN ntc USING (doc_id)),
             |r AS (
             |  SELECT source, sub, doc_id, ntok, rn,
             |    CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS off, ntok AS acc
             |  FROM t WHERE rn = 1
             |  UNION ALL
             |  SELECT t.source, t.sub, t.doc_id, t.ntok, t.rn,
             |    CASE WHEN r.acc > 0 AND r.acc + t.ntok > 256 THEN r.pack_id + 1 ELSE r.pack_id END,
             |    CASE WHEN r.acc > 0 AND r.acc + t.ntok > 256 THEN CAST(0 AS BIGINT) ELSE r.acc END,
             |    CASE WHEN r.acc > 0 AND r.acc + t.ntok > 256 THEN t.ntok ELSE r.acc + t.ntok END
             |  FROM r JOIN t ON t.source = r.source AND t.sub = r.sub AND t.rn = r.rn + 1)
             |SELECT source, doc_id, ntok, CAST(sub * 4096 + pack_id AS BIGINT) AS pack_id, off
             |FROM r""".stripMargin)
    ),

    // Per-language CALIBRATED quality gate: keep docs at or above their
    // own language's median quality — absolute thresholds are miscalibrated
    // across languages (stopword lists, punctuation norms differ), so
    // production curation gates per-domain/per-language quantiles. The
    // per-lang exact median comes from GroupedPercentile.exact
    // (histogram-bisect two-pass, 64 score buckets over q ∈ [0,1] — no
    // per-group value buffer, unlike Spark's `percentile` aggregate
    // which would hold every score of a hot language in one executor)
    // and broadcasts back onto the scoring scan — no window over the
    // corpus, no sort. The keep decision compares 6dp-ROUNDED score vs
    // threshold on both sides, so an engine ulp in the interpolated
    // median can never flip a verdict.
    "text_quality_calibrated" -> Query(
      (s, d) => {
        val q = graft.Caches.scoped(
          Tables.documents(s, d).select(col("doc_id"), col("lang"),
            TextFunctions.qualityScore(col("text")).as("q")))
        val thr = graft.operators.GroupedPercentile.exact(
            q.select(col("lang"), col("q")), "lang", "q",
            Seq(("p50", 0.5)), floor(col("q") * 64).cast("long"), identity)
          .select(col("lang"), col("res").as("thr"))
        q.join(broadcast(thr), "lang")
          .select(col("doc_id"), col("lang"),
            round(col("q"), 6).as("quality"), round(col("thr"), 6).as("thr"),
            (round(col("q"), 6) >= round(col("thr"), 6)).cast("long").as("keep"))
      },
      Some(s"""WITH c AS (
             |  SELECT doc_id, lang, text,
             |    CASE WHEN length(text) > 0
             |      THEN CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) / length(text)
             |      ELSE 0.0 END AS pr,
             |    CASE WHEN len($lowToksSql) > 0
             |      THEN CAST(${hitsSql("en")} AS DOUBLE) / len($lowToksSql)
             |      ELSE 0.0 END AS sr
             |  FROM documents),
             |q AS (SELECT doc_id, lang,
             |        LEAST(length(text)/500.0, 1.0) * 0.4
             |          + GREATEST(1.0 - pr * 5, 0.0) * 0.4
             |          + LEAST(sr * 5, 1.0) * 0.2 AS q
             |      FROM c),
             |thr AS (SELECT lang, quantile_cont(q, 0.5) AS thr FROM q GROUP BY lang)
             |SELECT q.doc_id, q.lang, ROUND(q.q, 6) AS quality, ROUND(thr.thr, 6) AS thr,
             |  CAST(ROUND(q.q, 6) >= ROUND(thr.thr, 6) AS BIGINT) AS keep
             |FROM q JOIN thr USING (lang)""".stripMargin)
    ),

    // COMPRESSION-RATIO quality signal — the cheap redundancy detector
    // real curation stacks (C4/Gopher lineage) run beside token stats:
    // highly-repetitive or machine-generated text deflates far below
    // natural prose. One mapPartitions pass with a per-partition
    // Deflater (level 6, fixed => deterministic bytes), no shuffle.
    // DuckDB has no deflate, so the checked projection carries what IS
    // cross-engine: the exact UTF-8 byte length per doc plus an
    // in-plan within_bound verdict (0 < deflated <= raw + 64, the
    // stored-block worst case — a codec that inflates or emits nothing
    // fails the gate). PipelineOpsSpec keeps the full-ratio checks
    // (determinism, bp arithmetic, repetition-compresses-better) via
    // deflateRatios, the full frame this query projects from.
    "text_compression_ratio" -> Query(
      (s, d) =>
        deflateRatios(s, d)
          .select(col("doc_id"), col("raw_len"),
            (col("deflate_len") > 0 &&
              col("deflate_len") <= col("raw_len") + 64)
              .cast("long").as("within_bound")),
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS raw_len,
             |  CAST(1 AS BIGINT) AS within_bound
             |FROM documents""".stripMargin)
    ),

    // Order-sensitive positional rolling-hash fingerprint.
    "text_fingerprint" -> Query(
      (s, d) =>
        Tables.documents(s, d).select(
          col("doc_id"),
          graft.functions.Hashing.positionalFingerprint(cleanToks).as("fp")),
      Some("""SELECT doc_id,
             |  CAST(COALESCE(list_sum(list_transform(
             |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''),
             |    (x, i) -> CAST('0x' || substr(md5(concat(i, '_', x)), 1, 8) AS BIGINT))), 0) AS BIGINT) AS fp
             |FROM documents""".stripMargin)
    ),

    // RAG chunking: every document becomes 400-char windows starting
    // every 300 chars (100-char overlap so no retrieval-relevant span
    // straddles a cut unseen). Entirely ROW-LOCAL — chunk starts come
    // from a codegen'd sequence + posexplode, the digest from one md5
    // per chunk — so the plan is a single scan with ZERO shuffle
    // (PlanSpec-pinned): at 100 TB chunking is scan-rate bound, the
    // shape you need when the chunker runs in the same pass as the
    // embedder. Offsets + digests (not chunk text) are the output:
    // that's the chunk MANIFEST downstream stages join on, 40 bytes
    // per chunk instead of 400.
    "text_chunk_sliding" -> Query(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), col("text"), length(col("text")).as("n"))
          .filter(col("n") >= 1)
          .select(col("doc_id"), col("text"), col("n"),
            posexplode(sequence(lit(0), col("n") - 1, lit(300))).as(Seq("ci", "st")))
          .select(col("doc_id"),
            col("ci").cast("long").as("chunk_idx"),
            col("st").cast("long").as("chunk_start"),
            least(lit(400), col("n") - col("st")).cast("long").as("chunk_len"),
            md5(col("text").substr(col("st") + 1, lit(400))).as("chunk_md5")),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n
             |           FROM documents WHERE length(text) >= 1),
             |s AS (SELECT doc_id, text, n,
             |        unnest(generate_series(0, n - 1, 300)) AS st
             |      FROM d)
             |SELECT doc_id,
             |  CAST(st // 300 AS BIGINT) AS chunk_idx,
             |  CAST(st AS BIGINT) AS chunk_start,
             |  CAST(LEAST(400, n - st) AS BIGINT) AS chunk_len,
             |  md5(substr(text, CAST(st + 1 AS INTEGER), 400)) AS chunk_md5
             |FROM s""".stripMargin)
    ),

    // Sequence-length profile — the packing/truncation planner's input:
    // per (source, power-of-two length bucket) doc counts and token
    // totals. The bucket is the BIT LENGTH of the token count
    // (length of the binary representation = floor(log2 n)+1) —
    // pure integer, so both engines bucket identically with no
    // floating log2 edge cases. This histogram is what you consult
    // before choosing a context length: what fraction of docs truncate
    // at 2^k, how many pad. Tokenization is row-local; one map-side-
    // combinable shuffle on (source, bucket).
    "text_seqlen_profile" -> Query(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("source"), size(cleanToks).cast("long").as("n_tok"))
          .withColumn("len_bucket", length(bin(col("n_tok"))).cast("long"))
          .groupBy(col("source"), col("len_bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("sum_tokens"),
            min(col("n_tok")).as("min_tokens"),
            max(col("n_tok")).as("max_tokens")),
      Some("""WITH t AS (SELECT source,
             |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tok
             |  FROM documents)
             |SELECT source, CAST(length(bin(n_tok)) AS BIGINT) AS len_bucket,
             |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
             |  MIN(n_tok) AS min_tokens, MAX(n_tok) AS max_tokens
             |FROM t GROUP BY 1, 2""".stripMargin)
    ),

    // Duplicate n-gram coverage — the cross-document repetition signal
    // web-scale curation pipelines gate on (what fraction of this
    // doc's 5-gram instances also appear in ANOTHER doc?): boilerplate,
    // mirrored pages, and template spam score high while unique prose
    // scores low. Shingling is row-local codegen; the only data-sized
    // exchanges are the equi-join/agg on the 60-bit shingle hash —
    // O(n·shingles), never pairwise over docs, so the plan is the same
    // at 100 TB (where this signal is usually fed by the
    // dedup_minhash_lsh band tables it shares hashing with).
    "text_dup_ngram_coverage" -> Query(
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), cleanToks.as("t"))
          .filter(size(col("t")) >= 5)
        val inst = base.select(col("doc_id"),
          explode(graft.plans.TextExpressions.shingleHashes60(col("t"), 5)).as("sh"))
        val dfreq = inst.groupBy(col("sh"))
          .agg(countDistinct(col("doc_id")).as("df"))
        inst.join(dfreq, Seq("sh"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup"))
          .withColumn("dup_coverage",
            round(col("n_dup").cast("double") / col("n_shingles").cast("double"), 4))
      },
      Some("""WITH t AS (SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
             |  FROM documents),
             |b AS (SELECT doc_id, tk FROM t WHERE len(tk) >= 5),
             |i0 AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 4)) AS i FROM b),
             |inst AS (SELECT doc_id,
             |    CAST('0x' || substr(md5(array_to_string(list_slice(tk, i, i + 4), ' ')), 1, 15) AS BIGINT) AS sh
             |  FROM i0),
             |dfq AS (SELECT sh, COUNT(DISTINCT doc_id) AS df FROM inst GROUP BY 1)
             |SELECT i.doc_id, COUNT(*) AS n_shingles,
             |  CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
             |  ROUND(CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS dup_coverage
             |FROM inst i JOIN dfq USING (sh) GROUP BY 1""".stripMargin)
    ),

    // Hashing-trick vectorization: every doc becomes a dense 16-dim
    // bag-of-words count vector (dim = 32-bit token hash mod 16) —
    // the classic feature-hashing embedding for cheap classifiers and
    // clustering when a learned encoder is overkill. ENTIRELY
    // row-local (hash + bucket-count fold per row, emitted as csv for
    // cross-engine compare), so the plan is one scan with ZERO
    // shuffle (plan-pinned) — at 100 TB vectorization runs at scan
    // rate alongside the other per-doc signals.
    "text_hash_vectorize" -> Query(
      // counting runs in the native HashBucketCountsCsv expression (one
      // tight loop per row inside codegen) — the HOF form (16 filter()
      // passes over an md5 transform, all interpreted lambda frames)
      // measured ~3 s flat at sf0.1, 6x this formulation
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            size(cleanToks).cast("long").as("n_tokens"),
            graft.plans.TextExpressions.hashBucketCountsCsv(cleanToks, 16)
              .as("vec_csv")),
      Some("""WITH t AS (SELECT doc_id,
             |    len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS n_tok,
             |    list_transform(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''),
             |      x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) % 16) AS th
             |  FROM documents)
             |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
             |  array_to_string(list_transform(generate_series(0, 15),
             |    i -> CAST(len(list_filter(th, h -> h = i)) AS VARCHAR)), ',') AS vec_csv
             |FROM t""".stripMargin)
    ),

    // Vocabulary growth (Heaps/Herdan law) per source: token instances
    // N, distinct vocabulary V, type-token ratio, and the Herdan
    // exponent ln V / ln N — the corpus statistic that tells you
    // whether a source keeps contributing NEW vocabulary as it grows
    // (natural text: beta ~0.5-0.7) or is template spam re-emitting
    // the same tokens (beta -> 0). One explode + one shuffle on
    // (source, token) for the exact distinct; pairs with
    // text_zipf_slope in the corpus-statistics family.
    "text_vocab_growth" -> Query(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("source"), explode(cleanToks).as("tok"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_tokens"),
            countDistinct(col("tok")).as("vocab"))
          .select(col("source"), col("n_tokens"), col("vocab"),
            round(col("vocab").cast("double") / col("n_tokens").cast("double"), 6)
              .as("ttr"),
            round(log(col("vocab").cast("double"))
              / log(col("n_tokens").cast("double")), 6).as("herdan_beta")),
      Some("""WITH t AS (SELECT source,
             |    unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tok
             |  FROM documents)
             |SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS vocab,
             |  ROUND(CAST(COUNT(DISTINCT tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS ttr,
             |  ROUND(ln(CAST(COUNT(DISTINCT tok) AS DOUBLE))
             |    / ln(CAST(COUNT(*) AS DOUBLE)), 6) AS herdan_beta
             |FROM t GROUP BY 1""".stripMargin)
    ),

    // WINNOWING fingerprint selection (Schleimer/Wilkerson/Aiken,
    // SIGMOD 2003 — the MOSS algorithm): slide a w=4 window over the
    // 3-gram shingle hash stream and keep the window MINIMUM, rightmost
    // occurrence on ties. Guarantees every match of length >= w+k-1
    // shares a fingerprint while storing only ~2/(w+1) of the hashes —
    // the sub-document dedup index you can afford at 100 TB. The
    // rightmost-tie rule is folded into ONE integer key
    // (hash * 2^20 + (2^20-1 - pos)): min(key) picks min hash then max
    // pos, no struct ordering needed cross-engine. Per-doc windows run
    // inside the one doc_id-partitioned sort; output is integer counts
    // + the exact fingerprint-set sum.
    "text_winnowing" -> Query(
      (s, d) => {
        val sh = winnowKeyed(s, d)
        val win = winnowSelected(sh)
        val nsh = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
        win.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_windows"),
            countDistinct(col("fp")).as("n_fingerprints"),
            sum_distinct(col("fp")).as("fp_sum"))
          .join(nsh, Seq("doc_id"))
          .select(col("doc_id"), col("n_shingles"), col("n_windows"),
            col("n_fingerprints"), col("fp_sum"))
      },
      Some(s"""WITH $winnowCteSql,
             |nsh AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY 1)
             |SELECT v.doc_id, nsh.n_shingles, COUNT(*) AS n_windows,
             |  COUNT(DISTINCT fp) AS n_fingerprints, CAST(SUM(DISTINCT fp) AS BIGINT) AS fp_sum
             |FROM v JOIN nsh ON v.doc_id = nsh.doc_id
             |GROUP BY v.doc_id, nsh.n_shingles""".stripMargin)
    ),

    // WINNOWING-PAIR dedup — the index in use: two docs sharing >= 2
    // selected fingerprint HASHES are sub-document near-dup candidates
    // (winnowing guarantees any shared run of >= w+k-1 tokens selects a
    // common fingerprint, so this is the guaranteed-recall analog of
    // random MinHash banding at ~2/(w+1) index density). Candidate
    // generation is an equi-join on the fingerprint hash — O(n·density),
    // never all-pairs, hot fingerprints bounded like hot shingles.
    "dedup_winnowing_pairs" -> Query(
      (s, d) => {
        val fps = graft.Caches.scoped(
          winnowSelected(winnowKeyed(s, d))
            .select(col("doc_id"), expr("fp div 1048576").as("fh"))
            .distinct())
        fps.as("a")
          .join(fps.as("b"),
            col("a.fh") === col("b.fh") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
      },
      Some(s"""WITH $winnowCteSql,
             |fh AS (SELECT DISTINCT doc_id, fp // 1048576 AS fh FROM v)
             |SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n_shared
             |FROM fh a JOIN fh b ON a.fh = b.fh AND a.doc_id < b.doc_id
             |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin)
    ),

    // CORPUS NOVELTY per document — what fraction of a doc's 3-gram
    // shingles has NEVER appeared in an earlier doc (first-occurrence
    // attribution by min doc_id over the shared shingle index): the
    // ingestion-order novelty curve dedup-aware sampling reads — a
    // crawl whose tail is all re-hashes of the head shows novelty
    // collapsing to boilerplate-only. One groupBy over the
    // materialized shingle index + one hash equi-join back; integer
    // basis points.
    "text_ngram_novelty" -> Query(
      (s, d) => {
        val sh = graft.Caches.scoped(
          graft.dedup.DedupQueries.shingleHash60Rows(s, d))
        val first = sh.groupBy(col("shh")).agg(min(col("doc_id")).as("fd"))
        sh.join(first, Seq("shh"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum((col("fd") === col("doc_id")).cast("long")).as("n_novel"))
          .select(col("doc_id"), col("n_shingles"), col("n_novel"),
            expr("n_novel * 10000 div n_shingles").as("novel_bp"))
      },
      Some(s"""WITH ${graft.dedup.DedupQueries.shingleHashCte},
             |fx AS (SELECT shh, MIN(doc_id) AS fd FROM shx0 GROUP BY 1)
             |SELECT s.doc_id, COUNT(*) AS n_shingles,
             |  CAST(SUM(CASE WHEN fx.fd = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
             |  CAST(SUM(CASE WHEN fx.fd = s.doc_id THEN 1 ELSE 0 END) * 10000
             |    // COUNT(*) AS BIGINT) AS novel_bp
             |FROM shx0 s JOIN fx USING (shh) GROUP BY 1""".stripMargin)
    ),

    // FUZZY benchmark decontamination — the near-duplicate completion
    // of text_decontaminate's exact 8-gram collision test: a training
    // doc that paraphrases an eval doc (reordered sentences, light
    // edits) shares few exact 8-grams but keeps high shingle Jaccard.
    // Candidates come from the SAME MinHash band index the dedup family
    // uses (16 sigs, 8 bands x 2 — one banded equi-join, never
    // all-pairs); candidates are then VERIFIED with the exact integer
    // Jaccard rule 3*inter >= na + nb (J >= 0.5) so no float threshold
    // crosses the engine boundary. Per training doc: candidate count,
    // confirmed count, contaminated verdict.
    "text_decontaminate_fuzzy" -> Query(
      (s, d) => {
        val bands = graft.Caches.scoped(graft.dedup.DedupQueries.bandTable(s, d))
        val cand = bands.filter(col("doc_id") % 20 =!= 0).as("a")
          .join(bands.filter(col("doc_id") % 20 === 0).as("b"),
            col("a.band_idx") === col("b.band_idx") && col("a.bkey") === col("b.bkey"))
          .select(col("a.doc_id").as("train"), col("b.doc_id").as("eval"))
          .distinct()
        val sh = graft.Caches.scoped(graft.dedup.DedupQueries.shingleHash60Rows(s, d))
        val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val inter = cand
          .join(sh.select(col("doc_id").as("train"), col("shh")), Seq("train"))
          .join(sh.select(col("doc_id").as("eval"), col("shh")), Seq("eval", "shh"))
          .groupBy(col("train"), col("eval")).agg(count(lit(1)).as("inter"))
        val ver = cand
          .join(inter, Seq("train", "eval"), "left")
          .join(sz.select(col("doc_id").as("train"), col("n").as("na")), Seq("train"))
          .join(sz.select(col("doc_id").as("eval"), col("n").as("nb")), Seq("eval"))
          .select(col("train"),
            (coalesce(col("inter"), lit(0L)) * 3 >= col("na") + col("nb"))
              .cast("long").as("hit"))
        val per = ver.groupBy(col("train").as("doc_id"))
          .agg(count(lit(1)).as("n_candidates"), sum(col("hit")).as("n_confirmed"))
        Tables.documents(s, d).filter(col("doc_id") % 20 =!= 0)
          .select(col("doc_id"))
          .join(per, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
            coalesce(col("n_confirmed"), lit(0L)).as("n_confirmed"),
            (coalesce(col("n_confirmed"), lit(0L)) > 0).cast("long").as("contaminated"))
      },
      Some(s"""WITH ${graft.dedup.DedupQueries.bandsCteSql},
             |cd AS (SELECT DISTINCT a.doc_id AS train, b.doc_id AS eval
             |       FROM bd a JOIN bd b ON a.band_idx = b.band_idx AND a.bkey = b.bkey
             |       WHERE a.doc_id % 20 <> 0 AND b.doc_id % 20 = 0),
             |shr AS (SELECT DISTINCT doc_id,
             |    CAST('0x' || substr(md5(concat_ws(' ', tk[i], tk[i+1], tk[i+2])), 1, 15) AS BIGINT) AS s
             |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk)-2)) AS i FROM td)),
             |sz AS (SELECT doc_id, COUNT(*) AS n FROM shr GROUP BY 1),
             |itr AS (SELECT cd.train, cd.eval, COUNT(*) AS inter
             |        FROM cd JOIN shr a ON a.doc_id = cd.train
             |                JOIN shr b ON b.doc_id = cd.eval AND b.s = a.s
             |        GROUP BY 1, 2),
             |ver AS (SELECT cd.train,
             |          CAST(COALESCE(itr.inter, 0) * 3 >= sa.n + sb.n AS BIGINT) AS hit
             |        FROM cd
             |        LEFT JOIN itr ON itr.train = cd.train AND itr.eval = cd.eval
             |        JOIN sz sa ON sa.doc_id = cd.train
             |        JOIN sz sb ON sb.doc_id = cd.eval),
             |per AS (SELECT train AS doc_id, COUNT(*) AS n_candidates, SUM(hit) AS n_confirmed
             |        FROM ver GROUP BY 1)
             |SELECT d.doc_id, COALESCE(per.n_candidates, 0) AS n_candidates,
             |  CAST(COALESCE(per.n_confirmed, 0) AS BIGINT) AS n_confirmed,
             |  CAST(COALESCE(per.n_confirmed, 0) > 0 AS BIGINT) AS contaminated
             |FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
             |LEFT JOIN per USING (doc_id)""".stripMargin)
    ),

    // DSIR importance weights (Xie et al., NeurIPS 2023): rank raw
    // documents by how target-like they are under HASHED n-gram bucket
    // models — the published recipe for selecting pretraining data that
    // matches a high-quality target distribution without training a
    // classifier. Target = the English slice; features = 1024 hashed
    // unigram buckets; weight = mean per-token log-likelihood ratio
    // ln p_target / p_raw with add-one smoothing. Every ln argument is
    // a PRODUCT OF INTEGERS ((ct+1)*(Nr+1024) vs (cr+1)*(Nt+1024)) so
    // both engines feed ln identical doubles; per-doc sums ride
    // DECIMAL(18,12). The bucket models are 1024-row broadcasts; the
    // data-sized work is one token explode + one (doc, bucket) agg.
    "text_dsir_weight" -> Query(
      (s, d) =>
        dsirScored(s, d).select(col("doc_id"), col("n_tokens"), col("dsir_logratio"),
          (col("dsir_logratio") > 0).cast("long").as("keep")),
      Some(s"""WITH $dsirCteSql
             |SELECT doc_id, n_tokens, dsir_logratio,
             |  CAST(dsir_logratio > 0 AS BIGINT) AS keep
             |FROM sc""".stripMargin)
    ),

    // DSIR importance SAMPLING — the selection step that consumes the
    // weights: per-doc acceptance probability in integer basis points
    // (5000 + 5000·weight, clamped to [0, 10000] — target-like docs
    // oversample, off-target docs undersample), decided by the
    // deterministic md5 coin every sampler in the repo uses
    // (hash < accept_bp). The clamp and coin are pure integer
    // arithmetic on the ROUNDED weight, so the verdict column — the
    // thing a resampled corpus is built from — hash-checks exactly.
    "pipeline_dsir_sample" -> Query(
      (s, d) =>
        dsirScored(s, d)
          .select(col("doc_id"), col("dsir_logratio"),
            least(lit(10000L), greatest(lit(0L),
              lit(5000L) + floor(col("dsir_logratio") * 5000 + 0.5).cast("long")))
              .as("accept_bp"),
            (graft.functions.Hashing.md5Long32(
              concat(lit("dsirs_"), col("doc_id").cast("string"))) % 10000)
              .as("coin"))
          .withColumn("kept", (col("coin") < col("accept_bp")).cast("long")),
      Some(s"""WITH $dsirCteSql
             |SELECT doc_id, dsir_logratio,
             |  LEAST(10000, GREATEST(0,
             |    5000 + CAST(floor(dsir_logratio * 5000 + 0.5) AS BIGINT))) AS accept_bp,
             |  CAST('0x' || substr(md5('dsirs_' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000 AS coin,
             |  CAST(CAST('0x' || substr(md5('dsirs_' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000
             |    < LEAST(10000, GREATEST(0,
             |        5000 + CAST(floor(dsir_logratio * 5000 + 0.5) AS BIGINT))) AS BIGINT) AS kept
             |FROM sc""".stripMargin)
    ),

    // CODE-LIKENESS gate — the prose/code split every pretraining
    // mixture needs before weighting code separately: per doc, the
    // density of code-class symbols ({}();=<>), digits, and 2-space
    // indented lines, all as integer basis points (counts via
    // length-minus-stripped, the regexp trick both engines evaluate
    // identically), with an integer-threshold verdict. Row-local — one
    // scan, no shuffle.
    "text_code_ratio" -> Query(
      (s, d) => {
        val n = length(col("text"))
        val sym = n - length(regexp_replace(col("text"), "[{}();=<>]", ""))
        val dig = n - length(regexp_replace(col("text"), "[0-9]", ""))
        val lines = split(col("text"), "\n")
        val indented = size(filter(lines, l => l.startsWith("  ")))
        Tables.documents(s, d)
          .select(col("doc_id"), n.cast("long").as("n_chars_m"),
            sym.cast("long").as("n_symbols"), dig.cast("long").as("n_digits"),
            size(lines).cast("long").as("n_lines"),
            indented.cast("long").as("n_indented"))
          .filter(col("n_chars_m") > 0)
          .select(col("doc_id"), col("n_chars_m"), col("n_symbols"), col("n_digits"),
            col("n_lines"), col("n_indented"),
            expr("n_symbols * 10000 div n_chars_m").as("symbol_bp"),
            expr("n_digits * 10000 div n_chars_m").as("digit_bp"))
          .withColumn("code_like",
            (col("symbol_bp") >= 300 || col("n_indented") * 2 > col("n_lines"))
              .cast("long"))
      },
      Some("""WITH c AS (SELECT doc_id, length(text) AS n_chars_m,
             |    length(text) - length(regexp_replace(text, '[{}();=<>]', '', 'g')) AS n_symbols,
             |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
             |    len(string_split(text, chr(10))) AS n_lines,
             |    len(list_filter(string_split(text, chr(10)), l -> l LIKE '  %')) AS n_indented
             |  FROM documents)
             |SELECT doc_id, CAST(n_chars_m AS BIGINT) AS n_chars_m,
             |  CAST(n_symbols AS BIGINT) AS n_symbols, CAST(n_digits AS BIGINT) AS n_digits,
             |  CAST(n_lines AS BIGINT) AS n_lines, CAST(n_indented AS BIGINT) AS n_indented,
             |  CAST(n_symbols * 10000 // n_chars_m AS BIGINT) AS symbol_bp,
             |  CAST(n_digits * 10000 // n_chars_m AS BIGINT) AS digit_bp,
             |  CAST(n_symbols * 10000 // n_chars_m >= 300 OR n_indented * 2 > n_lines AS BIGINT) AS code_like
             |FROM c WHERE n_chars_m > 0""".stripMargin)
    ),

    // TOKENIZER FERTILITY per language — the subword-economics metric
    // (REAL BPE tokens per whitespace word) that decides how a
    // multilingual mixture's token budget is really spent: languages
    // the tokenizer fragments (fertility >> 1) cost more context per
    // word. Per-doc counts come from the shared materialized
    // Bpe.ntokTable (one corpus encode per dir, amortized over the
    // token-budget family); the oracle replays the TRAINING loop in a
    // recursive CTE, so the merge table never crosses as a literal.
    "text_tokenizer_fertility" -> Query(
      (s, d) => {
        val perDoc = Bpe.ntokTable(s, d)
          .select(col("doc_id"), col("n_words").as("w"), col("n_bpe").as("t"))
        Tables.documents(s, d).select(col("doc_id"), col("lang"))
          .join(perDoc, Seq("doc_id"), "left")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("w"), lit(0L))).as("n_words"),
            sum(coalesce(col("t"), lit(0L))).as("n_bpe"))
          .filter(col("n_words") > 0)
          .select(col("lang"), col("n_docs"), col("n_words"), col("n_bpe"),
            expr("n_bpe * 10000 div n_words").as("fertility_bp"))
      },
      Some(s"""WITH RECURSIVE ${Bpe.wordTokensCteSql},
             |dw AS (SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
             |                  x -> x <> '')) AS word FROM documents),
             |pd AS (SELECT doc_id, COUNT(*) AS w, SUM(wt.nt) AS t
             |       FROM dw JOIN wt USING (word) GROUP BY 1),
             |g AS (SELECT lang, COUNT(*) AS n_docs,
             |        CAST(SUM(COALESCE(pd.w, 0)) AS BIGINT) AS n_words,
             |        CAST(SUM(COALESCE(pd.t, 0)) AS BIGINT) AS n_bpe
             |      FROM documents LEFT JOIN pd USING (doc_id) GROUP BY 1)
             |SELECT lang, n_docs, n_words, n_bpe,
             |  CAST(n_bpe * 10000 // n_words AS BIGINT) AS fertility_bp
             |FROM g WHERE n_words > 0""".stripMargin)
    ),

    // REAL BPE TOKENIZATION per document: greedy-merge training over
    // the corpus word-frequency table (Sennrich 2016; graft.text.Bpe,
    // driver-side over the vocab-bounded word counts, memoized like
    // the k-means centroids), then per-doc token budgets read from
    // the shared materialized Bpe.ntokTable (one distinct-word encode
    // + broadcast per dir, so encoder cost is O(vocab), paid once for
    // the whole token-budget family, not per query). The oracle
    // replays the entire training loop in a recursive CTE over
    // separator-framed word states (one `replace` per merge rank) —
    // byte-identical segmentation, no interpolated merge table.
    "text_bpe_tokenize" -> Query(
      (s, d) =>
        Bpe.ntokTable(s, d)
          .select(col("doc_id"), col("n_words"),
            col("n_bpe").as("n_bpe_tokens"),
            expr("n_bpe * 10000 div n_words").as("fertility_bp")),
      Some(s"""WITH RECURSIVE ${Bpe.wordTokensCteSql},
             |dw AS (SELECT doc_id, unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
             |                  x -> x <> '')) AS word FROM documents)
             |SELECT doc_id, COUNT(*) AS n_words, CAST(SUM(wt.nt) AS BIGINT) AS n_bpe_tokens,
             |  CAST(SUM(wt.nt) * 10000 // COUNT(*) AS BIGINT) AS fertility_bp
             |FROM dw JOIN wt USING (word) GROUP BY 1""".stripMargin)
    ),

    // TOKENIZER HEALTH report per language — the dashboard a
    // multilingual tokenizer ships with: fertility (BPE tokens per
    // word) plus the UNCOMPRESSED share (word instances whose
    // segmentation is still one token per character — the tokenizer
    // did nothing for them; a high share flags a language the merges
    // never learned). Reads the shared Bpe.ntokTable like
    // text_bpe_tokenize (per-doc n_unc pre-counted at build time), so
    // health adds one lang join over the buckets — zero corpus scans.
    "text_tokenizer_health" -> Query(
      (s, d) => {
        val perDoc = Bpe.ntokTable(s, d)
        Tables.documents(s, d).select(col("doc_id"), col("lang"))
          .join(perDoc, Seq("doc_id"))
          .groupBy(col("lang"))
          .agg(sum(col("n_words")).as("n_words"), sum(col("n_bpe")).as("n_bpe"),
            sum(col("n_unc")).as("n_uncompressed"))
          .filter(col("n_words") > 0)
          .select(col("lang"), col("n_words"), col("n_bpe"),
            expr("n_bpe * 10000 div n_words").as("fertility_bp"),
            expr("n_uncompressed * 10000 div n_words").as("uncompressed_bp"))
      },
      Some(s"""WITH RECURSIVE ${Bpe.wordTokensCteSql},
             |dw AS (SELECT lang, unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
             |                  x -> x <> '')) AS word FROM documents)
             |SELECT lang, COUNT(*) AS n_words, CAST(SUM(wt.nt) AS BIGINT) AS n_bpe,
             |  CAST(SUM(wt.nt) * 10000 // COUNT(*) AS BIGINT) AS fertility_bp,
             |  CAST(SUM(CASE WHEN wt.nt = length(wt.word) THEN 1 ELSE 0 END) * 10000
             |    // COUNT(*) AS BIGINT) AS uncompressed_bp
             |FROM dw JOIN wt USING (word) GROUP BY 1""".stripMargin)
    ),

    // TOKENIZER VOCAB EXPORT — the trained merge table as a dataset:
    // (rank, lhs, rhs, merged) per learned merge, the artifact a
    // serving stack ships to every encoder. The Spark side emits the
    // driver-trained model (a bounded artifact, like the k-means
    // centroid export); the oracle re-derives the SAME table by
    // replaying training in the recursive CTE and reading each
    // iteration's chosen pair — so the gate cross-checks the full
    // greedy trainer (pair counting, weighting, tie-breaks, stop
    // rule) between the JVM and SQL implementations.
    "text_bpe_vocab" -> Query(
      (s, d) => {
        val rows = Bpe.trained(s, d).merges.zipWithIndex.map {
          case ((a, b), i) => ((i + 1).toLong, a, b, a + b)
        }
        s.createDataFrame(rows).toDF("rank", "lhs", "rhs", "merged")
      },
      Some(s"""WITH RECURSIVE ${Bpe.wordTokensCteSql}
             |SELECT DISTINCT CAST(it AS BIGINT) AS rank, ma AS lhs, mb AS rhs,
             |  ma || mb AS merged
             |FROM tr WHERE it >= 1""".stripMargin)
    ),

    // RAKE keyword extraction — the classic unsupervised keyphrase
    // ranker (Rose et al. 2010): candidate phrases are maximal runs of
    // non-stopword tokens, a word scores degree/frequency (degree =
    // summed length of the phrases it appears in), a phrase scores the
    // sum of its words' scores. Word scores are kept INTEGER
    // (deg*1e6 div freq) so the phrase ranking is exact — float
    // near-ties can't reorder the top-k across engines. Phrase ids are
    // a running stopword count per doc (one window over positions);
    // phrase text reassembles via array_sort so collect_list order
    // never matters; the global top-20 shortlists via orderBy+limit
    // (TakeOrderedAndProject) before the rank window touches anything.
    "text_keyword_rake" -> Query(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val stop = TextFunctions.stopwords("en")
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val marked = Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(TextFunctions.cleanTokens(lower(col("text")))).as(Seq("pos", "t")))
          .withColumn("isstop", col("t").isin(stop: _*).cast("long"))
          .withColumn("pid", sum(col("isstop")).over(w))
        val words = graft.Caches.scoped(marked.filter(col("isstop") === 0)
          .select(col("doc_id"), col("pid"), col("pos"), col("t")))
        val plen = words.groupBy(col("doc_id"), col("pid"))
          .agg(count(lit(1)).as("plen"))
        val wscore = words.join(plen, Seq("doc_id", "pid"))
          .groupBy(col("t"))
          .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
          .select(col("t"), expr("deg * 1000000 div freq").as("wscore"))
        val phrases = words.join(wscore, Seq("t"))
          .groupBy(col("doc_id"), col("pid"))
          .agg(sum(col("wscore")).as("score"),
            concat_ws(" ", transform(
              array_sort(collect_list(struct(col("pos"), col("t")))),
              x => x.getField("t"))).as("phrase"))
        phrases.groupBy(col("phrase"))
          .agg(count(lit(1)).as("n_occ"), max(col("score")).as("score"))
          .orderBy(col("score").desc, col("phrase")).limit(20)
          .withColumn("rn", row_number().over(
            Window.orderBy(col("score").desc, col("phrase"))).cast("long"))
      },
      Some(s"""WITH tk0 AS (SELECT doc_id, $lowToksSql AS ls FROM documents),
             |tk AS (SELECT doc_id, i AS pos, ls[i] AS t
             |       FROM (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i FROM tk0)),
             |m AS (SELECT doc_id, pos, t,
             |        CASE WHEN t IN (${TextFunctions.stopwords("en").map(x => s"'$x'").mkString(", ")})
             |          THEN 1 ELSE 0 END AS isstop FROM tk),
             |p AS (SELECT doc_id, pos, t, isstop,
             |        SUM(isstop) OVER (PARTITION BY doc_id ORDER BY pos) AS pid FROM m),
             |wrds AS (SELECT doc_id, pid, pos, t FROM p WHERE isstop = 0),
             |pl AS (SELECT doc_id, pid, COUNT(*) AS plen FROM wrds GROUP BY 1, 2),
             |wsc AS (SELECT t, CAST(SUM(plen) * 1000000 // COUNT(*) AS BIGINT) AS wscore
             |        FROM wrds JOIN pl USING (doc_id, pid) GROUP BY t),
             |ph AS (SELECT wrds.doc_id, wrds.pid, CAST(SUM(wscore) AS BIGINT) AS score,
             |         string_agg(t, ' ' ORDER BY pos) AS phrase
             |       FROM wrds JOIN wsc USING (t) GROUP BY 1, 2),
             |g AS (SELECT phrase, COUNT(*) AS n_occ, MAX(score) AS score FROM ph GROUP BY 1),
             |r AS (SELECT phrase, n_occ, score,
             |        ROW_NUMBER() OVER (ORDER BY score DESC, phrase) AS rn FROM g)
             |SELECT phrase, n_occ, score, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 20""".stripMargin)
    ),

    // LICENSE / COMPLIANCE flags — the legal pre-filter a pretraining
    // corpus runs before anything else: per doc, occurrence counts of
    // license-signal phrases (case-insensitive literal classes, counted
    // via the length-minus-replaced trick divided by phrase length so
    // both engines count identically) and an any-hit verdict. Row-local
    // regexp work in the scan, zero shuffle.
    "text_license_flags" -> Query(
      (s, d) => {
        val lo = lower(col("text"))
        def hits(phrase: String): Column =
          ((length(lo) - length(regexp_replace(lo, phrase, "")))
            / phrase.length).cast("long")
        Tables.documents(s, d)
          .select(col("doc_id"),
            hits("copyright").as("n_copyright"),
            hits("all rights reserved").as("n_rights"),
            hits("license").as("n_license"),
            hits("creative commons").as("n_cc"))
          .withColumn("flagged",
            (col("n_copyright") + col("n_rights") + col("n_license") + col("n_cc") > 0)
              .cast("long"))
      },
      Some("""SELECT doc_id,
             |  CAST((length(lower(text)) - length(replace(lower(text), 'copyright', ''))) // 9 AS BIGINT) AS n_copyright,
             |  CAST((length(lower(text)) - length(replace(lower(text), 'all rights reserved', ''))) // 19 AS BIGINT) AS n_rights,
             |  CAST((length(lower(text)) - length(replace(lower(text), 'license', ''))) // 7 AS BIGINT) AS n_license,
             |  CAST((length(lower(text)) - length(replace(lower(text), 'creative commons', ''))) // 16 AS BIGINT) AS n_cc,
             |  CAST((length(lower(text)) - length(replace(lower(text), 'copyright', ''))) // 9
             |     + (length(lower(text)) - length(replace(lower(text), 'all rights reserved', ''))) // 19
             |     + (length(lower(text)) - length(replace(lower(text), 'license', ''))) // 7
             |     + (length(lower(text)) - length(replace(lower(text), 'creative commons', ''))) // 16
             |     > 0 AS BIGINT) AS flagged
             |FROM documents""".stripMargin)
    ),

    // SOURCE KL DIVERGENCE — per-source distribution drift vs the
    // corpus: KL(source ‖ corpus) over unigram distributions, the
    // information-theoretic "how unlike the rest is this feed" score
    // that flags a source gone template-spam or off-domain before it
    // skews a mixture. Every ln argument is a PRODUCT OF INTEGER
    // counts (c_s·N vs c·N_s), weighted sums ride DECIMAL(26,12)
    // (term sums exceed the (18,12) integer headroom), one division
    // by N_s at the end. Two shrinking aggs + one term join.
    "text_source_kl" -> Query(
      (s, d) => {
        val t = Tables.documents(s, d).select(col("source"),
          explode(TextFunctions.cleanTokens(lower(col("text")))).as("term"))
        val ts = t.groupBy(col("source"), col("term")).agg(count(lit(1)).as("cs"))
        val tc = t.groupBy(col("term")).agg(count(lit(1)).as("c"))
        val ns = t.groupBy(col("source")).agg(count(lit(1)).as("ns"))
        val tot = t.agg(count(lit(1)).as("n"))
        ts.join(tc, Seq("term"))
          .join(broadcast(ns), Seq("source"))
          .crossJoin(broadcast(tot))
          .groupBy(col("source"), col("ns"))
          .agg(sum((col("cs").cast("double") *
              (log((col("cs") * col("n")).cast("double"))
                - log((col("c") * col("ns")).cast("double"))))
            .cast("decimal(26,12)")).as("skl"))
          .select(col("source"), col("ns").as("n_tokens"),
            round(col("skl").cast("double") / col("ns"), 4).as("kl_div"))
      },
      Some(s"""WITH t AS (SELECT source, unnest($lowToksSql) AS term FROM documents),
             |ts AS (SELECT source, term, COUNT(*) AS cs FROM t GROUP BY 1, 2),
             |tc AS (SELECT term, COUNT(*) AS c FROM t GROUP BY 1),
             |ns AS (SELECT source, COUNT(*) AS ns FROM t GROUP BY 1),
             |tot AS (SELECT COUNT(*) AS n FROM t)
             |SELECT ts.source, CAST(ns.ns AS BIGINT) AS n_tokens,
             |  ROUND(CAST(SUM(CAST(CAST(cs AS DOUBLE) *
             |      (ln(CAST(cs * tot.n AS DOUBLE)) - ln(CAST(tc.c * ns.ns AS DOUBLE)))
             |    AS DECIMAL(26,12))) AS DOUBLE) / ns.ns, 4) AS kl_div
             |FROM ts JOIN tc USING (term) JOIN ns USING (source) CROSS JOIN tot
             |GROUP BY ts.source, ns.ns""".stripMargin)
    ),

    // SHINGLE NOVELTY — the per-document "how much of this is new to
    // the corpus" gate (doc_id order = ingest order): fraction of a
    // doc's distinct 3-gram shingles whose corpus-wide FIRST occurrence
    // is this doc. A crawl re-emitting mostly-seen text scores near 0
    // and can be dropped before the expensive dedup passes run. First
    // occurrence is a map-side-combinable MIN per shingle (the
    // dedup_paragraphs election, at shingle grain); novelty_bp stays
    // integer. Shares the string-free shingleHash60Rows index with the
    // dedup family — row-local hashing, then two shuffles (shingle MIN
    // + doc rollup) over 8-byte keys.
    "text_shingle_novelty" -> Query(
      (s, d) => {
        val sh = graft.Caches.scoped(graft.dedup.DedupQueries.shingleHash60Rows(s, d))
        val first = sh.groupBy(col("shh")).agg(min(col("doc_id")).as("fd"))
        sh.join(first, Seq("shh"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum((col("fd") === col("doc_id")).cast("long")).as("n_novel"))
          .select(col("doc_id"), col("n_shingles"), col("n_novel"),
            expr("n_novel * 10000 div n_shingles").as("novelty_bp"))
      },
      Some("""WITH t AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS tk
             |          FROM documents),
             |td AS (SELECT doc_id, tk FROM t WHERE len(tk) >= 3),
             |shr AS (SELECT DISTINCT doc_id,
             |    CAST('0x' || substr(md5(concat_ws(' ', tk[i], tk[i+1], tk[i+2])), 1, 15) AS BIGINT) AS s
             |  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk)-2)) AS i FROM td)),
             |f AS (SELECT s, MIN(doc_id) AS fd FROM shr GROUP BY 1)
             |SELECT shr.doc_id, COUNT(*) AS n_shingles,
             |  CAST(SUM(CAST(f.fd = shr.doc_id AS BIGINT)) AS BIGINT) AS n_novel,
             |  CAST(SUM(CAST(f.fd = shr.doc_id AS BIGINT)) * 10000 // COUNT(*) AS BIGINT) AS novelty_bp
             |FROM shr JOIN f ON f.s = shr.s
             |GROUP BY shr.doc_id""".stripMargin)
    ),

    // HAPAX RATIO per source — the vocabulary-tail health check a
    // tokenizer/mixture review runs: what share of each source's
    // vocabulary occurs exactly once (hapax) or twice (dis legomena)?
    // A boilerplate-heavy or template-generated source shows a
    // collapsed tail (low hapax share); OCR noise shows an inflated
    // one. Two map-side-combinable shuffles — (source, token) counts,
    // then the per-source rollup — integer-bp ratios, no floats.
    "text_hapax_ratio" -> Query(
      (s, d) => {
        val tc = Tables.documents(s, d)
          .select(col("source"), explode(cleanToks).as("tok"))
          .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
        tc.groupBy(col("source"))
          .agg(sum(col("c")).as("n_tokens"),
            count(lit(1)).as("vocab"),
            sum((col("c") === 1).cast("long")).as("hapax"),
            sum((col("c") === 2).cast("long")).as("dis"))
          .select(col("source"), col("n_tokens"), col("vocab"),
            col("hapax"), col("dis"),
            expr("hapax * 10000 div vocab").as("hapax_bp"),
            expr("dis * 10000 div vocab").as("dis_bp"))
      },
      Some("""WITH t AS (SELECT source,
             |    unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tok
             |  FROM documents),
             |tc AS (SELECT source, tok, COUNT(*) AS c FROM t GROUP BY 1, 2)
             |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens, COUNT(*) AS vocab,
             |  CAST(SUM(CAST(c = 1 AS BIGINT)) AS BIGINT) AS hapax,
             |  CAST(SUM(CAST(c = 2 AS BIGINT)) AS BIGINT) AS dis,
             |  CAST(SUM(CAST(c = 1 AS BIGINT)) * 10000 // COUNT(*) AS BIGINT) AS hapax_bp,
             |  CAST(SUM(CAST(c = 2 AS BIGINT)) * 10000 // COUNT(*) AS BIGINT) AS dis_bp
             |FROM tc GROUP BY 1""".stripMargin)
    ),

    // LANGUAGE-ID CONFUSION MATRIX — declared `lang` metadata vs the
    // n-gram langId prediction, the audit that decides whether the
    // upstream metadata or the heuristic gets trusted per language.
    // Re-uses text_langid's exact decision rule; the matrix is a
    // |langs|^2 map-side-combinable count plus a broadcast row-total
    // attach — per-row integer-bp shares, nothing driver-side.
    "text_langid_confusion" -> Query(
      (s, d) => {
        val cm = Tables.documents(s, d)
          .select(col("lang"), TextFunctions.langId(col("text")).as("lang_pred"))
          .groupBy(col("lang"), col("lang_pred")).agg(count(lit(1)).as("n"))
        val tot = cm.groupBy(col("lang")).agg(sum(col("n")).as("n_lang"))
        cm.join(broadcast(tot), Seq("lang"))
          .select(col("lang"), col("lang_pred"), col("n"),
            expr("n * 10000 div n_lang").as("row_bp"),
            (col("lang") === col("lang_pred")).cast("long").as("agree"))
      },
      Some(s"""WITH h AS (SELECT lang,
             |  ${hitsSql("en")} AS en_hits,
             |  ${hitsSql("fr")} AS fr_hits,
             |  ${hitsSql("es")} AS es_hits,
             |  ${hitsSql("de")} AS de_hits,
             |  len(regexp_extract_all(text, '${TextFunctions.zhChars.mkString("|")}')) AS zh_hits
             |FROM documents),
             |p AS (SELECT lang,
             |  CASE WHEN en_hits >= fr_hits AND en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= zh_hits THEN 'en'
             |       WHEN fr_hits >= es_hits AND fr_hits >= de_hits AND fr_hits >= zh_hits THEN 'fr'
             |       WHEN es_hits >= de_hits AND es_hits >= zh_hits THEN 'es'
             |       WHEN de_hits >= zh_hits THEN 'de'
             |       ELSE 'zh' END AS lang_pred
             |  FROM h),
             |cm AS (SELECT lang, lang_pred, COUNT(*) AS n FROM p GROUP BY 1, 2),
             |t AS (SELECT lang, SUM(n) AS n_lang FROM cm GROUP BY 1)
             |SELECT cm.lang, cm.lang_pred, cm.n,
             |  CAST(cm.n * 10000 // t.n_lang AS BIGINT) AS row_bp,
             |  CAST(cm.lang = cm.lang_pred AS BIGINT) AS agree
             |FROM cm JOIN t USING (lang)""".stripMargin)
    ),

    // HEAD-COVERAGE CURVE — what share of all token mass the top
    // 10 / 100 / 1000 vocabulary types carry: the head-heaviness
    // number (complement of text_zipf_slope) that sizes stopword
    // lists and predicts compression/dedup yield. The top-1000 slice
    // comes from orderBy+limit (TakeOrderedAndProject — per-partition
    // heaps, never a global sort of the vocabulary); the cumulative
    // window then runs over <= 1000 rows, a constant regardless of
    // corpus size. Integer-bp, deterministic (count desc, token asc).
    "text_head_coverage" -> Query(
      (s, d) => {
        val tc = Tables.documents(s, d)
          .select(explode(cleanToks).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val tot = tc.agg(sum(col("c")).as("total_tokens"))
        val top = tc.orderBy(col("c").desc, col("tok")).limit(1000)
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("tok"))
        top
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("cum", sum(col("c")).over(w))
          .filter(col("rn").isin(10L, 100L, 1000L))
          .crossJoin(broadcast(tot))
          .select(col("rn").as("rank"), col("cum").as("cum_tokens"),
            col("total_tokens"),
            expr("cum * 10000 div total_tokens").as("coverage_bp"))
      },
      Some("""WITH tc AS (SELECT tok, COUNT(*) AS c FROM (
             |    SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tok
             |    FROM documents) GROUP BY 1),
             |tot AS (SELECT SUM(c) AS total_tokens FROM tc),
             |top AS (SELECT tok, c FROM tc ORDER BY c DESC, tok LIMIT 1000),
             |r AS (SELECT c,
             |        ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rn,
             |        SUM(c) OVER (ORDER BY c DESC, tok) AS cum
             |      FROM top)
             |SELECT CAST(rn AS BIGINT) AS rank, CAST(cum AS BIGINT) AS cum_tokens,
             |  CAST(total_tokens AS BIGINT) AS total_tokens,
             |  CAST(cum * 10000 // total_tokens AS BIGINT) AS coverage_bp
             |FROM r CROSS JOIN tot WHERE rn IN (10, 100, 1000)""".stripMargin)
    ),

    // CHARACTER-CLASS PROFILE per source — lower/upper/digit/space/
    // other shares of the raw character stream: the cheapest corpus
    // fingerprint (code vs prose vs tables vs OCR noise) and the
    // input-distribution audit for tokenizer training. Pure codegen'd
    // regexp_count arithmetic, one map-side-combinable agg per source,
    // integer-bp output.
    "text_charclass_profile" -> Query(
      (s, d) => {
        val t = Tables.documents(s, d).select(col("source"),
          length(col("text")).cast("long").as("nc"),
          regexp_count(col("text"), lit("[a-z]")).cast("long").as("lo"),
          regexp_count(col("text"), lit("[A-Z]")).cast("long").as("up"),
          regexp_count(col("text"), lit("[0-9]")).cast("long").as("dg"),
          regexp_count(col("text"), lit("\\s")).cast("long").as("sp"))
        t.groupBy(col("source"))
          .agg(sum(col("nc")).as("n_chars"), sum(col("lo")).as("n_lower"),
            sum(col("up")).as("n_upper"), sum(col("dg")).as("n_digit"),
            sum(col("sp")).as("n_space"))
          .select(col("source"), col("n_chars"),
            expr("n_lower * 10000 div n_chars").as("lower_bp"),
            expr("n_upper * 10000 div n_chars").as("upper_bp"),
            expr("n_digit * 10000 div n_chars").as("digit_bp"),
            expr("n_space * 10000 div n_chars").as("space_bp"),
            expr("(n_chars - n_lower - n_upper - n_digit - n_space) * 10000 div n_chars")
              .as("other_bp"))
      },
      Some("""WITH t AS (SELECT source, CAST(length(text) AS BIGINT) AS nc,
             |    CAST(len(regexp_extract_all(text, '[a-z]')) AS BIGINT) AS lo,
             |    CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS up,
             |    CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS dg,
             |    CAST(len(regexp_extract_all(text, '\s')) AS BIGINT) AS sp
             |  FROM documents),
             |g AS (SELECT source, SUM(nc) AS n_chars, SUM(lo) AS n_lower,
             |        SUM(up) AS n_upper, SUM(dg) AS n_digit, SUM(sp) AS n_space
             |      FROM t GROUP BY 1)
             |SELECT source, CAST(n_chars AS BIGINT) AS n_chars,
             |  CAST(n_lower * 10000 // n_chars AS BIGINT) AS lower_bp,
             |  CAST(n_upper * 10000 // n_chars AS BIGINT) AS upper_bp,
             |  CAST(n_digit * 10000 // n_chars AS BIGINT) AS digit_bp,
             |  CAST(n_space * 10000 // n_chars AS BIGINT) AS space_bp,
             |  CAST((n_chars - n_lower - n_upper - n_digit - n_space) * 10000 // n_chars AS BIGINT)
             |    AS other_bp
             |FROM g""".stripMargin)
    ),

    // GOPHER-STYLE quality gates (Rae et al. 2021 §A1.1 repetition/
    // quality heuristics, re-expressed as integer-exact per-doc rules):
    // word count in [50, 100k], mean word length in [3, 10] chars,
    // symbol-to-word ratio (# and ...) under 10%, bullet-start lines
    // under 90%, ellipsis-end lines under 30%, >=80% alphabetic words,
    // >=2 english stopword hits. Pure map-side codegen'd arithmetic —
    // zero shuffles, the plan is a scan + project at any corpus size.
    // All rates integer basis points / centi-chars so both engines
    // derive bit-identical verdicts.
    "text_gopher_rules" -> Query(
      (s, d) => {
        val toks = TextFunctions.cleanTokens(col("text"))
        val lowToks = TextFunctions.cleanTokens(lower(col("text")))
        val lines = split(col("text"), "\n")
        val c = Tables.documents(s, d).select(
          col("doc_id"),
          size(toks).cast("long").as("n_words"),
          aggregate(toks, lit(0L), (a, t) => a + length(t)).as("tok_chars"),
          size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long").as("alpha_words"),
          (regexp_count(col("text"), lit("#")) +
            regexp_count(col("text"), lit("\\.\\.\\."))).cast("long").as("sym_hits"),
          size(lines).cast("long").as("n_lines"),
          size(filter(lines, l => l.rlike("^[ \t]*[-*•]"))).cast("long")
            .as("bullet_lines"),
          size(filter(lines, l => l.rlike("(\\.\\.\\.|…)[ \t]*$"))).cast("long")
            .as("ellipsis_lines"),
          TextFunctions.stopwordHits(lowToks, "en").cast("long").as("stop_hits"))
        c.select(col("doc_id"), col("n_words"),
            expr("CASE WHEN n_words > 0 THEN tok_chars * 100 div n_words ELSE 0 END")
              .as("mwl_cp"),
            expr("CASE WHEN n_words > 0 THEN sym_hits * 10000 div n_words ELSE 0 END")
              .as("symbol_bp"),
            expr("CASE WHEN n_words > 0 THEN alpha_words * 10000 div n_words ELSE 0 END")
              .as("alpha_bp"),
            expr("bullet_lines * 10000 div n_lines").as("bullet_bp"),
            expr("ellipsis_lines * 10000 div n_lines").as("ellipsis_bp"),
            col("stop_hits"))
          .withColumn("keep",
            (col("n_words").between(50, 100000) &&
              col("mwl_cp").between(300, 1000) &&
              col("symbol_bp") < 1000 &&
              col("bullet_bp") <= 9000 &&
              col("ellipsis_bp") <= 3000 &&
              col("alpha_bp") >= 8000 &&
              col("stop_hits") >= 2).cast("long"))
      },
      Some(s"""WITH c AS (
             |  SELECT doc_id,
             |    CAST(len($toksSql) AS BIGINT) AS n_words,
             |    CAST(COALESCE(list_sum(list_transform($toksSql, x -> length(x))), 0) AS BIGINT)
             |      AS tok_chars,
             |    CAST(len(list_filter($toksSql, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
             |      AS alpha_words,
             |    CAST(len(regexp_extract_all(text, '#'))
             |       + len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS sym_hits,
             |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
             |    CAST(len(list_filter(string_split(text, chr(10)),
             |        l -> regexp_matches(l, '^[ \t]*[-*•]'))) AS BIGINT) AS bullet_lines,
             |    CAST(len(list_filter(string_split(text, chr(10)),
             |        l -> regexp_matches(l, '(\\.\\.\\.|…)[ \t]*$$'))) AS BIGINT) AS ellipsis_lines,
             |    CAST(${hitsSql("en")} AS BIGINT) AS stop_hits
             |  FROM documents)
             |SELECT doc_id, n_words,
             |  CAST(CASE WHEN n_words > 0 THEN tok_chars * 100 // n_words ELSE 0 END AS BIGINT)
             |    AS mwl_cp,
             |  CAST(CASE WHEN n_words > 0 THEN sym_hits * 10000 // n_words ELSE 0 END AS BIGINT)
             |    AS symbol_bp,
             |  CAST(CASE WHEN n_words > 0 THEN alpha_words * 10000 // n_words ELSE 0 END AS BIGINT)
             |    AS alpha_bp,
             |  CAST(bullet_lines * 10000 // n_lines AS BIGINT) AS bullet_bp,
             |  CAST(ellipsis_lines * 10000 // n_lines AS BIGINT) AS ellipsis_bp,
             |  stop_hits,
             |  CAST(n_words BETWEEN 50 AND 100000
             |    AND (CASE WHEN n_words > 0 THEN tok_chars * 100 // n_words ELSE 0 END) BETWEEN 300 AND 1000
             |    AND (CASE WHEN n_words > 0 THEN sym_hits * 10000 // n_words ELSE 0 END) < 1000
             |    AND bullet_lines * 10000 // n_lines <= 9000
             |    AND ellipsis_lines * 10000 // n_lines <= 3000
             |    AND (CASE WHEN n_words > 0 THEN alpha_words * 10000 // n_words ELSE 0 END) >= 8000
             |    AND stop_hits >= 2 AS BIGINT) AS keep
             |FROM c""".stripMargin)
    ),

    // TYPE-TOKEN RATIO per doc + heaviest-token share — the per-document
    // lexical-diversity twin of the corpus-level hapax/vocab-growth
    // audits: low TTR or a dominant token flags machine-generated /
    // keyword-stuffed docs before pretraining. Two partial-aggregatable
    // shuffles ((doc, tok) counts, then per-doc rollup); integer bp.
    "text_ttr" -> Query(
      (s, d) => {
        val t = Tables.documents(s, d).select(col("doc_id"),
          explode(TextFunctions.cleanTokens(col("text"))).as("tok"))
        t.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
            max(col("c")).as("top_c"))
          .select(col("doc_id"), col("n_tokens"), col("n_types"),
            expr("n_types * 10000 div n_tokens").as("ttr_bp"),
            expr("top_c * 10000 div n_tokens").as("top_tok_bp"))
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
             |tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
             |d AS (SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_types,
             |        MAX(c) AS top_c FROM tc GROUP BY 1)
             |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(n_types AS BIGINT) AS n_types,
             |  CAST(n_types * 10000 // n_tokens AS BIGINT) AS ttr_bp,
             |  CAST(top_c * 10000 // n_tokens AS BIGINT) AS top_tok_bp
             |FROM d""".stripMargin)
    )
  )
}
