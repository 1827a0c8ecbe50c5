package graft.text

import graft.{Query, Tables}
import graft.functions.{TextFunctions, VectorFunctions}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document retrieval: BM25 lexical scoring, hybrid lexical+vector rank
  * fusion, and readability scoring — the search-side operators a corpus
  * pipeline grows once it has dedup and quality gates. All oracle-checked;
  * doubles follow the house parity rules (exact integer/decimal inputs,
  * identical expression shape cross-engine, round only the terminal score).
  */
object RetrievalQueries {

  /** Fixed query terms (corpus-common, deterministic). */
  private val QueryTerms = Seq("vector", "join", "filter")
  private val termsSqlList = QueryTerms.map(t => s"'$t'").mkString(", ")

  /** Okapi BM25 with k1=1.2, b=0.75 (Robertson/Sparck Jones; the Lucene
    * `k1+1` numerator variant). Shared by bm25 + hybrid oracle SQL.
    */
  private val bm25Sql =
    s"""WITH tok AS (SELECT doc_id,
       |    unnest(list_filter(string_split_regex(trim(text), '\\s+'),
       |                       x -> x <> '')) AS t
       |  FROM documents),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
       |st AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS s_dl FROM dl),
       |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok
       |       WHERE t IN ($termsSqlList) GROUP BY 1, 2),
       |df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT tf.doc_id,
       |         ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
       |           * ((tf.tf * 2.2)
       |              / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / (CAST(st.s_dl AS DOUBLE) / st.n_docs)))))
       |           AS s
       |       FROM tf JOIN dl USING (doc_id) JOIN df USING (t) CROSS JOIN st),
       |bm25 AS (SELECT doc_id, COUNT(*) AS n_terms,
       |           ROUND(CAST(SUM(CAST(s AS DECIMAL(18,12))) AS DOUBLE), 6) AS score
       |         FROM sc GROUP BY doc_id)""".stripMargin

  /** The same BM25 scoring as a DataFrame (docs with >=1 query term). */
  private def bm25(s: org.apache.spark.sql.SparkSession, d: String) = {
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("doc_id"),
      explode(TextFunctions.cleanTokens(col("text"))).as("t"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("s_dl"))
    val tf = toks.filter(col("t").isInCollection(QueryTerms))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    tf.join(dl, Seq("doc_id"))
      .join(broadcast(df_), Seq("t"))
      .crossJoin(broadcast(stats))
      .withColumn("s",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
          * ((col("tf") * 2.2)
            / (col("tf") + lit(1.2) * (lit(0.25)
              + lit(0.75) * (col("dl") / (col("s_dl").cast("double") / col("n_docs")))))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        round(sum(col("s").cast("decimal(18,12)")).cast("double"), 6).as("score"))
  }

  val entries: Seq[(String, Query)] = Seq(

    // BM25 full-text scoring for a fixed query — the lexical-retrieval
    // baseline every search stack starts from. One token explode feeds
    // doc lengths and term frequencies (two partial-agg shuffles on
    // doc_id); document-frequency and corpus stats are tiny broadcast
    // sides, so the scoring join never shuffles the corpus again. Top
    // docs come from orderBy+limit (TakeOrderedAndProject — per-partition
    // heaps + one merge, no global sort even at 100 TB). Per-term scores
    // sum through DECIMAL so partition order can't move the last ulp.
    "text_bm25_topk" -> Query(
      (s, d) => bm25(s, d)
        .orderBy(col("score").desc, col("doc_id")).limit(20),
      Some(s"""$bm25Sql
             |SELECT doc_id, n_terms, score FROM bm25
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)
    ),

    // HYBRID retrieval — reciprocal-rank fusion (Cormack et al.) of the
    // BM25 ranking and a vector-similarity ranking for one probe:
    // rrf = 1/(60+rank_lex) + 1/(60+rank_vec), missing side contributes
    // 0. Each side first reduces to a top-100 shortlist (that shortlist
    // is the scale bound: at 100 TB each ranking arrives from its own
    // index's top-k, and the fusion join touches 200 rows, not the
    // corpus). Ranks are integers, so the fused score is bit-identical
    // cross-engine before any rounding.
    "ann_hybrid_rrf" -> Query(
      (s, d) => {
        // shortlist FIRST via orderBy+limit (distributed top-k heaps),
        // then rank the 100 survivors — the global row_number window only
        // ever sees the shortlist, never the corpus
        val lex = bm25(s, d)
          .orderBy(col("score").desc, col("doc_id")).limit(100)
          .withColumn("rl", row_number().over(
            Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
          .select(col("doc_id"), col("rl"))
        val probe = Tables.embeddings(s, d).filter(col("vec_id") === 7)
          .select(col("embedding").as("qv"),
            VectorFunctions.norm(col("embedding")).as("qnrm"))
        val vec = Tables.embeddings(s, d).filter(col("vec_id") =!= 7)
          .crossJoin(broadcast(probe))
          .select(col("vec_id"),
            round(VectorFunctions.dot(col("qv"), col("embedding"))
              / (col("qnrm") * VectorFunctions.norm(col("embedding"))), 4).as("cos"))
          .orderBy(col("cos").desc, col("vec_id")).limit(100)
          .withColumn("rv", row_number().over(
            Window.orderBy(col("cos").desc, col("vec_id"))).cast("long"))
          .select(col("vec_id").as("doc_id"), col("rv"))
        lex.join(vec, Seq("doc_id"), "full_outer")
          .select(col("doc_id"), col("rl"), col("rv"),
            (coalesce(lit(1.0) / (col("rl") + 60), lit(0.0))
              + coalesce(lit(1.0) / (col("rv") + 60), lit(0.0))).as("rrf"))
          .orderBy(col("rrf").desc, col("doc_id")).limit(15)
      },
      Some(s"""$bm25Sql,
             |lex AS (SELECT doc_id, rl FROM (
             |          SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rl
             |          FROM bm25) WHERE rl <= 100),
             |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
             |vc AS (SELECT e.vec_id,
             |         ROUND(
             |           list_sum(list_transform(generate_series(1, 64),
             |             i -> CAST(q.qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) /
             |           (sqrt(list_sum(list_transform(generate_series(1, 64),
             |             i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))) *
             |            sqrt(list_sum(list_transform(generate_series(1, 64),
             |             i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))), 4)
             |           AS cos
             |       FROM q CROSS JOIN embeddings e WHERE e.vec_id <> 7),
             |vec AS (SELECT vec_id AS doc_id, rv FROM (
             |          SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS rv
             |          FROM vc) WHERE rv <= 100),
             |fused AS (SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, lex.rl, vec.rv,
             |            COALESCE(1.0 / (lex.rl + 60), 0.0)
             |              + COALESCE(1.0 / (vec.rv + 60), 0.0) AS rrf
             |          FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
             |SELECT doc_id, rl, rv, rrf FROM fused
             |ORDER BY rrf DESC, doc_id LIMIT 15""".stripMargin)
    ),

    // Flesch reading-ease scoring — the classic readability gate. All
    // counts are integers from one row-local pass (no explode, no
    // shuffle): words from the shared tokenizer, sentences from the
    // text_sentences split, syllables approximated as vowel-group runs
    // clamped to >= 1 per word (keeps non-Latin scripts defined). The
    // score is a fixed affine map of two integer ratios — identical
    // double arithmetic cross-engine, rounded once.
    "text_readability" -> Query(
      (s, d) => {
        val words = size(TextFunctions.cleanTokens(col("text"))).cast("long")
        val sents = greatest(size(filter(
          transform(split(col("text"), "[.!?]+"), x => trim(x)),
          x => x =!= "")).cast("long"), lit(1L))
        val syl = size(regexp_extract_all(lower(col("text")),
          lit("[aeiouy]+"), lit(0))).cast("long")
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), words.as("n_words"),
            sents.as("n_sents"), greatest(syl, words).as("n_syll"))
          .filter(col("n_words") > 0)
          .withColumn("flesch",
            round(lit(206.835)
              - lit(1.015) * (col("n_words").cast("double") / col("n_sents"))
              - lit(84.6) * (col("n_syll").cast("double") / col("n_words")), 4))
      },
      Some("""WITH c AS (SELECT doc_id, lang,
             |    CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
             |                         x -> x <> '')) AS BIGINT) AS n_words,
             |    GREATEST(CAST(len(list_filter(list_transform(
             |        string_split_regex(text, '[.!?]+'), x -> trim(x)),
             |        x -> x <> '')) AS BIGINT), 1) AS n_sents,
             |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS syl
             |  FROM documents)
             |SELECT doc_id, lang, n_words, n_sents,
             |  GREATEST(syl, n_words) AS n_syll,
             |  ROUND(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
             |        - 84.6 * (CAST(GREATEST(syl, n_words) AS DOUBLE) / n_words), 4)
             |    AS flesch
             |FROM c WHERE n_words > 0""".stripMargin)
    )
  )
}
