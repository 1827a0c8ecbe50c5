package graft.text

import graft.{Query, Tables}
import graft.functions.{Hashing, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-level statistics for training-data curation (SURVEY §2.5):
  * lexical-richness scoring, tokenizer-vocab design curves, pairwise
  * source-distribution divergence, crawl prefix-dup detection, and
  * bigram conditional entropy. Shapes are all vocabulary-sized — term
  * counts are the only shuffle keys, never raw tokens or doc pairs —
  * so each plan survives a 100x corpus scale-up unchanged.
  *
  * Float discipline follows graft.Parity: every data-sized float sum
  * goes through an exact DECIMAL accumulator (order-independent), ln
  * arguments are integer-valued doubles or integer ratios (identical
  * bits cross-engine), and results round at 4dp.
  */
object CorpusQueries {

  private def toks: Column = TextFunctions.cleanTokens(col("text"))
  private def lowToks: Column = TextFunctions.cleanTokens(lower(col("text")))

  private val toksSql =
    "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')"
  private val lowToksSql =
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')"

  /** Per-(source, lowercased term) counts — the shared vocabulary-sized
    * base relation for the corpus-distribution queries.
    */
  private def sourceTermCounts(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), explode(lowToks).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))

  val entries: Seq[(String, Query)] = Seq(

    // YULE'S K lexical-richness characteristic per doc:
    // K = 1e4 * (sum(c^2) - N) / N^2 over the doc's term-frequency
    // spectrum. High K = repetitive/templated text (a finer signal than
    // TTR because it weighs the whole frequency spectrum, not just the
    // type count). Two partial-aggregatable shuffles, exact integer
    // sufficient statistics, one terminal rounded double.
    "text_yule_k" -> Query(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), explode(lowToks).as("tok"))
          .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n"), count(lit(1)).as("v"),
            sum(col("c") * col("c")).as("s2"))
          .select(col("doc_id"), col("n").as("n_tokens"),
            col("v").as("n_types"),
            round(lit(10000.0) * (col("s2") - col("n")).cast("double")
              / (col("n") * col("n")).cast("double"), 4).as("yule_k")),
      Some(s"""WITH t AS (SELECT doc_id, unnest($lowToksSql) AS tok FROM documents),
             |tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
             |d AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS v, SUM(c*c) AS s2
             |      FROM tc GROUP BY 1)
             |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
             |  CAST(v AS BIGINT) AS n_types,
             |  ROUND(10000.0 * CAST(s2 - n AS DOUBLE) / CAST(n * n AS DOUBLE), 4)
             |    AS yule_k
             |FROM d""".stripMargin)
    ),

    // TOKENIZER-VOCAB CUTOFF CURVE: vocabulary size and corpus token
    // coverage at min-frequency cutoffs {1,2,5,10,20,50,100} — the
    // curve a tokenizer designer reads to pick a vocab floor. The term
    // count table is the only data-sized relation; the x7 cutoff
    // explode happens on vocabulary-sized rows and partial-aggregates
    // map-side, so the plan is corpus-scan + two tiny shuffles.
    "text_vocab_cutoffs" -> Query(
      (s, d) => {
        val tc = Tables.documents(s, d)
          .select(explode(lowToks).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val tot = tc.agg(sum(col("c")).as("n_total"))
        tc.select(col("c"),
            explode(array(Seq(1, 2, 5, 10, 20, 50, 100).map(lit): _*))
              .as("cutoff"))
          .filter(col("c") >= col("cutoff"))
          .groupBy(col("cutoff"))
          .agg(count(lit(1)).as("vocab_size"), sum(col("c")).as("covered"))
          .crossJoin(broadcast(tot))
          .select(col("cutoff").cast("long").as("cutoff"), col("vocab_size"),
            col("covered"),
            expr("covered * 10000 div n_total").as("coverage_bp"))
      },
      Some(s"""WITH t AS (SELECT unnest($lowToksSql) AS tok FROM documents),
             |tc AS (SELECT tok, COUNT(*) AS c FROM t GROUP BY 1),
             |tot AS (SELECT SUM(c) AS n_total FROM tc),
             |cut AS (SELECT unnest([1, 2, 5, 10, 20, 50, 100]) AS cutoff)
             |SELECT CAST(cutoff AS BIGINT) AS cutoff,
             |  CAST(COUNT(*) AS BIGINT) AS vocab_size,
             |  CAST(SUM(c) AS BIGINT) AS covered,
             |  CAST(SUM(c) * 10000 // MAX(n_total) AS BIGINT) AS coverage_bp
             |FROM tc, cut, tot WHERE c >= cutoff
             |GROUP BY cutoff""".stripMargin)
    ),

    // PAIRWISE SOURCE JENSEN-SHANNON DIVERGENCE: the mixture-planning
    // distance matrix between every source pair's unigram distribution.
    // The only data-sized join is term-count-vs-term-count on the term
    // key (vocabulary-sized, ~|sources|^2 fan-out per term); terms
    // present in just one side contribute in closed form from the
    // per-source scalars (N_s, T_s = sum c*ln c), so NO full-outer join
    // is needed:  H(M) = H_both + onlyA + onlyB with
    //   onlyA = (ln(2*Na)*(Na - Sa) - (Ta_all - Ta_both)) / (2*Na)
    // and JSD = H(M) - (H(A) + H(B))/2, H(S) = ln Ns - Ts/Ns.
    "text_source_jsd" -> Query(
      (s, d) => {
        val cs = sourceTermCounts(s, d)
        val tot = cs.groupBy(col("source"))
          .agg(sum(col("c")).as("n"),
            sum((col("c").cast("double") * log(col("c").cast("double")))
              .cast("decimal(28,12)")).as("t_all"))
        val a = cs.select(col("source").as("src_a"), col("tok"),
          col("c").as("ca"))
        val b = cs.select(col("source").as("src_b"), col("tok"),
          col("c").as("cb"))
        val ta = tot.select(col("source").as("src_a"), col("n").as("na"),
          col("t_all").as("ta_all"))
        val tb = tot.select(col("source").as("src_b"), col("n").as("nb"),
          col("t_all").as("tb_all"))
        val m = (col("ca").cast("double") / col("na").cast("double")
          + col("cb").cast("double") / col("nb").cast("double")) / 2
        val pair = a.join(b, Seq("tok")).filter(col("src_a") < col("src_b"))
          .join(broadcast(ta), Seq("src_a")).join(broadcast(tb), Seq("src_b"))
          .groupBy(col("src_a"), col("src_b"))
          .agg(count(lit(1)).as("shared_types"),
            max(col("na")).as("na"), max(col("nb")).as("nb"),
            sum(col("ca")).as("sa"), sum(col("cb")).as("sb"),
            sum((col("ca").cast("double") * log(col("ca").cast("double")))
              .cast("decimal(28,12)")).as("ta_both"),
            sum((col("cb").cast("double") * log(col("cb").cast("double")))
              .cast("decimal(28,12)")).as("tb_both"),
            sum((-m * log(m)).cast("decimal(28,12)")).as("h_both"),
            max(col("ta_all")).as("ta_all"), max(col("tb_all")).as("tb_all"))
        val nad = col("na").cast("double")
        val nbd = col("nb").cast("double")
        val onlyA = (log(lit(2.0) * nad) * (col("na") - col("sa")).cast("double")
          - (col("ta_all") - col("ta_both")).cast("double")) / (lit(2.0) * nad)
        val onlyB = (log(lit(2.0) * nbd) * (col("nb") - col("sb")).cast("double")
          - (col("tb_all") - col("tb_both")).cast("double")) / (lit(2.0) * nbd)
        val ha = log(nad) - col("ta_all").cast("double") / nad
        val hb = log(nbd) - col("tb_all").cast("double") / nbd
        val jsd = (col("h_both").cast("double") + onlyA + onlyB) -
          (ha + hb) / 2
        pair.select(col("src_a"), col("src_b"), col("shared_types"),
          round(jsd, 4).as("jsd_nats"))
      },
      Some(s"""WITH t AS (SELECT source, unnest($lowToksSql) AS tok FROM documents),
             |cs AS (SELECT source, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
             |tot AS (SELECT source, SUM(c) AS n,
             |          SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
             |              AS DECIMAL(28,12))) AS t_all
             |        FROM cs GROUP BY 1),
             |pair AS (SELECT a.source AS src_a, b.source AS src_b,
             |    COUNT(*) AS shared_types,
             |    MAX(ta.n) AS na, MAX(tb.n) AS nb,
             |    SUM(a.c) AS sa, SUM(b.c) AS sb,
             |    SUM(CAST(CAST(a.c AS DOUBLE) * ln(CAST(a.c AS DOUBLE))
             |        AS DECIMAL(28,12))) AS ta_both,
             |    SUM(CAST(CAST(b.c AS DOUBLE) * ln(CAST(b.c AS DOUBLE))
             |        AS DECIMAL(28,12))) AS tb_both,
             |    SUM(CAST(-((CAST(a.c AS DOUBLE) / CAST(ta.n AS DOUBLE)
             |          + CAST(b.c AS DOUBLE) / CAST(tb.n AS DOUBLE)) / 2)
             |        * ln((CAST(a.c AS DOUBLE) / CAST(ta.n AS DOUBLE)
             |          + CAST(b.c AS DOUBLE) / CAST(tb.n AS DOUBLE)) / 2)
             |        AS DECIMAL(28,12))) AS h_both,
             |    MAX(ta.t_all) AS ta_all, MAX(tb.t_all) AS tb_all
             |  FROM cs a JOIN cs b ON a.tok = b.tok AND a.source < b.source
             |  JOIN tot ta ON ta.source = a.source
             |  JOIN tot tb ON tb.source = b.source
             |  GROUP BY 1, 2)
             |SELECT src_a, src_b, CAST(shared_types AS BIGINT) AS shared_types,
             |  ROUND(CAST(h_both AS DOUBLE)
             |    + (ln(2.0 * CAST(na AS DOUBLE)) * CAST(na - sa AS DOUBLE)
             |       - CAST(ta_all - ta_both AS DOUBLE)) / (2.0 * CAST(na AS DOUBLE))
             |    + (ln(2.0 * CAST(nb AS DOUBLE)) * CAST(nb - sb AS DOUBLE)
             |       - CAST(tb_all - tb_both AS DOUBLE)) / (2.0 * CAST(nb AS DOUBLE))
             |    - ((ln(CAST(na AS DOUBLE)) - CAST(ta_all AS DOUBLE) / CAST(na AS DOUBLE))
             |       + (ln(CAST(nb AS DOUBLE)) - CAST(tb_all AS DOUBLE) / CAST(nb AS DOUBLE))) / 2,
             |    4) AS jsd_nats
             |FROM pair""".stripMargin)
    ),

    // CRAWL PREFIX-DUP GROUPS: docs sharing their first 16 tokens —
    // the cheap screen for re-crawled pages whose bodies diverge after
    // a common header (exact dedup misses them, MinHash is overkill).
    // One row-local 60-bit hash of the prefix, one shuffle on it.
    "text_prefix_dup" -> Query(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"),
            Hashing.md5Long60(concat_ws(" ", slice(toks, 1, 16)))
              .as("prefix_hash"))
          .groupBy(col("prefix_hash"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("source")).as("n_sources"),
            min(col("doc_id")).as("first_doc"),
            sum(col("n_chars")).as("total_chars"))
          .filter(col("n_docs") >= 2),
      Some(s"""WITH p AS (SELECT doc_id, source, n_chars,
             |    CAST('0x' || substr(md5(array_to_string(($toksSql)[1:16], ' ')), 1, 15)
             |      AS BIGINT) AS prefix_hash
             |  FROM documents)
             |SELECT prefix_hash, CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
             |  MIN(doc_id) AS first_doc,
             |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
             |FROM p GROUP BY 1 HAVING COUNT(*) >= 2""".stripMargin)
    ),

    // BIGRAM CONDITIONAL ENTROPY per source: H(next|cur) of the
    // source's bigram model, the next-token predictability signal that
    // separates templated/boilerplate sources (low H) from diverse
    // prose (high H); mi = H(next) - H(next|cur) is the information
    // the current token carries. Bigram and unigram count tables are
    // vocabulary-sized; the one data-sized step is the per-doc lead
    // window (partitioned by doc_id).
    "text_cond_entropy_bigram" -> Query(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val tok = Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            posexplode(lowToks).as(Seq("pos", "t")))
        val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val bg = tok
          .select(col("source"), col("t").as("w1"),
            lead(col("t"), 1).over(wd).as("w2"))
          .filter(col("w2").isNotNull)
        val bc = bg.groupBy(col("source"), col("w1"), col("w2"))
          .agg(count(lit(1)).as("c12"))
        val u1 = bc.groupBy(col("source"), col("w1"))
          .agg(sum(col("c12")).as("c1"))
        val u2 = bc.groupBy(col("source"), col("w2"))
          .agg(sum(col("c12")).as("c2"))
        val n = bc.groupBy(col("source")).agg(sum(col("c12")).as("n"))
        val condTerm = (col("c12").cast("double")
          * (log(col("c1").cast("double")) - log(col("c12").cast("double"))))
          .cast("decimal(28,12)")
        val cond = bc.join(u1, Seq("source", "w1"))
          .groupBy(col("source")).agg(sum(condTerm).as("hc_num"))
        val h2 = u2.groupBy(col("source"))
          .agg(sum((col("c2").cast("double") * log(col("c2").cast("double")))
            .cast("decimal(28,12)")).as("t2"))
        val nd = col("n").cast("double")
        val hCond = col("hc_num").cast("double") / nd
        val hNext = log(nd) - col("t2").cast("double") / nd
        n.join(cond, Seq("source")).join(h2, Seq("source"))
          .select(col("source"), col("n").as("n_bigrams"),
            round(hCond, 4).as("h_cond"),
            round(hNext, 4).as("h_next"),
            round(hNext - hCond, 4).as("mi"))
      },
      Some(s"""WITH t AS (SELECT source, doc_id, $lowToksSql AS tk FROM documents),
             |bg AS (SELECT source, tk[i] AS w1, tk[i+1] AS w2
             |       FROM (SELECT source, tk, unnest(generate_series(1, len(tk) - 1)) AS i
             |             FROM t WHERE len(tk) >= 2)),
             |bc AS (SELECT source, w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2, 3),
             |u1 AS (SELECT source, w1, SUM(c12) AS c1 FROM bc GROUP BY 1, 2),
             |u2 AS (SELECT source, w2, SUM(c12) AS c2 FROM bc GROUP BY 1, 2),
             |n AS (SELECT source, SUM(c12) AS n FROM bc GROUP BY 1),
             |cond AS (SELECT bc.source,
             |    SUM(CAST(CAST(c12 AS DOUBLE)
             |        * (ln(CAST(c1 AS DOUBLE)) - ln(CAST(c12 AS DOUBLE)))
             |        AS DECIMAL(28,12))) AS hc_num
             |  FROM bc JOIN u1 ON bc.source = u1.source AND bc.w1 = u1.w1
             |  GROUP BY 1),
             |h2 AS (SELECT source,
             |    SUM(CAST(CAST(c2 AS DOUBLE) * ln(CAST(c2 AS DOUBLE))
             |        AS DECIMAL(28,12))) AS t2
             |  FROM u2 GROUP BY 1)
             |SELECT n.source, CAST(n.n AS BIGINT) AS n_bigrams,
             |  ROUND(CAST(hc_num AS DOUBLE) / CAST(n.n AS DOUBLE), 4) AS h_cond,
             |  ROUND(ln(CAST(n.n AS DOUBLE)) - CAST(t2 AS DOUBLE) / CAST(n.n AS DOUBLE), 4)
             |    AS h_next,
             |  ROUND((ln(CAST(n.n AS DOUBLE)) - CAST(t2 AS DOUBLE) / CAST(n.n AS DOUBLE))
             |    - CAST(hc_num AS DOUBLE) / CAST(n.n AS DOUBLE), 4) AS mi
             |FROM n JOIN cond ON cond.source = n.source
             |JOIN h2 ON h2.source = n.source""".stripMargin)
    ),

    // LANGUAGE-PROFILE OUTLIERS: per-doc KL divergence from the doc's
    // own language's unigram distribution — the mislabeled-language /
    // off-domain detector that runs after langid. The closed form
    // KL = (sum c*(ln c - ln cl))/Nd + ln Nl - ln Nd needs only ONE
    // (lang, term)-keyed join (doc counts vs language profile, the doc
    // is a subset of its own profile so nothing is unmatched) and one
    // fused decimal sum; per-language totals are broadcast scalars.
    "text_doc_lang_outliers" -> Query(
      (s, d) => {
        val tc = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), explode(lowToks).as("tok"))
          .groupBy(col("doc_id"), col("lang"), col("tok"))
          .agg(count(lit(1)).as("c"))
        val lc = tc.groupBy(col("lang"), col("tok")).agg(sum(col("c")).as("cl"))
        val nl = lc.groupBy(col("lang")).agg(sum(col("cl")).as("nl"))
        val fused = (col("c").cast("double")
          * (log(col("c").cast("double")) - log(col("cl").cast("double"))))
          .cast("decimal(28,12)")
        tc.join(lc, Seq("lang", "tok"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(sum(col("c")).as("nd"), sum(fused).as("ab"))
          .join(broadcast(nl), Seq("lang"))
          .select(col("doc_id"), col("lang"), col("nd").as("n_tokens"),
            round(col("ab").cast("double") / col("nd").cast("double")
              + (log(col("nl").cast("double")) - log(col("nd").cast("double"))),
              4).as("kl_nats"))
      },
      Some(s"""WITH t AS (SELECT doc_id, lang, unnest($lowToksSql) AS tok FROM documents),
             |tc AS (SELECT doc_id, lang, tok, COUNT(*) AS c FROM t GROUP BY 1, 2, 3),
             |lc AS (SELECT lang, tok, SUM(c) AS cl FROM tc GROUP BY 1, 2),
             |nl AS (SELECT lang, SUM(cl) AS nl FROM lc GROUP BY 1),
             |d AS (SELECT doc_id, tc.lang, SUM(c) AS nd,
             |        SUM(CAST(CAST(c AS DOUBLE)
             |            * (ln(CAST(c AS DOUBLE)) - ln(CAST(cl AS DOUBLE)))
             |            AS DECIMAL(28,12))) AS ab
             |      FROM tc JOIN lc ON lc.lang = tc.lang AND lc.tok = tc.tok
             |      GROUP BY 1, 2)
             |SELECT doc_id, d.lang, CAST(nd AS BIGINT) AS n_tokens,
             |  ROUND(CAST(ab AS DOUBLE) / CAST(nd AS DOUBLE)
             |    + (ln(CAST(nl AS DOUBLE)) - ln(CAST(nd AS DOUBLE))), 4) AS kl_nats
             |FROM d JOIN nl ON nl.lang = d.lang""".stripMargin)
    ),

    // RARE-TOKEN GATE: share of each doc's tokens whose CORPUS
    // frequency is <= 2 — the OOV-risk screen run before tokenizer
    // training (a doc of near-hapax junk inflates the vocab tail).
    // Doc term counts join the corpus count table on the term key
    // (vocabulary-sized); verdicts are integer bp with a 20% keep
    // threshold mirrored cross-engine.
    "text_rare_token_docs" -> Query(
      (s, d) => {
        val tc = Tables.documents(s, d)
          .select(col("doc_id"), explode(lowToks).as("tok"))
          .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
        val cc = tc.groupBy(col("tok")).agg(sum(col("c")).as("cf"))
        tc.join(cc, Seq("tok"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_tokens"),
            sum(when(col("cf") <= 2, col("c")).otherwise(0L)).as("rare"))
          .select(col("doc_id"), col("n_tokens"),
            expr("rare * 10000 div n_tokens").as("rare_bp"),
            (expr("rare * 10000 div n_tokens") <= 2000).cast("long").as("keep"))
      },
      Some(s"""WITH t AS (SELECT doc_id, unnest($lowToksSql) AS tok FROM documents),
             |tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
             |cc AS (SELECT tok, SUM(c) AS cf FROM tc GROUP BY 1),
             |d AS (SELECT doc_id, SUM(c) AS n_tokens,
             |        SUM(CASE WHEN cf <= 2 THEN c ELSE 0 END) AS rare
             |      FROM tc JOIN cc USING (tok) GROUP BY 1)
             |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(rare * 10000 // n_tokens AS BIGINT) AS rare_bp,
             |  CAST(rare * 10000 // n_tokens <= 2000 AS BIGINT) AS keep
             |FROM d""".stripMargin)
    ),

    // HELD-OUT PERPLEXITY per source: train an add-one unigram LM on
    // a deterministic salted-hash half of each source's docs, score
    // the other half — the generalization twin of in-sample
    // text_surprisal (a source whose held-out cross-entropy far
    // exceeds its in-sample one is template-diverse; OOV share flags
    // vocabulary churn). The hash split decorrelates from doc_id
    // assignment patterns. Seen and unseen test tokens share one
    // formula, p = (c+1)/(N+V+1) with c = 0 when unseen, so the
    // single left join on the (source, term) key covers both.
    "text_heldout_perplexity" -> Query(
      (s, d) => {
        val half = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), explode(lowToks).as("tok"),
            pmod(Hashing.md5Long60(concat(lit("ho_"),
              col("doc_id").cast("string"))), lit(2)).as("parity"))
        val trc = half.filter(col("parity") === 0)
          .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
        val trTot = trc.groupBy(col("source"))
          .agg(sum(col("c")).as("n_train"), count(lit(1)).as("v"))
        val tec = half.filter(col("parity") === 1)
          .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("ct"))
        val denom = (col("n_train") + col("v") + 1).cast("double")
        val term = (col("ct").cast("double")
          * (log(denom) - log((coalesce(col("c"), lit(0L)) + 1).cast("double"))))
          .cast("decimal(28,12)")
        tec.join(trc, Seq("source", "tok"), "left")
          .join(broadcast(trTot), Seq("source"))
          .groupBy(col("source"))
          .agg(max(col("n_train")).as("n_train"), sum(col("ct")).as("n_test"),
            sum(when(col("c").isNull, col("ct")).otherwise(0L)).as("oov"),
            sum(term).as("nll"))
          .select(col("source"), col("n_train"), col("n_test"),
            expr("oov * 10000 div n_test").as("oov_bp"),
            round(col("nll").cast("double") / col("n_test").cast("double"), 4)
              .as("heldout_ce"))
      },
      Some(s"""WITH t AS (SELECT doc_id, source, unnest($lowToksSql) AS tok,
             |    CAST('0x' || substr(md5('ho_' || CAST(doc_id AS VARCHAR)), 1, 15)
             |      AS BIGINT) % 2 AS parity FROM documents),
             |trc AS (SELECT source, tok, COUNT(*) AS c FROM t
             |        WHERE parity = 0 GROUP BY 1, 2),
             |tt AS (SELECT source, SUM(c) AS n_train, COUNT(*) AS v
             |       FROM trc GROUP BY 1),
             |tec AS (SELECT source, tok, COUNT(*) AS ct FROM t
             |        WHERE parity = 1 GROUP BY 1, 2),
             |j AS (SELECT tec.source, ct, c, n_train, v
             |      FROM tec LEFT JOIN trc ON trc.source = tec.source
             |        AND trc.tok = tec.tok
             |      JOIN tt ON tt.source = tec.source),
             |g AS (SELECT source, MAX(n_train) AS n_train, SUM(ct) AS n_test,
             |        SUM(CASE WHEN c IS NULL THEN ct ELSE 0 END) AS oov,
             |        SUM(CAST(CAST(ct AS DOUBLE)
             |            * (ln(CAST(n_train + v + 1 AS DOUBLE))
             |               - ln(CAST(COALESCE(c, 0) + 1 AS DOUBLE)))
             |            AS DECIMAL(28,12))) AS nll
             |      FROM j GROUP BY 1)
             |SELECT source, CAST(n_train AS BIGINT) AS n_train,
             |  CAST(n_test AS BIGINT) AS n_test,
             |  CAST(oov * 10000 // n_test AS BIGINT) AS oov_bp,
             |  ROUND(CAST(nll AS DOUBLE) / CAST(n_test AS DOUBLE), 4) AS heldout_ce
             |FROM g""".stripMargin)
    ),

    // CORPUS CARD — the per-source datasheet row ("datasheets for
    // datasets") a training-data release ships: volume (docs, tokens),
    // declared-language share, exact-duplicate rate (1 - distinct
    // content hashes / docs), and mean quality. Every float-born
    // signal (the quality composite) quantizes to integer basis points
    // PER DOC before any aggregation, so the rollup sums longs — no
    // double-summation order nondeterminism anywhere. One scan, one
    // partial agg per source (the distinct-hash count is the only
    // extra shuffle, keyed on source).
    "pipeline_corpus_card" -> Query(
      (s, d) => {
        val q_bp = floor(TextFunctions.qualityScore(col("text")) * 10000 + 0.5)
          .cast("long")
        Tables.documents(s, d)
          .select(col("source"), col("lang"), col("text"),
            size(lowToks).cast("long").as("ntok"), q_bp.as("q_bp"),
            md5(col("text")).as("h"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ntok")).as("n_tokens"),
            countDistinct(col("h")).as("n_uniq"),
            sum((col("lang") === "en").cast("long")).as("n_en"),
            sum(col("q_bp")).as("qsum"))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            expr("n_tokens div n_docs").as("mean_tokens"),
            expr("n_en * 10000 div n_docs").as("en_bp"),
            expr("(n_docs - n_uniq) * 10000 div n_docs").as("dup_bp"),
            expr("qsum div n_docs").as("mean_quality_bp"))
      },
      Some {
        val enStops = TextFunctions.stopwords("en").map(w => s"'$w'").mkString(", ")
        s"""WITH c AS (
           |  SELECT source, lang, md5(text) AS h,
           |    CAST(len($lowToksSql) AS BIGINT) AS ntok,
           |    CASE WHEN length(text) > 0
           |      THEN CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS DOUBLE) / length(text)
           |      ELSE 0.0 END AS pr,
           |    CASE WHEN len($lowToksSql) > 0
           |      THEN CAST(len(list_filter($lowToksSql, x -> list_contains([$enStops], x))) AS DOUBLE)
           |           / len($lowToksSql)
           |      ELSE 0.0 END AS sr,
           |    length(text) AS n_chars_m
           |  FROM documents),
           |qq AS (SELECT source, lang, h, ntok,
           |    CAST(floor((LEAST(n_chars_m/500.0, 1.0) * 0.4
           |         + GREATEST(1.0 - pr * 5, 0.0) * 0.4
           |         + LEAST(sr * 5, 1.0) * 0.2) * 10000 + 0.5) AS BIGINT) AS q_bp
           |  FROM c)
           |SELECT source, COUNT(*) AS n_docs,
           |  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
           |  CAST(SUM(ntok) // COUNT(*) AS BIGINT) AS mean_tokens,
           |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT) AS en_bp,
           |  CAST((COUNT(*) - COUNT(DISTINCT h)) * 10000 // COUNT(*) AS BIGINT) AS dup_bp,
           |  CAST(SUM(q_bp) // COUNT(*) AS BIGINT) AS mean_quality_bp
           |FROM qq GROUP BY 1""".stripMargin
      }
    ),

    // T5-STYLE SPAN-CORRUPTION budget plan — the seq2seq pretraining
    // data-prep step that decides, per document, how long the encoder
    // and decoder sequences will be after masking: deterministic
    // salted-md5 span starts (5% of positions, span length 3, clipped
    // at the doc end), overlapping spans merged by the gaps-and-islands
    // rank trick (a contiguous masked run is one sentinel), then
    // enc_len = n_tokens - n_masked + n_spans and dec_len = n_masked +
    // n_spans. Everything is integer and doc-local: the only windows
    // partition by doc_id over that doc's masked positions.
    "text_span_corruption_plan" -> Query(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), size(lowToks).cast("long").as("n_tokens"))
          .filter(col("n_tokens") > 0)
        val pos = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(lowToks).as(Seq("p", "tok")))
          .select(col("doc_id"), col("p").cast("long").as("p"))
        val starts = pos.filter(
          Hashing.md5Long60(concat(lit("span_"), col("doc_id").cast("string"),
            lit("_"), col("p").cast("string"))) % 20 === 0)
        val masked = starts.join(docs, Seq("doc_id"))
          .select(col("doc_id"),
            explode(sequence(col("p"),
              least(col("p") + 2, col("n_tokens") - 1))).as("m"))
          .distinct()
        val w = Window.partitionBy(col("doc_id")).orderBy(col("m"))
        val spans = masked
          .withColumn("grp", col("m") - row_number().over(w))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_masked"),
            countDistinct(col("grp")).as("n_spans"))
        docs.join(spans, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("n_masked"), lit(0L)).as("n_masked"),
            coalesce(col("n_spans"), lit(0L)).as("n_spans"))
          .withColumn("enc_len",
            col("n_tokens") - col("n_masked") + col("n_spans"))
          .withColumn("dec_len", col("n_masked") + col("n_spans"))
      },
      Some(s"""WITH docs AS (SELECT doc_id, CAST(len($lowToksSql) AS BIGINT) AS n_tokens
             |             FROM documents WHERE len($lowToksSql) > 0),
             |pos AS (SELECT doc_id, CAST(unnest(generate_series(0, len($lowToksSql) - 1)) AS BIGINT) AS p
             |        FROM documents WHERE len($lowToksSql) > 0),
             |st AS (SELECT doc_id, p FROM pos
             |       WHERE CAST('0x' || substr(md5('span_' || CAST(doc_id AS VARCHAR) || '_' || CAST(p AS VARCHAR)), 1, 15) AS BIGINT) % 20 = 0),
             |mk AS (SELECT DISTINCT st.doc_id,
             |         CAST(unnest(generate_series(st.p, LEAST(st.p + 2, d.n_tokens - 1))) AS BIGINT) AS m
             |       FROM st JOIN docs d USING (doc_id)),
             |sp AS (SELECT doc_id, COUNT(*) AS n_masked,
             |         COUNT(DISTINCT m - rn) AS n_spans
             |       FROM (SELECT doc_id, m,
             |               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY m) AS rn
             |             FROM mk)
             |       GROUP BY 1)
             |SELECT d.doc_id, d.n_tokens,
             |  CAST(COALESCE(sp.n_masked, 0) AS BIGINT) AS n_masked,
             |  CAST(COALESCE(sp.n_spans, 0) AS BIGINT) AS n_spans,
             |  CAST(d.n_tokens - COALESCE(sp.n_masked, 0) + COALESCE(sp.n_spans, 0) AS BIGINT) AS enc_len,
             |  CAST(COALESCE(sp.n_masked, 0) + COALESCE(sp.n_spans, 0) AS BIGINT) AS dec_len
             |FROM docs d LEFT JOIN sp USING (doc_id)""".stripMargin)
    ),

    // PER-SOURCE length GINI — does one crawl source owe its token
    // count to a handful of giant documents? The inequality audit a
    // mixture plan reads next to the source caps. Unlike the global
    // agg_gini (range-sort machinery), this per-GROUP Gini folds to a
    // VALUE-LEVEL histogram first — (source, n_chars) counts — and
    // computes the rank-weighted sum with the tied-rank closed form
    // sum x*c*(2*cumlo + c + 1), so the per-source window runs over
    // distinct lengths (bounded) instead of documents: no hot-source
    // single partition at any corpus size. DECIMAL(38) rank products
    // (a hot source's c*cumlo is ~n^2); one terminal double ratio.
    "text_length_gini" -> Query(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val v = Tables.documents(s, d)
          .groupBy(col("source"), col("n_chars").as("x"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy(col("source")).orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val t = v.withColumn("cumlo", coalesce(sum(col("c")).over(w), lit(0L)))
        t.groupBy(col("source")).agg(
            sum(col("c")).as("n"),
            sum(col("c").cast("decimal(38,0)") * col("x")).as("sx"),
            sum(col("x").cast("decimal(38,0)") * col("c") *
              (lit(2) * col("cumlo") + col("c") + 1)).as("six2"))
          .select(col("source"), col("n").as("n_docs"),
            round(col("six2").cast("double") /
                (col("n").cast("double") * col("sx").cast("double")) -
              (col("n") + lit(1.0)) / col("n"), 6).as("gini"))
      },
      Some("""WITH v AS (SELECT source, n_chars AS x, COUNT(*) AS c
             |           FROM documents GROUP BY 1, 2),
             |t AS (SELECT *, COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY x
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumlo
             |      FROM v),
             |g AS (SELECT source, SUM(c) AS n,
             |        SUM(CAST(c AS HUGEINT) * x) AS sx,
             |        SUM(CAST(x AS HUGEINT) * c * (2*cumlo + c + 1)) AS six2
             |      FROM t GROUP BY 1)
             |SELECT source, CAST(n AS BIGINT) AS n_docs,
             |  ROUND(CAST(six2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
             |    - (n + 1.0) / n, 6) AS gini
             |FROM g""".stripMargin)
    )
  )
}
