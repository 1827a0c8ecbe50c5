package graft.text

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: REAL greedy merge training over the
  * corpus word-frequency table (Sennrich et al. 2016), replacing the
  * BPE-ish regex proxy for token budgets.
  *
  * Training is the classic loop: start from characters, repeatedly
  * merge the adjacent symbol pair with the highest corpus-weighted
  * count (ties → lexicographically smallest pair), stop at
  * [[Bpe.MaxMerges]] merges or when no pair occurs twice. It runs
  * DRIVER-SIDE over the collected word-frequency table — the standard
  * industry shape (HF trainers fold the corpus to word counts first):
  * the collect is bounded by the corpus VOCABULARY (Heaps' law), not
  * the corpus, and is memoized per data dir like the k-means
  * centroids (a reusable model artifact; deterministic input =>
  * identical merges, so the memo cannot change any output).
  *
  * Cross-engine exactness: encoding a training-corpus word by
  * replaying the merge list in order reproduces that word's
  * TRAINING-TIME segmentation exactly (each replay step applies the
  * same all-non-overlapping-occurrences-left-to-right operation to the
  * same state, by induction over ranks). The DuckDB oracle therefore
  * needs no interpolated merge table: it replays the whole TRAINING
  * loop in a recursive CTE (word states as separator-framed strings,
  * one `replace` per iteration, best pair via an aggregate over the
  * working table) and reads the final per-word symbol counts — the
  * exact values the native replay encoder produces.
  */
object Bpe {

  /** Merge budget (the vocab knob). Small enough that the synthetic
    * corpus keeps a NON-degenerate segmentation (every word collapsing
    * to one symbol would make fertility flat 10000); a production
    * tokenizer raises this to 30k+ with the same machinery.
    */
  val MaxMerges = 40

  final case class Trained(merges: Seq[(String, String)],
                           wordTokens: Map[String, Int])

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Trained]()

  /** Train (memoized per dir) over the corpus word-count table. */
  def trained(s: SparkSession, d: String): Trained =
    cache.computeIfAbsent(d, dir => {
      val wc = Tables.documents(s, dir)
        .select(explode(TextFunctions.cleanTokens(lower(col("text")))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
        .sortBy(_._1).toSeq
      train(wc)
    })

  /** One left-to-right non-overlapping merge pass — the JVM twin of
    * the oracle's framed-string `replace` (and of the replay encoder).
    */
  private[graft] def applyMerge(syms: Array[String], a: String,
                                b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Greedy merge training over (word, count) rows. */
  def train(wordCounts: Seq[(String, Long)]): Trained = {
    var words: Array[(String, Array[String], Long)] =
      wordCounts.map { case (w, c) =>
        (w, w.map(_.toString).toArray, c)
      }.toArray
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var go = true
    while (go && merges.length < MaxMerges) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (_, syms, c) =>
        var j = 0
        while (j + 1 < syms.length) {
          val k = (syms(j), syms(j + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          j += 1
        }
      }
      val eligible = counts.filter(_._2 >= 2L)
      if (eligible.isEmpty) go = false
      else {
        val (pair, _) = eligible.minBy { case ((a, b), c) => (-c, a, b) }
        merges += pair
        words = words.map { case (w, syms, c) =>
          (w, applyMerge(syms, pair._1, pair._2), c)
        }
      }
    }
    Trained(merges.toSeq,
      words.map { case (w, syms, _) => w -> syms.length }.toMap)
  }

  /** Shared DuckDB CTE chain replaying the training loop, ending in
    * `wt(word, nt)` — per-word BPE token count. Expects a prior CTE
    * (or the documents table) providing the same tokenization. The
    * word state is a DOUBLE-separator-framed string
    * (⟂⟂s1⟂⟂s2⟂⟂ with ⟂ = chr(31)): the merge of (a, b) is
    * `replace(s, '⟂a⟂⟂b⟂', '⟂ab⟂')`, whose left-to-right
    * non-overlapping scan reproduces the trainer's pass exactly (each
    * match consumes one framing char from each neighbor, so adjacent
    * matches still fire).
    */
  lazy val wordTokensCteSql: String = {
    val sep = "chr(31)"
    val pat = s"$sep || bpa || $sep || $sep || bpb || $sep"
    val rep = s"$sep || bpa || bpb || $sep"
    s"""wc AS (SELECT tok AS word, COUNT(*) AS cnt FROM (
       |    SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |                  x -> x <> '')) AS tok FROM documents) GROUP BY 1),
       |w0 AS (SELECT word, cnt,
       |         $sep || $sep ||
       |           array_to_string(string_split(word, ''), $sep || $sep) ||
       |           $sep || $sep AS s
       |       FROM wc),
       |tr AS (
       |  SELECT 0 AS it, word, cnt, s, NULL::VARCHAR AS ma, NULL::VARCHAR AS mb FROM w0
       |  UNION ALL
       |  SELECT it + 1, word, cnt,
       |    replace(s, $pat, $rep) AS s, bpa AS ma, bpb AS mb
       |  FROM (
       |    SELECT it, word, cnt, s,
       |      (SELECT a FROM (
       |         SELECT syms[j] AS a, syms[j+1] AS b, SUM(cnt) AS c
       |         FROM (SELECT cnt, string_split(trim(s, $sep), $sep || $sep) AS syms FROM tr),
       |              LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(j)
       |         GROUP BY 1, 2 HAVING SUM(cnt) >= 2
       |         ORDER BY c DESC, a, b LIMIT 1)) AS bpa,
       |      (SELECT b FROM (
       |         SELECT syms[j] AS a, syms[j+1] AS b, SUM(cnt) AS c
       |         FROM (SELECT cnt, string_split(trim(s, $sep), $sep || $sep) AS syms FROM tr),
       |              LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(j)
       |         GROUP BY 1, 2 HAVING SUM(cnt) >= 2
       |         ORDER BY c DESC, a, b LIMIT 1)) AS bpb
       |    FROM tr)
       |  WHERE it < $MaxMerges AND bpa IS NOT NULL),
       |fin AS (SELECT word, s FROM tr WHERE it = (SELECT MAX(it) FROM tr)),
       |wt AS (SELECT word,
       |         len(string_split(trim(s, $sep), $sep || $sep)) AS nt
       |       FROM fin)""".stripMargin
  }
}
