package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Corpus-size-conditional broadcast hints (r16, closing the r15
  * "documented, not guarded" caveat).
  *
  * A few queries broadcast frames that are small at every gate corpus
  * but CORPUS-PROPORTIONAL by construction — the decontamination eval
  * index (a fixed 1-in-20 fraction of corpus shingles) and the
  * approx-dedup audit-doc lists (1-in-8 of selected near-dup pairs).
  * An unconditional `broadcast()` hint on such a frame is a latent
  * OOM at some future corpus size: the hint FORCES the build side
  * regardless of actual bytes. This helper keeps the hint only while
  * the driving `documents` table is under a row threshold (one
  * memoized metadata-cheap count per dir) and otherwise returns the
  * frame unhinted, letting Catalyst/AQE pick the join strategy from
  * real sizes — the pruning joins are plain equi-/semi-joins, so they
  * stay correct as shuffle joins.
  *
  * Why a threshold on the SOURCE table rather than no hint at all: the
  * r14 measurement behind the audit prune (DedupQueries, 14.8 s → 2 s)
  * showed the win comes from never shuffling the corpus shingle table.
  * Without the hint the initial plan is a shuffle join, and AQE's
  * broadcast conversion still pays the big side's shuffle WRITE before
  * runtime stats arrive — so dropping the hint everywhere would
  * re-introduce most of the measured cost at gate scales. The
  * threshold (1M docs ≈ tens of MB for the largest derived frame —
  * ~5× every corpus this repo measures, incl. the 500k-doc decade
  * stress corpora) keeps the measured-fast plan where it is proven and
  * degrades to AQE's choice where it is not. PlanSpec pins both sides:
  * broadcast chosen at gate scale, hint absent under a forced-zero
  * threshold.
  */
object Hints {

  /** Document-count ceiling for keeping corpus-derived broadcast hints. */
  val BroadcastDocLimit: Long = 1000000L

  private val counts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Memoized row count of `documents` for a data dir. */
  def docCount(s: SparkSession, d: String): Long =
    counts.computeIfAbsent(d, _ => Tables.documents(s, d).count()).longValue()

  /** `broadcast(df)` while the dir's documents table is within `limit`
    * rows; `df` unhinted past it.
    */
  def broadcastIfBounded(s: SparkSession, d: String, df: DataFrame,
                         limit: Long = BroadcastDocLimit): DataFrame =
    if (docCount(s, d) <= limit) broadcast(df) else df
}
