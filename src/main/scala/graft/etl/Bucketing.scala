package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed managed tables — the pre-shuffle that makes repeated joins
  * and aggregations on the same key shuffle-free at read time.
  *
  * At 100 TB the dominant cost of fact⋈fact joins is the shuffle; a
  * table bucketed (and sorted) on the join key is hash-partitioned on
  * disk once, so every later join/agg on that key reads co-located
  * buckets with NO Exchange in the plan (verified in EtlSpec).
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Unique managed-table suffix for a data dir: sanitized basename
    * (readable) + first 8 md5 hex chars of the ABSOLUTE path (unique).
    * Basename alone collides: two dirs with the same leaf name — or
    * names differing only in non-word chars (`data-1` vs `data_1`) —
    * would share a table, and the second build would silently serve
    * the first dir's queries the second dir's rows.
    */
  def dirTag(d: String): String = {
    val abs = new java.io.File(d).getAbsolutePath
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    new java.io.File(d).getName.replaceAll("\\W", "_") + "_" +
      digest.take(4).map(b => f"$b%02x").mkString
  }

  /** Memoized bucketed materialization with a PER-SESSION catalog
    * guard: the memo map is JVM-global, but managed tables live in a
    * SparkSession's catalog — a fresh session in the same JVM (new
    * warehouse, new catalog) hits the memo yet lacks the table, so
    * rebuild instead of failing with TABLE_OR_VIEW_NOT_FOUND (or
    * silently reading a stale table from a prior warehouse).
    */
  // Per-memoKey lock objects. The Spark write must NOT run inside a
  // ConcurrentHashMap.compute: the CHM contract requires computations
  // to be short and to never re-enter the map, and a long saveAsTable
  // job under a bin lock stalls unrelated keys (or deadlocks if the
  // fresh-body ever touches the same memo). computeIfAbsent here only
  // allocates a lock object — trivially short — and the whole
  // check-then-write critical section runs under that per-key monitor.
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  def memoBucketed(s: org.apache.spark.sql.SparkSession,
                   memo: java.util.concurrent.ConcurrentHashMap[String, String],
                   memoKey: String, table: String, key: String,
                   buckets: Int)(fresh: => DataFrame): DataFrame = {
    val lock = locks.computeIfAbsent(memoKey, _ => new AnyRef)
    // Two threads in a fresh session (memo hit, table absent) must not
    // race concurrent Overwrite saveAsTable calls on the same table
    // name, so existence check + write are one critical section.
    val tbl = lock.synchronized {
      val prev = memo.get(memoKey)
      val target = if (prev == null) table else prev
      if (prev == null || !s.catalog.tableExists(target))
        writeBucketed(fresh, target, key, buckets)
      memo.put(memoKey, target)
      target
    }
    s.table(tbl)
  }
}
