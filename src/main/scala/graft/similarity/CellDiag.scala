package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diagnostic main for the trained-IVF pair regime (VERDICT r12 Next
  * #1): prints the cell-size distribution, candidate-pair volume,
  * emitted-vs-true cos>=0.3 pair counts, and a truth-label
  * connectivity audit of `Ivf.candidatePairs` for a data dir — the
  * evidence behind the hot-cell guard. Brute-force truth and the
  * driver-side union-find are diagnostic-corpus-only by design. Run:
  *   sbt "runMain graft.similarity.CellDiag <dir> [<dir> ...]"
  */
object CellDiag {
  def main(args: Array[String]): Unit = {
    val spark = graft.Session.local()
    import graft.functions.VectorFunctions
    for (d <- args) {
      val t0 = System.nanoTime()
      val asg = Ivf.pairAssignments(spark, d).cache()
      val cells = asg.groupBy("cid").agg(count(lit(1)).as("m"))
      val stats = cells.agg(
        count(lit(1)).as("n_cells"), max(col("m")).as("max_m"),
        avg(col("m")).as("avg_m"),
        expr("percentile(m, 0.99)").as("p99_m"),
        sum(col("m") * (col("m") - 1) / 2).as("cand_pairs")).collect()(0)
      val distinctCand = asg.as("a")
        .join(asg.as("b"), col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id")).distinct().count()
      // post-collapse (distinct-qv representative) view — what the
      // capped pair join actually runs over
      val q = graft.Tables.embeddings(spark, d)
        .select(col("vec_id"), Ivf.quantCol.as("qv"))
      val grouped = q.withColumn("gid", min(col("vec_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qv"))))
      val reps = grouped.filter(col("vec_id") === col("gid")).select(col("gid"))
        .join(asg, col("gid") === col("vec_id"))
      val rstats = reps.groupBy("cid").agg(count(lit(1)).as("m"))
        .agg(max(col("m")).as("rmax"),
          sum(col("m") * (col("m") - 1) / 2).as("rslots")).collect()(0)
      // output-proportionality + stress recall: true cos>=0.3 pairs
      // (brute force) vs pairs surviving capped candidate generation
      val e = graft.Tables.embeddings(spark, d).select(col("vec_id"),
        col("embedding"), VectorFunctions.norm(col("embedding")).as("nrm"))
      def cosPairs(l: DataFrame): DataFrame = l
        .join(e.select(col("vec_id").as("va"), col("embedding").as("ea"),
          col("nrm").as("na")), Seq("va"))
        .join(e.select(col("vec_id").as("vb"), col("embedding").as("eb"),
          col("nrm").as("nb")), Seq("vb"))
        .filter(round(VectorFunctions.dot(col("ea"), col("eb"))
          / (col("na") * col("nb")), 4) >= 0.3)
        .select(col("va"), col("vb"))
      val nTrue = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .filter(round(VectorFunctions.dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 4) >= 0.3).count()
      val cappedDf = Ivf.candidatePairs(spark, d).cache()
      val capped = cappedDf.count()
      val emitted = cosPairs(cappedDf).cache()
      val nEmit = emitted.count()
      val n = graft.Tables.embeddings(spark, d).count()
      val k = Ivf.graphK(spark, d)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[celldiag] $d n=$n k=$k cells=${stats.getLong(0)} " +
        f"max=${stats.getLong(1)} avg=${stats.getDouble(2)}%.1f " +
        f"p99=${stats.getDouble(3)}%.1f cand(slots)=${stats.getAs[java.math.BigDecimal](4)} " +
        f"cand(distinct)=$distinctCand repmax=${rstats.getLong(0)} " +
        f"repslots=${rstats.getAs[java.math.BigDecimal](1)} " +
        f"cand(collapsed+capped)=$capped true_pairs=$nTrue emit_pairs=$nEmit " +
        f"recall=${if (nTrue > 0) nEmit.toDouble / nTrue else -1.0}%.3f sec=$sec%.1f")
      // connectivity audit (what dedup actually consumes): do the
      // emitted pairs still merge each truth component transitively?
      val edges = emitted
        .select(col("va").cast("long"), col("vb").cast("long")).collect()
      val labs = graft.Tables.embeddings(spark, d)
        .select(col("vec_id").cast("long"), col("label")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for (r <- edges) {
        val (a, b) = (find(r.getLong(0)), find(r.getLong(1)))
        if (a != b) parent(a) = b
      }
      for ((l, ms) <- labs.groupBy(_._2).toSeq.sortBy(-_._2.size).take(5)) {
        val comps = ms.keys.map(find).toSet.size
        println(s"[celldiag]   label $l members=${ms.size} merged into $comps components")
      }
      // composition of the 3 hottest cells: which truth labels fill them
      val lab = graft.Tables.embeddings(spark, d).select(col("vec_id"), col("label"))
      val hot3 = asg.groupBy("cid").agg(count(lit(1)).as("m"))
        .orderBy(col("m").desc).limit(3).collect().map(_.getLong(0))
      for (c <- hot3) {
        val comp = asg.filter(col("cid") === c).join(lab, "vec_id")
          .groupBy("label").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc).limit(5).collect()
          .map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" ")
        println(s"[celldiag]   hot cell $c labels: $comp")
      }
      emitted.unpersist(); cappedDf.unpersist(); asg.unpersist()
      graft.Caches.releaseAll(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
