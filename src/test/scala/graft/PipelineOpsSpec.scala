package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-7 pipeline operators — properties
  * the DuckDB hash gate can't express (it proves Spark == oracle; these
  * prove both compute the thing the operator CLAIMS).
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("text_pack_greedy: packs respect the budget and docs stay contiguous") {
    val rows = SparkEntry.queries("text_pack_greedy")(spark, sf)
      .select(col("source"), col("doc_id").cast("long"), col("ntok").cast("long"),
        col("pack_id").cast("long"), col("off").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val bySource = rows.groupBy(_._1)
    bySource.foreach { case (src, ds) =>
      val sorted = ds.sortBy(_._2)
      // doc_id order never decreases the pack id, and offsets restart at 0
      sorted.sliding(2).foreach {
        case Array((_, _, _, p1, _), (_, _, t2, p2, o2)) =>
          assert(p2 == p1 || p2 == p1 + 1, s"$src: pack ids must step by 0/1")
          if (p2 == p1 + 1) assert(o2 == 0, s"$src: new pack must start at offset 0")
          assert(t2 > 0)
        case _ => ()
      }
      // no multi-doc pack exceeds the budget; single-doc packs may
      // (a doc longer than the budget gets its own pack)
      sorted.groupBy(_._4).foreach { case (p, docs) =>
        val tot = docs.map(_._3).sum
        if (docs.length > 1) assert(tot <= 256, s"$src pack $p holds $tot tokens")
      }
    }
    // every doc appears exactly once
    assert(rows.map(_._2).distinct.length == rows.length)
  }

  test("text_decontaminate: verdicts cover exactly the non-eval docs") {
    val out = SparkEntry.queries("text_decontaminate")(spark, sf)
      .select(col("doc_id").cast("long"), col("contaminated").cast("long")).collect()
    assert(out.forall(_.getLong(0) % 20 != 0), "eval docs must not be scored")
    val nDocs = Tables.documents(spark, sf).filter(col("doc_id") % 20 =!= 0).count()
    assert(out.length.toLong == nDocs)
    val nBad = out.count(_.getLong(1) == 1L)
    assert(nBad > 0, "sf0.01 is known to contain eval-overlapping docs")
  }

  test("pipeline_semdedup: cluster minima survive and some duplicates drop") {
    val v = SparkEntry.queries("pipeline_semdedup")(spark, sf)
      .select(col("vec_id").cast("long"), col("cid").cast("long"),
        col("dropped").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(v.length == Tables.embeddings(spark, sf).count())
    // the lowest vec_id of every cluster can never have a smaller peer
    v.groupBy(_._2).foreach { case (cid, vs) =>
      val m = vs.minBy(_._1)
      assert(m._3 == 0L, s"cluster $cid min ${m._1} was dropped")
    }
    val nDropped = v.count(_._3 == 1L)
    assert(nDropped > 0 && nDropped < v.length / 2,
      s"dropped $nDropped of ${v.length} — expected a small nonzero fraction")
  }

  test("graph_triangles: emitted triangles are canonical and their edges exist") {
    val tri = SparkEntry.queries("graph_triangles")(spark, sf)
      .select(col("a").cast("long"), col("b").cast("long"), col("c").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tri.nonEmpty)
    assert(tri.forall { case (a, b, c) => a < b && b < c })
    assert(tri.distinct.length == tri.length, "each triangle found exactly once")
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
      .agg(count(lit(1)).as("sup")).filter(col("sup") >= 2)
      .select(col("pa").cast("long"), col("pb").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    tri.foreach { case (a, b, c) =>
      assert(edges((a, b)) && edges((b, c)) && edges((a, c)),
        s"triangle ($a,$b,$c) missing an edge")
    }
  }

  test("asof_join_tolerance: staleness is bounded and fields null together") {
    val rows = SparkEntry.queries("asof_join_tolerance")(spark, sf)
      .select(col("asof_orderkey"), col("staleness_days")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), "match fields must null together")
      if (!r.isNullAt(1)) {
        val st = r.getLong(1)
        assert(st >= 0 && st <= 30, s"staleness $st outside tolerance")
      }
    }
    assert(rows.exists(!_.isNullAt(0)), "some probes should match within 30d")
    assert(rows.exists(_.isNullAt(0)), "some probes should be rejected as stale")
  }

  test("events_running_distinct: curve is monotone and ends at the user count") {
    val rows = SparkEntry.queries("events_running_distinct")(spark, sf)
      .orderBy(col("day"))
      .select(col("cum_users").cast("long"), col("dau").cast("long"),
        col("n_new").cast("long"))
      .collect()
    val cums = rows.map(_.getLong(0))
    assert(cums.zip(cums.tail).forall { case (x, y) => y >= x })
    val total = Tables.events(spark, sf).select(countDistinct(col("user_id")))
      .head().getLong(0)
    assert(cums.last == total)
    assert(rows.map(_.getLong(2)).sum == total)
    rows.foreach(r => assert(r.getLong(1) >= r.getLong(2), "dau >= newly seen"))
  }

  test("etl_snapshot_diff: every verdict class appears and unchanged is silent") {
    val v = SparkEntry.queries("etl_snapshot_diff")(spark, sf)
      .groupBy(col("verdict")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v.keySet == Set("added", "removed", "changed"))
    val orders = Tables.orders(spark, sf)
    val added = orders.filter(col("o_orderkey") % 89 === 3).count()
    val removed = orders.filter(col("o_orderkey") % 89 === 5).count()
    assert(v("added") == added)
    assert(v("removed") == removed)
    assert(v("changed") > 0)
  }

  test("etl_checksum_manifest: manifest partitions the corpus exactly") {
    val m = SparkEntry.queries("etl_checksum_manifest")(spark, sf)
      .select(col("n_docs").cast("long")).collect().map(_.getLong(0))
    assert(m.sum == Tables.documents(spark, sf).count())
  }

  test("graph_link_predict: jaccard bounded and wedge counts tie to triangles") {
    val rows = SparkEntry.queries("graph_link_predict")(spark, sf)
      .select(col("cn").cast("long"), col("deg_a").cast("long"),
        col("deg_b").cast("long"), col("jacc_bp").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (cn, da, db, j) =>
      assert(cn <= math.min(da, db), "common neighbors bounded by degree")
      assert(j >= 0 && j <= 10000)
    }
    // each triangle contributes its closing edge pair to cn on all 3 edges
    val nTri = SparkEntry.queries("graph_triangles")(spark, sf).count()
    assert(rows.map(_._1).sum == 3 * nTri,
      "sum of per-edge common neighbors must be 3x the triangle count")
  }

  test("mm_audio_resample: output length is exactly half (rounded up)") {
    val rows = SparkEntry.queries("mm_audio_resample")(spark, sf)
      .select(col("n_in").cast("long"), col("n_out").cast("long")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) == (r.getLong(0) + 1) / 2))
  }

  test("window_ewma: smoothed value stays inside the window's range") {
    val rows = SparkEntry.queries("window_ewma")(spark, sf)
      .orderBy(col("event_type"), col("day"))
      .select(col("event_type"), col("x").cast("long"), col("ewma").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (_, vs) =>
      // first day of each series has nothing to smooth against
      assert(math.abs(vs.head._3 - vs.head._2) < 1e-9)
      vs.sliding(8).foreach { wnd =>
        val e = wnd.last._3
        assert(e >= wnd.map(_._2).min - 1e-9 && e <= wnd.map(_._2).max + 1e-9)
      }
    }
  }

  test("etl_language_mix: rates flatten the language skew deterministically") {
    val rows = SparkEntry.queries("etl_language_mix")(spark, sf)
      .select(col("lang"), col("rate_bp").cast("long"), col("keep").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byLang = rows.groupBy(_._1)
    val counts = byLang.view.mapValues(_.length).toMap
    val majority = counts.maxBy(_._2)._1
    assert(byLang(majority).head._2 < 10000, "over-represented language downsamples")
    counts.filter(_._2 < counts.values.sum / counts.size).keys.foreach { l =>
      assert(byLang(l).head._2 == 10000, s"under-represented $l keeps everything")
    }
    // hash-threshold sampling lands near its rate (binomial, loose bound)
    byLang.foreach { case (l, vs) =>
      val kept = vs.count(_._3 == 1L).toDouble / vs.length
      val rate = vs.head._2 / 10000.0
      assert(math.abs(kept - rate) < 0.15, s"$l kept $kept at rate $rate")
    }
  }

  test("agg_weighted_stats: variance is nonnegative and consistent") {
    SparkEntry.queries("agg_weighted_stats")(spark, sf)
      .select(col("wvar").cast("double"), col("wstddev").cast("double"))
      .collect().foreach { r =>
        assert(r.getDouble(0) >= 0.0)
        assert(math.abs(math.sqrt(r.getDouble(0)) - r.getDouble(1)) < 1e-2)
      }
  }

  test("window_drawdown: nonnegative, zero at peaks, cum is the flow prefix sum") {
    val rows = SparkEntry.queries("window_drawdown")(spark, sf)
      .orderBy(col("event_type"), col("day"))
      .select(col("event_type"), col("flow").cast("long"),
        col("cum").cast("long"), col("drawdown").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, vs) =>
      var cum = 0L; var peak = Long.MinValue
      vs.foreach { case (_, flow, c, dd) =>
        cum += flow; peak = math.max(peak, cum)
        assert(c == cum, "cum must be the prefix sum of flows")
        assert(dd == peak - cum)
        assert(dd >= 0)
      }
      assert(vs.exists(_._4 == 0), "the running peak itself has zero drawdown")
      assert(vs.exists(_._4 > 0), "a +/- series must draw down somewhere")
    }
  }

  test("agg_winsorized_mean: clamping shrinks the tails but keeps ~90% of mass") {
    SparkEntry.queries("agg_winsorized_mean")(spark, sf)
      .select(col("n").cast("long"), col("n_clamped").cast("long"),
        col("winsorized_mean").cast("double"), col("raw_mean").cast("double"))
      .collect().foreach { r =>
        val frac = r.getLong(1).toDouble / r.getLong(0)
        assert(frac > 0.05 && frac < 0.15, s"clamped fraction $frac should be ~10%")
        assert(r.getDouble(2) != r.getDouble(3), "clamping must move a skewed mean")
      }
  }

  test("events_ab_lift: arms partition purchases, assignment is deterministic, z near 0 under the null") {
    val r = SparkEntry.queries("events_ab_lift")(spark, sf).head()
    val nA = r.getLong(0); val nB = r.getLong(1)
    val total = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(nA + nB == total, "every purchase lands in exactly one arm")
    assert(nA > 0 && nB > 0)
    // hash-splitting the SAME traffic is an A/A test: no true lift, so
    // |z| should sit well inside normal range
    assert(math.abs(r.getDouble(4)) < 4, s"A/A z=${r.getDouble(4)}")
    // deterministic: rerun gives the identical readout
    assert(SparkEntry.queries("events_ab_lift")(spark, sf).head() == r)
  }

  test("agg_bitmap_distinct: bitmap popcount equals countDistinct exactly") {
    val got = SparkEntry.queries("agg_bitmap_distinct")(spark, sf)
      .select(col("event_type"), col("n_users").cast("long"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == ref)
  }

  test("q_skyline: every survivor is undominated and every non-survivor is dominated") {
    val sky = SparkEntry.queries("q_skyline")(spark, sf)
      .select(col("p_partkey").cast("long"), col("p_retailprice").cast("double"),
        col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val all = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def dominatedBy(p: (Long, Double, Long)) = all.exists(q =>
      (q._2 < p._2 || (q._2 == p._2 && q._1 < p._1)) && q._3 >= p._3)
    sky.foreach(p => assert(!dominatedBy(p), s"$p is dominated yet emitted"))
    val skySet = sky.map(_._1).toSet
    all.filterNot(p => skySet(p._1))
      .foreach(p => assert(dominatedBy(p), s"$p is undominated yet dropped"))
  }

  test("agg_gini: coefficient bounded and grows under concentration") {
    val g = SparkEntry.queries("agg_gini")(spark, sf)
      .select(col("gini").cast("double")).head().getDouble(0)
    assert(g > 0 && g < 1, s"gini $g out of range")
  }

  test("events_stickiness: dau never exceeds mau and bp mirrors the ratio") {
    SparkEntry.queries("events_stickiness")(spark, sf)
      .select(col("dau").cast("long"), col("mau").cast("long"),
        col("stickiness_bp").cast("long"))
      .collect().foreach { r =>
        assert(r.getLong(0) <= r.getLong(1))
        assert(r.getLong(2) == r.getLong(0) * 10000 / r.getLong(1))
      }
  }

  test("events_bot_burst: every user appears once and flags follow thresholds") {
    val rows = SparkEntry.queries("events_bot_burst")(spark, sf)
      .select(col("user_id").cast("long"), col("min_gap_us").cast("long"),
        col("max_per_hour").cast("long"), col("is_bot").cast("long"))
      .collect()
    assert(rows.length ==
      Tables.events(spark, sf).select(col("user_id")).distinct().count())
    rows.foreach { r =>
      val expect = r.getLong(2) >= 3 || (!r.isNullAt(1) && r.getLong(1) < 60000000L)
      assert(r.getLong(3) == (if (expect) 1L else 0L))
    }
  }

  test("join_spatial_grid: grid blocking finds exactly the brute-force pair set") {
    val got = SparkEntry.queries("join_spatial_grid")(spark, sf)
      .select(col("va").cast("long"), col("vb").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.distinct.length == got.length, "3x3 replication must not duplicate pairs")
    val pts = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").getItem(0).cast("double"),
        col("embedding").getItem(1).cast("double"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val brute = (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib && (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= 0.04 * 0.04
    } yield (ia, ib)).toSet
    assert(got.toSet == brute, s"grid ${got.length} vs brute ${brute.size}")
  }

  test("agg_corr: power-sum correlation agrees with Spark's built-in corr") {
    val got = SparkEntry.queries("agg_corr")(spark, sf)
      .select(col("l_returnflag"), col("corr").cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ref = Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ref.foreach { case (k, c) =>
      assert(math.abs(got(k) - c) < 1e-4, s"$k corr: ${got(k)} vs $c")
    }
  }

  test("etl_k_anonymity: flags partition the audit and at-risk counts are consistent") {
    val rows = SparkEntry.queries("etl_k_anonymity")(spark, sf)
      .select(col("n").cast("long"), col("k_anonymous").cast("long"),
        col("n_at_risk").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).sum == Tables.customer(spark, sf).count())
    rows.foreach { case (n, ka, risk) =>
      assert(ka == (if (n >= 5) 1L else 0L))
      assert(risk == (if (n < 5) n else 0L))
    }
  }

  test("text_compression_ratio: deterministic, bounded, and dup text compresses better") {
    // full-ratio checks run on deflateRatios (the frame the registered
    // query projects its oracle-checkable columns from)
    val a = graft.text.TextQueries.deflateRatios(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val b = graft.text.TextQueries.deflateRatios(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(a.sameElements(b), "fixed-level deflate must be run-deterministic")
    a.foreach { case (_, raw, defl, bp) =>
      assert(raw > 0 && defl > 0)
      assert(bp == defl * 10000 / raw)
      assert(bp < 15000, "deflate never triples text size")
    }
    // the registered query's verdict column must hold on real data
    val q = SparkEntry.queries("text_compression_ratio")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(q.length === a.length)
    q.foreach { case (_, rawLen, wb) =>
      assert(rawLen > 0 && wb === 1L, "deflate must stay within the stored-block bound")
    }
    // a doc made of one repeated sentence must compress far better than
    // the corpus median (the signal the quality gate relies on)
    import spark.implicits._
    val probe = Seq((1L, "the same sentence again. " * 40),
      (2L, a.indices.map(i => s"w${i * 7919}").mkString(" ")))
      .toDF("doc_id", "text")
    val tmp = graft.etl.TmpDirs.dir("deflate_probe")
    probe.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pr = graft.text.TextQueries.deflateRatios(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(pr(1L) < pr(2L) / 3, s"repetition must deflate hard: $pr")
  }

  test("text_bm25_topk: every hit contains a query term and scores rank correctly") {
    val rows = SparkEntry.queries("text_bm25_topk")(spark, sf)
      .select(col("doc_id").cast("long"), col("n_terms").cast("long"),
        col("score").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 20)
    rows.foreach { case (_, nt, s2) =>
      assert(nt >= 1 && nt <= 3)
      assert(s2 > 0, "BM25 of a matched doc is positive")
    }
    // a doc matching all 3 query terms should outrank a same-length doc
    // matching 1 (more IDF mass) — check the top hit has >= 2 terms
    assert(rows.maxBy(_._3)._2 >= 2)
  }

  test("ann_hybrid_rrf: fusion favors docs ranked by both sides") {
    val rows = SparkEntry.queries("ann_hybrid_rrf")(spark, sf)
      .select(col("doc_id").cast("long"), col("rl").cast("long"),
        col("rv").cast("long"), col("rrf").cast("double"))
      .collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      val rl = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val rv = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(rl.nonEmpty || rv.nonEmpty, "fused doc must appear in a ranking")
      val expect = rl.map(x => 1.0 / (x + 60)).getOrElse(0.0) +
        rv.map(x => 1.0 / (x + 60)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - expect) < 1e-12)
    }
    // a doc present in BOTH shortlists beats one present in just one at
    // similar rank — the top fused doc must be a both-sides doc
    val top = rows.maxBy(_.getDouble(3))
    assert(!top.isNullAt(1) && !top.isNullAt(2))
  }

  test("dedup_edit_distance: distance is symmetric-bounded and self-consistent") {
    val rows = SparkEntry.queries("dedup_edit_distance")(spark, sf)
      .select(col("id_a").cast("long"), col("id_b").cast("long"),
        col("lev").cast("long"), col("is_dup").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, lev, dup) =>
      assert(a < b, "pairs are canonical")
      assert(lev >= 0 && lev <= 25)
      assert(dup == (if (lev <= 15) 1L else 0L))
    }
  }

  test("agg_exact_median_2pass: two-pass median equals the single-sort median") {
    val row = SparkEntry.queries("agg_exact_median_2pass")(spark, sf).head()
    val n = row.getLong(0)
    val x2 = row.getLong(1)
    val cents = Tables.orders(spark, sf)
      .select((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(_.getLong(0)).sorted
    assert(n == cents.length)
    val k1 = (n + 1) / 2; val k2 = (n + 2) / 2
    assert(x2 == cents(k1.toInt - 1) + cents(k2.toInt - 1))
  }

  test("text_readability: flesch reproduces its formula and stays finite") {
    val rows = SparkEntry.queries("text_readability")(spark, sf)
      .select(col("n_words").cast("long"), col("n_sents").cast("long"),
        col("n_syll").cast("long"), col("flesch").cast("double"))
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (w, sn, sy, f) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(w > 0 && sn >= 1 && sy >= w, "syllables clamped to >=1 per word")
      val expect = 206.835 - 1.015 * (w.toDouble / sn) - 84.6 * (sy.toDouble / w)
      assert(math.abs(f - expect) < 1e-3)
    }
  }

  test("abc_pareto: classes partition the catalog and cumulate to exactly 100%") {
    val rows = SparkEntry.queries("abc_pareto")(spark, sf)
      .select(col("part").cast("long"), col("rev_e4").cast("long"),
        col("cum_bp").cast("long"), col("abc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val nParts = Tables.lineitem(spark, sf).select(col("l_partkey")).distinct().count()
    assert(rows.length == nParts, "every selling part is classified exactly once")
    assert(rows.map(_._4).toSet == Set("A", "B", "C"))
    assert(rows.maxBy(_._3)._3 == 10000, "last item cumulates to exactly 100%")
    // ranking by revenue desc must give monotone cum_bp
    val byRank = rows.sortBy(r => (-r._2, r._1)).map(_._3)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => b >= a })
    // the A class is the head of the ranking (never interleaved)
    val classes = rows.sortBy(r => (-r._2, r._1)).map(_._4)
    assert(classes.mkString.matches("A+B+C+"))
  }

  test("graph_bfs_khop: dist-0 is the seed set and every level is edge-adjacent to the previous") {
    val dist = SparkEntry.queries("graph_bfs_khop")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist.values.forall(d => d >= 0 && d <= 3))
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = li.as("x").join(li.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("pa"), col("y.l_partkey").as("pb"))
      .agg(count(lit(1)).as("sup")).filter(col("sup") >= 2)
      .select(col("pa").cast("long"), col("pb").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keySet
    assert(dist.filter(_._2 == 0L).keySet == nodes.filter(_ % 97 == 0))
    dist.filter(_._2 > 0).foreach { case (n, d) =>
      assert(adj(n).exists(m => dist.get(m).contains(d - 1)),
        s"node $n at dist $d needs a neighbor at dist ${d - 1}")
    }
    // min-dist property: no node has a neighbor two levels closer
    dist.foreach { case (n, d) =>
      assert(adj(n).forall(m => dist.getOrElse(m, 4L) >= d - 1))
    }
  }

  test("agg_skew_kurtosis: moment formulas agree with Spark's built-in estimators") {
    val got = SparkEntry.queries("agg_skew_kurtosis")(spark, sf)
      .select(col("l_returnflag"), col("skewness").cast("double"),
        col("kurtosis").cast("double"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val ref = Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(skewness(col("l_quantity")).as("sk"), kurtosis(col("l_quantity")).as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    ref.foreach { case (k, (sk, ku)) =>
      assert(math.abs(got(k)._1 - sk) < 1e-3, s"$k skewness")
      assert(math.abs(got(k)._2 - ku) < 1e-3, s"$k kurtosis")
    }
  }

  test("text_zipf_slope: every language fits a falling power law") {
    val rows = SparkEntry.queries("text_zipf_slope")(spark, sf)
      .select(col("lang"), col("n_terms").cast("long"), col("zipf_slope").cast("double"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 10, s"${r.getString(0)} needs enough terms to fit")
      assert(r.getDouble(2) < 0, s"${r.getString(0)} slope must be negative")
    }
  }

  test("events_time_to_convert: buckets partition the viewing users") {
    val rows = SparkEntry.queries("events_time_to_convert")(spark, sf)
      .select(col("bucket"), col("n_users").cast("long")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val nViewers = Tables.events(spark, sf).filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_._2).sum == nViewers, "every viewer lands in exactly one bucket")
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("events_anomaly_mad + window_rolling_median: robust stats stay in range") {
    val mad = SparkEntry.queries("events_anomaly_mad")(spark, sf)
      .select(col("mad").cast("double"), col("med").cast("double"),
        col("x").cast("long"), col("is_outlier").cast("long")).collect()
    mad.foreach { r =>
      assert(r.getDouble(0) >= 0)
      assert(r.getLong(3) == (if (math.abs(r.getLong(2) - r.getDouble(1)) >
        5 * r.getDouble(0)) 1L else 0L))
    }
    val med = SparkEntry.queries("window_rolling_median")(spark, sf)
      .groupBy(col("event_type"))
      .agg(min(col("med7")).as("lo"), max(col("med7")).as("hi"),
        min(col("x")).as("xlo"), max(col("x")).as("xhi"))
      .collect()
    med.foreach { r =>
      assert(r.getLong(1) >= r.getLong(3), "median can't fall below the floor")
      assert(r.getLong(2) <= r.getLong(4), "median can't exceed the ceiling")
    }
  }

  test("etl_dq_rules: audit covers every rule, counts full tables, pass ties to violations") {
    val rows = SparkEntry.queries("etl_dq_rules")(spark, sf)
      .select(col("rule"), col("tbl"), col("n_checked").cast("long"),
        col("n_violations").cast("long"), col("pass").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).sorted.toSeq == Seq("r1_li_orphans", "r2_ship_before_order",
      "r3_price_positive", "r4_nchars_consistent", "r5_ts_in_window"))
    // n_checked is the FULL table cardinality — a rule that silently
    // filters its input is lying about coverage
    val expect = Map(
      "lineitem" -> Tables.lineitem(spark, sf).count(),
      "orders" -> Tables.orders(spark, sf).count(),
      "documents" -> Tables.documents(spark, sf).count(),
      "events" -> Tables.events(spark, sf).count())
    rows.foreach { case (r, t, n, v, p) =>
      assert(n == expect(t), s"$r checked $n of ${expect(t)} $t rows")
      assert(p == (if (v == 0) 1L else 0L), s"$r: pass must mirror violations")
    }
    // the synthetic data draws ship/order dates independently, so the
    // temporal-consistency rule MUST fire — proves violations are counted
    val r2 = rows.find(_._1 == "r2_ship_before_order").get
    assert(r2._4 > 0 && r2._5 == 0, "temporal rule must fire on this data")
  }

  test("text_quality_calibrated: roughly half of each language clears its median") {
    val rows = SparkEntry.queries("text_quality_calibrated")(spark, sf)
      .select(col("lang"), col("keep").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    rows.groupBy(_._1).foreach { case (lang, vs) =>
      val frac = vs.count(_._2 == 1L).toDouble / vs.length
      assert(frac >= 0.4 && frac <= 0.7, s"$lang keeps $frac — not a median gate")
    }
  }
}
