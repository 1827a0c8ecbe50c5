package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality gates for the approximate operators: the correctness gate
  * proves they compute WHAT they claim deterministically; these tests
  * prove the claims are WORTH computing — ANN candidates actually
  * contain the true neighbors, sketches actually land near the exact
  * answers. Deterministic inputs => these are stable numbers, so the
  * floors are tight enough to catch a degenerate hash/probe choice
  * (a 6-plane single-table LSH scored 0.12 here; the shipped 5x3
  * multi-table index scores 0.74).
  */
class QualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("ensemble excerpt recall clears 0.95 at corpus scale, and the floor binds") {
    // the r15 asymmetric-recall claim (0.996 measured on the committed
    // gen_excerpt corpus) pinned IN the gate: a deterministic
    // ~550-doc open-vocab corpus with ~10% contiguous-slice excerpt
    // plants (the containment-not-Jaccard geometry width-1 bands
    // exist for). Floor at production EnsembleBandCap, plus a
    // binding proof: a recall-breaking cap (1 — every >=2-doc bucket
    // drops, so no collisions survive) must fall BELOW the floor, so
    // a future cap retune cannot silently trade recall away.
    val rnd = new scala.util.Random(46)
    val vocab = {
      val seen = scala.collection.mutable.LinkedHashSet[String]()
      while (seen.size < 2000)
        seen += (1 to (2 + rnd.nextInt(9))).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      seen.toIndexedSeq
    }
    // log-uniform rank draw ~ Zipf-ish: informative (non-saturating) shingles
    def zw(): String = vocab(math.min(1999, (math.pow(2000.0, rnd.nextDouble()) - 1).toInt))
    val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val plants = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val isExcerpt = scala.collection.mutable.ArrayBuffer[Boolean]()
    for (i <- 0 until 550) {
      val srcIdx =
        if (i > 20 && rnd.nextDouble() < 0.10)
          (0 until 20).map(_ => rnd.nextInt(i))
            .find(j => !isExcerpt(j) && docs(j)._2.split(' ').length >= 40)
        else None
      srcIdx match {
        case Some(j) =>
          val tp = docs(j)._2.split(' ')
          val m = math.max(8, (tp.length * (0.25 + rnd.nextDouble() * 0.25)).toInt)
          val start = rnd.nextInt(tp.length - m + 1)
          docs += ((i.toLong, tp.slice(start, start + m).mkString(" ")))
          plants += ((j.toLong, i.toLong))
          isExcerpt += true
        case None =>
          docs += ((i.toLong, Seq.fill(40 + rnd.nextInt(81))(zw()).mkString(" ")))
          isExcerpt += false
      }
    }
    assert(plants.size >= 20, s"fixture degenerated: only ${plants.size} plants")
    val dir = graft.etl.TmpDirs.dir("ensemble_recall_spec")
    import spark.implicits._
    docs.toSeq.map { case (id, t) => (id, t, "en", s"src${id % 7}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def recallAt(cap: Long): Double = {
      val got = graft.dedup.DedupQueries.containmentEnsemble(spark, dir, cap)
        .select(col("da"), col("db")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.Caches.releaseAll()
      plants.count(got).toDouble / plants.size
    }
    val r = recallAt(graft.dedup.DedupQueries.EnsembleBandCap)
    info(s"ensemble excerpt recall = $r over ${plants.size} plants")
    assert(r >= 0.95, s"ensemble excerpt recall $r below floor")
    val broken = recallAt(1L)
    assert(broken < 0.95,
      s"cap=1 still scored $broken — the floor no longer binds, rebuild the fixture")
  }

  test("count-min sketch never underestimates and stays within the collision budget") {
    // CMS one-sided error is a THEOREM (counters only ever add):
    // est >= true for every key; and est - true <= 3N/width is the
    // Markov bound at 3x the expected colliding mass (width 1024,
    // depth 4 makes exceeding it on ALL four rows at once a
    // degenerate-hash signal, not noise)
    val rows = SparkEntry.queries("agg_count_min_sketch")(spark, sf)
      .select(col("true_cnt").cast("long"), col("est_cnt").cast("long"),
        col("over_bp").cast("long")).collect()
    assert(rows.length === 20)
    val n = spark.read.parquet(s"$sf/lineitem.parquet").count()
    val budget = 3L * n / 1024
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(0), s"CMS underestimated: $r")
      assert(r.getLong(1) - r.getLong(0) <= budget,
        s"overestimate ${r.getLong(1) - r.getLong(0)} beyond 3N/width=$budget")
    }
  }

  test("holt linear smoothing recovers an exact linear trend") {
    // on y_t = 10 + 3t the recursion's fixed point is level = y_t,
    // trend = 3: feed a synthetic series through the SAME fold and
    // check convergence to the true trend
    val n = 20
    // replay the query's arithmetic directly
    var l = 10.0 + 3.0 * 1
    var b = (10.0 + 3.0 * 2) - (10.0 + 3.0 * 1)
    (2 to n).foreach { t =>
      val y = 10.0 + 3.0 * t
      val lNew = (y + l + b) / 2.0
      b = (lNew - l) / 4.0 + 3.0 * b / 4.0
      l = lNew
    }
    assert(math.abs(b - 3.0) < 1e-6, s"trend $b")
    assert(math.abs(l - (10.0 + 3.0 * n)) < 1e-4, s"level $l")
  }

  test("cusum changepoint finds a planted level shift at the right day") {
    // series: 14 days at 10 then 14 days at 50 -> split at t=14
    val xs = Seq.fill(14)(10L) ++ Seq.fill(14)(50L)
    val n = xs.length.toLong
    val sn = xs.sum
    val best = xs.indices.dropRight(1).map { i =>
      val t = (i + 1).toLong
      val st = xs.take(i + 1).sum
      (math.abs(n * st - t * sn), -t)
    }.max
    assert(-best._2 === 14L, s"planted shift found at ${-best._2}")
  }

  private def topkSets(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sf)
      .select(col("qid").cast("long"), col("vec_id").cast("long"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  private def meanRecallAt5(name: String): Double = {
    val truth = topkSets("ann_bruteforce_topk")
    val got = topkSets(name)
    val recalls = truth.map { case (q, t) => got.getOrElse(q, Set.empty).count(t).toDouble / 5 }
    recalls.sum / recalls.size
  }

  // Floors below sit at measured−0.05 (r18, VERDICT r17 Next #6): the
  // fixtures are deterministic, so the measured recalls are stable
  // numbers and a loose floor is a dead zone where a real regression —
  // a quantizer bug, a bad HierSwitchN interaction — passes silently.
  // Each test records its measured value (sf0.01 fixture) beside the
  // floor.

  test("ann_lsh_topk recall@5 vs brute force clears 0.68 (measured 0.74)") {
    val r = meanRecallAt5("ann_lsh_topk")
    info(s"LSH mean recall@5 = $r")
    assert(r >= 0.68, s"LSH mean recall@5 = $r")
  }

  test("ann_multiprobe_lsh recall@5 clears plain LSH on the same geometry") {
    // multi-probe's whole claim: the 1-plane-flip probe expansion buys
    // recall WITHOUT more tables — it can only widen each table's
    // candidate set, so per-query recall dominates plain LSH exactly.
    val mp = meanRecallAt5("ann_multiprobe_lsh")
    val plain = meanRecallAt5("ann_lsh_topk")
    info(s"multiprobe mean recall@5 = $mp (plain LSH $plain)")
    assert(mp >= plain, s"multiprobe recall $mp < plain LSH $plain")
    assert(mp >= 0.95, s"multiprobe mean recall@5 = $mp (measured 1.0)")
  }

  test("vec_knn_graph recall@3 vs brute-force neighbors clears 0.75 (measured 0.80)") {
    // the round-12 scale path (trained-IVF-cell blocking, cells
    // proportional to the corpus) must stay a usable kNN-graph
    // constructor: measured 0.80 at sf0.01 (probe=4, ~4 vectors/cell)
    import graft.functions.VectorFunctions
    val e = Tables.embeddings(spark, sf).select(col("vec_id"),
      col("embedding"), VectorFunctions.norm(col("embedding")).as("nrm"))
    val truth = e.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        round(VectorFunctions.dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 4).as("cos"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
          .orderBy(col("cos").desc, col("dst"))))
      .filter(col("rn") <= 3)
      .select(col("src").cast("long"), col("dst").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("vec_knn_graph")(spark, sf)
      .select(col("src").cast("long"), col("dst").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.Caches.releaseAll()
    assert(truth.nonEmpty)
    val recall = truth.count(got).toDouble / truth.size
    info(s"kNN-graph recall@3 = $recall")
    assert(recall >= 0.75, s"kNN-graph recall@3 = $recall")
  }

  test("ann_ivf_hierarchical recall@3 vs brute-force neighbors clears 0.72 (measured 0.77)") {
    // the two-level coarse→fine regime matches the flat graph's floor
    // (measured 0.77 at sf0.01 with kc=256 × kf=16, probes 4×2; flat
    // vec_knn_graph measured 0.80) — the floor guards against a
    // probe-width or kf retune silently collapsing coverage
    import graft.functions.VectorFunctions
    val e = Tables.embeddings(spark, sf).select(col("vec_id"),
      col("embedding"), VectorFunctions.norm(col("embedding")).as("nrm"))
    val truth = e.as("a").join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        round(VectorFunctions.dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 4).as("cos"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
          .orderBy(col("cos").desc, col("dst"))))
      .filter(col("rn") <= 3)
      .select(col("src").cast("long"), col("dst").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("ann_ivf_hierarchical")(spark, sf)
      .select(col("src").cast("long"), col("dst").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.Caches.releaseAll()
    assert(truth.nonEmpty)
    val recall = truth.count(got).toDouble / truth.size
    info(s"hierarchical kNN recall@3 = $recall")
    assert(recall >= 0.72, s"hierarchical kNN recall@3 = $recall")
  }

  test("vec_knn_graph edges agree with brute-force neighbors where candidates exist") {
    // the LSH-blocked kNN graph is approximate by construction, but
    // every emitted edge must be a genuine high-cosine pair: each
    // (src, dst, cos) edge's cosine must match the exact pairwise
    // cosine (the blocking only limits WHICH pairs are scored, never
    // the score), and each src's rank-1 edge must be its best among
    // the emitted candidates (window correctness).
    val edges = SparkEntry.queries("vec_knn_graph")(spark, sf)
    val n = edges.count()
    assert(n > 0)
    val perSrc = edges.groupBy(col("src"))
      .agg(countDistinct(col("rn")).as("d"), count(lit(1)).as("c"))
      .filter(col("d") =!= col("c")).count()
    assert(perSrc == 0, "duplicate ranks within a src's edge list")
    val badRank = edges.as("a").join(edges.as("b"),
        col("a.src") === col("b.src") && (col("a.rn") < col("b.rn")) &&
          (col("a.cos") < col("b.cos"))).count()
    assert(badRank == 0, "edge ranked better with lower cosine")
  }

  test("ann_ivf_hier_topk recall@5 vs brute force clears 0.56 (measured 0.62)") {
    // 0.62 measured at sf0.01 (4 coarse x 2 fine probes) — between
    // flat ann_ivf_topk's 0.60 and ann_ivf_trained's 0.72. Since r18
    // this body IS the hier leg of the adaptive ann_ivf_trained, so
    // the floor also guards what the adaptive route serves past
    // HierSwitchN.
    val r = meanRecallAt5("ann_ivf_hier_topk")
    info(s"hier ANN recall@5 = $r")
    assert(r >= 0.56, s"hierarchical IVF mean recall@5 = $r")
  }

  test("ann_ivf_topk recall@5 vs brute force clears 0.54 (measured 0.60)") {
    val r = meanRecallAt5("ann_ivf_topk")
    info(s"IVF mean recall@5 = $r")
    assert(r >= 0.54, s"IVF mean recall@5 = $r")
  }

  test("ann_ivf_trained recall@5 vs brute force clears 0.66 (measured 0.72)") {
    // trained quantizer should not be WORSE than the seed-sampled one
    // (measured 0.72 at k=128/nprobe=16 vs untrained ann_ivf_topk 0.60
    // at sf0.01 — the sf0.01 fixture sits below HierSwitchN, so this
    // measures the adaptive entry's FLAT leg)
    val r = meanRecallAt5("ann_ivf_trained")
    info(s"trained-IVF mean recall@5 = $r")
    assert(r >= 0.66, s"trained-IVF mean recall@5 = $r")
  }

  test("trained quantizer model is fixed-k: cell count never tracks the corpus") {
    // the round-7 scale flaw: k = n/50 grew the driver-side model and
    // the literal-centroid plan with the corpus. Pin that the trained
    // model is bounded by the kmeansK config constant regardless of
    // input size (128 cells at sf0.01's 500 vectors AND sf0.1's 2000).
    val k = SparkEntry.queries("kmeans_train")(spark, sf)
      .select(col("cid")).distinct().count()
    assert(k <= 128, s"trained model has $k cells — must stay <= kmeansK")
    assert(k >= 64, s"trained model collapsed to $k cells")
  }

  test("ann_binary_hamming recall@5 vs brute force clears 0.4") {
    // 63 sign bits keep ~0.5+ of the true top-5 on the weakly-clustered
    // test embeddings; the floor catches a broken signature/popcount,
    // not SOTA recall
    val r = meanRecallAt5("ann_binary_hamming")
    assert(r >= 0.4, s"binary-Hamming mean recall@5 = $r")
  }

  test("vec_matryoshka_rerank recall@5 vs brute force clears 0.5") {
    // the head-16 slice of these synthetic embeddings is an unusually
    // good coarse scorer; a degraded slice/rerank wiring would crater
    // well below this floor
    val r = meanRecallAt5("vec_matryoshka_rerank")
    assert(r >= 0.5, s"matryoshka mean recall@5 = $r")
  }

  test("ann_reranked recall@5 beats the PQ-only ranking") {
    // the whole point of the rerank stage: exact cosine over the
    // 32-candidate ADC shortlist must recover (strictly more of) the
    // true cosine top-5 than any PQ-distance ordering can
    val r = meanRecallAt5("ann_reranked")
    assert(r >= 0.3, s"reranked mean recall@5 = $r")
  }

  test("ann_pq_topk recall@5 vs exact L2 clears 0.2") {
    // PQ ranks by L2 ADC, so the truth set is exact L2 top-5 (NOT the
    // cosine brute-force query). 16 data-seeded sub-centroids score
    // 0.28 on this weakly-clustered corpus (random codebooks: 0.22);
    // the floor catches a degenerate codebook, not SOTA recall — real
    // deployments train 8-bit codebooks with kmeans_train's machinery.
    val e = Tables.embeddings(spark, sf)
    val p = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("q"))
    val dist = aggregate(
      zip_with(col("embedding"), col("q"),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val truth = e.crossJoin(p).select(col("qid"), col("vec_id"), dist.as("d"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("d"), col("vec_id"))))
      .filter(col("rn") <= 5)
      .select(col("qid").cast("long"), col("vec_id").cast("long")).collect()
      .groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val got = topkSets("ann_pq_topk")
    val recalls = truth.map { case (q, t) => got.getOrElse(q, Set.empty).count(t).toDouble / 5 }
    val r = recalls.sum / recalls.size
    assert(r >= 0.2, s"PQ-ADC mean recall@5 vs exact L2 = $r")
  }

  test("agg_hll_union per-group and MERGED estimates land within 5% of exact") {
    // the 5% comparison now runs IN-PLAN (within_bound, oracle-checked);
    // this spec pins the in-plan verdict against an independent exact
    // recomputation — including that the merged scope deduplicates
    // across groups rather than summing estimates
    val got = SparkEntry.queries("agg_hll_union")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exactPer = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = Tables.orders(spark, sf)
      .agg(countDistinct(col("o_custkey"))).collect()(0).getLong(0)
    exactPer.foreach { case (k, exact) =>
      val (e, wb) = got(k)
      assert(e === exact, s"per-group $k exact column drifted")
      assert(wb === 1L, s"per-group $k sketch estimate out of 5% bound")
    }
    val (eAll, wbAll) = got("(all)")
    assert(eAll === exactAll && wbAll === 1L,
      s"merged scope: exact $eAll vs $exactAll, within_bound $wbAll")
  }

  test("dedup_embedding LSH blocking recovers most true near-dup pairs") {
    // Truth = ALL pairs with rounded cosine >= 0.3 (brute force is fine at
    // sf0.01: 500 vectors). The registered query only scores pairs that
    // collide in >=1 of the 6 LSH tables — this asserts the banding
    // geometry actually surfaces the real pairs, not just *some* pairs.
    import graft.functions.VectorFunctions
    val e = Tables.embeddings(spark, sf).select(col("vec_id"),
      col("embedding"), VectorFunctions.norm(col("embedding")).as("nrm"))
    val truth = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        round(VectorFunctions.dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 4).as("cos"))
      .filter(col("cos") >= 0.3)
      .select(col("va").cast("long"), col("vb").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("dedup_embedding")(spark, sf)
      .select(col("va").cast("long"), col("vb").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.Caches.releaseAll()
    assert(truth.nonEmpty)
    assert(got.subsetOf(truth), "LSH-blocked pairs must be a subset of true pairs")
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.5, s"embedding pair recall = $recall (${got.size}/${truth.size})")
  }

  test("edit-distance banded blocking keeps the exhaustive-block dup pairs") {
    // Round 7 flagged the bare (length-bucket, first-char) blocking as
    // O(block²) in hot blocks; the fix adds 4 MinHash bands over the
    // head's char 4-grams to the key. Truth = the OLD exhaustive
    // blocking's verdicts (every (lb, c1) pair at lev <= 15); the
    // banded query must recover nearly all of them (measured 1.0 at
    // sf0.01 AND sf0.1 — planted near-dups share most 4-grams, so some
    // band's min-gram collides).
    val docs = Tables.documents(spark, sf).select(col("doc_id"),
      (col("n_chars") / 20).cast("long").as("lb"),
      substring(col("text"), 1, 1).as("c1"),
      substring(col("text"), 1, 60).as("head"))
    val truth = docs.as("a").join(docs.as("b"),
        col("a.lb") === col("b.lb") && col("a.c1") === col("b.c1") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(levenshtein(col("a.head"), col("b.head")) <= 15)
      .select(col("a.doc_id").cast("long"), col("b.doc_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("dedup_edit_distance")(spark, sf)
      .filter(col("is_dup") === 1)
      .select(col("id_a").cast("long"), col("id_b").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    assert(got.subsetOf(truth), "banded pairs must be a subset of exhaustive-block pairs")
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.9, s"edit-distance pair recall = $recall (${got.size}/${truth.size})")
  }

  test("approx_count_distinct lands within 5% of exact per group") {
    // the 5% comparison now runs IN-PLAN (within_bound, oracle-checked);
    // pin the verdict and the exact columns against an independent twin
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf)
    val exactDf = Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("tp"),
        countDistinct(col("l_orderkey")).as("to"))
    val joined = approx.join(exactDf, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("exact_parts") === r.getAs[Long]("tp"))
      assert(r.getAs[Long]("exact_orders") === r.getAs[Long]("to"))
      assert(r.getAs[Long]("within_bound") === 1L,
        s"sketch out of 5% bound for ${r.getAs[String]("l_returnflag")}")
    }
  }

  test("minhash signature agreement estimates true Jaccard within sketch error") {
    import graft.functions.{Hashing, TextFunctions}
    // signatures + true shingle sets for every doc, computed from the
    // same primitives the dedup family registers
    val sigCols = (0 until 16).map(i =>
      Hashing.minHashAffine(i, col("hs")).as(s"sig$i"))
    val base = Tables.documents(spark, sf)
      .filter(size(TextFunctions.cleanTokens(col("text"))) >= 3)
      .select(col("doc_id").cast("long").as("doc_id"),
        transform(TextFunctions.shingleSet(col("text"), 3),
          s => Hashing.md5Long32(s)).as("hs"))
    val rows = base.select(col("doc_id") +: col("hs") +: sigCols: _*).collect()
    val sets = rows.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[scala.collection.Seq[Long]]("hs").toSet).toMap
    val sigs = rows.map(r => r.getAs[Long]("doc_id") ->
      (0 until 16).map(i => r.getAs[Long](s"sig$i"))).toMap
    // candidate pairs the LSH banding actually surfaces
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select(col("da").cast("long"), col("db").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val errs = pairs.map { case (a, b) =>
      val trueJ = sets(a).intersect(sets(b)).size.toDouble / sets(a).union(sets(b)).size
      val estJ = sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 16.0
      math.abs(estJ - trueJ)
    }
    val mae = errs.sum / errs.size
    // 16 permutations => per-pair sigma ~ sqrt(J(1-J)/16) <= 0.125
    assert(mae <= 0.2, s"minhash estimator MAE = $mae over ${errs.size} pairs")
  }

  test("int8 quantization reconstructs within half a quantization step") {
    // round-to-nearest symmetric quantization: |x - q*scale/127| <= scale/254
    val xd = transform(col("embedding"), x => x.cast("double"))
    val bad = Tables.embeddings(spark, sf)
      .withColumn("scale", array_max(transform(xd, x => abs(x))))
      .withColumn("q", transform(xd, x => floor(x * 127.0 / col("scale") + 0.5).cast("long")))
      .withColumn("max_err", aggregate(
        zip_with(col("q"), xd, (qi, x) => abs(qi * col("scale") / 127.0 - x)),
        lit(0.0), (a, x) => greatest(a, x)))
      .filter(col("max_err") > col("scale") / 254.0 * 1.000001)
      .count()
    assert(bad === 0L)
  }

  test("ann_ivf_pq recall@5 vs exact L2 clears 0.15") {
    // IVF-PQ compounds two approximations: nprobe/128 cell coverage on
    // top of the 16-entry PQ codebook, so its floor sits below
    // ann_pq_topk's 0.2. Truth excludes self (the query does too).
    val e = Tables.embeddings(spark, sf)
    val p = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("q"))
    val dist = aggregate(
      zip_with(col("embedding"), col("q"),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val truth = e.crossJoin(p).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), dist.as("d"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("d"), col("vec_id"))))
      .filter(col("rn") <= 5)
      .select(col("qid").cast("long"), col("vec_id").cast("long")).collect()
      .groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val got = topkSets("ann_ivf_pq")
    val recalls = truth.map { case (q, t) => got.getOrElse(q, Set.empty).count(t).toDouble / 5 }
    val r = recalls.sum / recalls.size
    assert(r >= 0.15, s"IVF-PQ mean recall@5 vs exact L2 = $r")
  }

  test("bloom manifest admits every partition that truly holds the key") {
    // the bloom guarantee: false positives allowed, false negatives
    // never — a probe must see at least every truly-containing file
    val bad = SparkEntry.queries("etl_bloom_manifest")(spark, sf)
      .filter(col("n_parts_bloom") < col("n_parts_true"))
      .count()
    assert(bad === 0L, "bloom manifest produced a false negative")
  }

  test("CUPED readout is internally consistent") {
    val r = SparkEntry.queries("events_ab_cuped")(spark, sf).collect().head
    val pct = r.getAs[Double]("var_reduction_pct")
    assert(pct >= 0.0 && pct <= 100.0, s"rho^2 out of range: $pct")
    assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
  }

  test("approx_percentile lands within bound of the exact percentile per group") {
    // the bound comparison now runs IN-PLAN (within_bound,
    // oracle-checked); pin the verdict and that the exact columns agree
    // with agg_percentiles' independent computation of the same stats
    val approx = SparkEntry.queries("agg_approx_percentiles")(spark, sf)
    val exact = SparkEntry.queries("agg_percentiles")(spark, sf)
      .select(col("l_returnflag"), col("p50"), col("p99"))
    val joined = approx.join(exact, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Double]("p50_exact") === r.getAs[Double]("p50"), s"p50 twin drift: $r")
      assert(r.getAs[Double]("p99_exact") === r.getAs[Double]("p99"), s"p99 twin drift: $r")
      assert(r.getAs[Long]("within_bound") === 1L, s"approx out of bound: $r")
    }
  }

  test("ann_maxsim_topk late-interaction ranking recovers the full-dim cosine top-5") {
    // MaxSim is exact over its own scorer (8x8-dim sub-vector late
    // interaction); this floor relates it to the exact full-dim cosine
    // top-5. On this synthetic near-isotropic corpus the per-sub-vector
    // max adds positive bias noise that swamps most alignment signal
    // (real ColBERT token embeddings are clustered, arbitrary 8-dim
    // chunks of one vector are not), so agreement is weak BY GEOMETRY:
    // measured 0.08 both here and in an independent DuckDB replay,
    // vs ~0.01 for random top-5 of 499. The floor catches a DEGENERATE
    // scorer (wrong slice bounds, dropped max, sum over the wrong key
    // all land at random), not retrieval quality.
    val r = meanRecallAt5("ann_maxsim_topk")
    assert(r >= 0.04, s"maxsim mean recall@5 vs exact cosine = $r (random ~= 0.01)")
  }

  test("ann_range_search returns a pure subset of the true epsilon-ball, most of it (measured 0.77)") {
    // Truth = EVERY (qid, vec) pair with rounded cosine >= 0.25 (brute
    // force at sf0.01: 10 probes x 500 vectors). The registered query
    // only scores LSH candidates, and exact cosine confirms each — so
    // precision must be 1.0 by construction (asserted as subset) and
    // the 5x3 banded index must surface nearly the whole ball.
    import graft.functions.VectorFunctions
    val e = Tables.embeddings(spark, sf).select(col("vec_id"),
      col("embedding"), VectorFunctions.norm(col("embedding")).as("nrm"))
    val p = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("nrm").as("qnrm"))
    val truth = e.crossJoin(p).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(VectorFunctions.dot(col("qv"), col("embedding"))
          / (col("qnrm") * col("nrm")), 4).as("cos"))
      .filter(col("cos") >= 0.25)
      .select(col("qid").cast("long"), col("vec_id").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("ann_range_search")(spark, sf)
      .select(col("qid").cast("long"), col("vec_id").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    assert(got.subsetOf(truth), "range-search pairs must be a subset of the true ball")
    val recall = got.size.toDouble / truth.size
    info(s"epsilon-ball recall = $recall (${got.size}/${truth.size})")
    assert(recall >= 0.72, s"epsilon-ball recall = $recall (${got.size}/${truth.size})")
  }

  // ── r18 hier-leg floors: the three new forced-hier twins pin what
  // the adaptive probe-query entries serve PAST HierSwitchN, so each
  // needs its own quality floor — a hier-leg recall collapse at gate
  // scale would otherwise only surface on a >4096-vector corpus.
  // Floors at measured−0.05 like the rest of the family. NOTE on the
  // levels: the sf0.01 fixture (500 vectors) sits far BELOW
  // HierSwitchN, where the hier index is deliberately the worse
  // choice — the adaptive entries serve the flat leg here. These
  // floors pin the twins against a WIRING regression at gate scale;
  // the hier leg's serving quality where it actually serves is
  // calibrated by ann_hier_probe_recall_curve and the >switch
  // falsifier corpus (tools/gate5k_verify.sh).

  test("ann_reranked_hier recall@5 vs brute force clears 0.51 (measured 0.56)") {
    // hier key-intersection candidates -> candidate-only ADC shortlist
    // -> exact rerank; the candidate set is ann_ivf_hier_topk's
    // (measured 0.62), and ADC shortlisting inside it can only lose a
    // little more.
    val r = meanRecallAt5("ann_reranked_hier")
    info(s"hier reranked mean recall@5 = $r")
    assert(r >= 0.51, s"hier reranked mean recall@5 = $r")
  }

  test("ann_filtered_topk_hier recovers the exact within-label top-5 (measured 0.46)") {
    // the flat ann_filtered_topk leg is EXACT within the probe's label
    // slice (it scans the whole slice), so it is the truth set for the
    // hier leg's label ∧ (cid, fid) intersection. 0.46 at 500 vectors:
    // label ∧ key intersection leaves ~tens of candidates per probe —
    // exactly the below-switch regime the adaptive entry routes to
    // flat.
    val truth = topkSets("ann_filtered_topk")
    val got = topkSets("ann_filtered_topk_hier")
    val recalls = truth.map { case (q, t) =>
      got.getOrElse(q, Set.empty).count(t).toDouble / t.size }
    val r = recalls.sum / recalls.size
    info(s"hier filtered mean recall@5 vs exact-within-label = $r")
    assert(r >= 0.41, s"hier filtered mean recall@5 = $r")
  }

  test("ann_range_search_hier is a pure subset of the true ball, most of it (measured 0.57)") {
    import graft.functions.VectorFunctions
    val e = Tables.embeddings(spark, sf).select(col("vec_id"),
      col("embedding"), VectorFunctions.norm(col("embedding")).as("nrm"))
    val p = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("nrm").as("qnrm"))
    val truth = e.crossJoin(p).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(VectorFunctions.dot(col("qv"), col("embedding"))
          / (col("qnrm") * col("nrm")), 4).as("cos"))
      .filter(col("cos") >= 0.25)
      .select(col("qid").cast("long"), col("vec_id").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("ann_range_search_hier")(spark, sf)
      .select(col("qid").cast("long"), col("vec_id").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    assert(got.subsetOf(truth), "hier range pairs must be a subset of the true ball")
    val recall = got.size.toDouble / truth.size
    info(s"hier epsilon-ball recall = $recall (${got.size}/${truth.size})")
    assert(recall >= 0.52, s"hier epsilon-ball recall = $recall")
  }

  test("centroid-classifier accuracy beats chance by 2.5x") {
    // 10 labels -> chance is 1000 bp on the confusion diagonal; the
    // synthetic labels are weak clusters, but the centroid classifier
    // must still recover well above chance or the distance plumbing
    // is broken (observed: ~4100 bp).
    val rows = SparkEntry.queries("vec_centroid_confusion")(spark, sf)
      .select(col("label").cast("long"), col("assigned").cast("long"),
        col("n").cast("long")).collect()
    val total = rows.map(_.getLong(2)).sum
    val diag = rows.filter(r => r.getLong(0) == r.getLong(1)).map(_.getLong(2)).sum
    val accBp = diag * 10000 / total
    assert(accBp >= 2500, s"diagonal accuracy = $accBp bp")
  }

  test("simplified silhouette stays in range and near-neutral on the weak labels") {
    // s in [-1, 1] by construction; these labels barely cluster, so a
    // big |mean| either way would mean the a/b distance wiring flipped
    val rows = SparkEntry.queries("vec_simplified_silhouette")(spark, sf)
      .select(col("mean_sil")).collect().map(_.getDouble(0))
    assert(rows.forall(s => s >= -1.0 && s <= 1.0))
    assert(rows.forall(s => math.abs(s) < 0.5), rows.mkString(","))
  }

  test("language-profile KL is non-negative for every doc") {
    // KL(doc || lang) >= 0 is a mathematical identity; a negative
    // value means the closed-form single-side decomposition lost a term
    val bad = SparkEntry.queries("text_doc_lang_outliers")(spark, sf)
      .filter(col("kl_nats") < 0).count()
    assert(bad === 0L)
  }

  test("MMR picks are less self-similar than the plain top-5") {
    // The whole point of MMR: the diversified set's mean pairwise
    // cosine must not exceed the undiversified top-5's. Equality is
    // allowed (a query whose top-5 is already diverse changes nothing).
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.lazyZip(b).map(_ * _).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def meanPairSim(sets: Map[Long, Seq[Long]]): Double = {
      val sims = for {
        (_, ids) <- sets.toSeq
        Seq(a, b) <- ids.combinations(2)
      } yield cos(emb(a), emb(b))
      sims.sum / sims.size
    }
    val mmr = SparkEntry.queries("ann_mmr_diversify")(spark, sf)
      .select(col("qid").cast("long"), col("vec_id").cast("long")).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSeq }
    val top5 = SparkEntry.queries("ann_bruteforce_topk")(spark, sf)
      .select(col("qid").cast("long"), col("vec_id").cast("long")).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSeq }
    assert(mmr.values.forall(_.size == 5))
    val (dMmr, dTop) = (meanPairSim(mmr), meanPairSim(top5))
    assert(dMmr <= dTop + 1e-9, s"mmr=$dMmr top5=$dTop")
  }

  test("IVF recall curve is monotone in nprobe and bounded by 10000 bp") {
    val rows = SparkEntry.queries("ann_nprobe_recall_curve")(spark, sf)
      .select(col("nprobe").cast("long"), col("recall_bp").cast("long"))
      .collect().sortBy(_.getLong(0)).map(_.getLong(1))
    assert(rows.length === 4)
    assert(rows.zip(rows.tail).forall { case (a, b) => a <= b },
      s"recall must not drop as nprobe widens: ${rows.mkString(",")}")
    assert(rows.forall(r => r >= 0 && r <= 10000))
    assert(rows.last >= 2000, s"nprobe=8 recall ${rows.last} bp — wiring broken?")
  }

  test("residual quantization never increases error (zero codeword floor)") {
    val bad = SparkEntry.queries("vec_residual_quantize")(spark, sf)
      .filter(col("err2") > col("err1")).count()
    assert(bad === 0L, "code 0 is the zero vector, so err2 <= err1 always")
  }

  test("image byte entropy stays within [0, ln 256] and flags agree") {
    val rows = SparkEntry.queries("mm_image_entropy")(spark, sf)
      .select(col("entropy"), col("flat").cast("long")).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(0) >= 0.0 && r.getDouble(0) <= math.log(256.0) + 1e-9))
    assert(rows.forall(r => (r.getDouble(0) < 3.0) == (r.getLong(1) == 1L)))
  }

  test("fk orphan audit finds zero orphans on the generator's star schema") {
    // The synthetic generator emits referentially-consistent tables;
    // a nonzero count here means the audit joins are wired wrong (or
    // the generator broke — either way, surface it).
    val rows = SparkEntry.queries("etl_fk_orphans")(spark, sf)
      .select(col("rel"), col("n_rows").cast("long"), col("n_orphans").cast("long"))
      .collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getLong(1) > 0))
    assert(rows.forall(_.getLong(2) == 0L),
      rows.map(r => s"${r.getString(0)}=${r.getLong(2)}").mkString(","))
  }

  test("palette coverage is at least uniform share; SNR ordering holds; lateness sane") {
    val pal = SparkEntry.queries("mm_image_quantize_palette")(spark, sf)
      .select(col("dominant_pk").cast("long"), col("coverage_bp").cast("long")).collect()
    assert(pal.nonEmpty)
    assert(pal.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 7))
    // the dominant entry of an 8-way partition covers >= ceil(1/8)
    assert(pal.forall(_.getLong(1) >= 1250))
    val snr = SparkEntry.queries("mm_audio_snr")(spark, sf)
      .select(col("e10").cast("long"), col("e90").cast("long"), col("snr_db")).collect()
    assert(snr.nonEmpty)
    assert(snr.forall(r => r.getLong(1) >= r.getLong(0)))
    assert(snr.forall(_.getDouble(2) >= 0.0))
    val dis = SparkEntry.queries("events_disorder_profile")(spark, sf)
      .select(col("late_bp").cast("long"), col("p50_late_us"), col("p99_late_us")).collect()
    assert(dis.nonEmpty)
    assert(dis.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 10000))
    assert(dis.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .forall(r => r.getDouble(2) >= r.getDouble(1)))
  }

  test("the hypothesis-test battery agrees the generator's columns are unrelated") {
    // quantity, discount, and return flags are generated independently,
    // so every association/location test must sit near its null — a
    // big statistic in ANY of them means that test's machinery broke,
    // caught here as a family-level cross-check on top of the per-op
    // oracle hashes
    val mwZ = SparkEntry.queries("agg_mannwhitney")(spark, sf)
      .select(col("z")).collect().head.getDouble(0)
    assert(math.abs(mwZ) < 3.0, s"Mann-Whitney z=$mwZ")
    val ksD = SparkEntry.queries("agg_ks_test")(spark, sf)
      .select(col("d")).collect().head.getDouble(0)
    assert(ksD < 0.03, s"KS D=$ksD")
    val wx = SparkEntry.queries("agg_wilcoxon_signed")(spark, sf)
      .select(col("z")).collect().head.getDouble(0)
    assert(math.abs(wx) < 3.0, s"Wilcoxon z=$wx")
    val cv = SparkEntry.queries("agg_chisq_independence")(spark, sf)
      .select(col("cramers_v")).collect().head.getDouble(0)
    assert(cv < 0.05, s"Cramer's V=$cv")
    val runsZ = SparkEntry.queries("agg_runs_test")(spark, sf)
      .select(col("z")).collect().head.getDouble(0)
    assert(math.abs(runsZ) < 3.0, s"runs z=$runsZ")
  }

  test("gap percentiles are monotone per event type") {
    val rows = SparkEntry.queries("events_gap_percentiles")(spark, sf)
      .select(col("p50_us"), col("p90_us"), col("p99_us")).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getDouble(0) <= r.getDouble(1) && r.getDouble(1) <= r.getDouble(2)))
  }

  test("rank correlations stay in [-1, 1] and broadly agree with Pearson's weak signal") {
    val sp = SparkEntry.queries("agg_spearman_corr")(spark, sf)
      .collect().head.getDouble(1)
    val kt = SparkEntry.queries("agg_kendall_tau")(spark, sf)
      .collect().head.getDouble(1)
    assert(math.abs(sp) <= 1.0 && math.abs(kt) <= 1.0)
    // quantity and discount are generated independently — all three
    // association measures must be near zero
    assert(math.abs(sp) < 0.1 && math.abs(kt) < 0.1, s"sp=$sp kt=$kt")
  }

  test("label precision stays in range and window-funnel depths nest") {
    val lp = SparkEntry.queries("ann_label_precision")(spark, sf)
      .select(col("hits5").cast("long"), col("base_bp").cast("long")).collect()
    assert(lp.length === 10)
    assert(lp.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 5))
    assert(lp.forall(r => r.getLong(1) > 0 && r.getLong(1) < 10000))
    // windowFunnel can never beat the unbounded funnel: users at
    // window-depth >= 2 are a subset of events_funnel's step-2 users
    val wf = SparkEntry.queries("events_window_funnel")(spark, sf)
      .select(col("depth").cast("long"), col("n_users").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unbounded2 = SparkEntry.queries("events_funnel")(spark, sf)
      .filter(col("steps_completed") >= 2).count()
    assert(wf.filter(_._1 >= 2).values.sum <= unbounded2)
  }

  test("ood flags ~1% of vectors; corpus card shares stay in bp range") {
    val ood = SparkEntry.queries("vec_ood_centroid_dist")(spark, sf)
      .select(col("ood").cast("long")).collect().map(_.getLong(0))
    val n = ood.length
    val flagged = ood.sum
    // p99 threshold => at most ~1% above it (ties/interpolation allow 0)
    assert(flagged <= math.max(1, n / 50), s"$flagged of $n flagged")
    val card = SparkEntry.queries("pipeline_corpus_card")(spark, sf)
      .select(col("en_bp").cast("long"), col("dup_bp").cast("long"),
        col("mean_quality_bp").cast("long")).collect()
    assert(card.nonEmpty)
    assert(card.forall(r => (0 to 2).forall(i =>
      r.getLong(i) >= 0 && r.getLong(i) <= 10000)))
  }

  test("span-corruption budgets reconcile and ESD rounds are complete") {
    val sc = SparkEntry.queries("text_span_corruption_plan")(spark, sf)
      .select(col("n_tokens").cast("long"), col("n_masked").cast("long"),
        col("n_spans").cast("long"), col("enc_len").cast("long"),
        col("dec_len").cast("long")).collect()
    assert(sc.nonEmpty)
    assert(sc.forall(r => r.getLong(1) <= r.getLong(0)))
    assert(sc.forall(r => r.getLong(2) <= r.getLong(1)))
    assert(sc.forall(r => r.getLong(3) === r.getLong(0) - r.getLong(1) + r.getLong(2)))
    assert(sc.forall(r => r.getLong(4) === r.getLong(1) + r.getLong(2)))
    // masked share should be near 15% corpus-wide (5% starts x len 3)
    val share = sc.map(_.getLong(1)).sum.toDouble / sc.map(_.getLong(0)).sum
    assert(share > 0.08 && share < 0.22, s"masked share $share")
    val esd = SparkEntry.queries("events_anomaly_esd")(spark, sf)
      .select(col("event_type"), col("round").cast("long")).collect()
    assert(esd.length === 15, "3 rounds x 5 types, audit trail always complete")
  }

  test("pooled stratified diff lies within the stratum range; leakage audit sane") {
    val rows = SparkEntry.queries("events_propensity_strata")(spark, sf)
      .select(col("stratum"), col("diff_bp").cast("long")).collect()
    val per = rows.filter(_.getString(0) != "pooled").map(_.getLong(1))
    val pooled = rows.filter(_.getString(0) == "pooled").map(_.getLong(1)).head
    assert(per.length === 3, "three mean-relative strata must all be populated")
    // a mass-weighted mean (up to integer-division slack) stays inside
    // the per-stratum envelope
    assert(pooled >= per.min - 1 && pooled <= per.max + 1)
    val leak = SparkEntry.queries("etl_feature_leakage_audit")(spark, sf)
      .select(col("leak_bp").cast("long"), col("n_samples").cast("long")).collect()
    assert(leak.nonEmpty && leak.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 10000))
  }

  test("gmv bridge reconciles, calibration covers sanely, fano positive") {
    val gmv = SparkEntry.queries("orders_gmv_mix")(spark, sf)
      .select(col("r0").cast("long"), col("r1").cast("long"),
        col("price_eff"), col("volume_eff"), col("cross_eff")).collect()
    assert(gmv.nonEmpty)
    // the three rounded effects must rebuild the exact delta to within
    // rounding slack (3 x half-cent)
    assert(gmv.forall { r =>
      val delta = (r.getLong(1) - r.getLong(0)) / 100.0
      math.abs(r.getDouble(2) + r.getDouble(3) + r.getDouble(4) - delta) < 0.02
    })
    val cal = SparkEntry.queries("events_quantile_calibration")(spark, sf)
      .select(col("coverage_bp").cast("long")).collect().map(_.getLong(0))
    assert(cal.nonEmpty)
    // a stationary generator should keep p90 roughly calibrated
    assert(cal.forall(c => c >= 8000 && c <= 9800), cal.mkString(","))
    val fano = SparkEntry.queries("events_burstiness_fano")(spark, sf)
      .select(col("fano")).collect().map(_.getDouble(0))
    assert(fano.forall(_ > 0.0))
  }

  test("bootstrap CI brackets the point estimate with ordered bounds") {
    val r = SparkEntry.queries("agg_bootstrap_ci")(spark, sf).collect().head
    val (mean, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo <= hi)
    assert(lo <= mean && mean <= hi,
      s"deterministic resampling puts the mean inside the CI here: $lo $mean $hi")
    // resample noise should be small relative to the mean (n is large)
    assert((hi - lo) / mean < 0.05)
  }

  test("hubness histogram mass equals the kNN edge count plus isolated vectors") {
    val edges = SparkEntry.queries("vec_knn_graph")(spark, sf).count()
    val hist = SparkEntry.queries("vec_knn_hubness")(spark, sf)
      .select(col("in_degree").cast("long"), col("n_vecs").cast("long"))
      .collect()
    val vecs = Tables.embeddings(spark, sf).count()
    assert(hist.map(_.getLong(1)).sum === vecs,
      "every vector appears exactly once in the histogram")
    assert(hist.map(r => r.getLong(0) * r.getLong(1)).sum === edges,
      "total in-degree mass must equal the edge count")
  }
}
