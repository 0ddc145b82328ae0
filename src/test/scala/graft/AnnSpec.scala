package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables
import graft.functions.VectorFunctions.toDouble

/** ANN quality: LSH top-k vs brute-force ground truth. */
class AnnSpec extends SparkSuite {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")
    .select(col("vec_id"), toDouble(col("embedding")).as("v")).cache()
  private lazy val queries = emb.filter(col("vec_id") < Similarity.NumQueries)

  test("index training is partitioning-deterministic: fixed-point means make retrains bit-identical") {
    // the property the round-7 fixed-point accumulation bought: a
    // float avg's result depends on partition merge order, so two
    // retrains of the same corpus could disagree in the last ulp and
    // flip a cell-boundary assignment. With exact integer sums the
    // trained artifacts must be EQUAL — not close — under any
    // repartitioning. (This is also what makes the DuckDB oracles
    // able to re-train the index independently.)
    val scrambled = emb.repartition(7, col("vec_id"))
    assert(Similarity.ivfCentroids(emb) == Similarity.ivfCentroids(scrambled),
      "IVF centroids changed under repartitioning")
    assert(Similarity.pqTrain(Similarity.unitNorm(emb)) ==
      Similarity.pqTrain(Similarity.unitNorm(scrambled)),
      "PQ codebook changed under repartitioning")
  }

  test("brute force returns exactly k neighbors per query, self excluded") {
    val rows = Similarity.bruteTopK(emb, queries, Similarity.TopK).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == Similarity.NumQueries)
    assert(byQ.values.forall(_.length == Similarity.TopK))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    // scores sorted-sane: every score in [-1, 1]
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0))
  }

  test("filtered search returns only same-label neighbors, each a label-restricted top-k") {
    val out = SparkEntry.queries("ann_filtered")(spark, sfDir).collect()
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.nonEmpty)
    // every neighbor carries the query's own label
    out.foreach { r =>
      assert(labels(r.getLong(1)) == labels(r.getLong(0)),
        s"neighbor ${r.getLong(1)} has wrong label for query ${r.getLong(0)}")
      assert(r.getLong(0) != r.getLong(1))
    }
    // and the result is exactly brute top-k over the label slice
    val q0 = out.filter(_.getLong(0) == 0L).map(_.getLong(1)).toSet
    val slice = emb.join(
      spark.read.parquet(s"$sfDir/embeddings.parquet").selectExpr("vec_id", "label"),
      "vec_id").filter(org.apache.spark.sql.functions.col("label") === labels(0L))
    val expect = Similarity.bruteTopK(
      slice.select("vec_id", "v"),
      queries.filter(org.apache.spark.sql.functions.col("vec_id") === 0L),
      Similarity.TopK).collect().map(_.getLong(1)).toSet
    assert(q0 == expect, s"label-restricted top-k mismatch: $q0 vs $expect")
  }

  test("LSH recall against brute-force ground truth beats random chance") {
    val truth = Similarity.bruteTopK(emb, queries, Similarity.TopK).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.lshTopK(emb, queries, Similarity.TopK).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    // measured 0.50 on this corpus: the synthetic vectors are
    // near-uniform (true top-k sits at cos ≈ 0.4-0.5, ~63° — a weak
    // LSH signal), so 4 bands × 4 planes recovers half the true
    // neighbors from ~25% of the corpus; theory for p_bit ≈ 0.64
    // predicts 1-(1-0.64^4)^4 ≈ 0.53. Pinned just below measured so a
    // banding bug that halves recall fails loudly.
    assert(recall >= 0.45, s"LSH recall $recall (expected ~0.50)")
  }

  test("IVF recall against brute-force ground truth beats random chance") {
    val truth = Similarity.bruteTopK(emb, queries, Similarity.TopK).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val centroids = Similarity.ivfCentroids(emb)
    assert(centroids.size == Similarity.NumCentroids)
    assert(centroids.forall(_.size == Similarity.Dim))
    val got = Similarity.ivfTopK(emb, queries, Similarity.TopK, centroids)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    // measured 0.94: probing 4/16 cells examines ~25% of the corpus
    // but true neighbors concentrate in the query's nearest cells.
    // Pinned just below measured (margin for centroid drift across
    // SFs), far above the ~25% random-sampling baseline.
    assert(recall >= 0.85, s"IVF recall $recall (expected ~0.94)")
  }

  test("kNN classify: an in-process brute vote reproduces every prediction") {
    val rows = Similarity.annKnnClassify.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    val all = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d, na, nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val corpus = all.filter(_._1 >= Similarity.NumQueries)
    val queries = all.filter(_._1 < Similarity.NumQueries)
    assert(rows.length == queries.length, "one prediction per query")
    queries.foreach { case (qid, qv, qlabel) =>
      val top = corpus.map(c => (c._1, cos(qv, c._2), c._3))
        .sortBy(t => (-t._2, t._1)).take(Similarity.TopK)
      val (predLabel, votes) = top.groupBy(_._3).view
        .mapValues(_.length).toSeq.minBy { case (l, n) => (-n, l) }
      val got = rows.find(_._1 == qid).get
      assert(got._2 == predLabel && got._3 == votes.toLong && got._4 == qlabel,
        s"query $qid: got $got, want ($predLabel, $votes, $qlabel)")
    }
  }

  test("kNN over IVF+PQ: one prediction per query, high agreement with the brute vote") {
    val fast = Similarity.annKnnIvfPq.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    val brute = Similarity.annKnnClassify.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(fast.length == brute.length, "one prediction per query")
    assert(fast.map(_._1).toSeq == brute.map(_._1).toSeq)
    // same true labels regardless of search path
    assert(fast.map(r => (r._1, r._4)).toSeq == brute.map(r => (r._1, r._4)).toSeq)
    val agree = fast.zip(brute).count { case (f, b) => f._2 == b._2 }
    // probe recall ≥0.9 ⇒ votes rarely flip; pinned below measured so
    // a probe-path regression that degrades neighbors fails loudly
    assert(agree.toDouble / fast.length >= 0.8,
      s"IVF+PQ vote agrees with brute on only $agree/${fast.length} queries")
  }

  test("IVF returns at most k neighbors per query, none from unprobed space twice") {
    val centroids = Similarity.ivfCentroids(emb)
    val rows = Similarity.ivfTopK(emb, queries, Similarity.TopK, centroids).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length <= Similarity.TopK))
    // no duplicate (query, neighbor) pairs despite multi-cell probing
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
  }

  test("PQ two-stage search: compressed codes + exact re-rank recover brute top-k") {
    val truth = Similarity.bruteTopK(emb, queries, Similarity.TopK).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // train through the SAME normalization the ann_pq operator uses
    val cb = Similarity.pqTrain(Similarity.unitNorm(emb))
    assert(cb.length == Similarity.PqM * Similarity.PqK * Similarity.PqSubDim)
    val got = Similarity.pqTopK(emb, queries, Similarity.TopK, cb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    // measured 1.0 at spec scale (shortlist = 20·k of a 500-vector
    // corpus) and 0.96 at sf0.1 (shortlist 5%); pinned below measured
    assert(recall >= 0.9, s"PQ recall $recall (expected ~1.0 at this scale)")
  }

  test("SQ8 two-stage search: int8 codes + exact re-rank recover brute top-k") {
    val truth = Similarity.bruteTopK(emb, queries, Similarity.TopK)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("ann_sq8")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    // measured 1.0 at sf0.001 and sf0.01: 8-bit symmetric codes on a
    // unit-normed 64-dim corpus preserve the ranking almost exactly
    assert(recall >= 0.9, s"SQ8 recall $recall (expected ~1.0)")
    // and the quantization really is int8: every code in [-127, 127]
    val inv = Similarity.sq8InvFor(spark, sfDir)
    val outOfRange = Similarity.unitNorm(emb)
      .select(explode(col("v")).as("x"))
      .filter(abs(floor(col("x") * inv + 0.5)) > 127).count()
    // the clamp exists for the ±ulp boundary case only
    assert(inv > 0 && outOfRange == 0)
  }

  test("binary (1-bit) search: sign codes + exact re-rank beat chance at 32x compression") {
    val truth = Similarity.bruteTopK(emb, queries, Similarity.TopK)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("ann_binary")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    // measured 0.4 (sf0.001) / 0.5 (sf0.01): a 64-bit sign code with a
    // 4x shortlist is the coarse end of the ladder — same regime as
    // the hyperplane-LSH floor (0.45); chance would be ~k/corpus ≈ 0.03
    assert(recall >= 0.3, s"binary recall $recall (expected ~0.4-0.5)")
    // every returned neighbor carries its TRUE cosine (exact re-rank):
    val scored = SparkEntry.queries("ann_binary")(spark, sfDir).collect()
    val exact = Similarity.bruteTopK(emb, queries, 1 << 20) // full ranking
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    scored.foreach { r =>
      assert(r.getDouble(2) == exact((r.getLong(0), r.getLong(1))),
        s"re-ranked score is not the exact cosine for ${(r.getLong(0), r.getLong(1))}")
    }
  }

  test("centroid drift: occupancy conserved under both centroid sets, drift real but bounded") {
    val rows = SparkEntry.queries("ann_centroid_drift")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val corpus = emb.count()
    // every corpus vector lands in exactly one cell under EACH set
    assert(rows.map(_._3).sum == corpus, "base occupancy not conserved")
    assert(rows.map(_._4).sum == corpus, "full occupancy not conserved")
    // an 80%-base retrain moves geometry measurably but not wildly
    assert(rows.forall(r => r._2 > 0.5 && r._2 <= 1.0),
      s"implausible drift: ${rows.map(_._2).min}..${rows.map(_._2).max}")
    assert(rows.exists(_._2 < 1.0), "degenerate: retrain moved nothing")
  }

  test("quantization property: random vectors replay the codes/signatures driver-side, bit for bit") {
    import spark.implicits._
    // the property every quantized oracle rests on: unit-norm, SQ8
    // codes and sign signatures computed by the in-plan expressions
    // are bit-identical to a sequential driver recompute with the
    // same fold order
    val rnd = new scala.util.Random(17)
    val vecs = (0 until 40).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian() * 0.3)))
    val df = vecs.toDF("vec_id", "v")
    val un = Similarity.unitNorm(df)
    val inv = Similarity.sq8Inv(un)
    val viaPlan = un
      .select(col("vec_id"), Similarity.sq8Codes(col("v"), inv).as("c"),
        col("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Double](2)))
      .sortBy(_._1)
    val sigPlan = df.select(col("vec_id"), Similarity.binarySigExpr.as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    vecs.foreach { case (id, v) =>
      // unit-norm: the kernel's left-to-right fold order
      val n = math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x))
      val nv = v.map(_ / n)
      val (_, planCodes, planNv) = viaPlan(id.toInt)
      assert(planNv == nv, s"vec $id: unit-norm diverged")
      val codes = nv.map(x =>
        math.min(127L, math.max(-127L, math.floor(x * inv + 0.5).toLong)))
      assert(planCodes == codes, s"vec $id: SQ8 codes diverged")
      assert(codes.forall(c => c >= -127 && c <= 127))
      // sign signature: bit d iff v(d) > 0
      val sig = v.zipWithIndex.foldLeft(0L) { case (acc, (x, i)) =>
        if (x > 0) acc + (1L << i) else acc
      }
      assert(sigPlan(id) == sig, s"vec $id: sign signature diverged")
    }
    // integer code dots are exact and symmetric
    val c0 = viaPlan(0)._2; val c1 = viaPlan(1)._2
    val dot01 = c0.zip(c1).map { case (a, b) => a * b }.sum
    assert(dot01 == c1.zip(c0).map { case (a, b) => a * b }.sum)
  }

  test("PQ codes are the compressed representation: M small ints per vector") {
    val cb = Similarity.pqTrain(Similarity.unitNorm(emb))
    import org.apache.spark.sql.functions.{call_function, lit, typedLit}
    val codes = emb.select(call_function("graft_pq_encode", col("v"),
      typedLit(cb), lit(Similarity.PqM), lit(Similarity.PqK)).as("c")).collect()
    assert(codes.forall(_.getSeq[Long](0).length == Similarity.PqM))
    assert(codes.forall(_.getSeq[Long](0).forall(c => c >= 0 && c < Similarity.PqK)),
      "codes must fit 4 bits (K=16)")
  }

  test("IVF+PQ composition: cell-pruned ADC + exact re-rank recall vs brute") {
    import org.apache.spark.sql.execution.FormattedMode
    val truth = Similarity.bruteTopK(emb, queries, Similarity.TopK).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val df = Similarity.ivfPqTopK(spark, sfDir, Similarity.TopK)
    // the codes scan must be partition-pruned to the probed cells —
    // the whole point of composing PQ into the IVF layout
    val plan = df.queryExecution.explainString(FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"probe cells did not become partition filters on the codes scan:\n$plan")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & got).size.toDouble / truth.size
    // bounded by the IVF stage (probing 4/16 cells, measured 0.94
    // alone); PQ's shortlist+re-rank inside the probed cells loses
    // nothing at this scale. Pinned at the PQ bar (0.9). Measured at
    // sf0.1 (50k vectors): ivfpq 0.96 == pure PQ 0.96, IVF alone
    // 0.98 — the composition gives up nothing for its 4x cell
    // pruning.
    assert(recall >= 0.9, s"IVF+PQ recall $recall (expected ~0.94)")
    // composition really restricts ADC: exactly k DISTINCT neighbors
    // per query, every query answered, and every returned neighbor's
    // index cell is one of ITS query's probed cells — the (query_id,
    // cell) join key restriction, asserted against the persisted
    // index's own cell column plus the probe-cell selection through
    // the SAME probeCellsExpr kernel the operator uses (a driver-math
    // recompute here could round a near-tie boundary differently and
    // flake this assertion — the divergence class probeCellsExpr
    // exists to eliminate)
    val byQ = df.collect().groupBy(_.getLong(0))
    assert(byQ.keySet.size == Similarity.NumQueries, "a query went unanswered")
    assert(byQ.values.forall { rs =>
      rs.length == Similarity.TopK &&
        rs.map(_.getLong(1)).distinct.length == Similarity.TopK
    }, "expected exactly k distinct neighbors per query")
    val centroids = Similarity.centroidsFor(spark, sfDir)
    val probedOf = queries
      .select(col("vec_id"),
        Similarity.probeCellsExpr(typedLit(centroids), col("v")).as("cells"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSet)
      .toMap
    val cellOf = spark.read.parquet(Similarity.pqIndexPath(sfDir))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    byQ.foreach { case (qid, rs) =>
      rs.foreach { r =>
        assert(probedOf(qid).contains(cellOf(r.getLong(1))),
          s"neighbor ${r.getLong(1)} of query $qid came from an unprobed cell")
      }
    }
  }

  test("LSH candidates per query stay well below the corpus size") {
    val n = emb.count()
    val cands = Similarity.lshTopK(emb, queries, k = Int.MaxValue).count()
    assert(cands < Similarity.NumQueries * n / 2,
      s"$cands candidates for ${Similarity.NumQueries} queries over $n vectors")
  }

  test("persisted IVF index: point probe prunes partitions and matches in-memory IVF") {
    import org.apache.spark.sql.execution.FormattedMode
    val persisted = graft.SparkEntry.queries("ann_ivf_persist")(spark, sfDir)
    // the op's OWN centroids (retraining here could differ in the
    // last ulp of an avg() and flip a boundary assignment)
    val centroids = Similarity.centroidsFor(spark, sfDir)
    val qv = emb.filter(col("vec_id") === 0L).head().getSeq[Double](1).toSeq
    val probe = Similarity.ivfPointLookup(spark, sfDir, centroids, 0L, qv)
    val plan = probe.queryExecution.explainString(FormattedMode)
    // plan property: the cell predicate sits INSIDE the
    // PartitionFilters list (a bare 'PartitionFilters: []' line plus
    // 'cell' in the schema would be vacuous)
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"probe cells did not become partition filters:\n$plan")
    // result property: identical neighbors to the in-memory IVF path
    val fromIndex = persisted.collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toSet
    val inMemory = Similarity.ivfTopK(emb,
        emb.filter(col("vec_id") === 0L), Similarity.TopK, centroids)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
    assert(fromIndex == inMemory,
      s"persisted-index probe diverged: $fromIndex vs $inMemory")
  }

  test("vec_profile matches a driver-side recompute within the rounding grain") {
    val rows = Similarity.vecProfile.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val vecs = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select(graft.functions.VectorFunctions.toDouble(col("embedding")))
      .collect().map(_.getSeq[Double](0))
    val dim = vecs.head.length
    assert(rows.length == dim && rows.map(_._1).toSeq == (1 to dim).map(_.toLong))
    rows.foreach { case (d, mean, std, mn, mx) =>
      val xs = vecs.map(_(d.toInt - 1))
      val m = xs.sum / xs.length
      val sd = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / xs.length)
      assert(math.abs(mean - m) <= 1e-6 && math.abs(std - sd) <= 1e-6,
        s"dim $d: ($mean, $std) vs recomputed ($m, $sd)")
      assert(mn == xs.min && mx == xs.max, s"dim $d: exact min/max diverged")
      assert(mn <= mean && mean <= mx && std >= 0)
    }
  }

  test("hard negatives: every mined negative sits inside the band, below the dup cutoff") {
    val rows = Similarity.annHardNegatives.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length <= Similarity.TopK))
    assert(rows.forall { r =>
      val c = r.getDouble(2)
      c >= Similarity.HardLo - 1e-6 && c < Similarity.HardHi + 1e-6
    }, "a mined negative escaped the [HardLo, HardHi) band")
    // nothing in the output may be a near-duplicate by dedup_embedding's rule
    assert(rows.forall(_.getDouble(2) < Similarity.HardHi + 1e-6))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("appendable IVF: delta holds exactly the batch, base is never rewritten, staleness bounded") {
    import java.io.File
    val first = Similarity.annIvfAppend.run(spark, sfDir).collect()
    val path = Similarity.appendIndexPath(sfDir)
    val baseSuccess = new File(s"$path/base/_SUCCESS")
    val m0 = baseSuccess.lastModified()
    // second invocation probes the committed index without rebuilding
    val second = Similarity.annIvfAppend.run(spark, sfDir).collect()
    assert(baseSuccess.lastModified() == m0,
      "append path rewrote the base index on a re-run")
    assert(first.map(_.toString).sorted.sameElements(second.map(_.toString).sorted))
    // the delta generation holds exactly the appended ids — nothing
    // from base leaked in, nothing from the batch was dropped
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val maxId = e.agg(org.apache.spark.sql.functions.max("vec_id")).head().getLong(0)
    val cut = math.floor(maxId * Similarity.AppendFrac).toLong
    val deltaIds = spark.read.parquet(s"$path/delta")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(deltaIds == (cut to maxId).toSet,
      s"delta ids != appended batch [${cut}, $maxId]")
    // staleness bound: probing base-frozen centroids over base+batch
    // must recover most of the FULL-RETRAIN index's neighbors
    // (ann_ivf trains on the whole corpus). Not 100% by design — the
    // batch shifted the true centroids — but an append index that
    // lost half its recall would need a retrain, and this bound is
    // the trigger's spec.
    val full = Similarity.annIvf.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val appended = first.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = appended.intersect(full).size.toDouble / full.size
    assert(recall >= 0.6, f"append-index recall vs full retrain $recall%.2f < 0.6")
  }

  test("appendable IVF: a torn delta build is retried, base untouched") {
    import java.io.File
    val path = Similarity.appendIndexPath(sfDir)
    Similarity.annIvfAppend.run(spark, sfDir).collect() // ensure built
    val baseM = new File(s"$path/base/_SUCCESS").lastModified()
    // simulate a crash between the delta write and its commit: the
    // marker is gone, so the generation must be rebuilt — and ONLY it
    assert(new File(s"$path/delta/_SUCCESS").delete())
    val rows = Similarity.annIvfAppend.run(spark, sfDir).collect()
    assert(new File(s"$path/delta/_SUCCESS").exists(), "torn delta not rebuilt")
    assert(new File(s"$path/base/_SUCCESS").lastModified() == baseM,
      "delta recovery rewrote the base index")
    assert(rows.nonEmpty)
  }

  test("range search: results sit above tau, are a subset of brute radius pairs, full recall in probed cells") {
    val got = Similarity.annRangeSearch.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.forall(_._3 >= Similarity.RangeTau - 5e-7),
      "a returned pair fell below the radius")
    assert(got.map(t => (t._1, t._2)).distinct.length == got.length,
      "duplicate (query, neighbor) pair")
    // ground truth: brute radius pairs over the whole corpus
    val cLit = typedLit(Similarity.centroidsFor(spark, sfDir))
    val brute = emb.as("c")
      .join(broadcast(queries.as("q")), col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cos", graft.functions.VectorFunctions.cosine(col("q.v"), col("c.v")))
      .filter(col("cos") >= Similarity.RangeTau)
      .select(col("q.vec_id").as("qid"), col("c.vec_id").as("nid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall(t => brute((t._1, t._2))), "false positive vs brute radius")
    // completeness within the probed index slice: any brute pair whose
    // corpus vector lives in one of the query's probed cells MUST be
    // returned (the only legal misses are unprobed cells)
    val cells = emb.withColumn("cell", Similarity.cellExpr(cLit, col("v")).cast("long"))
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probes = queries
      .select(col("vec_id"),
        explode(Similarity.probeCellsExpr(cLit, col("v"))).as("pc0"))
      .select(col("vec_id"), col("pc0").cast("long").as("pc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, ps) => q -> ps.map(_._2).toSet }
    val inProbed = brute.filter { case (q, n) => probes(q).contains(cells(n)) }
    val gotSet = got.map(t => (t._1, t._2)).toSet
    assert(inProbed.subsetOf(gotSet), "missed a pair inside a probed cell")
  }

  test("recall eval: one row per query, n_hits equals the op-output intersection") {
    val rows = Similarity.annRecallEval.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == Similarity.NumQueries)
    assert(rows.forall(r => r._2 >= 0 && r._2 <= Similarity.TopK))
    assert(rows.forall(r => math.abs(r._3 - r._2.toDouble / Similarity.TopK) == 0.0))
    val brutePairs = Similarity.annTopkBrute.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfPairs = Similarity.annIvf.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = brutePairs.groupBy(_._1).view
      .mapValues(_.count(ivfPairs)).toMap
    assert(rows.forall(r => expected.getOrElse(r._1, 0) == r._2),
      "n_hits diverges from the published ops' intersection")
  }

  test("MMR equals a sequential recompute over the shortlist; a planted near-dup pair diversifies") {
    import graft.functions.VectorKernels.cosine
    val got = Similarity.annMmr.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty && got.groupBy(_._1).forall(_._2.length == Similarity.TopK))
    // independent recompute: rebuild each query's shortlist and run
    // the greedy sequentially from raw vectors
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val qids = vecs.keys.filter(_ < Similarity.NumQueries).toSeq.sorted
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = qids.flatMap { qid =>
      val shortlist = vecs.toSeq.filter(_._1 != qid)
        .map { case (cid, v) => (cid, cosine(vecs(qid), v), v) }
        .sortBy { case (cid, rel, _) => (-rel, cid) }
        .take(Similarity.MmrShortlist).toArray
      Similarity.mmrGreedy(shortlist, Similarity.TopK)
        .map { case (rank, cid, score) => (qid, rank, cid, r6(score)) }
    }
    assert(got.toSeq.sorted == want.sorted)
    // planted fixture: two near-identical high-rel vectors + one
    // orthogonal-ish lower-rel third. Plain top-2 takes both copies;
    // MMR must swap the redundant copy for the diverse candidate.
    val a = Array(1.0, 0.0, 0.05, 0.0)
    val aCopy = Array(0.999, 0.001, 0.05, 0.0)
    val ortho = Array(0.0, 1.0, 0.0, 0.05)
    val q = Array(0.75, 0.66, 0.0, 0.0)
    val cands = Array(
      (1L, cosine(q, a), a), (2L, cosine(q, aCopy), aCopy),
      (3L, cosine(q, ortho), ortho))
    val byRel = cands.sortBy(c => (-c._2, c._1)).take(2).map(_._1).toSet
    assert(byRel == Set(1L, 2L), "fixture: plain top-2 should be the two copies")
    val mmr = Similarity.mmrGreedy(cands, 2).map(_._2).toSet
    assert(mmr.contains(3L) && (mmr & Set(1L, 2L)).size == 1,
      s"MMR should keep one copy and swap in the diverse candidate, got $mmr")
  }

  test("vec_gram: exact BigInt driver recompute matches bit-for-bit; diagonal = covar_pop") {
    val got = Similarity.vecGram.run(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    val d = Similarity.Dim
    assert(got.size == d * (d + 1) / 2)
    // sequential exact recompute: same fixed-point integerization,
    // arbitrary-precision sums, the identical final IEEE tree
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(_.getSeq[Float](1).toArray.map(x =>
        math.floor(x.toDouble * 1048576.0 + 0.5).toLong))
    val n = vecs.length.toLong
    val sums = Array.fill(d)(BigInt(0))
    val gram = scala.collection.mutable.Map.empty[(Int, Int), BigInt].withDefaultValue(BigInt(0))
    vecs.foreach { q =>
      (0 until d).foreach { i =>
        sums(i) += q(i)
        (i until d).foreach(j => gram((i, j)) += BigInt(q(i)) * q(j))
      }
    }
    def r10(x: Double) = BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
    (0 until d).foreach { i =>
      (i until d).foreach { j =>
        val (gq, cov) = got((i.toLong, j.toLong))
        assert(gq == gram((i, j)).toDouble, s"gram($i,$j)")
        val want = r10((n.toDouble * gram((i, j)).toDouble
          - sums(i).toDouble * sums(j).toDouble)
          / (n.toDouble * n.toDouble) / (1048576.0 * 1048576.0))
        assert(cov == want, s"cov($i,$j): $cov vs $want")
      }
    }
    // variances are non-negative and the matrix is genuinely non-degenerate
    assert((0 until d).forall(i => got((i.toLong, i.toLong))._2 >= 0.0))
    assert(got.exists(_._2._2 != 0.0))
    // cross-check a few cells against Spark's builtin covar_pop (float
    // path — agreement within the quantization grain)
    val builtin = emb
      .select(element_at(col("v"), 1).as("x0"), element_at(col("v"), 2).as("x1"))
      .agg(covar_pop(col("x0"), col("x1"))).head().getDouble(0)
    assert(math.abs(got((0L, 1L))._2 - builtin) < 1e-5,
      s"cov(0,1) ${got((0L, 1L))._2} vs builtin $builtin")
  }

  test("kNN graph: neighbors are genuine band-mates ranked by cosine; per-node fan-out <= 3") {
    import org.apache.spark.sql.functions._
    val got = graft.operators.Similarity.annKnnGraph.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (src, rows) =>
      val ranked = rows.sortBy(_._2)
      assert(ranked.map(_._2).toSeq == (1L to ranked.length), s"$src ranks not contiguous")
      assert(ranked.length <= 3, s"$src fan-out")
      // ranking respects (cos desc, id asc)
      ranked.toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3), s"$src rank order")
        case _ =>
      }
      assert(!ranked.exists(_._3 == src), s"$src self-edge")
    }
    // cross-check a sample of cosines against the raw vectors
    val vecs = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array[double]".replace("[","<").replace("]",">")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    got.take(50).foreach { case (srcId, _, dst, cos) =>
      val (a, b) = (vecs(srcId), vecs(dst))
      val dot = a.zip(b).map(p => p._1 * p._2).sum
      val exp = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      assert(math.abs(cos - exp) < 1e-5, s"cosine $srcId->$dst")
    }
  }
}
