package graft

import graft.operators.Pipeline
import graft.sources.Tables

/** The lineage contract: pipeline_lineage is the per-document
  * refinement of pipeline_e2e — grouping the lineage output must
  * reproduce the e2e funnel exactly, and every document carries a
  * consistent verdict. */
class PipelineSpec extends SparkSuite {

  test("lineage verdicts aggregate to exactly the e2e funnel") {
    val lineage = Pipeline.pipelineLineage.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        Option(r.getString(4)), Option(r.get(5)).map(_.asInstanceOf[Long])))
    val e2e = Pipeline.pipelineE2e.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    // every doc appears exactly once (corpus + the two planted fixtures)
    val docs = Tables.load(spark, sfDir, "documents").count()
    assert(lineage.length.toLong == docs + 2)
    assert(lineage.map(_._1).distinct.length == lineage.length)

    // kept docs grouped by split == the e2e funnel (docs + chars + words)
    val kept = lineage.filter(_._4 == "kept")
    val bySplit = kept.groupBy(_._5.get)
    assert(bySplit.keySet == e2e.keySet)
    bySplit.foreach { case (split, xs) =>
      val (nDocs, nChars, nWords) = e2e(split)
      assert(xs.length.toLong == nDocs, s"$split n_docs")
      assert(xs.map(_._3).sum == nChars, s"$split n_chars")
      assert(xs.map(_._2).sum == nWords, s"$split n_words")
    }

    // verdict consistency: only kept docs carry a split; every passed
    // doc points at a canonical owner; duplicates point at a DIFFERENT
    // doc that is itself kept; kept docs own themselves
    lineage.foreach { case (id, _, _, reason, split, owner) =>
      assert(split.isDefined == (reason == "kept"), s"doc $id split presence")
      assert(owner.isDefined == (reason != "short"), s"doc $id owner presence")
      if (reason == "kept") assert(owner.get == id, s"doc $id self-owner")
    }
    val keptIds = kept.map(_._1).toSet
    lineage.filter(_._4 == "duplicate").foreach { case (id, _, _, _, _, owner) =>
      assert(owner.get != id && keptIds.contains(owner.get), s"dup $id owner kept")
    }
    // all three verdicts genuinely occur at this SF
    assert(lineage.map(_._4).distinct.toSet == Set("short", "duplicate", "kept"))
  }

  test("incremental refresh: funnel is monotone, re-deliveries drop at the cross-batch stage, splits tile") {
    val got = graft.operators.Pipeline.pipelineIncremental.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == (1L to 7L))
    val n = got.map(_._3)
    // stages 1..4 are a funnel
    assert(n(0) >= n(1) && n(1) >= n(2) && n(2) >= n(3), s"funnel not monotone: ${n.toSeq}")
    // the planted 1/3 exact re-deliveries drop at the cross-batch stage
    assert(n(2) < n(1), "no cross-batch duplicates dropped")
    assert(n(2) <= 2L * n(1) / 3L + 1, "expected ~1/3 of the batch to be re-deliveries")
    // split admissions tile the deduped survivors exactly
    assert(n(4) + n(5) + n(6) == n(3), "splits do not tile the survivors")
    assert(n(4) > 0 && n(3) > 0)
  }
}
