package graft.operators

import org.apache.spark.sql.functions._

import graft.Op
import graft.sources.Tables

/** End-to-end training-data pipeline composition — the flagship
  * "switch your pipeline to graft" demonstration: PII scrub →
  * normalize → quality gate → exact-dedup on normalized content →
  * deterministic split assignment → per-split corpus statistics,
  * all in ONE declarative plan (Catalyst fuses the per-row stages
  * into the scan; two data shuffles total — the dedup hash-agg and
  * the per-split agg, plus the trivial 3-row ORDER BY exchange —
  * scrub/normalize/filter add ZERO).
  */
object Pipeline {

  val pipelineE2e: Op = Op.sql("pipeline_e2e",
    s"""WITH scrubbed AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(text, '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
      |                   '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS text
      |  FROM documents),
      |norm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |         ' +', ' ', 'g')) AS t
      |  FROM scrubbed),
      |filtered AS (
      |  SELECT doc_id, t FROM norm
      |  WHERE len(string_split(t, ' ')) >= 5 AND length(t) >= 20),
      |dedup AS (SELECT min(doc_id) AS doc_id, t FROM filtered GROUP BY t),
      |assigned AS (
      |  SELECT doc_id, t,
      |    CASE WHEN CAST(('0x' || substr(md5(t), 1, 1)) AS BIGINT) < 13 THEN 'train'
      |         WHEN CAST(('0x' || substr(md5(t), 1, 1)) AS BIGINT) < 15 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM dedup)
      |SELECT split, count(*) AS n_docs,
      |       CAST(sum(length(t)) AS BIGINT) AS n_chars,
      |       CAST(sum(len(string_split(t, ' '))) AS BIGINT) AS n_words
      |FROM assigned GROUP BY split ORDER BY split""".stripMargin) { (s, dir) =>
    // Parallel.floor on the raw docs: MEASURED NEGATIVE (r12,
    // matched-floor A/B 1.55-1.62 → 1.92-2.35 s) — four regex passes
    // per doc still lose to serializing the full text payload
    // through the single scan task's shuffle write, the same
    // boundary Parallel's doc records for the dedup text kernels.
    // The regex chain stays fused into the scan.
    val scrubbed = Tables.load(s, dir, "documents").select(col("doc_id"),
      regexp_replace(regexp_replace(col("text"), TextAnalysis.EmailRe, "<EMAIL>"),
        TextAnalysis.PhoneRe, "<PHONE>").as("text"))
    val norm = scrubbed.select(col("doc_id"),
      trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
        " +", " ")).as("t"))
    val filtered = norm.filter(
      size(split(col("t"), " ")) >= 5 && length(col("t")) >= 20)
    // dedup keyed on the md5 FINGERPRINT, not the text (r11): the
    // per-doc stats the report needs (length, word count) are
    // functions of t, so identical-t rows carry identical values and
    // min() recovers them per group — the dedup shuffle then moves
    // (32-char hash, 2 longs) instead of the full normalized payload
    // (~20× fewer bytes at any corpus), with map-side combine
    // collapsing duplicates before the wire. The split label is a
    // function of the grouping key itself.
    // COLLISION CONTRACT (r12, ADVICE r11): md5 keying is the
    // framework-wide exactness contract for content-hash dedup —
    // Dedup.corpusExact and dedup_lines group on the same md5(text),
    // and the DuckDB oracles replay it, so both engines merge the
    // same (astronomically unlikely, but constructible) colliding
    // texts and stay hash-equal. A pipeline hardening against
    // adversarial corpus content should swap ONE symbol — this md5 —
    // for sha2(t, 256) on both sides; the plan shape is unchanged.
    val dedup = filtered
      .select(md5(col("t").cast("binary")).as("m"), col("doc_id"),
        length(col("t")).as("len"), size(split(col("t"), " ")).as("words"))
      .groupBy("m")
      .agg(min("doc_id").as("doc_id"), min("len").as("len"),
        min("words").as("words"))
    val assigned = dedup
      .withColumn("h", conv(substring(col("m"), 1, 1), 16, 10).cast("bigint"))
      .withColumn("split",
        when(col("h") < 13, "train").when(col("h") < 15, "val").otherwise("test"))
    assigned.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("len")).cast("bigint").as("n_chars"),
        sum(col("words")).cast("bigint").as("n_words"))
      // ≤3 split groups at any corpus: single-partition order, no
      // sampled range exchange over 3 rows
      .transform(Bounded.ordered(_, col("split")))
  }

  /** The pipeline's OUTPUT side: after normalize → quality-gate →
    * split-assign (E2e's derivation MINUS its PII-scrub and dedup
    * stages — packing accounts for the raw accepted corpus; run
    * scrub/dedup upstream when composing, and note the split hash is
    * then over the scrubbed text), lay each split's
    * token stream end-to-end and cut 512-token training chunks
    * ([[TextAnalysis.textPackSequences]]'s packing, partitioned by
    * split), then account for the result: docs, tokens, chunks, and
    * how many docs straddle a chunk boundary. The straddler count is
    * what forces the oracle through the actual per-doc prefix-sum
    * window — totals alone would collapse to one agg. Still one
    * fused plan: per-row stages free, one window shuffle (by split),
    * one 3-row agg. */
  val pipelinePack: Op = Op.sql("pipeline_pack",
    """WITH norm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |         ' +', ' ', 'g')) AS t
      |  FROM documents),
      |filtered AS (
      |  SELECT doc_id, t, len(string_split(t, ' ')) AS n_tokens, md5(t) AS h
      |  FROM norm
      |  WHERE len(string_split(t, ' ')) >= 5 AND length(t) >= 20),
      |assigned AS (
      |  SELECT *, CASE WHEN CAST(('0x' || substr(h, 1, 1)) AS BIGINT) < 13 THEN 'train'
      |                 WHEN CAST(('0x' || substr(h, 1, 1)) AS BIGINT) < 15 THEN 'val'
      |                 ELSE 'test' END AS split
      |  FROM filtered),
      |packed AS (
      |  SELECT split, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY split ORDER BY h, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM assigned)
      |SELECT split, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  CAST(max(floor((cum - 1) / 512)) + 1 AS BIGINT) AS n_chunks,
      |  CAST(sum(CASE WHEN floor((cum - n_tokens) / 512) <> floor((cum - 1) / 512)
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
      |FROM packed GROUP BY split ORDER BY split""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val norm = Tables.load(s, dir, "documents").select(col("doc_id"),
      trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
        " +", " ")).as("t"))
    val filtered = norm
      .filter(size(split(col("t"), " ")) >= 5 && length(col("t")) >= 20)
      .select(col("doc_id"),
        size(split(col("t"), " ")).cast("bigint").as("n_tokens"),
        md5(col("t").cast("binary")).as("h"))
    val assigned = filtered.withColumn("hv",
        conv(substring(col("h"), 1, 1), 16, 10).cast("bigint"))
      .withColumn("split",
        when(col("hv") < 13, "train").when(col("hv") < 15, "val").otherwise("test"))
    val w = Window.partitionBy("split").orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = assigned.withColumn("cum", sum("n_tokens").over(w))
    packed.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("bigint").as("n_tokens"),
        (max(floor((col("cum") - 1) / 512)) + 1).cast("bigint").as("n_chunks"),
        sum(when(floor((col("cum") - col("n_tokens")) / 512)
          =!= floor((col("cum") - 1) / 512), 1L).otherwise(0L))
          .cast("bigint").as("n_straddlers"))
      .orderBy("split")
  }

  /** Per-document LINEAGE through the pipeline — the drop-reason
    * attribution a pipeline operator reads when the corpus shrinks
    * unexpectedly (`pipeline_e2e` reports the funnel's AGGREGATE;
    * this op answers "why did doc X disappear, and who shadowed
    * it"): every document gets its stage metrics (post-normalize
    * word/char counts), its FIRST failing stage as `reason`
    * (`short` → `duplicate` → `kept`, in pipeline order), the
    * canonical owner that shadowed it when deduped, and its split
    * assignment when kept — so the e2e funnel is exactly a GROUP BY
    * over this output. The dedup ownership join is keyed on the
    * md5 of the normalized text, not the text itself (fixed-width
    * shuffle keys at 100 TB — the dedup_exact discipline); one
    * content-keyed hash-agg + one content-keyed join, per-row
    * stages fused into the scan.
    *
    * The driver corpus is clean (every doc passes every stage), so
    * the op plants two fixture docs ABOVE the id range — an exact
    * duplicate of the min-id doc and a too-short doc — the
    * kv_write_batch discipline: both drop paths execute and
    * hash-check at every SF, and because planted ids lose the
    * min-doc_id ownership race, the kept set (hence the e2e funnel)
    * is unchanged. */
  val pipelineLineage: Op = Op.sql("pipeline_lineage",
    s"""WITH docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT (SELECT max(doc_id) + 1 FROM documents), text
      |  FROM documents WHERE doc_id = (SELECT min(doc_id) FROM documents)
      |  UNION ALL
      |  SELECT (SELECT max(doc_id) + 2 FROM documents), 'tiny'),
      |scrubbed AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(text, '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
      |                   '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS text
      |  FROM docs),
      |norm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |         ' +', ' ', 'g')) AS t
      |  FROM scrubbed),
      |meta AS (
      |  SELECT doc_id, md5(t) AS h,
      |    CAST(len(string_split(t, ' ')) AS BIGINT) AS n_words,
      |    CAST(length(t) AS BIGINT) AS n_chars
      |  FROM norm),
      |gate AS (SELECT *, n_words >= 5 AND n_chars >= 20 AS passed FROM meta),
      |own AS (SELECT h, min(doc_id) AS owner FROM gate WHERE passed GROUP BY h)
      |SELECT g.doc_id, g.n_words, g.n_chars,
      |  CASE WHEN NOT g.passed THEN 'short'
      |       WHEN g.doc_id <> o.owner THEN 'duplicate'
      |       ELSE 'kept' END AS reason,
      |  CASE WHEN g.passed AND g.doc_id = o.owner THEN
      |    CASE WHEN CAST(('0x' || substr(g.h, 1, 1)) AS BIGINT) < 13 THEN 'train'
      |         WHEN CAST(('0x' || substr(g.h, 1, 1)) AS BIGINT) < 15 THEN 'val'
      |         ELSE 'test' END END AS split,
      |  CASE WHEN g.passed THEN o.owner END AS canonical_id
      |FROM gate g LEFT JOIN own o ON g.h = o.h
      |ORDER BY g.doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    val base = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
    val ids = base.agg(min("doc_id"), max("doc_id")).head()
    val (minId, maxId) = (ids.getLong(0), ids.getLong(1))
    val planted = base.filter(col("doc_id") === minId)
      .select(lit(maxId + 1).as("doc_id"), col("text"))
      .unionByName(Seq((maxId + 2, "tiny")).toDF("doc_id", "text"))
    val scrubbed = base.unionByName(planted).select(col("doc_id"),
      regexp_replace(regexp_replace(col("text"), TextAnalysis.EmailRe, "<EMAIL>"),
        TextAnalysis.PhoneRe, "<PHONE>").as("text"))
    val norm = scrubbed.select(col("doc_id"),
      trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
        " +", " ")).as("t"))
    val meta = norm.select(col("doc_id"),
      md5(col("t").cast("binary")).as("h"),
      size(split(col("t"), " ")).cast("bigint").as("n_words"),
      length(col("t")).cast("bigint").as("n_chars"))
    val gate = meta.withColumn("passed",
      col("n_words") >= 5 && col("n_chars") >= 20)
    // shuffle_hash: the ownership table is corpus-proportional
    // (one row per distinct content) — at test SF it fits under the
    // broadcast threshold, at 100 TB it cannot exist on the driver;
    // pin the keyed shuffle join like the banded dedup self-joins
    val own = gate.filter(col("passed"))
      .groupBy("h").agg(min("doc_id").as("owner"))
      .hint("shuffle_hash")
    val hv = conv(substring(col("h"), 1, 1), 16, 10).cast("bigint")
    gate.join(own, Seq("h"), "left")
      .select(col("doc_id"), col("n_words"), col("n_chars"),
        when(!col("passed"), "short")
          .when(col("doc_id") =!= col("owner"), "duplicate")
          .otherwise("kept").as("reason"),
        when(col("passed") && col("doc_id") === col("owner"),
          when(hv < 13, "train").when(hv < 15, "val").otherwise("test"))
          .as("split"),
        when(col("passed"), col("owner")).as("canonical_id"))
      .orderBy("doc_id")
  }

  /** INCREMENTAL PIPELINE REFRESH (round 12 — the daily-ingest face
    * of pipeline_e2e: a new batch arrives against an EXISTING corpus
    * state, and only delta-sized work may run. Stages: scrub →
    * normalize → quality gate → cross-batch dedup against the base
    * survivors' content hashes (dedup_incremental's decision — the
    * join carries only (md5, id) scalars, and at 100 TB the base
    * side is the persisted bloom-filtered KV hash store, never a
    * live DISTINCT) → self-dedup within the batch → split
    * assignment. Output = the delta batch's stage funnel plus its
    * per-split admissions — the report a corpus refresh publishes.
    * Batch derivation shared with dedup_incremental (doc_id+200000,
    * 2/3 'v2 '-prefixed → genuinely new, 1/3 exact re-deliveries →
    * dropped at the cross-batch stage). Every stage is delta-sized
    * except the base-hash build; base side pinned shuffle-hash. */
  val pipelineIncremental: Op = Op.sql("pipeline_incremental",
    s"""WITH scrub AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(text, '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
      |                   '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS text
      |  FROM documents),
      |norm AS (
      |  SELECT trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |         ' +', ' ', 'g')) AS t
      |  FROM scrub),
      |base AS (
      |  SELECT DISTINCT md5(t) AS h FROM norm
      |  WHERE len(string_split(t, ' ')) >= 5 AND length(t) >= 20),
      |batch0 AS (
      |  SELECT doc_id + 200000 AS doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN text ELSE 'v2 ' || text END AS text
      |  FROM documents),
      |bscrub AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(text, '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
      |                   '${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS text
      |  FROM batch0),
      |bnorm AS (
      |  SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |         ' +', ' ', 'g')) AS t
      |  FROM bscrub),
      |bqual AS (
      |  SELECT doc_id, t FROM bnorm
      |  WHERE len(string_split(t, ' ')) >= 5 AND length(t) >= 20),
      |bnew AS (
      |  SELECT b.doc_id, b.t FROM bqual b
      |  LEFT JOIN base s ON md5(b.t) = s.h WHERE s.h IS NULL),
      |bdedup AS (SELECT t, min(doc_id) AS doc_id FROM bnew GROUP BY t),
      |bsplit AS (
      |  SELECT CASE WHEN CAST(('0x' || substr(md5(t), 1, 1)) AS BIGINT) < 13 THEN 'train'
      |              WHEN CAST(('0x' || substr(md5(t), 1, 1)) AS BIGINT) < 15 THEN 'val'
      |              ELSE 'test' END AS split
      |  FROM bdedup)
      |SELECT CAST(stage_no AS BIGINT) AS stage_no, stage,
      |  CAST(n_docs AS BIGINT) AS n_docs
      |FROM (
      |  SELECT 1 AS stage_no, 'ingested' AS stage,
      |    (SELECT count(*) FROM batch0) AS n_docs
      |  UNION ALL SELECT 2, 'quality_pass', (SELECT count(*) FROM bqual)
      |  UNION ALL SELECT 3, 'new_vs_base', (SELECT count(*) FROM bnew)
      |  UNION ALL SELECT 4, 'self_deduped', (SELECT count(*) FROM bdedup)
      |  UNION ALL SELECT 5, 'split_train',
      |    (SELECT count(*) FROM bsplit WHERE split = 'train')
      |  UNION ALL SELECT 6, 'split_val',
      |    (SELECT count(*) FROM bsplit WHERE split = 'val')
      |  UNION ALL SELECT 7, 'split_test',
      |    (SELECT count(*) FROM bsplit WHERE split = 'test'))
      |ORDER BY stage_no""".stripMargin) { (s, dir) =>
    import s.implicits._
    def scrubNorm(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      trim(regexp_replace(regexp_replace(lower(
        regexp_replace(regexp_replace(col("text"), TextAnalysis.EmailRe, "<EMAIL>"),
          TextAnalysis.PhoneRe, "<PHONE>")), "[^a-z0-9 ]", ""), " +", " ")).as("t"))
    def qual(df: org.apache.spark.sql.DataFrame) =
      df.filter(size(split(col("t"), " ")) >= 5 && length(col("t")) >= 20)
    val d = Tables.load(s, dir, "documents")
    val base = qual(scrubNorm(d))
      .select(md5(col("t").cast("binary")).as("h")).distinct()
      .hint("shuffle_hash")
    val batch0 = d.select((col("doc_id") + 200000).as("doc_id"),
      when(col("doc_id") % 3 === 0, col("text"))
        .otherwise(concat(lit("v2 "), col("text"))).as("text"))
    val bqual = qual(scrubNorm(batch0))
    val bnew = bqual.withColumn("bh", md5(col("t").cast("binary")))
      .join(base, col("bh") === col("h"), "left")
      .filter(col("h").isNull).select("doc_id", "t")
    val bdedup = bnew.groupBy("t").agg(min("doc_id").as("doc_id"))
    val bsplit = bdedup.withColumn("hx",
        conv(substring(md5(col("t").cast("binary")), 1, 1), 16, 10).cast("bigint"))
      .withColumn("split",
        when(col("hx") < 13, "train").when(col("hx") < 15, "val").otherwise("test"))
    def n(df: org.apache.spark.sql.DataFrame): Long = df.count()
    val splitCounts = bsplit.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq(
      (1L, "ingested", n(batch0)),
      (2L, "quality_pass", n(bqual)),
      (3L, "new_vs_base", n(bnew)),
      (4L, "self_deduped", n(bdedup)),
      (5L, "split_train", splitCounts.getOrElse("train", 0L)),
      (6L, "split_val", splitCounts.getOrElse("val", 0L)),
      (7L, "split_test", splitCounts.getOrElse("test", 0L))
    ).toDF("stage_no", "stage", "n_docs").orderBy("stage_no")
  }

  val all: Seq[Op] = Seq(pipelineE2e, pipelinePack, pipelineLineage,
    pipelineIncremental)
}
