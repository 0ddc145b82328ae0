package graft

import java.sql.Timestamp

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Edge-semantics pinned by construction: the session-window gap
  * boundary convention, and analysis-time type checking of the
  * custom expressions. */
class BoundarySpec extends SparkSuite {

  test("an event exactly gap-after the previous one MERGES into the session") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def plusMs(ms: Long) = new Timestamp(t0.getTime + ms)
    // measured convention (this test exists because an advisory
    // claimed the opposite): session_window merges while
    // next_ts <= prev_ts + gap — the boundary event is INSIDE.
    // user 1: gap of exactly 30:00 → 1 session (boundary merges)
    // user 2: gap of 29:59       → 1 session
    // user 3: gap of 30:01       → 2 sessions (strictly beyond gap)
    val events = Seq(
      (1L, t0, "view", 0.0), (1L, plusMs(30 * 60000), "view", 0.0),
      (2L, t0, "view", 0.0), (2L, plusMs(29 * 60000 + 59000), "view", 0.0),
      (3L, t0, "view", 0.0), (3L, plusMs(30 * 60000 + 1000), "view", 0.0))
      .toDF("user_id", "ts", "event_type", "value")
    val sessions = Streams.sessionize(events)
      .groupBy("user_id").count().orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sessions.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 2L)),
      "session_window merge must be inclusive at the gap boundary (oracle uses >)")
  }

  test("custom expressions reject wrong argument types at analysis time") {
    import spark.implicits._
    val df = Seq((1, 2.5)).toDF("i", "d")
    // string-typed kernels fed an int, vector kernel fed a scalar:
    // must fail in analysis (clean error), not at runtime with a
    // ClassCastException inside generated code
    Seq(
      expr("graft_simhash64(i)"),
      expr("graft_minhash_bands(i, 64, 16)"),
      expr("graft_cosine(d, d)"),
      expr("graft_hyperplane_bands(d, 4)")
    ).foreach { e =>
      intercept[AnalysisException] { df.select(e).collect() }
    }
  }

  test("star contraction on an empty or self-loop-only graph converges to an empty forest") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    val (s1, r1) = graft.operators.Analytics.largeSmallStar(empty)
    assert(s1.isEmpty && r1 >= 1)
    val loops = Seq((3L, 3L), (7L, 7L)).toDF("x", "y")
    val (s2, _) = graft.operators.Analytics.largeSmallStar(loops)
    assert(s2.isEmpty, "self-loops must not manufacture components")
  }

  test("grouped rank on an empty frame returns an empty frame with the rank columns") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val empty = Seq.empty[(String, Long)].toDF("grp", "id")
    val out = graft.operators.RankSelect.groupRanks(empty, "grp", Seq(col("id")))
    assert(out.columns.toSet == Set("grp", "id", "rank", "n"))
    assert(out.isEmpty)
  }

  test("doc containment on an empty corpus is empty; an all-short corpus reports NULLs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.Dedup.docContainment(empty).isEmpty)
    // every doc below one window: reported, containment NULL, never dropped
    val short = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val rows = graft.operators.Dedup.docContainment(short).collect()
    assert(rows.length == 2)
    assert(rows.forall(r => r.getLong(1) == 0 && r.isNullAt(3) && !r.getBoolean(4)))
  }

  test("nearest as-of with an empty right side keeps every left row unmatched") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (2L, 200L, 20L)).toDF("user_id", "ts_us", "event_id")
    val right = Seq.empty[(Long, Long, Long)].toDF("user_id", "ts_us", "event_id")
    val got = graft.operators.RangeJoin
      .asofNearest(left, right, "user_id", "event_id", "event_id")
      .collect().map(r => (r.getLong(1), r.isNullAt(3), r.isNullAt(4))).toSet
    assert(got == Set((10L, true, true), (20L, true, true)))
  }

  test("checkpointing an empty log fails loudly instead of publishing an empty manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_ckpt").toString
    val log = graft.kv.KVLog(dir + "/log", "key", "seq", "tombstone")
    intercept[IllegalArgumentException] { log.checkpointTo(dir + "/ckpt") }
    assert(!new java.io.File(dir + "/ckpt").exists())
  }

  test("MMR with fewer candidates than k returns them all, ranked — never pads or loops") {
    import graft.functions.VectorKernels.cosine
    val q = Array(1.0, 0.0)
    val cands = Array(
      (10L, cosine(q, Array(0.9, 0.1)), Array(0.9, 0.1)),
      (20L, cosine(q, Array(0.1, 0.9)), Array(0.1, 0.9)))
    val picked = graft.operators.Similarity.mmrGreedy(cands, k = 5)
    assert(picked.map(_._1) == Seq(1, 2), "ranks must stay contiguous")
    assert(picked.map(_._2).toSet == Set(10L, 20L))
    assert(graft.operators.Similarity.mmrGreedy(Array.empty, k = 5).isEmpty)
  }

  test("k-core on an empty or sub-threshold graph converges immediately to empty") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(graft.operators.Analytics.kCore(empty, k = 2, maxRounds = 3).collect().isEmpty)
    // a single edge can never sustain a 2-core; one peel round ends it
    val single = Seq((1L, 2L)).toDF("u", "v")
    assert(graft.operators.Analytics.kCore(single, k = 2, maxRounds = 3).collect().isEmpty)
  }

  test("backfill serve with an EMPTY tail side serves the backfill unchanged") {
    import spark.implicits._
    val e = Seq((1L, 10L, java.math.BigDecimal.valueOf(250, 2)),
        (1L, 11L, java.math.BigDecimal.valueOf(150, 2)),
        (2L, 12L, java.math.BigDecimal.valueOf(500, 2)))
      .toDF("user_id", "event_id", "value")
      .withColumn("value", col("value").cast("double"))
    val cut = 100L // everything is backfill; the tail stream has seen nothing
    val served = Streams.backfillServe(
        Streams.backfillAgg(e, cut), Streams.tailAgg(e, cut))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(served.toSeq == Seq((1L, 2L, 0L, 2L, 4.0), (2L, 1L, 0L, 1L, 5.0)))
  }

  test("WAL replay of an all-torn segment (shorter than one record) recovers nothing, cleanly typed") {
    val r = graft.kv.Wal.decode(Array.fill[Byte](graft.kv.Wal.RecordBytes - 1)(0x7F))
    assert(r.records.isEmpty && !r.clean)
  }

  test("range delete: a tombstone at EXACTLY the put's seq does not delete it (strict >)") {
    import spark.implicits._
    // RocksDB rule: the tombstone shadows only SMALLER sequence
    // numbers; an equal-seq put wins (a write batch can't interleave
    // seqs anyway, but the comparison must be strict)
    val runs = Seq((5L, 10L, false, 1.5)).toDF("key", "seq", "tombstone", "v")
    val t = graft.kv.KVTable(runs, "key", "seq", "tombstone")
    val rts = Seq((0L, 100L, 10L)).toDF("lo", "hi", "seq")
    assert(t.mergedWithRangeDeletes(rts).count() == 1)
    val rtsNewer = Seq((0L, 100L, 11L)).toDF("lo", "hi", "seq")
    assert(t.mergedWithRangeDeletes(rtsNewer).count() == 0)
  }

  test("funnel: out-of-order stages never progress; purchase-only users reach nothing") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new Timestamp(t0.getTime + s * 1000)
    val e = Seq(
      // user 1: purchase BEFORE any view, then view — no click stage
      (1L, 1L, ts(1), "purchase", 1.0), (1L, 2L, ts(2), "view", 0.0),
      // user 2: click at the SAME µs as the view — strict > rejects it
      (2L, 3L, ts(5), "view", 0.0), (2L, 4L, ts(5), "click", 0.0),
      // user 3: the full strict path
      (3L, 5L, ts(10), "view", 0.0), (3L, 6L, ts(11), "click", 0.0),
      (3L, 7L, ts(12), "purchase", 9.0)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = Streams.funnelTrack(e).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
    assert(got.toSeq == Seq((1L, true, false, false),
      (2L, true, false, false), (3L, true, true, true)))
  }

  test("as-of enrichment: purchases before any click carry NULLs; same-µs click with lower id counts") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new Timestamp(t0.getTime + s * 1000)
    val e = Seq(
      (1L, 1L, ts(1), "purchase", 5.0),            // before any click → NULLs
      (1L, 2L, ts(3), "click", 1.25),
      (1L, 3L, ts(3), "purchase", 6.0),            // same µs, click id 2 < 3 → enriched
      (1L, 4L, ts(2), "purchase", 7.0)             // EARLIER ts than the click → NULLs
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val got = Streams.asofEnrich(e).orderBy("purch_id").collect()
      .map(r => (r.getLong(1), Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      (1L, None, None),
      (3L, Some(t0.getTime * 1000 + 3000000L), Some(1.25)),
      (4L, None, None)))
  }

  test("watermark drop protocol: filter lags eviction by one batch, keys on window END, equality drops") {
    // Measured on Spark 4.1 (round 12) and pinned here because
    // Streams.lateAudit replays exactly this protocol in closed form:
    //  (a) a row below the watermark sails through the batch where the
    //      watermark FIRST advanced past it (filter uses the previous
    //      batch's watermark), and the identical row drops one batch
    //      later;
    //  (b) the drop predicate keys on the row's WINDOW END, not its raw
    //      event time — end == watermark drops (inclusive), while a row
    //      whose ts is below the watermark but whose window end is
    //      above survives.
    import spark.implicits._
    def ts(h: Int, m: Int) =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(h * 3600L + m * 60L))
    def drive(batches: Seq[Seq[java.sql.Timestamp]], sink: String): Seq[Long] = {
      val src = java.nio.file.Files.createTempDirectory("graft_wm_pin").toString
      val clock = new ChunkStamper(src)
      batches.foreach { b =>
        b.map(Tuple1(_)).toDF("ts").coalesce(1).write.mode("append").parquet(src)
        clock.stamp()
      }
      val stream = spark.readStream
        .schema(Seq(Tuple1(ts(0, 0))).toDF("ts").schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      q.processAllAvailable()
      q.stop()
      q.recentProgress.toSeq.sortBy(_.batchId)
        .map(_.stateOperators.map(_.numRowsDroppedByWatermark).sum)
    }
    // (a) lag: wm advances to 10:00 after batch 0; an 08:15 row in
    // batch 1 is kept, the same lateness in batch 2 drops — and the
    // batch-2 drops include the window end == 10:00 equality case
    val lag = drive(Seq(
      Seq(ts(10, 30)),
      Seq(ts(8, 15)),
      Seq(ts(8, 20), ts(9, 30))), "wm_pin_lag")
    assert(lag.take(3) == Seq(0L, 0L, 2L), s"lag/equality protocol: $lag")
    // (b) end-keyed: filter wm 09:50 in batch 2; ts 09:45 is below it
    // but window [09:00,10:00) end is above -> kept
    val keyed = drive(Seq(
      Seq(ts(10, 20)),
      Seq(ts(10, 25)),
      Seq(ts(9, 45))), "wm_pin_keyed")
    assert(keyed.take(3) == Seq(0L, 0L, 0L), s"end-keyed protocol: $keyed")
  }

  test("round-12 degenerate inputs: constant gini, empty benford, pairless ACF, matchless forecast") {
    import spark.implicits._
    // constant series: zero concentration — gini numerator collapses
    val const = Seq.fill(10)(("c", 5.0)).zipWithIndex
      .map { case ((ty, v), i) =>
        (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(i * 60L)), ty, v, i.toLong)
      }.toDF("ts", "event_type", "value", "event_id")
    // (gini path needs event_id; reuse cusum which shares the bucket shape)
    val cs = graft.operators.Analytics.cusumReport(const.select(col("ts"), col("event_type"), col("value")))
      .collect()
    assert(cs.length == 1 && cs.head.getDouble(4) == 0.0,
      "constant series must carry zero CUSUM mass")
    // benford over values below one cent: every digit row present, all zero
    val tiny = Seq.fill(5)(0.001).toDF("value")
    val bf = graft.operators.Analytics.benfordReport(tiny).collect()
    assert(bf.length == 9 && bf.forall(_.getLong(1) == 0L),
      "sub-cent values must leave all nine digit rows at zero")
    assert(bf.forall(_.isNullAt(2)), "empty-corpus shares must be NULL, not a throw")
    // single-bucket series: no lag pairs -> no ACF rows for the type
    val one = Seq((java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0)), "solo", 1.0))
      .toDF("ts", "event_type", "value")
    assert(graft.operators.Analytics.acfReport(one, 3).collect().isEmpty,
      "a single bucket has no lag pairs")
    // no t-24h partner anywhere: backtest emits nothing for the type
    val sparse = Seq(
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0)), "s", 1.0),
      (java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(3600)), "s", 2.0))
      .toDF("ts", "event_type", "value")
    assert(graft.operators.Analytics.forecastBacktest(sparse).collect().isEmpty,
      "no seasonal partner must mean no scored rows")
  }
}
