package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** §2.4 streaming: the reference's stream design
  * (`/root/reference/docs/stream_design.md`, streaming writes over the
  * KV engine) mapped onto Structured Streaming.
  *
  * Each transform below is written against a plain DataFrame so the
  * SAME plan runs in batch (oracle-checked against DuckDB) and as a
  * streaming query (spec-checked via a file source + memory sink):
  * Structured Streaming's incrementalization is exactly this
  * batch-equivalence contract.
  *
  * Scale notes: watermark bounds state (1 hour of open windows per
  * key-group); windowed aggregation state is partitioned by
  * (window, keys) — the same hash shuffle as the batch groupBy;
  * session windows use Spark's native session_window state merging
  * rather than a hand-rolled mapGroupsWithState where built-in
  * semantics suffice.
  */
object Streams {

  /** Tumbling 1-hour window aggregation per event_type, watermarked.
    * (`withWatermark` is a no-op in batch execution.) */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(unix_micros(col("w.start")).as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization (30-min inactivity gap) per user:
    * session start/end (+gap) and event count. */
  def sessionize(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("s_start"),
        unix_micros(col("sw.end")).as("s_end"), col("n_events"))

  /** Per-user running aggregate state for [[statefulTrack]]. */
  final case class UserState(n_events: Long, sum_value: Double, last_ts: Long)
  final case class UserTrack(user_id: Long, n_events: Long,
                             sum_value: Double, last_ts: Long)

  /** Custom stateful tracking via `flatMapGroupsWithState` — the
    * general tool when built-in windows can't express the state
    * machine (reference: the stream design's per-key incremental
    * state). State is one small struct per user (bounded), updated
    * per micro-batch; in BATCH execution the same code sees each
    * group once with empty initial state, so batch output == final
    * streaming state — which is what the DuckDB oracle checks. */
  def statefulTrack(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val typed = events.select(col("user_id"), col("value"),
      unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Double, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[UserState, UserTrack](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0, Long.MinValue))
          val next = rows.foldLeft(prev) { (s, r) =>
            UserState(s.n_events + 1, s.sum_value + r._2, math.max(s.last_ts, r._3))
          }
          state.update(next)
          Iterator.single(UserTrack(user, next.n_events,
            math.rint(next.sum_value * 100) / 100, next.last_ts))
      }
      .toDF()
  }

  /** Streaming ingestion INTO the KV store — the scenario the
    * reference's stream design actually describes
    * (`/root/reference/docs/stream_design.md`: a stream of writes
    * absorbed by the LSM engine): each micro-batch is appended as
    * one immutable KV run (the memtable-flush analog), and any
    * [[graft.kv.KVTable]] read over the accumulated runs sees
    * latest-seq-wins semantics. No per-row writes, no state store —
    * the LSM "many runs, merge on read" shape IS the streaming
    * sink. */
  /** Stream-stream INTERVAL join (click → purchase within 1 hour per
    * user): the canonical two-stream correlation. Both sides carry
    * watermarks and the join condition bounds p_ts to
    * [c_ts, c_ts + 1h], so streaming state is bounded — each side
    * buffers at most watermark + interval of rows per key-group.
    * Timestamps are µs-truncated on BOTH engines (the oracle
    * reconstructs them via make_timestamp(epoch_us(ts))), so the
    * boundary compare is identical. In batch execution the same plan
    * is a plain interval join. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    c.join(p, col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), unix_micros(col("c_ts")).as("click_ts"),
        unix_micros(col("p_ts")).as("purch_ts"))
  }

  /** Streaming dedup of a keyed stream (the ingest-time dedup stage
    * of a training pipeline): first occurrence of each
    * (user_id, event_type) passes, duplicates drop. State = one
    * entry per distinct key. Batch execution of the same plan is a
    * plain distinct, which is what the oracle checks. */
  def streamDistinctKeys(events: DataFrame): DataFrame =
    events.select("user_id", "event_type")
      .dropDuplicates("user_id", "event_type")

  /** One micro-batch → one run DIRECTORY keyed by batchId, written
    * with overwrite: a replayed micro-batch (failure before the
    * offset commit) replaces its own previous — possibly partial —
    * output instead of appending duplicate runs. This is the
    * idempotence the reference gets from WAL record framing +
    * sequence-checked replay
    * (`storage_engine/src/wal/wal_record_writer.rs`); here the
    * batchId is the framing. */
  def ingestBatch(batch: DataFrame, runsDir: String, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$runsDir/run-$batchId")

  /** All accumulated runs of a [[kvIngest]] directory (one subdir per
    * micro-batch). */
  def kvRuns(spark: SparkSession, runsDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(runsDir)

  def kvIngest(stream: DataFrame, runsDir: String): StreamingQuery =
    stream
      .select(col("user_id").as("key"), col("event_id").as("seq"),
        (col("event_type") === "error").as("tombstone"), col("value").as("v"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        ingestBatch(batch, runsDir, batchId)
      }
      .outputMode("append")
      .start()

  /** Run a batch-defined transform as a real streaming query over a
    * file source, writing to an in-memory sink table; returns the
    * started query (caller awaits + reads `spark.table(sinkTable)`).
    * Used by specs to prove the plans are streaming-executable. */
  def runFileStream(spark: SparkSession, srcDir: String,
                    schemaOf: DataFrame, transform: DataFrame => DataFrame,
                    sinkTable: String, outputMode: String = "complete"): StreamingQuery = {
    val stream = spark.readStream
      .schema(schemaOf.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    transform(stream).writeStream
      .format("memory")
      .queryName(sinkTable)
      .outputMode(outputMode)
      .start()
  }
}
