package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet star-schema source + registrar.
  *
  * Spark-first analog of the reference's storage scan path
  * (`query_engine/src/function/table/seq_table_scan.rs` +
  * `execution/volcano_executor/table_scan.rs`): instead of a
  * hand-rolled sequential scan operator, `spark.read.parquet` gives a
  * vectorized columnar scan with predicate pushdown and column
  * pruning for free (the reference implements those as optimizer
  * rules `column_pruning.rs` / `pushdown_predicates.rs`).
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // Analyzed-DataFrame cache, keyed by (session, path, dir mtime).
  // `spark.read.parquet` pays a file listing + a parquet footer
  // schema read EVERY call — measured ~0.3 s of the 0.74 s wall for
  // the 5-table q10 at sf0.1 (target/profile.json), and a real
  // per-query driver cost on a 100 TB table with 10^5 files. A
  // long-running engine lists a table once and replans from the
  // cached relation; the mtime in the key keeps the cache honest if
  // the table is rewritten between calls. Bounded: |dirs|x|tables|
  // analyzed plans, no data — plan-only, so executors hold nothing.
  // Keyed on the SparkSession OBJECT (r13, ADVICE r12):
  // SparkSession does not override equals, so map equality is
  // identity — collision-free, unlike the identityHashCode int key
  // two live sessions could in principle share. The strong session
  // reference pins nothing new: the cached DataFrames already hold
  // their session.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, Long), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val mtime =
      try java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(path)).toMillis
      catch { case _: Throwable => -1L }
    cache.computeIfAbsent(
      (spark, path, mtime),
      _ => loadUncached(spark, dir, name))
  }

  private def loadUncached(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Timestamp columns arrive in whichever physical form the data
    // generator chose; normalize them all AT THE SCAN to session-UTC
    // TimestampType so every downstream operator sees one timestamp
    // type and filters still push down to parquet:
    //  - TIMESTAMP(MICROS, isAdjustedToUTC=false) would read as
    //    TIMESTAMP_NTZ; with inferTimestampNTZ off (pinned in
    //    GraftSession.builder / the test suite session, NOT set here —
    //    load() is side-effect-free) the scan itself yields
    //    TimestampType — exact under the UTC session timezone,
    //    matching DuckDB's naive epoch_us, and no post-scan cast that
    //    would block predicate pushdown;
    //  - TIMESTAMP(NANOS) has no native Spark type (SPARK-40819): read
    //    nanos as long (legacy.parquet.nanosAsLong, same session pin),
    //    truncate with integer `div` (not `/`: double division rounds
    //    at 1e18-scale nanos where DuckDB truncates).
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType)
      // legacy nanos layout: surface a microsecond-truncated timestamp
      df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  // registerAllOnce memo — the CURRENTLY-registered dir per session
  // (r13, ADVICE r12): temp views are session-global, so a memo
  // keyed by (session, dir) went stale the moment a different dir
  // was registered on the same session — asking for dir A after
  // registering dir B would skip re-registration and silently read
  // B's data. Storing the one dir the views actually point at makes
  // a dir switch re-register (and a repeat a no-op). Plan-only
  // catalog state, so the memo holds no data.
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** [[registerAll]] memoized per session: ops that build their plan
    * from ONE sql() text (r12) re-register views on every bench
    * repetition otherwise — ten catalog commands inside the timed
    * region. A different `dir` on the same session re-registers
    * (views are repointed); `compute`'s per-key lock serializes
    * concurrent registrations on one session. */
  def registerAllOnce(spark: SparkSession, dir: String): Unit =
    registered.compute(spark, (_, cur) => {
      if (cur != dir) registerAll(spark, dir)
      dir
    })
}
