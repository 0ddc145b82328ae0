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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
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
}
