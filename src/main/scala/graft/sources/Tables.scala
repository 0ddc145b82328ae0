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
    // events.ts is parquet TIMESTAMP(NANOS), which Spark has no native
    // type for (SPARK-40819): read nanos as long, then surface a
    // microsecond-truncated TimestampType so every downstream operator
    // sees a normal timestamp column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      // integer `div`, not `/`: double division loses sub-µs exactness
      // at 1e18-scale nanos and rounds where DuckDB truncates
      df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
