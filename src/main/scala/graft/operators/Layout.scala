package graft.operators

import org.apache.spark.sql.functions._

import graft.Op
import graft.sources.Tables

/** §2.1+ physical-layout operators: the two storage decisions that
  * dominate 100 TB plans — bucketing (co-located joins: pay the
  * shuffle once at write time, never again per query) and partition
  * pruning (date-partitioned layout turns a time filter into "don't
  * even list those directories").
  *
  * The reference gets the same effects from its LSM layout (leveled
  * key-ordered SSTables = clustering; manifest key ranges = pruning,
  * `storage_engine/src/manager/version_set.rs`); Spark's analogs are
  * bucketed tables and hive-style partitioned directories, and both
  * are asserted at the PLAN level in PlanAuditSpec — the results
  * being right is the oracle's job, the layout actually eliminating
  * the shuffle/scan is the plan audit's job.
  */
object Layout {

  private val BucketedWh = "/root/repo/target/graft_bucketed"
  private val PartPath = "/root/repo/target/graft_events_part"
  val Buckets = 8

  /** Both join sides written bucketed (same bucket count, bucket col
    * = join key) → SortMergeJoin with NO Exchange on either side:
    * the scan itself reports the hash partitioning. At 100 TB this
    * is the difference between re-shuffling the fact table per query
    * and never shuffling it again after ingest. The `merge` hint
    * only disables the broadcast path (customer is tiny at test SF —
    * a broadcast would hide the bucketing under audit). */
  val q34BucketedJoin: Op = Op.sql("q34_bucketed_join",
    """SELECT o_orderkey, c_name, o_totalprice
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_totalprice > 300000
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    s.sql("DROP TABLE IF EXISTS graft_orders_b")
    s.sql("DROP TABLE IF EXISTS graft_customer_b")
    Tables.load(s, dir, "orders").write.mode("overwrite")
      .bucketBy(Buckets, "o_custkey").sortBy("o_custkey")
      .option("path", s"$BucketedWh/orders_b").saveAsTable("graft_orders_b")
    Tables.load(s, dir, "customer").write.mode("overwrite")
      .bucketBy(Buckets, "c_custkey").sortBy("c_custkey")
      .option("path", s"$BucketedWh/customer_b").saveAsTable("graft_customer_b")
    s.table("graft_orders_b").filter(col("o_totalprice") > 300000)
      .hint("merge")
      .join(s.table("graft_customer_b"), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Date-partitioned layout + literal date filter → the scan lists
    * only the matching partition directory (`PartitionFilters` in
    * the plan, 1/30 of the files ever touched). The standard layout
    * for any time-series fact table at scale. */
  val q35PartitionPruning: Op = Op.sql("q35_partition_pruning",
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST("value" AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS sum_value
      |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.load(s, dir, "events")
      .withColumn("d", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("d").parquet(PartPath)
    s.read.parquet(PartPath)
      .filter(col("d") === lit("2024-01-15"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("decimal(18,2)").as("sum_value"))
      .orderBy("event_type")
  }

  val all: Seq[Op] = Seq(q34BucketedJoin, q35PartitionPruning)
}
