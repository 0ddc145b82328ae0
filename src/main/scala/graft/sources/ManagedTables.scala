package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Minimal persistent managed-table catalog: CREATE TABLE / INSERT /
  * SELECT-back / DROP over a parquet warehouse directory.
  *
  * The Spark-first answer to the reference's DDL+DML executors
  * (`/root/reference/src/query_engine/src/execution/volcano_executor/create_table.rs`,
  * `insert.rs`, exercised by `tests/slt/create_table.slt` /
  * `insert_table.slt`): where the reference routes CREATE/INSERT
  * through its catalog set and LSM storage, graft's tables are
  * directories of immutable parquet files under a warehouse root —
  * the schema lives in the parquet footers (a zero-row file is
  * written at CREATE so an empty table still has one), inserts are
  * append-only file additions (no read-modify-write, safe for
  * concurrent readers), and everything survives the session because
  * the only state IS the files.
  *
  * Scale notes: INSERT appends files — O(batch), never O(table); a
  * 100 TB table takes new batches at the same cost as an empty one.
  * Readers prune by parquet footer stats as usual. Compaction of
  * many small insert files is [[graft.kv.KVTable.compactTo]]'s job
  * when a key column exists.
  */
object ManagedTables {

  val defaultWarehouse = "/root/repo/target/graft_warehouse"

  private def dir(wh: String, name: String) = s"$wh/$name"

  /** CREATE [OR REPLACE] TABLE name(schema): writes a zero-row
    * parquet file carrying the schema, so the table exists (and is
    * readable/insertable) before any data arrives. */
  def create(spark: SparkSession, name: String, schema: StructType,
             wh: String = defaultWarehouse): Unit =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      .write.mode("overwrite").parquet(dir(wh, name))

  /** INSERT INTO name: append-only parquet add, schema-checked
    * (names + types, nullability-insensitive) against the stored
    * schema first — the analog of the reference binder's insert
    * column-count/type check. */
  def insert(spark: SparkSession, name: String, batch: DataFrame,
             wh: String = defaultWarehouse): Unit = {
    val stored = read(spark, name, wh).schema
    def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    require(shape(batch.schema) == shape(stored),
      s"INSERT schema mismatch for '$name': ${batch.schema.sql} vs stored ${stored.sql}")
    batch.write.mode("append").parquet(dir(wh, name))
  }

  /** SELECT * FROM name (all inserted batches). */
  def read(spark: SparkSession, name: String,
           wh: String = defaultWarehouse): DataFrame =
    spark.read.parquet(dir(wh, name))

  /** DROP TABLE IF EXISTS name. */
  def drop(name: String, wh: String = defaultWarehouse): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    val d = new java.io.File(dir(wh, name))
    if (d.exists()) rm(d)
  }

  /** Table names present in the warehouse. */
  def tables(wh: String = defaultWarehouse): Seq[String] = {
    val root = new java.io.File(wh)
    if (!root.exists()) Seq.empty
    else root.listFiles().filter(_.isDirectory).map(_.getName).toSeq.sorted
  }
}
