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

  /** INSERT INTO name[(cols…)]: append-only parquet add with the
    * reference binder's insert semantics (insert_table.slt): columns
    * match the stored schema BY NAME in any order, columns absent
    * from the batch are NULL-filled, unknown columns and type
    * mismatches are rejected before any write. */
  def insert(spark: SparkSession, name: String, batch: DataFrame,
             wh: String = defaultWarehouse): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    val stored = read(spark, name, wh).schema
    val unknown = batch.columns.filterNot(stored.fieldNames.contains)
    require(unknown.isEmpty,
      s"INSERT into '$name': unknown columns ${unknown.mkString(", ")}")
    val aligned = stored.fields.map { f =>
      if (batch.columns.contains(f.name)) {
        val dt = batch.schema(f.name).dataType
        require(dt == f.dataType,
          s"INSERT into '$name': column ${f.name} is $dt, stored ${f.dataType}")
        col(f.name)
      } else lit(null).cast(f.dataType).as(f.name)
    }
    batch.select(aligned.toSeq: _*).write.mode("append").parquet(dir(wh, name))
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
