package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog introspection table functions.
  *
  * Analogs of the reference's `function/table/query_tables.rs`
  * (`template_query_tables()`) and `query_columns.rs`
  * (`template_query_columns()`), which walk its CatalogSet
  * (`catalog/catalog_set.rs`). graft derives the same answers from
  * the parquet schemas of the registered star-schema tables.
  */
object Catalog {
  /** (schema_name, table_name, row_count) for every table, as ONE
    * lazy plan (union of per-table count aggregates) — a single job
    * with one task per table, instead of round-1's driver loop of 10
    * serial `count()` jobs. The parquet count aggregate never
    * materializes columns (vectorized batch row counts). */
  def queryTables(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit}
    Tables.all.sorted.map { n =>
      Tables.load(spark, dir, n)
        .agg(count(lit(1)).as("row_count"))
        .select(lit("main").as("schema_name"), lit(n).as("table_name"),
          col("row_count"))
    }.reduce(_.unionAll(_))
  }

  /** DuckDB oracle for [[queryTables]]: counts over the same
    * registered parquet views. */
  val tablesOracleSql: String =
    "SELECT 'main' AS schema_name, table_name, row_count FROM (" +
      Tables.all.sorted.map(n =>
        s"SELECT '$n' AS table_name, count(*) AS row_count FROM $n")
        .mkString(" UNION ALL ") +
      ") ORDER BY table_name"

  /** (table_name, column_name, ordinal, data_type) from the live
    * parquet schemas, with type names normalized to the ANSI-ish
    * spelling shared with [[columnsOracleSql]] (CatalogSpec asserts
    * live and static inventories agree). */
  def queryColumns(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.all.sorted.flatMap { t =>
      Tables.load(spark, dir, t).schema.fields.zipWithIndex.map {
        case (f, i) => (t, f.name, i + 1, normalizeType(f.dataType.sql))
      }
    }.toDF("table_name", "column_name", "ordinal", "data_type")
  }

  /** Map Spark SQL type names onto the normalized names used by the
    * static oracle (DuckDB-friendly spellings). */
  def normalizeType(sparkSql: String): String = sparkSql.toUpperCase match {
    case "STRING"        => "VARCHAR"
    case "INT"           => "INTEGER"
    case "ARRAY<FLOAT>"  => "FLOAT[]"
    case "TIMESTAMP_NTZ" => "TIMESTAMP"
    case other           => other
  }

  /** Static column inventory: the known star-schema layout (identical
    * across scale factors). Single source of truth for the oracle. */
  val staticColumns: Seq[(String, Seq[(String, String)])] = Seq(
    "region" -> Seq("r_regionkey" -> "INTEGER", "r_name" -> "VARCHAR"),
    "nation" -> Seq("n_nationkey" -> "INTEGER", "n_name" -> "VARCHAR",
      "n_regionkey" -> "INTEGER"),
    "customer" -> Seq("c_custkey" -> "BIGINT", "c_name" -> "VARCHAR",
      "c_nationkey" -> "INTEGER", "c_acctbal" -> "DOUBLE", "c_mktsegment" -> "VARCHAR"),
    "supplier" -> Seq("s_suppkey" -> "BIGINT", "s_name" -> "VARCHAR",
      "s_nationkey" -> "INTEGER", "s_acctbal" -> "DOUBLE"),
    "part" -> Seq("p_partkey" -> "BIGINT", "p_name" -> "VARCHAR",
      "p_brand" -> "VARCHAR", "p_type" -> "VARCHAR", "p_size" -> "INTEGER",
      "p_retailprice" -> "DOUBLE"),
    "orders" -> Seq("o_orderkey" -> "BIGINT", "o_custkey" -> "BIGINT",
      "o_orderstatus" -> "VARCHAR", "o_totalprice" -> "DOUBLE",
      "o_orderdate" -> "TIMESTAMP", "o_orderpriority" -> "VARCHAR"),
    "lineitem" -> Seq("l_orderkey" -> "BIGINT", "l_partkey" -> "BIGINT",
      "l_suppkey" -> "BIGINT", "l_linenumber" -> "INTEGER",
      "l_quantity" -> "DOUBLE", "l_extendedprice" -> "DOUBLE",
      "l_discount" -> "DOUBLE", "l_tax" -> "DOUBLE",
      "l_returnflag" -> "VARCHAR", "l_linestatus" -> "VARCHAR",
      "l_shipdate" -> "TIMESTAMP"),
    "events" -> Seq("event_id" -> "BIGINT", "ts" -> "TIMESTAMP",
      "user_id" -> "BIGINT", "event_type" -> "VARCHAR",
      "value" -> "DOUBLE", "props" -> "VARCHAR"),
    "documents" -> Seq("doc_id" -> "BIGINT", "text" -> "VARCHAR",
      "lang" -> "VARCHAR", "source" -> "VARCHAR", "n_chars" -> "BIGINT"),
    "embeddings" -> Seq("vec_id" -> "BIGINT", "embedding" -> "FLOAT[]",
      "label" -> "INTEGER"))

  /** DuckDB oracle for [[queryColumns]]: a VALUES scan of the static
    * inventory, sorted the same way. */
  val columnsOracleSql: String = {
    val rows = staticColumns.sortBy(_._1).flatMap { case (t, cols) =>
      cols.zipWithIndex.map { case ((c, ty), i) => s"('$t','$c',${i + 1},'$ty')" }
    }
    "SELECT * FROM (VALUES " + rows.mkString(",") +
      ") t(table_name, column_name, ordinal, data_type) ORDER BY table_name, ordinal"
  }
}
