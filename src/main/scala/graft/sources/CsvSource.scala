package graft.sources

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `read_csv` table function, Spark-first.
  *
  * Analog of the reference's `function/table/read_csv.rs`
  * (`read_csv('path', header=>true, delim=>',')`): graft delegates to
  * Spark's distributed CSV datasource (splittable, schema inference,
  * pushdown-capable) instead of a single-threaded CSV reader.
  */
object CsvSource {
  def read(spark: SparkSession, path: String,
           header: Boolean = true, delim: String = ","): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("sep", delim)
      .option("inferSchema", "true")
      .csv(path)

  /** Deterministic CSV fixture derived from a dim table, so the
    * read_csv path can be oracle-checked against DuckDB's read_csv on
    * the exact same file. Tiny dim only (nation: 25 rows). */
  def materializeNationCsv(spark: SparkSession, sfDir: String, outPath: String): String = {
    val rows = Tables.load(spark, sfDir, "nation")
      .selectExpr("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey")
      .collect()
    val sb = new StringBuilder("n_nationkey,n_name,n_regionkey\n")
    rows.foreach(r => sb.append(s"${r.getInt(0)},${r.getString(1)},${r.getInt(2)}\n"))
    val p = Paths.get(outPath)
    Files.createDirectories(p.getParent)
    Files.write(p, sb.toString.getBytes(StandardCharsets.UTF_8))
    outPath
  }

  /** The nation fixture with MALFORMED rows planted after every 5th
    * clean row, cycling the three corruption kinds a real feed
    * produces: wrong arity (too few fields), a type failure in an
    * integer column, and trailing extra fields. Returns the planted
    * bad-row count so specs can assert the drop is exact. */
  def materializeNationCsvWithErrors(spark: SparkSession, sfDir: String,
                                     outPath: String): Int = {
    val rows = Tables.load(spark, sfDir, "nation")
      .selectExpr("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey")
      .collect()
    val sb = new StringBuilder("n_nationkey,n_name,n_regionkey\n")
    var bad = 0
    rows.zipWithIndex.foreach { case (r, i) =>
      sb.append(s"${r.getInt(0)},${r.getString(1)},${r.getInt(2)}\n")
      if (i % 5 == 4) {
        bad += 1
        sb.append(i % 15 match {
          case 4  => "truncated_row\n"
          case 9  => s"not_an_int,CORRUPT$i,9\n"
          case _  => s"$i,EXTRA$i,1,spurious,fields\n"
        })
      }
    }
    val p = Paths.get(outPath)
    Files.createDirectories(p.getParent)
    Files.write(p, sb.toString.getBytes(StandardCharsets.UTF_8))
    bad
  }
}
