package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}

import graft.sources.Tables

/** Drives [[Shell.repl]] with scripted slt-style statements (the
  * reference's cli.rs loop: query, explain, pragma, error recovery). */
class ShellSpec extends SparkSuite {

  override def beforeAll(): Unit = {
    super.beforeAll()
    Tables.registerAll(spark, sfDir)
  }

  private def run(script: String): String = {
    val buf = new ByteArrayOutputStream()
    val out = new PrintStream(buf, true, "UTF-8")
    Shell.repl(spark, new BufferedReader(new StringReader(script)), out)
    buf.toString("UTF-8")
  }

  test("select, catalog pragma, explain, and error recovery in one session") {
    val outText = run(
      """SELECT 1 + 2 AS three;
        |SELECT count(*) AS n FROM region
        |SHOW TABLES;
        |explain SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY l_returnflag
        |SELECT definitely_not_a_column FROM region;
        |SELECT 'still alive' AS ok;
        |quit
        |SELECT 'after quit' AS never""".stripMargin)
    // literal select
    assert(outText.contains("three") && outText.contains("3"))
    // real table scan: region has 5 rows at every SF
    assert(outText.linesIterator.exists(_.trim == "5"))
    // SHOW TABLES lists registered tables
    assert(outText.contains("lineitem") && outText.contains("orders"))
    // explain renders a physical plan, not a result grid
    assert(outText.contains("HashAggregate"))
    // a bad statement reports and the loop keeps serving
    assert(outText.contains("error:"))
    assert(outText.contains("still alive"))
    // quit stops the loop before later statements
    assert(!outText.contains("after quit"))
  }

  test("row output is truncated at MaxRows, not unbounded") {
    val outText = run(s"SELECT * FROM lineitem LIMIT ${Shell.MaxRows + 50}\n")
    assert(outText.contains(s"truncated at ${Shell.MaxRows} rows"))
  }

  test("COPY FROM desugars to insert-from-csv-scan (reference bind_copy) and COPY TO exports") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_copy").toString
    // pipe-delimited headerless fixture — the reference csv.slt shape
    // (COPY state FROM 'state1.csv' (DELIMITER '|', HEADER false))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/state1.csv"),
      "1|CA|California\n2|CO|Colorado\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/state2.csv"),
      "id|state_code|state_name\n3|WA|Washington\n4|OR|Oregon\n")
    val outText = run(
      s"""DROP TABLE IF EXISTS graft_copy_state;
         |CREATE TABLE graft_copy_state(id STRING, state_code STRING, state_name STRING) USING parquet;
         |COPY graft_copy_state FROM '$tmp/state1.csv' (DELIMITER '|', HEADER false);
         |COPY graft_copy_state FROM '$tmp/state2.csv' (DELIMITER '|');
         |SELECT count(*) AS n FROM graft_copy_state;
         |SELECT id FROM graft_copy_state ORDER BY id;
         |COPY (SELECT id, state_code FROM graft_copy_state ORDER BY id) TO '$tmp/export.csv' (HEADER true);
         |COPY graft_copy_state TO '$tmp/export.parquet';
         |DROP TABLE graft_copy_state""".stripMargin)
    assert(outText.contains("COPY 2"), s"copy row counts missing:\n$outText")
    assert(outText.linesIterator.exists(_.trim == "4"), s"expected 4 rows:\n$outText")
    Seq("1", "2", "3", "4").foreach(id =>
      assert(outText.linesIterator.exists(_.trim == id), s"id $id missing"))
    // both exports read back complete
    val csvBack = spark.read.option("header", "true").csv(s"$tmp/export.csv")
    assert(csvBack.count() == 4 && csvBack.columns.toSeq == Seq("id", "state_code"))
    assert(spark.read.parquet(s"$tmp/export.parquet").count() == 4)
    // a COPY the grammar can't bind reports and the loop survives
    val bad = run("COPY nonsense;\nSELECT 'alive' AS ok\n")
    assert(bad.contains("error:") && bad.contains("alive"))
  }
}
