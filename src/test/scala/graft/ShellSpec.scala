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
}
