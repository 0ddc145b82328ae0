package graft

import java.io.{BufferedReader, InputStreamReader, PrintStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

import graft.sources.Tables

/** Interactive SQL entry point — the reference engine's primary UX
  * (`/root/reference/src/query_engine/src/cli.rs:1-158` is a readline
  * loop over its SQL executor). graft is a library; this main closes
  * the same loop over `spark.sql` with every table registered and the
  * graft extension functions installed, so a user can type the
  * reference's slt-style statements interactively.
  *
  * One statement per line (a trailing `;` is fine): any Spark SQL;
  * `explain <query>` renders the formatted physical plan (the q27
  * renderer); `quit`/`exit`/EOF ends the session.
  *
  * `sbt "runMain graft.Shell [sfDir]"`
  */
object Shell {

  val MaxRows = 100

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.api.GraftSession
      .builder("graft-shell", s"local[$cpus]", Some(cpus.toInt))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    repl(spark, new BufferedReader(new InputStreamReader(System.in)), System.out)
    spark.stop()
  }

  /** Read-eval-print one statement per line until EOF or quit.
    * Separated from [[main]] so specs drive it with scripted input. */
  def repl(spark: SparkSession, in: BufferedReader, out: PrintStream): Unit = {
    out.print("graft> ")
    out.flush()
    var line: String = null
    while ({ line = in.readLine(); line != null }) {
      val stmt = line.trim.stripSuffix(";").trim
      val lower = stmt.toLowerCase
      if (lower == "quit" || lower == "exit") return
      else if (stmt.nonEmpty) {
        try {
          if (lower.startsWith("explain ")) {
            out.println(spark.sql(stmt.substring("explain ".length))
              .queryExecution.explainString(FormattedMode))
          } else {
            val df = spark.sql(stmt)
            val rows = df.take(MaxRows + 1)
            out.println(df.columns.mkString("\t"))
            rows.take(MaxRows).foreach { r =>
              out.println((0 until r.length)
                .map(i => String.valueOf(r.get(i))).mkString("\t"))
            }
            if (rows.length > MaxRows)
              out.println(s"... (truncated at $MaxRows rows)")
          }
        } catch {
          case e: Exception =>
            out.println("error: " + Option(e.getMessage).getOrElse(e.toString)
              .linesIterator.take(5).mkString("\n"))
        }
      }
      out.print("graft> ")
      out.flush()
    }
  }
}
