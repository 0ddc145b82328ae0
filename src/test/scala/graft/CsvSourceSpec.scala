package graft

import java.nio.file.Files

import graft.sources.CsvSource

/** read_csv option coverage: header/no-header, custom delimiter,
  * schema inference (reference: read_csv.rs named args + csv.slt). */
class CsvSourceSpec extends SparkSuite {

  private def write(content: String): String = {
    val p = Files.createTempFile("graft_csv", ".csv")
    Files.writeString(p, content)
    p.toString
  }

  test("header + inferred schema types the columns") {
    val path = write("id,name,score\n1,alpha,1.5\n2,beta,2.5\n")
    val df = CsvSource.read(spark, path)
    assert(df.columns.toSeq == Seq("id", "name", "score"))
    val types = df.schema.fields.map(_.dataType.simpleString).toSeq
    assert(types == Seq("int", "string", "double"))
    assert(df.count() == 2)
  }

  test("custom delimiter and no header fall back to positional columns") {
    val path = write("1|alpha\n2|beta\n3|gamma\n")
    val df = CsvSource.read(spark, path, header = false, delim = "|")
    assert(df.columns.length == 2)
    assert(df.count() == 3)
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
  }
}
