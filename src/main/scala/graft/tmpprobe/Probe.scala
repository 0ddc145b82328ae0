package graft.tmpprobe
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.api.GraftSession.builder("probe", "local[8]", Some(8)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // per (vec_id % 16, pos): exact decimal sums of double-cast elements
    val out = e.select((col("vec_id") % 16).as("g"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("g", "pos")
      .agg(sum(col("x").cast(DecimalType(38, 18))).as("s"), count(lit(1)).as("n"))
      .select(col("g"), col("pos"), col("s").cast("string").as("s"),
        (col("s").cast("double") / col("n")).as("mean"))
      .orderBy("g", "pos")
    out.coalesce(1).write.mode("overwrite").parquet("/tmp/dec_probe")
    spark.stop()
  }
}
