package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Op
import graft.functions.VectorFunctions._
import graft.sources.Tables

/** §2.3 approximate-nearest-neighbor search over the `embeddings`
  * table (`vec_id`, `embedding: array<float>`, `label`).
  *
  * Scale design (100 TB): the corpus is NEVER self-joined. Brute
  * force broadcasts only the (small) query set against the corpus —
  * one scan, no shuffle of the corpus, map-side top-k via window over
  * the broadcast-joined result. The scale path (`ann_lsh`) buckets
  * both sides by random-hyperplane signature bands, so candidate
  * generation is a join keyed on band hashes: shuffle O(corpus), and
  * ranking happens only within buckets.
  */
object Similarity {

  val TopK = 5
  val NumQueries = 10

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))

  /** Brute-force cosine top-k: broadcast the query set, rank per
    * query. The corpus side stays a single pruned parquet scan. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = corpus.as("c")
      .join(broadcast(queries.as("q")), col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cos_raw", cosine(col("q.v"), col("c.v")))
    joined
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q.vec_id"))
          .orderBy(col("cos_raw").desc, col("c.vec_id"))))
      .filter(col("rn") <= k)
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        round(col("cos_raw"), 6).as("cos"))
  }

  val annTopkBrute: Op = Op.sql("ann_topk_brute",
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT * FROM e WHERE vec_id < $NumQueries)
       |SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |       round(list_cosine_similarity(q.v, e.v), 6) AS cos
       |FROM q JOIN e ON q.vec_id <> e.vec_id
       |QUALIFY row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.v, e.v) DESC, e.vec_id) <= $TopK
       |ORDER BY query_id, neighbor_id""".stripMargin) { (s, dir) =>
    val e = emb(s, dir)
    bruteTopK(e, e.filter(col("vec_id") < NumQueries), TopK)
      .orderBy("query_id", "neighbor_id")
  }

  // ---- random-hyperplane LSH --------------------------------------

  val NumPlanes = 16
  val SigBands = 4
  val PlanesPerBand: Int = NumPlanes / SigBands
  val Dim = 64

  /** Deterministic random hyperplanes (seed 42), shipped as a plan
    * literal — broadcast once with the plan, no data movement. */
  lazy val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumPlanes)(Seq.fill(Dim)(rnd.nextGaussian()))
  }

  /** (band_id, band_hash) signature bands of a double-vector column:
    * band_hash = hash of the band's plane-side bits. Two vectors at
    * small angle agree on all bits of some band with high
    * probability. */
  def hyperplaneBands(v: Column): Column =
    bound(transform(typedLit(planes), p => dot(v, p) > 0)) { bits =>
      transform(sequence(lit(0), lit(SigBands - 1)),
        j => struct(j.as("band_id"),
          xxhash64(j, slice(bits, j * PlanesPerBand + 1, lit(PlanesPerBand))).as("band_hash")))
    }

  private def banded(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("v"), explode(hyperplaneBands(col("v"))).as("b"))
      .select(col("vec_id"), col("v"), col("b.band_id"), col("b.band_hash"))

  /** LSH-bucketed ANN: candidates = corpus vectors sharing ≥1
    * signature band with the query, ranked by exact cosine within
    * the candidate set only. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val cands = banded(corpus).as("c")
      .join(banded(queries).as("q"),
        col("q.band_id") === col("c.band_id") &&
        col("q.band_hash") === col("c.band_hash") &&
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("q.v").as("qv"),
        col("c.vec_id").as("neighbor_id"), col("c.v").as("cv"))
      .distinct()
    cands
      .withColumn("cos_raw", cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos_raw").desc, col("neighbor_id"))))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos_raw"), 6).as("cos"))
  }

  val annLsh: Op = Op.rowsOnly("ann_lsh") { (s, dir) =>
    val e = emb(s, dir)
    lshTopK(e, e.filter(col("vec_id") < NumQueries), TopK)
      .orderBy("query_id", "neighbor_id")
  }

  val all: Seq[Op] = Seq(annTopkBrute, annLsh)
}
