package graft

import graft.kv.KVTable

/** Randomized-history property test: KVTable's distributed
  * latest-wins merge must equal a sequential in-memory replay of the
  * same write history — the executable contract of the reference's
  * storage engine semantics (apply writes in seq order; read =
  * latest non-tombstone). Deterministic seed; 8 histories × merged +
  * snapshot each. */
class KVPropertySpec extends SparkSuite {

  private def genHistory(rnd: scala.util.Random): List[(Long, Boolean, Double)] =
    List.fill(60)((rnd.nextInt(9).toLong, rnd.nextInt(4) == 0,
      (rnd.nextInt(2001) - 1000).toDouble))

  private def model(history: List[(Long, Boolean, Double)],
                    asOf: Option[Long]): Map[Long, (Long, Double)] =
    history.zipWithIndex
      .filter { case (_, i) => asOf.forall(i.toLong <= _) }
      .foldLeft(Map.empty[Long, Either[Unit, (Long, Double)]]) {
        case (m, ((k, tomb, v), i)) =>
          m.updated(k, if (tomb) Left(()) else Right((i.toLong, v)))
      }
      .collect { case (k, Right(sv)) => k -> sv }

  private def table(history: List[(Long, Boolean, Double)]): KVTable = {
    import spark.implicits._
    val rows = history.zipWithIndex.map { case ((k, tomb, v), i) =>
      (k, i.toLong, tomb, v)
    }
    KVTable(rows.toDF("key", "seq", "tombstone", "v"), "key", "seq", "tombstone")
  }

  private def collect(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("merged and snapshot == sequential replay, for random histories") {
    val rnd = new scala.util.Random(7)
    (1 to 8).foreach { trial =>
      val history = genHistory(rnd)
      val t = table(history)
      assert(collect(t.merged()) == model(history, None), s"merged, trial $trial")
      val cut = rnd.nextInt(60).toLong
      assert(collect(t.snapshot(cut)) == model(history, Some(cut)),
        s"snapshot($cut), trial $trial")
    }
  }
}
