package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Independent oracles for the as-of family's NEAREST direction —
  * the one as-of op whose DuckDB oracle mirrors the op's own window
  * formulation (DuckDB's native ASOF JOIN is backward-only), so the
  * semantics need checking by machinery the op never touches: a
  * driver-side linear scan over each user's events, plus a hand
  * fixture planting the tie and same-timestamp edge cases. */
class RangeJoinSpec extends SparkSuite {

  test("nearest as-of matches a per-user linear-scan recompute") {
    val got = SparkEntry.queries("q77_asof_nearest")(spark, sfDir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getString(2))))
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val signupsByUser = ev.filter(_._3 == "signup").groupBy(_._2)
    val want = ev.filter(_._3 == "purchase").map { case (pid, uid, _, pts) =>
      val cands = signupsByUser.getOrElse(uid, Array.empty)
      if (cands.isEmpty) (pid, None, None)
      else {
        // nearest by |delta|; tie -> backward; among equal-delta rows
        // on the same side the running last/first picks the one the
        // (ts, side) sort order reaches — same-ts signups are
        // backward at distance 0 and always win
        val back = cands.filter(_._4 <= pts)
          .sortBy(c => (c._4, c._1)).lastOption
        val fwd = cands.filter(_._4 > pts)
          .sortBy(c => (c._4, c._1)).headOption
        (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (pts - b._4 <= f._4 - pts) (pid, Some(b._1), Some("backward"))
            else (pid, Some(f._1), Some("forward"))
          case (Some(b), None) => (pid, Some(b._1), Some("backward"))
          case (None, Some(f)) => (pid, Some(f._1), Some("forward"))
          case _ => (pid, None, None)
        }
      }
    }.sortBy(_._1).toSeq
    assert(got.sortBy(_._1).toSeq == want, "nearest as-of diverges from the linear scan")
    assert(got.nonEmpty)
    assert(got.exists(_._3.contains("forward")),
      "fixture degenerate: no forward match exercised")
    assert(got.exists(_._3.contains("backward")))
  }

  test("nearest as-of fixture: ties go backward, same-ts counts backward at distance 0") {
    import spark.implicits._
    // user 1: purchase at 100 with signup at 90 (back, d=10) and 110
    //   (fwd, d=10) — TIE, must pick backward (id 90)
    // user 2: purchase at 200 with signup AT 200 — same-ts, backward d=0
    //   beats the fwd signup at 201
    // user 3: purchase at 300, only a forward signup at 350
    // user 4: purchase at 400, no signup at all
    val left = Seq((1L, 100L, 1000L), (2L, 200L, 2000L),
      (3L, 300L, 3000L), (4L, 400L, 4000L))
      .toDF("user_id", "ts_us", "event_id")
    val right = Seq((1L, 90L, 90L), (1L, 110L, 110L),
      (2L, 200L, 199L), (2L, 201L, 201L), (3L, 350L, 350L))
      .toDF("user_id", "ts_us", "event_id")
    val got = RangeJoin.asofNearest(left, right, "user_id", "event_id", "event_id")
      .collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getString(4)))).toSet
    assert(got == Set(
      (1000L, Some(90L), Some("backward")),
      (2000L, Some(199L), Some("backward")),
      (3000L, Some(350L), Some("forward")),
      (4000L, None, None)))
  }
}
