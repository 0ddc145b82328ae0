package graft

import graft.kv.KVTable
import graft.sources.Tables

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

  test("durable log: random append splits + torn interleavings == sequential replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 4).foreach { trial =>
      val history = genHistory(rnd)
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_kvlog_prop_$trial").toString
      val log = graft.kv.KVLog(dir + "/log", "key", "seq", "tombstone")
      // split the history into 1..6 contiguous run batches; after a
      // random prefix of appends, plant a torn mid-write dir (the
      // crash shapes KVLogSpec pins, here under random interleaving)
      val rows = history.zipWithIndex.map { case ((k, tomb, v), i) =>
        (k, i.toLong, tomb, v)
      }
      val cuts = (0 +: List.fill(rnd.nextInt(5))(rnd.nextInt(rows.size)).distinct
        .sorted :+ rows.size).distinct
      val tornAfter = rnd.nextInt(cuts.size - 1)
      cuts.sliding(2).zipWithIndex.foreach { case (List(lo, hi), b) =>
        log.append(rows.slice(lo, hi).toDF("key", "seq", "tombstone", "v"))
        if (b == tornAfter) {
          val torn = new java.io.File(log.path, s".tmp_run_torn_$b")
          assert(torn.mkdirs())
          java.nio.file.Files.write(torn.toPath.resolve("part-00000.parquet"),
            Array[Byte](80, 65, 82, 49, 9, 9))
        }
      }
      assert(collect(log.merged(spark)) == model(history, None),
        s"torn-interleaved log diverged from replay, trial $trial")
    }
  }

  test("WAL codec: roundtrip identity; truncation at EVERY offset keeps exactly the whole records") {
    import graft.kv.Wal
    val rnd = new scala.util.Random(13)
    val recs = Vector.fill(5)(Wal.Record(rnd.nextLong(), rnd.nextLong().abs,
      rnd.nextBoolean(), rnd.nextDouble() * 1000 - 500))
    val blob = Wal.encode(recs)
    assert(blob.length == recs.length * Wal.RecordBytes)
    val full = Wal.decode(blob)
    assert(full.records == recs && full.clean)
    // crash-tail contract: cutting the blob at ANY byte offset yields
    // exactly the preceding whole records, clean iff on a boundary
    (0 to blob.length).foreach { cut =>
      val r = Wal.decode(blob.take(cut))
      assert(r.records == recs.take(cut / Wal.RecordBytes),
        s"cut at $cut: got ${r.records.size} records")
      assert(r.clean == (cut % Wal.RecordBytes == 0), s"cut at $cut: clean=${r.clean}")
    }
  }

  test("WAL codec: a flipped byte anywhere in record i ends replay before i") {
    import graft.kv.Wal
    val rnd = new scala.util.Random(17)
    val recs = Vector.fill(4)(Wal.Record(rnd.nextLong(), rnd.nextLong().abs,
      rnd.nextBoolean(), rnd.nextDouble()))
    val blob = Wal.encode(recs)
    (0 until blob.length).foreach { pos =>
      val dam = blob.clone()
      dam(pos) = (dam(pos) ^ 0x41).toByte
      val r = Wal.decode(dam)
      val hit = pos / Wal.RecordBytes
      assert(r.records.size <= hit, s"flip at $pos: record $hit survived")
      assert(r.records == recs.take(r.records.size), s"flip at $pos: prefix mutated")
      assert(!r.clean, s"flip at $pos: reported clean")
    }
  }

  test("WAL replay op equals the closed-form merge over all-but-the-torn write") {
    import org.apache.spark.sql.functions._
    val viaWal = graft.operators.KV.kvWalReplay.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ev = Tables.load(spark, sfDir, "events")
    val maxSeq = ev.agg(max("event_id")).head().getLong(0)
    val direct = KVTable(
      ev.select(col("user_id").as("key"), col("event_id").as("seq"),
        (col("event_type") === "error").as("tombstone"), col("value").as("v"))
        .filter(col("seq") < maxSeq),
      "key", "seq", "tombstone").merged().orderBy("key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(viaWal.toSeq == direct.toSeq)
    assert(viaWal.nonEmpty)
  }

  test("OCC validation == a sequential first-committer-wins simulator, for random write sets") {
    import spark.implicits._
    import graft.operators.KV
    val rnd = new scala.util.Random(13)
    (1 to 6).foreach { trial =>
      // 4 txns, each writing 1-8 keys from a small (u, cf) space so
      // conflicts genuinely occur
      val writes = (1L to 4L).flatMap { txn =>
        List.fill(1 + rnd.nextInt(8))(
          (txn, rnd.nextInt(6).toLong, ("ab" (rnd.nextInt(2))).toString))
      }
      val got = KV.occValidate(spark, writes.toDF("txn", "u", "cf"), Seq(1L, 2L, 3L, 4L))
        .orderBy("txn_id").collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4)))
      // sequential simulator
      var committed = Set.empty[(Long, String)]
      val want = (1L to 4L).map { txn =>
        val keys = writes.filter(_._1 == txn).map(w => (w._2, w._3)).toSet
        val conf = keys.intersect(committed).size.toLong
        if (conf == 0) committed ++= keys
        (txn, conf, conf == 0L)
      }
      assert(got.toSeq == want, s"trial $trial: $writes")
    }
  }

  test("compaction pick == a sequential scorer, for random seq populations") {
    import spark.implicits._
    import graft.operators.KV
    val rnd = new scala.util.Random(29)
    (1 to 6).foreach { trial =>
      // seqs spread over a random range so band/file structure varies
      val maxSeq = 2000L + rnd.nextInt(50000)
      val seqs = (List(maxSeq) ++ List.fill(200)(1L + rnd.nextInt(maxSeq.toInt).toLong)).distinct
      val got = KV.compactionPick(seqs.toDF("seq")).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(4), r.getBoolean(5)))
      def lvl(s: Long) =
        if (s > math.floor(maxSeq * 0.9).toLong) 0
        else if (s > math.floor(maxSeq * 0.6).toLong) 1
        else if (s > math.floor(maxSeq * 0.3).toLong) 2 else 3
      val byL = seqs.groupBy(lvl)
      val want = byL.toSeq.sortBy(_._1).map { case (l, xs) =>
        val size = if (l == 0) xs.map(_ / 1000).distinct.size.toLong else xs.size * 32L
        val budget = Seq(4L, 4096L, 40960L, 409600L)(l)
        (l.toLong, size, size.toDouble / budget)
      }
      val best = want.map(_._3).max
      val pl = want.filter(_._3 == best).map(_._1).min
      assert(got.map(t => (t._1, t._2, t._3)).toSeq == want, s"trial $trial scores")
      assert(got.filter(_._4).map(_._1).toSeq == Seq(pl), s"trial $trial pick")
    }
  }
}
