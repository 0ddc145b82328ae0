package graft

import org.apache.spark.sql.functions._

import graft.functions.Ppm
import graft.operators.Multimodal

/** Multimodal: real P6/GSEQ codec roundtrips, batched decode path,
  * real resampling, frame fan-out. */
class MultimodalSpec extends SparkSuite {

  private lazy val media = Multimodal.mediaTable(spark, sfDir).cache()

  test("codec roundtrip: encode→decode is identity, container preserves frames") {
    val rnd = new scala.util.Random(3)
    (1 to 50).foreach { _ =>
      val (w, h) = (rnd.nextInt(40) + 1, rnd.nextInt(40) + 1)
      val img = Ppm.Image(w, h, Array.fill(w * h * 3)(rnd.nextInt.toByte))
      val back = Ppm.decode(Ppm.encode(img))
      assert(back.width == w && back.height == h)
      assert(back.pixels.sameElements(img.pixels))
    }
    val frames = (1 to 4).map(i => Array.fill(i * 10)(rnd.nextInt.toByte): Array[Byte])
    val back = Ppm.decodeSeq(Ppm.encodeSeq(frames))
    assert(back.length == 4 && back.zip(frames).forall { case (a, b) => a.sameElements(b) })
  }

  test("media table schema: binary payload with typed metadata") {
    val f = media.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(f("payload") == "binary")
    assert(f("mime") == "string")
    assert(f("width") == "int" && f("height") == "int")
  }

  test("decode runs in bounded batches, parses real headers, is deterministic") {
    val out = Multimodal.decodeMedia(media).cache()
    assert(out.count() == 500)
    // batch shape: every batch the decoder saw was ≤ DecodeBatchSize
    val maxBatch = out.agg(max("batch_size")).head().getInt(0)
    assert(maxBatch <= Multimodal.DecodeBatchSize && maxBatch > 1)
    // dims PARSED from payload bytes must equal the metadata columns
    val mismatched = out.as("d").join(media.as("m"), "doc_id")
      .filter(col("d.parsed_w") =!= col("m.width") ||
        col("d.parsed_h") =!= col("m.height"))
    assert(mismatched.count() == 0, "parsed dims diverge from metadata")
    // real pixel feature in range
    assert(out.filter(col("mean_intensity") < 0 || col("mean_intensity") > 255).count() == 0)
    // deterministic: second run identical
    val a = out.orderBy("doc_id").collect().toSeq
    val b = Multimodal.decodeMedia(media).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("resize really resamples: decoding the output yields the target dims") {
    val resized = Multimodal.resizeMedia(media, 32, 24)
    assert(resized.filter(col("width") =!= 32 || col("height") =!= 24).count() == 0)
    val dims = Multimodal.decodeMedia(resized)
      .select("parsed_w", "parsed_h").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(dims.toSeq == Seq((32, 24)), s"decoded dims ${dims.toSeq}")
    // resampling preserves the palette: every output byte exists in
    // the source payload's pixel section (nearest-neighbor copies)
    val one = media.filter(col("mime") === Multimodal.ImageMime)
      .select("payload").head().getAs[Array[Byte]](0)
    val rs = Ppm.resize(Ppm.decode(one), 32, 24)
    val srcSet = Ppm.decode(one).pixels.toSet
    assert(rs.pixels.forall(srcSet.contains))
  }

  test("frame sampling fans out video rows 1→N with per-frame decode, skips images") {
    val frames = Multimodal.frameSample(media).cache()
    val videos = media.filter(col("mime") === Multimodal.VideoMime)
    assert(frames.select("doc_id").distinct().count() == videos.count())
    assert(frames.join(media.filter(col("mime") =!= Multimodal.VideoMime), "doc_id")
      .count() == 0)
    // synthesized videos carry exactly 3 frames; all are decoded
    assert(frames.groupBy("doc_id").count().filter(col("count") =!= 3).count() == 0)
    assert(frames.filter(col("frame_no") >= col("n_frames")).count() == 0)
    // frames of one video differ (shifted pixel synthesis) but share dims
    val perDoc = frames.groupBy("doc_id")
      .agg(countDistinct("mean_intensity").as("cd"),
        countDistinct("frame_w").as("dw"))
    assert(perDoc.filter(col("dw") =!= 1).count() == 0)
    assert(perDoc.filter(col("cd") === 1).count() < videos.count(),
      "every video's frames identical — shift synthesis broken?")
  }

  test("WAV codec roundtrip is identity; decode rejects mis-framed headers") {
    import graft.functions.Wav
    val a = Wav.Audio(16000, Array[Short](0, 100, -100, 32767, -32768, 7))
    val back = Wav.decode(Wav.encode(a))
    assert(back.sampleRate == a.sampleRate)
    assert(back.samples.toSeq == a.samples.toSeq)
    // corrupting the byte-rate field must fail loudly, not mis-frame
    val bad = Wav.encode(a); bad(28) = (bad(28) ^ 0x01).toByte
    intercept[IllegalArgumentException] { Wav.decode(bad) }
    intercept[IllegalArgumentException] { Wav.decode(Array[Byte](1, 2, 3)) }
  }

  test("audio features parse real WAV bytes and cross-check metadata") {
    val feats = Multimodal.decodeAudio(Multimodal.audioTable(spark, sfDir)).cache()
    val audio = Multimodal.audioTable(spark, sfDir)
    assert(feats.count() == audio.count() && feats.count() > 0)
    // parsed-from-bytes fields must equal the typed metadata columns
    val joined = feats.join(audio, "doc_id")
    assert(joined.filter(col("parsed_rate") =!= col("sample_rate")).isEmpty)
    assert(joined.filter(col("parsed_samples") =!= col("n_samples")).isEmpty)
    // payload framing: 44-byte header + 2 bytes per sample, exactly
    assert(joined.filter(col("n_bytes") =!= col("n_samples") * 2 + 44).isEmpty)
    // features are meaningful: nonzero signal, crossings bounded
    assert(feats.filter(col("rms") <= 0 || col("rms") > 1).isEmpty)
    assert(feats.filter(col("zero_crossings") >= col("parsed_samples")).isEmpty)
    // duration math: samples/rate in micros (integer `div` — Spark's
    // `/` is true division and would compare a double to the long)
    assert(feats.filter(col("duration_us") =!=
      expr("CAST(parsed_samples AS BIGINT) * 1000000 div parsed_rate")).isEmpty)
    feats.unpersist()
  }

  test("perceptual-hash dedup recovers every noise-perturbed image copy") {
    val corpus = Multimodal.imageCorpusNear(spark, sfDir)
    val nImages = corpus.filter(col("doc_id") < 100000).count()
    val pairs = Multimodal.phashPairs(Multimodal.phash(corpus)).cache()
    // every planted (i, i+100000) pair must surface (noise flips are
    // invisible to the 8×8 block average)
    val planted = pairs.filter(col("id_b") === col("id_a") + 100000).count()
    assert(planted == nImages, s"recovered $planted of $nImages planted image pairs")
    // every reported pair is genuinely close — recompute the hamming
    // distance INDEPENDENTLY from the hashes (re-asserting the op's
    // own filter column would be tautological)
    val hashes = Multimodal.phash(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.collect().foreach { r =>
      val h = java.lang.Long.bitCount(hashes(r.getLong(0)) ^ hashes(r.getLong(1)))
      assert(h == r.getInt(2) && h <= 6,
        s"pair (${r.getLong(0)},${r.getLong(1)}): recomputed hamming $h vs reported ${r.getInt(2)}")
    }
    // the planted matches are near-exact, not borderline
    assert(pairs.filter(col("id_b") === col("id_a") + 100000)
      .agg(max("hamming")).head().getInt(0) <= 2)
  }

  test("scene detection: the planted scene boundary trips, intra-scene steps don't") {
    import spark.implicits._
    // two-scene video: frames 0-1 solid dark (identical), frames 2-3
    // solid bright (identical) — the only cut is the 1→2 transition
    val (w, h) = (16, 12)
    def solid(v: Int) = Ppm.encode(Ppm.Image(w, h, Array.fill(w * h * 3)(v.toByte)))
    val video = Ppm.encodeSeq(Seq(solid(10), solid(10), solid(200), solid(200)))
    val df = Seq(Multimodal.MediaRow(1L, Multimodal.VideoMime, w, h, video)).toDF()
    val steps = Multimodal.sceneDetect(df, threshold = 60.0)
      .orderBy("frame_no").collect()
    assert(steps.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    assert(steps.map(_.getBoolean(4)).toSeq == Seq(false, true, false))
    // the cut's MAD is exactly the solid-color delta; intra-scene is 0
    assert(steps(1).getDouble(3) == 190.0 && steps(0).getDouble(3) == 0.0)
  }

  test("VAD pins the planted silence/tone layout exactly") {
    import spark.implicits._
    import graft.functions.Wav
    // 10 frames at 8 kHz (160 samples each): silence ×3, tone ×3,
    // silence ×1, tone ×3 → 10 frames, 6 voiced, 2 segments
    val flen = 160
    val pattern = Seq(0, 0, 0, 1, 1, 1, 0, 1, 1, 1)
    val samples = pattern.flatMap(on =>
      Array.fill(flen)(if (on == 1) 1000.toShort else 0.toShort)).toArray
    val payload = Wav.encode(Wav.Audio(8000, samples))
    val df = Seq(Multimodal.AudioRow(1L, Multimodal.AudioMime, 8000,
      samples.length, payload)).toDF()
    val r = Multimodal.vad(df, threshold = 50.0).collect().head
    assert(r.getInt(1) == 10, "frame count")
    assert(r.getInt(2) == 6, "voiced frames")
    assert(r.getInt(3) == 2, "segments")
    assert(math.abs(r.getDouble(4) - 0.6) < 1e-12, "voiced ratio")
  }

  test("VAD over the muted corpus: real gaps detected, never degenerate") {
    val rows = Multimodal.vad(Multimodal.vadCorpus(spark, sfDir), 50.0)
      .collect()
    val n = graft.sources.Tables.load(spark, sfDir, "documents").count()
    assert(rows.length.toLong == n)
    rows.foreach { r =>
      val (frames, voiced, segs) =
        (r.getInt(1), r.getInt(2), r.getInt(3))
      assert(frames > 0 && voiced <= frames)
      assert(segs <= voiced && (segs > 0) == (voiced > 0))
      // the mute pattern silences every 3rd frame, so any clip with
      // ≥3 frames must have at least one unvoiced frame
      if (frames >= 3) assert(voiced < frames, s"doc ${r.getLong(0)}: no gap")
    }
    // and the corpus genuinely exercises multi-segment clips
    assert(rows.exists(_.getInt(3) >= 2), "no clip has 2+ voiced segments")
  }

  test("pipeline manifest equals the standalone stages, modality by modality") {
    val m = Multimodal.pipelineMm.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m.keySet == Set("audio", "image", "video"))
    val media = Multimodal.mediaTable(spark, sfDir)
    val img = media.filter(col("mime") === Multimodal.ImageMime)
    assert(m("image")._1 == img.count())
    assert(m("image")._2 ==
      Multimodal.phashPairs(Multimodal.phash(img)).count())
    assert(m("video")._1 ==
      media.filter(col("mime") === Multimodal.VideoMime).count())
    assert(m("video")._2 ==
      Multimodal.sceneDetect(media, 60.0).filter(col("is_cut")).count())
    val vadRows = Multimodal.vad(Multimodal.vadCorpus(spark, sfDir), 50.0)
    assert(m("audio")._1 == vadRows.count())
    assert(m("audio")._2 ==
      vadRows.agg(sum("n_segments")).head().getLong(0))
    // every modality processed real rows
    m.values.foreach { case (docs, _) => assert(docs > 0) }
  }

  test("scene detection over the corpus: every transition scored, no dims mixups") {
    val steps = graft.SparkEntry.queries("mm_scene_detect")(spark, sfDir).collect()
    assert(steps.nonEmpty)
    // synthetic videos are 3 frames → exactly 2 transitions each
    steps.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      assert(rs.length == 2 && rs.forall(_.getInt(2) == 3), s"video $id")
    }
    steps.foreach(r => assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 255))
  }

  test("format sniff: clean payloads sniff to their real container, corrupted magic quarantines") {
    val rows = Multimodal.mmFormatSniff.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, mime, sniffed, agree) =>
      if (id % 97 == 0) {
        assert(sniffed == "unknown" && !agree, s"doc $id: corrupted magic not caught")
      } else {
        assert(sniffed == mime && agree, s"doc $id: clean payload mis-sniffed")
      }
    }
    // the fixture must exercise both containers and the quarantine path
    assert(rows.exists(_._2 == Multimodal.ImageMime))
    assert(rows.exists(_._2 == Multimodal.VideoMime))
    assert(rows.exists(!_._4), "no corrupted payload in fixture")
  }

  test("keyframes: one frame per scene, boundaries from cuts, features match the frame sample") {
    import spark.implicits._
    // planted two-scene video: frames 0-1 near-identical (one scene),
    // frame 2 totally different content — the keyframe set must be
    // exactly {frame 0, frame 2}
    val w = 8; val h = 8
    def solid(v: Int) = Ppm.encode(Ppm.Image(w, h, Array.fill(w * h * 3)(v.toByte)))
    val planted = Seq(Multimodal.MediaRow(1L, Multimodal.VideoMime, w, h,
      Ppm.encodeSeq(Seq(solid(10), solid(12), solid(200))))).toDF()
    val got = Multimodal.keyframes(planted, threshold = 30.0).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).sortBy(_._1)
    assert(got.toSeq == Seq((0, 0, 2), (1, 2, 2)),
      s"planted two-scene video selected ${got.toSeq}")
    // a single-frame video has no transitions and exactly one keyframe
    val single = Seq(Multimodal.MediaRow(2L, Multimodal.VideoMime, w, h,
      Ppm.encodeSeq(Seq(solid(42))))).toDF()
    val one = Multimodal.keyframes(single, threshold = 30.0).collect()
    assert(one.length == 1 && one.head.getInt(2) == 0 && one.head.getInt(3) == 1)

    // corpus: scene count per video = tripped transitions + 1, and
    // every keyframe's intensity equals the frame sample's value for
    // that exact frame
    val kf = Multimodal.mmVideoKeyframe.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
    assert(kf.nonEmpty)
    val cuts = Multimodal.sceneDetect(media, threshold = 30.0).collect()
      .map(r => (r.getLong(0), r.getBoolean(4))).groupBy(_._1)
      .view.mapValues(_.count(_._2)).toMap
    kf.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.length == cuts(id) + 1, s"video $id scene count")
      assert(rows.forall(_._4 == rows.length))
      assert(rows.map(_._2).sorted.toSeq == (0 until rows.length).toSeq,
        s"video $id scene numbering")
      assert(rows.exists(_._3 == 0), s"video $id must keep frame 0")
    }
    val sampled = Multimodal.frameSample(media).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(5))).toMap
    kf.foreach { case (id, _, fno, _, mi) =>
      assert(mi == sampled((id, fno)), s"video $id frame $fno intensity")
    }
  }

  test("integrity audit: measured statuses match the plants, and flag exactly what decode rejects") {
    val rows = Multimodal.mmIntegrity.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, _, expected, actual, status) =>
      val want = if (id % 89 == 0) "truncated"
                 else if (id % 93 == 0) "padded" else "ok"
      assert(status == want, s"doc $id: status $status, want $want")
      assert(actual - expected == (want match {
        case "truncated" => -10L; case "padded" => 7L; case _ => 0L
      }), s"doc $id: delta ${actual - expected}")
    }
    assert(rows.exists(_._5 == "truncated") && rows.exists(_._5 == "ok"),
      "fixture must plant at least one truncation")
    // the audit flags exactly the payloads the real codec rejects:
    // an untouched payload decodes; the truncated one fails loudly
    val byId = media.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getAs[Array[Byte]]("payload"))).toMap
    val truncId = rows.find(_._5 == "truncated").get._1
    val (tMime, tPayload) = byId(truncId)
    val torn = tPayload.dropRight(10)
    intercept[Exception] {
      if (tMime == Multimodal.VideoMime) Ppm.decodeSeq(torn).foreach(Ppm.decode)
      else Ppm.decode(torn)
    }
    val okId = rows.find(_._5 == "ok").get._1
    val (oMime, oPayload) = byId(okId)
    if (oMime == Multimodal.VideoMime) Ppm.decodeSeq(oPayload).foreach(Ppm.decode)
    else Ppm.decode(oPayload)
  }

  test("color histogram: bins partition every pixel; counts match a direct payload recompute") {
    val got = Multimodal.mmColorHist.run(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
    // per-doc totals must equal 3 * w * h (every pixel binned once)
    val dims = media.select("doc_id", "width", "height").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    got.groupBy(_._1._1).foreach { case (docId, cells) =>
      val (w, h) = dims(docId)
      assert(cells.map(_._2).sum == 3L * w * h, s"doc $docId: pixels lost or doubled")
    }
    // direct recompute from the raw payload bytes for a sample of docs
    // (images AND the frame-0-of-video path)
    val sample = media.filter(col("doc_id") < 20)
      .select("doc_id", "mime", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))
    assert(sample.exists(_._2 == Multimodal.VideoMime))
    sample.foreach { case (docId, mime, payload) =>
      val img = Ppm.decode(
        if (mime == Multimodal.VideoMime) Ppm.decodeSeq(payload).head else payload)
      val want = img.pixels.zipWithIndex
        .groupBy { case (b, p) => (p % 3, (b & 0xFF) / 64) }
        .view.mapValues(_.length.toLong).toMap
      want.foreach { case ((c, bin), n) =>
        assert(got.toMap.get((docId, c.toLong, bin.toLong)).contains(n),
          s"doc $docId cell ($c,$bin)")
      }
    }
  }

  test("shard manifest equals a sequential pack replay; shards are contiguous and boundary-aligned") {
    val T = Multimodal.ShardTargetBytes
    val got = Multimodal.mmShardManifest.run(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
    // sequential replay from the real payload lengths
    val blobs = Multimodal.mediaTable(spark, sfDir)
      .select(col("doc_id"), col("mime"), length(col("payload")).cast("long").as("b"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = blobs.groupBy(r => (r._2, r._1 / 100)).toSeq.flatMap { case ((mime, bucket), xs) =>
      var cum = 0L
      xs.sortBy(_._1).map { case (docId, _, b) =>
        val shard = cum / T; cum += b; (mime, bucket, shard, docId, b)
      }.groupBy(_._3).map { case (shard, ys) =>
        ((mime, bucket, shard),
          (ys.length.toLong, ys.map(_._5).sum, ys.map(_._4).min, ys.map(_._4).max))
      }
    }.toMap
    assert(got.toMap == want, "manifest differs from the sequential pack replay")
    // shards within a (mime, bucket) are contiguous from 0, their doc
    // ranges are disjoint and ordered, and each shard starts in its
    // own byte window [shard*T, (shard+1)*T)
    got.groupBy(k => (k._1._1, k._1._2)).foreach { case ((mime, bucket), ss) =>
      val ordered = ss.sortBy(_._1._3)
      assert(ordered.map(_._1._3).toSeq == (0L until ordered.length).toSeq,
        s"($mime,$bucket): shard ids not contiguous")
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._2._4 < b._2._3, s"($mime,$bucket): overlapping doc ranges")
        case _ =>
      }
      var before = 0L
      ordered.foreach { case ((_, _, shard), (_, bytes, _, _)) =>
        assert(before >= shard * T && before < (shard + 1) * T,
          s"($mime,$bucket,$shard): starts at byte $before outside its window")
        before += bytes
      }
    }
    // the fixture must genuinely pack: some shard holds >1 blob and
    // some (mime, bucket) spans >1 shard
    assert(got.exists(_._2._1 > 1) && got.groupBy(k => (k._1._1, k._1._2)).exists(_._2.length > 1))
  }

  test("patchify: patch means match an independent byte-synthesis recompute; grid and ids tile exactly") {
    val media = Multimodal.mediaTable(spark, sfDir).filter(col("doc_id") % 7 === 1)
    val got = Multimodal.patchify(media, 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
      .groupBy(_._1)
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .filter(col("doc_id") % 7 === 1 && col("doc_id") % 5 =!= 0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(docs.nonEmpty)
    var sawPatches = false
    docs.foreach { case (id, text, nChars) =>
      val (w, h) = ((nChars % 64 + 1).toInt, (nChars % 48 + 1).toInt)
      val (nr, nc) = (h / 8, w / 8)
      val bytes = text.codePoints().toArray.map(_ & 0xFF)
      val want = (for (pr <- 0 until nr; pc <- 0 until nc) yield {
        val sum = (for (dy <- 0 until 8; dx <- 0 until 8; ch <- 0 until 3)
          yield bytes((((pr * 8 + dy) * w + pc * 8 + dx) * 3 + ch) % bytes.length).toLong).sum
        (pr * nc + pc, pr, pc, math.rint(sum.toDouble / 192 * 10000) / 10000)
      }).toSeq
      val g = got.getOrElse(id, Array.empty).toSeq
        .sortBy(_._2).map(t => (t._2, t._3, t._4, t._5))
      assert(g == want, s"doc $id patches")
      if (nr * nc > 0) {
        sawPatches = true
        assert(g.map(_._1) == (0 until nr * nc), s"doc $id ids tile the grid")
      }
    }
    assert(sawPatches, "corpus produced at least one patch grid")
    // videos in the slice are excluded by construction
    assert(!got.keySet.exists(_ % 5 == 0))
  }

  test("interleave: chunk accounting equals a sequential pack replay; modalities tile every chunk") {
    val got = Multimodal.mmInterleave.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 7 === 1 && col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    var off = 0L
    val want = docs.map { case (_, text, nChars) =>
      val t = "\\S+".r.findAllIn(text).length.toLong
      val p = ((nChars % 48 + 1) / 8) * ((nChars % 64 + 1) / 8)
      val row = (off / 512, t, p, t + 1 + p)
      off += t + 1 + p
      row
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (c, xs) =>
      (c, xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).sum, xs.map(_._4).sum)
    }
    assert(got.toSeq == want, "sequential pack replay diverges")
    got.foreach { case (_, nd, t, p, tot) =>
      assert(t + nd + p == tot, "separator accounting broken")
    }
    assert(got.map(_._4).sum > 0, "no patch tokens interleaved")
  }
}
