package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: binary payload + typed metadata schema, and
  * the batched mapPartitions decode path (decode itself is a STUB —
  * the batching/schema contract is what's under test). */
class MultimodalSpec extends SparkSuite {

  private lazy val media = Multimodal.mediaTable(spark, sfDir)

  test("media table schema: binary payload with typed metadata") {
    val f = media.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(f("payload") == "binary")
    assert(f("mime") == "string")
    assert(f("width") == "int" && f("height") == "int")
  }

  test("decode runs in bounded batches and is deterministic") {
    val out = Multimodal.decodeStub(media).cache()
    assert(out.count() == 500)
    // batch shape: every batch the stub saw was ≤ DecodeBatchSize
    val maxBatch = out.agg(max("batch_size")).head().getInt(0)
    assert(maxBatch <= Multimodal.DecodeBatchSize && maxBatch > 1)
    // deterministic features: second run identical
    val a = out.orderBy("doc_id").collect().toSeq
    val b = Multimodal.decodeStub(media).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("resize rewrites metadata and keeps payloads intact") {
    val resized = Multimodal.resizeStub(media, 224, 224)
    assert(resized.filter(col("width") =!= 224 || col("height") =!= 224).count() == 0)
    // payload lineage unchanged
    val a = media.select("doc_id", "payload").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq))
    val b = resized.select("doc_id", "payload").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq))
    assert(a.toSeq == b.toSeq)
  }

  test("frame sampling fans out video rows 1→N and skips images") {
    val frames = Multimodal.frameSampleStub(media).cache()
    val videos = media.filter(col("mime") === "video/mp4")
    // only videos produce frames
    assert(frames.select("doc_id").distinct().count() == videos.count())
    assert(frames.join(media.filter(col("mime") =!= "video/mp4"), "doc_id").count() == 0)
    // fan-out respects n_frames and is 1..4 per video
    val byDoc = frames.groupBy("doc_id").count()
    assert(byDoc.filter(col("count") < 1 || col("count") > 4).count() == 0)
    assert(frames.filter(col("frame_no") >= col("n_frames")).count() == 0)
  }

  test("features reflect payload bytes (n_bytes matches source text length)") {
    val joined = Multimodal.decodeStub(media).as("d")
      .join(graft.sources.Tables.load(spark, sfDir, "documents").as("s"), "doc_id")
      .filter(col("d.n_bytes") =!= length(col("s.text")))
    assert(joined.count() == 0)
  }
}
