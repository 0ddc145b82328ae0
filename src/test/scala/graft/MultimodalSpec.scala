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

  test("features reflect payload bytes (n_bytes matches source text length)") {
    val joined = Multimodal.decodeStub(media).as("d")
      .join(graft.sources.Tables.load(spark, sfDir, "documents").as("s"), "doc_id")
      .filter(col("d.n_bytes") =!= length(col("s.text")))
    assert(joined.count() == 0)
  }
}
