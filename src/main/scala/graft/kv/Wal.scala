package graft.kv

import java.nio.ByteBuffer
import java.util.zip.CRC32

/** Record-framed WAL codec — the BYTE format face of the reference's
  * write-ahead log (`/root/reference/src/storage_engine/src/wal/
  * wal_record_format.rs` frames every record as a checksummed header +
  * payload inside fixed blocks; `wal_record_reader.rs` replays until
  * the first record that fails its checksum or runs off the end,
  * treating everything after as a torn crash tail).
  *
  * graft's durable ingest normally replaces the WAL with
  * commit-by-rename parquet runs ([[KVLog]]) — but the record format
  * itself is a real surface a storage engine exposes (external WAL
  * shipping, CDC tails, cross-engine recovery), so it is implemented
  * here as a genuine binary codec: each record is
  * `crc32(4B BE) | len(2B BE) | type(1B) | payload(len B)` with the
  * CRC computed over `type|payload` (the LevelDB/RocksDB rule — the
  * length field is NOT covered, so a corrupt length is caught by the
  * payload CRC it mis-frames). Payload = `key(8B) | seq(8B) |
  * tombstone(1B) | value(8B IEEE-754 bits)` — fixed 25 bytes.
  *
  * Replay semantics (exactly the reference's): parse records
  * front-to-back; the FIRST record that is incomplete, mis-typed,
  * mis-sized or checksum-mismatched ends the segment — it and
  * everything after it are discarded as the torn tail. A segment that
  * ends exactly at a record boundary is `clean`.
  */
object Wal {

  /** One WAL record (KV write: upsert or tombstone). */
  final case class Record(key: Long, seq: Long, tombstone: Boolean, v: Double)

  val FullType: Byte = 1
  val PayloadBytes = 25
  val RecordBytes: Int = 4 + 2 + 1 + PayloadBytes // crc + len + type + payload

  /** Serialize records into one segment blob. */
  def encode(records: Seq[Record]): Array[Byte] = {
    val buf = ByteBuffer.allocate(records.length * RecordBytes)
    records.foreach { r =>
      val body = ByteBuffer.allocate(1 + PayloadBytes)
      body.put(FullType)
      body.putLong(r.key).putLong(r.seq)
      body.put(if (r.tombstone) 1.toByte else 0.toByte)
      body.putLong(java.lang.Double.doubleToLongBits(r.v))
      val bytes = body.array()
      val crc = new CRC32(); crc.update(bytes)
      buf.putInt(crc.getValue.toInt)
      buf.putShort(PayloadBytes.toShort)
      buf.put(bytes)
    }
    buf.array()
  }

  /** Replay result: the records before the first damage, and whether
    * the segment ended exactly at a record boundary. */
  final case class Replay(records: Vector[Record], clean: Boolean)

  /** Parse a segment front-to-back, stopping at the first torn or
    * corrupt record (crash-tail semantics — never throws). */
  def decode(blob: Array[Byte]): Replay = {
    val buf = ByteBuffer.wrap(blob)
    val out = Vector.newBuilder[Record]
    var done = false
    var clean = false
    while (!done) {
      if (buf.remaining() == 0) { done = true; clean = true }
      else if (buf.remaining() < RecordBytes) done = true
      else {
        val crc = buf.getInt
        val len = buf.getShort & 0xFFFF
        val typ = buf.get
        if (typ != FullType || len != PayloadBytes) done = true
        else {
          val body = new Array[Byte](1 + len)
          body(0) = typ
          buf.get(body, 1, len)
          val c = new CRC32(); c.update(body)
          if (c.getValue.toInt != crc) done = true
          else {
            val p = ByteBuffer.wrap(body, 1, len)
            out += Record(p.getLong, p.getLong, p.get != 0,
              java.lang.Double.longBitsToDouble(p.getLong))
          }
        }
      }
    }
    Replay(out.result(), clean)
  }
}
