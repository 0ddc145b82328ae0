package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernels behind the custom Catalyst expressions in
  * [[TextExpressions]] — static methods so generated code can call
  * them directly (the same pattern Spark's own expressions use).
  *
  * Replaces the interpreted higher-order-function formulation of the
  * MinHash/SimHash signatures, which evaluated one lambda per
  * shingle×seed (~60×64 interpreted expression trees per row) and
  * dominated the benchmark. One pass here: hash each shingle once,
  * derive the k seeded minhash functions by double hashing
  * g_i = a + i·b. Every hash is SQL-replayable integer arithmetic
  * (poly-31 + fmix64) so the DuckDB oracles can recompute full
  * signatures — see dedup_simhash / dedup_minhash_lsh.
  */
object TextHashing {

  private val Seed = 42L
  private val Mix = 0x9E3779B97F4A7C15L // golden-ratio odd constant
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Position salt for the band fold — any odd 64-bit constant. */
  val BandSalt = 0xD1B54A32D192ED03L

  /** murmur3's fmix64 avalanche — the shared finisher of every
    * SQL-replayable hash here (each step is plain mod-2^64 integer
    * arithmetic a DuckDB oracle replays with HUGEINT masking). */
  @inline def mix64(h0: Long): Long = {
    var h = h0
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL
    h ^= (h >>> 33); h *= 0xC4CEB9FE1A85EC53L
    h ^ (h >>> 33)
  }

  /** 3-token shingle hashes (whole-text hash if < 3 tokens): the
    * shingle STRING is hashed directly with [[simTokenHash]] — the
    * same poly-31/fmix64 chain the dedup_simhash oracle replays, so
    * MinHash signatures are SQL-replayable end to end (round 7; the
    * previous xxh64 token-hash chain had no SQL analog). */
  def shingleHashes(text: UTF8String): Array[Long] = {
    val toks = Ws.split(text.toString)
    if (toks.length < 3) return Array(simTokenHash(text.toString))
    val out = new Array[Long](toks.length - 2)
    var i = 0
    while (i < out.length) {
      out(i) = simTokenHash(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    out
  }

  /** MinHash-LSH band hashes: k seeded minhashes over the shingle
    * set (double hashing g_i = a + i·b, b = mix64(a)|1 odd), folded
    * into `bands` band hashes of k/bands rows each; output index =
    * band id. The fold is an ORDER-FREE sum of position-salted mixes
    * — `mix64(Σ_i mix64(min_i + (i+1)·BandSalt))` — deliberately:
    * exact mod-2^64 addition is commutative, so the DuckDB oracle
    * reproduces it with a plain SUM + the staged-mix pipeline instead
    * of an order-pinned fold chain. */
  def minhashBands(text: UTF8String, numHashes: Int, bands: Int): ArrayData = {
    val sh = shingleHashes(text)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var s = 0
    while (s < sh.length) {
      val a = sh(s)
      val b = mix64(a) | 1L // odd → all k functions distinct
      var i = 0
      var g = a
      while (i < numHashes) {
        if (g < mins(i)) mins(i) = g
        g += b
        i += 1
      }
      s += 1
    }
    val r = numHashes / bands
    val out = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var acc = 0L
      var i = j * r
      while (i < (j + 1) * r) {
        acc += mix64(mins(i) + (i + 1) * BandSalt)
        i += 1
      }
      out(j) = mix64(acc)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** The 56 C(8,3) chunk-triple blocking keys of a 64-bit SimHash,
    * each pre-packed as `chunk_id << 24 | chunk_i << 16 | chunk_j << 8
    * | chunk_k` — a single long join key per (i<j<k) triple (the
    * chunk_id in the high bits enforces same-position matching that
    * the previous two-column join expressed). One flat loop replaces
    * a nested interpreted transform×transform×transform expression
    * tree that built 56 structs per row. */
  def simhashChunks(sim: Long): ArrayData = {
    val out = new Array[Long](56)
    var n = 0
    var i = 0
    while (i < 6) {
      var j = i + 1
      while (j < 7) {
        var k = j + 1
        while (k < 8) {
          out(n) = ((i * 64 + j * 8 + k).toLong << 24) |
            (((sim >>> (i * 8)) & 255L) << 16) |
            (((sim >>> (j * 8)) & 255L) << 8) |
            ((sim >>> (k * 8)) & 255L)
          n += 1
          k += 1
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-token hash for SimHash: polynomial-31 over Unicode CODE
    * POINTS mod 2^64, finished with murmur3's fmix64 avalanche.
    * Chosen over xxh64 because every step is plain 64-bit integer
    * arithmetic a SQL engine can replay exactly — the dedup_simhash
    * and dedup_minhash_lsh DuckDB oracles recompute this hash with
    * HUGEINT masking, making both near-dup pipelines value-checkable
    * end to end instead of rows-only. Empty tokens are skipped (DuckDB's split keeps
    * trailing empties where Java drops them; skipping makes both
    * engines agree on any input). */
  def simTokenHash(tok: String): Long = {
    var h = 0L
    var i = 0
    while (i < tok.length) {
      val cp = tok.codePointAt(i)
      h = h * 31L + cp // wraps mod 2^64 — same bits as the SQL replay
      i += Character.charCount(cp)
    }
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL
    h ^= (h >>> 33); h *= 0xC4CEB9FE1A85EC53L
    h ^ (h >>> 33)
  }

  /** 64-bit order-sensitive document fingerprint: whitespace-
    * normalized tokens, each hashed with [[simTokenHash]] and salted
    * by its 1-based position, combined with exact mod-2^64 addition
    * (commutative — the DuckDB oracle reproduces it with SUM) and a
    * final avalanche. Order sensitivity comes from the position salt,
    * not fold order, which is what makes the chain SQL-replayable. */
  def fingerprint64(text: UTF8String): Long = {
    val toks = Ws.split(text.toString)
    var acc = 0L
    var q = 0 // 1-based index among NON-empty tokens: immune to the
    var p = 0 // engines' differing trim/empty-token edge behavior
    while (p < toks.length) {
      if (toks(p).nonEmpty) {
        q += 1
        acc += mix64(simTokenHash(toks(p)) + q * BandSalt)
      }
      p += 1
    }
    mix64(acc)
  }

  /** 64-bit SimHash over token hashes: ±1 vote per bit, sign→bit. */
  def simhash64(text: UTF8String): Long = {
    val toks = Ws.split(text.toString)
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      if (toks(t).nonEmpty) {
        val h = simTokenHash(toks(t))
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }
}
