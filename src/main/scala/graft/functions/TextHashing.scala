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

  /** One-pass token counts — `[ws_tokens, re_tokens]`:
    *
    *  - `ws_tokens` = `size(split(text, "\\s+"))` under Spark's
    *    default limit −1 (pieces between maximal whitespace runs,
    *    leading AND trailing empties kept) = |whitespace runs| + 1;
    *  - `re_tokens` = matches of `[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]`
    *    = letter runs + digit runs + each other non-whitespace
    *    codepoint (one match per CODE POINT, hence the codePointAt
    *    stepping — a char loop would double-count non-BMP symbols).
    *
    * Replaces two Java-regex passes (Pattern machinery + a match
    * object per token) with one classify-and-count loop — the regex
    * was the whole single-task scan cost of text_tokens (r9 profile:
    * 0.33 s for 5k docs). Whitespace is Java regex `\s` =
    * `[ \t\n\x0B\f\r]`, matching the split/extract semantics the
    * DuckDB oracle already replays. */
  def tokenCounts(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    var i = 0
    var wsRuns = 0L
    var re = 0L
    var prev = 0 // 0 start, 1 ws, 2 letter, 3 digit, 4 other
    while (i < n) {
      val cp = s.codePointAt(i)
      val cls =
        if (cp == ' ' || (cp >= '\t' && cp <= '\r')) 1
        else if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) 2
        else if (cp >= '0' && cp <= '9') 3
        else 4
      if (cls == 1) { if (prev != 1) wsRuns += 1 }
      else if (cls == 4) re += 1
      else if (cls != prev) re += 1
      prev = cls
      i += Character.charCount(cp)
    }
    new GenericArrayData(Array(wsRuns + 1, re))
  }

  /** One-pass quality counts — `[n_char, n_word, n_stop, n_alpha]`:
    * code-point length; single-space-split piece count (every `' '`
    * starts a new piece, leading/trailing empties kept — DuckDB
    * `string_split(text, ' ')` = Spark `split(text, " ")` semantics);
    * pieces equal to one of the seven stopwords the/a/of/and/to/in/is;
    * `[a-z]` code points. Replaces a split allocation + an INTERPRETED
    * array_filter lambda + a regexp_replace per row (text_quality's
    * whole single-task scan cost). */
  def qualityCounts(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    def isStop(st: Int, en: Int): Boolean = (en - st) match {
      case 1 => s.charAt(st) == 'a'
      case 2 =>
        val c0 = s.charAt(st); val c1 = s.charAt(st + 1)
        (c0 == 'o' && c1 == 'f') || (c0 == 't' && c1 == 'o') ||
          (c0 == 'i' && (c1 == 'n' || c1 == 's'))
      case 3 =>
        val c0 = s.charAt(st); val c1 = s.charAt(st + 1); val c2 = s.charAt(st + 2)
        (c0 == 't' && c1 == 'h' && c2 == 'e') ||
          (c0 == 'a' && c1 == 'n' && c2 == 'd')
      case _ => false
    }
    var i = 0
    var nChar = 0L; var nWord = 1L; var nStop = 0L; var nAlpha = 0L
    var tokStart = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      nChar += 1
      if (cp == ' ') {
        if (isStop(tokStart, i)) nStop += 1
        nWord += 1
        tokStart = i + 1
      } else if (cp >= 'a' && cp <= 'z') nAlpha += 1
      i += Character.charCount(cp)
    }
    if (isStop(tokStart, n)) nStop += 1
    new GenericArrayData(Array(nChar, nWord, nStop, nAlpha))
  }
}
