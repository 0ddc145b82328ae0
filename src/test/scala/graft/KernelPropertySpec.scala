package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TextHashing, VectorKernels}

/** Pure-JVM property tests of the codegen'd kernels — the invariants
  * the LSH algorithms rely on, checked directly (the dedup/ANN ops
  * built on these are rows-only at the driver gate, so a kernel
  * regression would otherwise only show up as silently-worse recall).
  */
class KernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(7)

  test("simhashChunks: 56 keys, distinct positions, chunks reconstruct the hash") {
    (1 to 200).foreach { _ =>
      val h = rnd.nextLong()
      val keys = TextHashing.simhashChunks(h).toLongArray()
      assert(keys.length == 56)
      val ids = keys.map(_ >>> 24)
      assert(ids.distinct.length == 56, "chunk-triple ids must be distinct")
      keys.foreach { key =>
        val id = (key >>> 24).toInt
        val (i, j, k) = (id / 64, (id / 8) % 8, id % 8)
        assert(i < j && j < k, s"non-ordered triple in id $id")
        val expect = (((h >>> (i * 8)) & 255L) << 16) |
          (((h >>> (j * 8)) & 255L) << 8) | ((h >>> (k * 8)) & 255L)
        assert((key & 0xFFFFFFL) == expect)
      }
    }
  }

  test("simhashChunks pigeonhole: hamming <= 5 pairs always share a key") {
    (1 to 500).foreach { _ =>
      val a = rnd.nextLong()
      val flips = rnd.nextInt(6) // 0..5 bit flips
      val b = (1 to flips).foldLeft(a)((h, _) => h ^ (1L << rnd.nextInt(64)))
      val ka = TextHashing.simhashChunks(a).toLongArray().toSet
      val kb = TextHashing.simhashChunks(b).toLongArray().toSet
      assert(ka.intersect(kb).nonEmpty,
        s"hamming-${java.lang.Long.bitCount(a ^ b)} pair shares no blocking key")
    }
  }

  private def utf8(s: String) = UTF8String.fromString(s)

  test("minhashBands: deterministic, 16 bands, equal texts collide, disjoint texts don't") {
    val t1 = utf8("the quick brown fox jumps over the lazy dog again and again")
    val b1 = TextHashing.minhashBands(t1, 64, 16).toLongArray()
    val b2 = TextHashing.minhashBands(utf8(t1.toString), 64, 16).toLongArray()
    assert(b1.length == 16 && b1.sameElements(b2))
    // fully disjoint shingle sets: sharing any band would be a ~2^-64 fluke
    val b3 = TextHashing.minhashBands(
      utf8("alpha beta gamma delta epsilon zeta eta theta iota kappa"), 64, 16)
      .toLongArray()
    assert(b1.intersect(b3).isEmpty)
  }

  test("minhashBands: near-identical texts share most bands (LSH premise)") {
    val words = (1 to 60).map(i => s"w${rnd.nextInt(40)}$i")
    val a = utf8(words.mkString(" "))
    val b = utf8(words.drop(1).mkString(" ")) // first word dropped — J ≈ 0.97
    val shared = TextHashing.minhashBands(a, 64, 16).toLongArray()
      .intersect(TextHashing.minhashBands(b, 64, 16).toLongArray()).length
    assert(shared >= 8, s"near-dup pair shares only $shared/16 bands")
  }

  private def arr(xs: Array[Double]) = new GenericArrayData(xs)

  test("cosine kernel: self-similarity 1, symmetry, scale invariance") {
    (1 to 100).foreach { _ =>
      val v = Array.fill(64)(rnd.nextGaussian())
      val w = Array.fill(64)(rnd.nextGaussian())
      assert(math.abs(VectorKernels.cosine(arr(v), arr(v)) - 1.0) < 1e-12)
      assert(VectorKernels.cosine(arr(v), arr(w)) ==
        VectorKernels.cosine(arr(w), arr(v)))
      val scaled = v.map(_ * 3.5)
      assert(math.abs(VectorKernels.cosine(arr(v), arr(w)) -
        VectorKernels.cosine(arr(scaled), arr(w))) < 1e-12)
    }
  }

  test("hyperplaneBands: deterministic, positive-scale invariant, negation flips all bits") {
    (1 to 100).foreach { _ =>
      val v = Array.fill(64)(rnd.nextGaussian())
      val s1 = VectorKernels.hyperplaneBands(arr(v), 4).toLongArray()
      assert(s1.sameElements(VectorKernels.hyperplaneBands(arr(v.clone()), 4).toLongArray()))
      assert(s1.forall(b => b >= 0 && b < 16), "4-bit packed patterns")
      // cosine is scale-invariant, so the signature must be too
      val s2 = VectorKernels.hyperplaneBands(arr(v.map(_ * 0.25)), 4).toLongArray()
      assert(s1.sameElements(s2))
      // -v sits at cosine -1: every plane side flips (dot=0 measure-zero)
      val s3 = VectorKernels.hyperplaneBands(arr(v.map(-_)), 4).toLongArray()
      s1.zip(s3).foreach { case (a, b) => assert((a ^ b) == 15L) }
    }
  }

  // --- one-pass counting kernels vs the regex/HOF forms they replaced ---

  private val alphabet =
    "ab z9 1.the and of to in is  \t\n\f\r!#其🙂xyzA B7,,"

  private def randomText(): String = {
    val n = rnd.nextInt(60)
    (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
  }

  test("tokenCounts == size(split \\s+) and size(regexp_extract_all) on arbitrary text") {
    val re = java.util.regex.Pattern.compile("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")
    (1 to 2000).foreach { _ =>
      val t = randomText()
      val got = TextHashing.tokenCounts(utf8(t)).toLongArray()
      val ws = t.split("\\s+", -1).length.toLong // Spark split default limit -1
      val m = re.matcher(t)
      var n = 0L
      while (m.find()) n += 1
      assert(got(0) == ws, s"ws_tokens mismatch on [$t]")
      assert(got(1) == n, s"re_tokens mismatch on [$t]")
    }
  }

  test("qualityCounts == codepoint length / single-space split / stopword filter / [a-z] count") {
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    (1 to 2000).foreach { _ =>
      val t = randomText()
      val got = TextHashing.qualityCounts(utf8(t)).toLongArray()
      val toks = t.split(" ", -1)
      assert(got(0) == t.codePointCount(0, t.length).toLong, s"n_char on [$t]")
      assert(got(1) == toks.length.toLong, s"n_word on [$t]")
      assert(got(2) == toks.count(stop).toLong, s"n_stop on [$t]")
      assert(got(3) == t.codePoints().filter(c => c >= 'a' && c <= 'z').count(),
        s"n_alpha on [$t]")
    }
  }
}
