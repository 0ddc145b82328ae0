package graft.operators

/** Generators for DuckDB SQL that replays graft's integer hash
  * kernels ([[graft.functions.TextHashing]]) exactly: all arithmetic
  * is mod 2^64, emulated on HUGEINT with explicit masking, and each
  * fmix64 application is emitted as STAGED columns — one step per
  * SELECT layer — because inlining would duplicate subexpressions
  * exponentially with nesting depth. Shared by the dedup_minhash_lsh,
  * dedup_simhash and text_fingerprint oracles. */
object SqlReplay {

  val M64 = "18446744073709551616"
  val MixC1 = "18397679294719823053" // 0xFF51AFD7ED558CCD
  val MixC2 = "14181476777654086739" // 0xC4CEB9FE1A85EC53
  val BandSaltU: String = java.lang.Long.toUnsignedString(
    graft.functions.TextHashing.BandSalt)

  /** (a * c) mod 2^64 for HUGEINT column `a`, constant `c`. */
  def mulmod(a: String, c: String): String =
    s"((($a % 4294967296) * $c + (((($a // 4294967296) * $c) % 4294967296) * 4294967296)) % $M64)"

  /** fmix64 staged over column `in` → column `out`. */
  def mixStages(in: String, out: String): Seq[(String, String)] = Seq(
    s"${out}_a" -> s"xor($in, $in >> 33)",
    s"${out}_b" -> mulmod(s"${out}_a", MixC1),
    s"${out}_c" -> s"xor(${out}_b, ${out}_b >> 33)",
    s"${out}_d" -> mulmod(s"${out}_c", MixC2),
    out -> s"xor(${out}_d, ${out}_d >> 33)")

  /** Stack staged (column, expression) layers over a base query. */
  def stagedSql(base: String, stages: Seq[(String, String)]): String =
    stages.foldLeft(base) { case (inner, (c, e)) =>
      s"SELECT *, $e AS $c FROM ($inner)" }

  /** [[graft.functions.TextHashing.simTokenHash]] of string column
    * `strCol` → column `out` (poly-31 over codepoints + fmix64). */
  def tokenHashStages(strCol: String, out: String): Seq[(String, String)] =
    (s"${out}_p" -> ("list_reduce([0::HUGEINT] || " +
      s"list_transform(string_split($strCol, ''), c -> unicode(c)::HUGEINT), " +
      s"(x, y) -> (x * 31 + y) % $M64)")) +: mixStages(s"${out}_p", out)

  /** Unsigned HUGEINT column → signed BIGINT (Java long bits). */
  def toSignedBigint(col: String): String =
    s"CAST(CASE WHEN $col >= 9223372036854775808 THEN $col - $M64 ELSE $col END AS BIGINT)"

  // xxh64 primes (Spark's XXH64.hashLong — the count-min hash chain)
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5plus8 = "2870177450012600269" // PRIME64_5 + 8

  /** rotl(x, r): the shifted-out high bits land in the zeroed low
    * bits, so plain + suffices (operands are disjoint bit ranges). */
  private def rotl(x: String, r: Int, out: String): (String, String) =
    out -> s"((($x << $r) % $M64) + ($x >> ${64 - r}))"

  /** Spark `XXH64.hashLong(v, seed)` staged over HUGEINT expressions
    * `v` and `seed` → column `out`. */
  def hashLongStages(v: String, seed: String, out: String): Seq[(String, String)] = Seq(
    s"${out}_h0" -> s"(($seed) + $P5plus8) % $M64",
    s"${out}_k1a" -> mulmod(s"($v)", P2),
    rotl(s"${out}_k1a", 31, s"${out}_k1b")._1 -> rotl(s"${out}_k1a", 31, s"${out}_k1b")._2,
    s"${out}_k1" -> mulmod(s"${out}_k1b", P1),
    s"${out}_h1" -> s"xor(${out}_h0, ${out}_k1)",
    rotl(s"${out}_h1", 27, s"${out}_h2a")._1 -> rotl(s"${out}_h1", 27, s"${out}_h2a")._2,
    s"${out}_h2b" -> mulmod(s"${out}_h2a", P1),
    s"${out}_h2" -> s"(${out}_h2b + $P4) % $M64",
    s"${out}_f1" -> s"xor(${out}_h2, ${out}_h2 >> 33)",
    s"${out}_f2" -> mulmod(s"${out}_f1", P2),
    s"${out}_f3" -> s"xor(${out}_f2, ${out}_f2 >> 29)",
    s"${out}_f4" -> mulmod(s"${out}_f3", P3),
    out -> s"xor(${out}_f4, ${out}_f4 >> 32)")
}
