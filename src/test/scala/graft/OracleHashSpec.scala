package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.oracle.RefHash
import graft.ops.Dedup

/** The from-spec oracle hash (graft.oracle.RefHash) must agree
  * bit-for-bit with the engine's values — it is what the driver's
  * DuckDB gate compares q_minhash_sigs / q_simhash against. Two
  * layers: (1) raw xxh64 vs Spark's `xxhash64` column function across
  * the length lanes of the spec (empty, <4, <8, <32, 32, >32,
  * multi-stripe, non-ASCII UTF-8); (2) whole-signature parity vs the
  * native kernels on adversarial documents. */
class OracleHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("from-spec xxh64 == Spark XXH64 across length lanes and seeds") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    val strs = Seq(
      "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "abcdefgh",
      "abcdefghi", "0123456789abcdef", "0123456789abcdef0123456789abcde",
      "0123456789abcdef0123456789abcdef",
      "0123456789abcdef0123456789abcdefX",
      "x" * 63, "x" * 64, "x" * 65, "x" * 200,
      "naïve café – ünïcødé ✓ 東京", "tab\tand\nnewline ")
    // 42 and 1610612741 are the two seeds the kernels use; 0 and a
    // negative seed exercise the spec's seed arithmetic generally
    for (seed <- Seq(42L, 1610612741L, 0L, -7L); s <- strs) {
      assert(RefHash.xxh64(s, seed) ==
        XXH64.hashUTF8String(UTF8String.fromString(s), seed),
        s"xxh64 mismatch: seed=$seed len=${s.length} '$s'")
    }
    // and the user-facing column function (seed 42 over UTF-8 bytes)
    import spark.implicits._
    val viaColumn = strs.toDF("s").select(xxhash64(col("s"))).collect().map(_.getLong(0))
    assert(viaColumn.toSeq == strs.map(s => RefHash.xxh64(s, 42L)))
  }

  test("oracle minhash signature / simhash == native kernel values") {
    import spark.implicits._
    val texts = Seq(
      "",
      "one",
      "one two",
      "one two three",
      "The Quick   Brown fox\tjumps over\nthe lazy dog",
      "punct!! and, (parens) — plus 123 numbers 456",
      "repeated repeated repeated repeated repeated",
      "a " * 100 + "tail")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

    val kernelSigs = Dedup.minHashSignatures(d).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(kernelSigs(i.toLong).sameElements(RefHash.minHashSignature(t)),
        s"minhash mismatch on doc $i")
    }

    val kernelSims = Dedup.simHash(d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(kernelSims(i.toLong) == RefHash.simHash(t), s"simhash mismatch on doc $i")
    }
  }

  test("signatureString matches Spark's array-to-string cast rendering") {
    import spark.implicits._
    val sig = Array(1L, -2L, Long.MaxValue, Long.MinValue)
    val rendered = Seq(Tuple1(sig)).toDF("signature")
      .select(col("signature").cast("array<string>").cast("string"))
      .head().getString(0)
    assert(rendered == RefHash.signatureString(sig))
  }
}
