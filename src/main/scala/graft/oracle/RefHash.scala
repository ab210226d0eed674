package graft.oracle

import java.nio.charset.StandardCharsets
import java.util.Locale
import java.util.regex.Pattern

/**
 * ORACLE-ONLY reference implementations — never imported by the
 * engine. The minhash/simhash kernels ([[graft.functions.GraftExpressions]])
 * hash through Spark's internal `XXH64`; the driver's DuckDB gate
 * could not re-derive those values (DuckDB has no xxhash64), which
 * left q_minhash_sigs / q_simhash as rows-only checks through round 4.
 *
 * This object closes that hole the same way the q_kg_*_golden rows
 * close pipeline parity: an INDEPENDENT from-scratch implementation
 * of the public xxHash64 specification
 * (github.com/Cyan4973/xxHash, doc/xxhash_spec.md — public algorithm,
 * reimplemented here from the spec's step list, not from Spark's or
 * xxHash's source), plus plain-java.lang.String re-derivations of the
 * documented normalization/shingle/vote contracts. graft.Verify
 * evaluates these driver-side over the verify corpus and writes the
 * expected values as parquet; the oracle SQL reads that parquet, so a
 * defect in either the Catalyst kernels OR Spark's XXH64 port shows
 * up as a hash mismatch in CORRECTNESS instead of passing silently.
 *
 * Driver-sized by contract: Verify runs at sf0.01 (500 documents);
 * these functions are only ever applied to a collected oracle corpus,
 * exactly like the exact all-pairs oracle roles.
 *
 * Lowercasing caveat: the kernels lowercase via Spark's
 * `UTF8String.toLowerCase` (ASCII fast path; JVM-default-locale slow
 * path for non-ASCII), while this oracle uses `Locale.ROOT` — the two
 * agree on ASCII and on every default-locale JVM, and can differ only
 * for locale-special-cased code points (e.g. dotted/dotless I under
 * tr_TR) on a non-default-locale driver. The verify corpus is ASCII;
 * a divergence here would surface as an oracle mismatch, the correct
 * failure direction.
 */
object RefHash {

  // xxHash64 constants, from the spec's "Step 1" table
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  private def readLE64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) |
      ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24) |
      ((b(i + 4) & 0xFFL) << 32) |
      ((b(i + 5) & 0xFFL) << 40) |
      ((b(i + 6) & 0xFFL) << 48) |
      ((b(i + 7) & 0xFFL) << 56)

  private def readLE32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) |
      ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24)

  private def round(acc: Long, x: Long): Long = rotl(acc + x * P2, 31) * P1

  private def mergeRound(h: Long, v: Long): Long = (h ^ round(0L, v)) * P1 + P4

  /** xxHash64 of `b` with `seed`, per the public spec: 32-byte stripes
    * through 4 accumulators, converge+merge, length, then 8/4/1-byte
    * tail lanes, then the avalanche. */
  def xxh64(b: Array[Byte], seed: Long): Long = {
    val len = b.length
    var i = 0
    var h =
      if (len >= 32) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        while (i + 32 <= len) {
          v1 = round(v1, readLE64(b, i))
          v2 = round(v2, readLE64(b, i + 8))
          v3 = round(v3, readLE64(b, i + 16))
          v4 = round(v4, readLE64(b, i + 24))
          i += 32
        }
        var acc = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        acc = mergeRound(acc, v1)
        acc = mergeRound(acc, v2)
        acc = mergeRound(acc, v3)
        mergeRound(acc, v4)
      } else seed + P5
    h += len
    while (i + 8 <= len) {
      h = rotl(h ^ round(0L, readLE64(b, i)), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h = rotl(h ^ (readLE32(b, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h = rotl(h ^ ((b(i) & 0xFFL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^ (h >>> 32)
  }

  /** xxHash64 of a string's UTF-8 bytes (what Spark's `xxhash64`
    * hashes for string columns). */
  def xxh64(s: String, seed: Long): Long =
    xxh64(s.getBytes(StandardCharsets.UTF_8), seed)

  private val ws = Pattern.compile("\\s+")
  private val nonAlnum = Pattern.compile("[^a-z0-9]+")

  /** Expected MinHash signature per the documented kernel contract
    * (lowercase → whitespace-split tokens → k-word space-joined
    * shingles; Carter-Wegman h_i = xxh64(sh, 42) + i·xxh64(sh,
    * 1610612741); signature[i] = min over shingles), re-derived with
    * java.lang.String ops and the from-spec hash above. */
  def minHashSignature(text: String, k: Int = 3, numHashes: Int = 16): Array[Long] = {
    val s = text.toLowerCase(Locale.ROOT).trim
    val toks = ws.split(s)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val nSh = math.max(toks.length - k + 1, 1)
    var i = 0
    while (i < nSh) {
      val sh = toks.slice(i, math.min(i + k, toks.length)).mkString(" ")
      val h1 = xxh64(sh, 42L)
      val h2 = xxh64(sh, 1610612741L)
      var h = 0
      while (h < numHashes) {
        val v = h1 + h.toLong * h2
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      i += 1
    }
    sig
  }

  /** Expected 64-bit SimHash per the documented kernel contract
    * (lowercase → non-alphanumeric runs to spaces → trim → tokens;
    * per-token xxh64 seed 42; majority vote per bit). */
  def simHash(text: String): Long = {
    val s = nonAlnum.matcher(text.toLowerCase(Locale.ROOT)).replaceAll(" ").trim
    if (s.isEmpty) return 0L
    val toks = ws.split(s)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = xxh64(toks(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** The exact string rendering q_minhash_sigs ships (Spark's
    * `cast(array<long> as array<string>) cast string`): elements in
    * decimal, joined by ", ", bracketed. */
  def signatureString(sig: Array[Long]): String =
    sig.mkString("[", ", ", "]")
}
