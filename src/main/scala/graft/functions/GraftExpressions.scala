package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the hot scalar kernels of the
 * training-data operators — each replaces a tree of higher-order
 * Column functions (transform/aggregate/zip_with) whose per-element
 * interpreted evaluation dominated the bench (lambda HOFs don't
 * participate in codegen): one virtual call per ROW with a tight JVM
 * loop inside beats per-ELEMENT interpretation by 1-2 orders of
 * magnitude, while keeping the operators pure projections (no
 * shuffle, no UDF object round-trip, null-safe).
 *
 * Registered as SQL functions by [[GraftExtensions]]
 * (SparkSessionExtensions.injectFunction) and invoked through the
 * public `functions.call_function`, so callers never touch internal
 * Column constructors.
 *
 * CodegenFallback is deliberate: each expression is the entire
 * projection for its operator, so the lost whole-stage fusion is one
 * virtual call per row — the eval loop itself is monomorphic JVM code
 * the JIT compiles.
 */
object GraftExpressions {
  private[functions] val ws: Pattern = Pattern.compile("\\s+")
  private[functions] val nonAlnum: Pattern = Pattern.compile("[^a-z0-9]+")

  /** min over shingles of (h1 + i·h2) — the Carter-Wegman 2-universal
    * family: 2 xxh64 evaluations per shingle give all K permutations. */
  private[functions] def minhash(text: UTF8String, k: Int, numHashes: Int): GenericArrayData = {
    val s = text.toLowerCase.toString.trim
    val toks = ws.split(s)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val nSh = math.max(toks.length - k + 1, 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nSh) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + k, toks.length)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val sh = UTF8String.fromString(sb.toString)
      val h1 = XXH64.hashUTF8String(sh, 42L)
      val h2 = XXH64.hashUTF8String(sh, 1610612741L)
      var h = 0
      while (h < numHashes) {
        val v = h1 + h.toLong * h2
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash: per-token xxh64 (seed 42 — identical values to
    * Spark's xxhash64(token)), sign-vote per bit. */
  private[functions] def simhash(text: UTF8String): Long = {
    val s = nonAlnum.matcher(text.toLowerCase.toString).replaceAll(" ").trim
    if (s.isEmpty) return 0L
    val toks = ws.split(s)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(toks(i)), 42L)
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

  /** Sorted distinct 64-bit hashes of the k-CODEPOINT character
    * shingles of the normalized text (lowercase, each whitespace run
    * collapsed to one space, no trim — bit-parity with the Column
    * formulation `regexp_replace(lower(text), "\\s+", " ")` +
    * substr windows). A document shorter than k codepoints yields its
    * single whole-text shingle, like `substr` past the end. Hash is
    * FNV-1a 64 over the window's UTF-16 chars: distinct windows map to
    * distinct hashes w.h.p. (collision ≈ |shingles|²/2⁶⁴ corpus-wide),
    * so SET sizes — and therefore Jaccard values — equal the exact
    * string-set formulation. */
  private[functions] def shingles64(text: UTF8String, k: Int): GenericArrayData = {
    val raw = text.toLowerCase.toString
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    var inWs = false
    while (i < raw.length) {
      val c = raw.charAt(i)
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      if (isWs) { if (!inWs) sb.append(' '); inWs = true }
      else { sb.append(c); inWs = false }
      i += 1
    }
    val n = sb.length
    // codepoint start offsets (char index of each codepoint, plus end)
    var cp = 0
    val starts = new Array[Int](n + 1)
    var p = 0
    while (p < n) {
      starts(cp) = p
      p += (if (Character.isHighSurrogate(sb.charAt(p)) && p + 1 < n &&
        Character.isLowSurrogate(sb.charAt(p + 1))) 2 else 1)
      cp += 1
    }
    starts(cp) = n
    val m = math.max(cp - k + 1, 1)
    val hs = new Array[Long](m)
    var w = 0
    while (w < m) {
      val from = starts(math.min(w, cp))
      val until = starts(math.min(w + k, cp))
      var h = 0xcbf29ce484222325L
      var q = from
      while (q < until) {
        h ^= sb.charAt(q).toLong
        h *= 0x100000001b3L
        q += 1
      }
      hs(w) = h
      w += 1
    }
    java.util.Arrays.sort(hs)
    var out = 0
    var r = 0
    while (r < m) {
      if (r == 0 || hs(r) != hs(r - 1)) { hs(out) = hs(r); out += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, out))
  }

  /** Gopher-style duplicate-bigram counts over the lowercased alnum
    * word stream — bit-parity with the Column formulation in
    * [[graft.ops.Clean.repetitionStats]] (filter(split(regexp_replace(
    * lower(text), "[^a-z0-9]+", " "), " "), _ =!= "") + zip_with +
    * array_distinct): words are maximal [a-z0-9] runs of the
    * UTF8String-lowercased text (any other char — including each
    * surrogate of a non-ASCII codepoint, which the char-class regex
    * also rejects — separates), bigram identity is the joined
    * "w1 w2" string, which is uniquely parseable because words carry
    * no spaces. Returns (n_bigrams, n_dup); (0, 0) under two words. */
  private[functions] def bigramStats(text: UTF8String): (Long, Long) = {
    val s = text.toLowerCase.toString
    val n = s.length
    // word-id assignment on the fly; bigram set as packed (id1, id2)
    val ids = new java.util.HashMap[String, Integer]()
    val seen = new java.util.HashSet[Long]()
    var nBigrams = 0L
    var nDup = 0L
    var prevId = -1
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        while (i < n && {
          val d = s.charAt(i)
          (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        val w = s.substring(start, i)
        var id = ids.get(w)
        if (id == null) { id = ids.size(); ids.put(w, id) }
        if (prevId >= 0) {
          nBigrams += 1
          if (!seen.add((prevId.toLong << 32) | (id.toLong & 0xffffffffL)))
            nDup += 1
        }
        prevId = id
      } else i += 1
    }
    (nBigrams, nDup)
  }

  /** Stopword-heuristic language ID — bit-parity with the Column
    * formulation in [[graft.ops.TextStats.langId]]: per language, the
    * non-overlapping left-to-right occurrence count of four padded
    * stopword needles in " "+lower(text)+" " (exactly what the
    * length-minus-replace chain counted); winner = max score with ties
    * to the lexicographically greatest language code (the
    * greatest(struct(score, lang)) rule), 'en' when all scores are 0.
    * One scan per needle with zero string allocation — the Column tree
    * allocated 16 intermediate strings per row. */
  private val langNeedles: Array[(String, Array[String])] = Array(
    "de" -> Array(" der ", " und ", " die ", " nicht "),
    "en" -> Array(" the ", " and ", " of ", " to "),
    "es" -> Array(" el ", " que ", " los ", " una "),
    "fr" -> Array(" le ", " la ", " et ", " les "))

  private[functions] def langId(text: UTF8String): UTF8String = {
    val p = " " + text.toLowerCase.toString + " "
    var bestLang: String = null
    var bestScore = -1L
    var i = 0
    while (i < langNeedles.length) {
      val (lang, needles) = langNeedles(i)
      var s = 0L
      var j = 0
      while (j < needles.length) {
        val n = needles(j)
        var idx = p.indexOf(n)
        while (idx >= 0) { s += 1; idx = p.indexOf(n, idx + n.length) }
        j += 1
      }
      if (s > bestScore || (s == bestScore && lang.compareTo(bestLang) > 0)) {
        bestScore = s; bestLang = lang
      }
      i += 1
    }
    UTF8String.fromString(if (bestScore == 0L) "en" else bestLang)
  }

  private[functions] def toDouble(a: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case _ => throw new IllegalArgumentException(s"unsupported element type $et")
  }
}

/** graft_minhash_sig(text, k, numHashes) → array<bigint>. */
case class MinHashSigExpr(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && numHashes >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.minhash(input.asInstanceOf[UTF8String], k, numHashes)
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** graft_simhash(text) → bigint. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.simhash(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** graft_cosine(a, b) → double; accepts array<float|double>, computes
  * in double precision (identical to cast-to-double + HOF fold). */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => et
    case t => throw new IllegalArgumentException(s"graft_cosine expects array<float|double>, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (et1, et2) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = GraftExpressions.toDouble(x, et1, i)
      val yv = GraftExpressions.toDouble(y, et2, i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
}

/** graft_lsh_bucket(vec, nBits, seed) → bigint. Hyperplane b's weight
  * for dim i is ±1 from the chained xxh64 of (seed, b, i) with the
  * same int-chain seeding as Spark's xxhash64(seed, b, i), so bucket
  * values are bit-identical to the Column-algebra formulation. */
case class LshBucketExpr(child: Expression, nBits: Int, seed: Int)
    extends UnaryExpression with CodegenFallback {
  require(nBits >= 1 && nBits <= 63)
  private def elemType: DataType = child.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => et
    case t => throw new IllegalArgumentException(s"graft_lsh_bucket expects array<float|double>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"
  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val et = elemType
    val n = v.numElements()
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var acc = XXH64.hashInt(seed, 42L)
      acc = XXH64.hashInt(b, acc)
      var proj = 0.0
      var i = 0
      while (i < n) {
        val h = XXH64.hashInt(i, acc)
        val w = if ((h & 1L) == 1L) 1.0 else -1.0
        proj += GraftExpressions.toDouble(v, et, i) * w
        i += 1
      }
      if (proj > 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }
  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

/** graft_shingles64(text, k) → array<bigint>: sorted distinct hashed
  * char-k shingles (see [[GraftExpressions.shingles64]]) — the
  * corpus-scale replacement for materializing string shingle arrays
  * (~5× text bytes per row through every verify-join shuffle). */
case class Shingles64Expr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"k=$k < 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles64"
  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.shingles64(input.asInstanceOf[UTF8String], k)
  override protected def withNewChildInternal(newChild: Expression): Shingles64Expr =
    copy(child = newChild)
}

/** graft_langid(text) → string (see [[GraftExpressions.langId]]). */
case class LangIdExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_langid"
  override protected def nullSafeEval(input: Any): Any =
    GraftExpressions.langId(input.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** graft_bigram_stats(text) → struct<n_bigrams:bigint, n_dup:bigint>
  * (see [[GraftExpressions.bigramStats]]) — replaces the interpreted
  * split/zip_with/array_distinct tree, which materialized two bigram
  * arrays per row and paid per-element lambda evaluation. */
case class BigramStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_dup", LongType, nullable = false)))
  override def prettyName: String = "graft_bigram_stats"
  override protected def nullSafeEval(input: Any): Any = {
    val (nb, nd) = GraftExpressions.bigramStats(input.asInstanceOf[UTF8String])
    org.apache.spark.sql.catalyst.InternalRow(nb, nd)
  }
  override protected def withNewChildInternal(newChild: Expression): BigramStatsExpr =
    copy(child = newChild)
}

/** graft_jaccard64(a, b) → double: Jaccard |A∩B| / max(|A∪B|, 1) of
  * two SORTED DISTINCT bigint arrays (the [[Shingles64Expr]] output
  * contract) via a single merge pass — no per-element interpreted
  * array_intersect/array_union. Unsorted input is a caller bug and
  * yields an undercounted intersection. */
case class Jaccard64Expr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard64"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val (xv, yv) = (x.getLong(i), y.getLong(j))
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    inter.toDouble / math.max(nx + ny - inter, 1)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Jaccard64Expr =
    copy(left = l, right = r)
}
