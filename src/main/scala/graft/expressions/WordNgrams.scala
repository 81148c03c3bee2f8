package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram expressions for the decontamination / boilerplate
  * hot paths (Curation.contaminationStats, TextAnalysis.boilerplateNgrams).
  *
  * The declarative formulation — normalizeWs → split → wordShingles
  * (transform + slice + concat_ws per gram) → array_distinct — is correct
  * but every higher-order step is interpreted per element; on a corpus
  * scan the gram construction dominates the stage. These expressions do
  * one pass over the raw string each:
  *
  *  - [[WordNgramStrings]]: text → distinct gram strings in
  *    first-occurrence order — BIT-IDENTICAL to the declarative
  *    `array_distinct(wordShingles(tokens(normalizeWs(text)), n))`
  *    (lowercase whole string, tokens = maximal runs of non-`\s`
  *    characters, grams joined with single spaces); equivalence-tested on
  *    real data in CurationSpec.
  *  - [[WordNgramHashes]]: text → SORTED distinct array<bigint> of gram
  *    hashes, skipping gram-string allocation entirely (per-token 64-bit
  *    polynomial hashes, splitmix64-finalized, combined arithmetically —
  *    see gramHashes for why the multipliers must be large). The hash
  *    differs from the declarative path's xxhash64-of-gram-string —
  *    callers (contaminationStats) only compare/count grams, so any
  *    injective-modulo-collisions hash is equivalent; the CurationSpec
  *    hashed≡string test pins that.
  */
case class WordNgramStrings(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "n-gram size must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngram_strings requires string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    WordNgramEval.gramStrings(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.WordNgramEval.gramStrings($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordNgramStrings =
    copy(child = newChild)
  override def prettyName: String = "word_ngram_strings"
}

case class WordNgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "n-gram size must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngram_hashes requires string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    WordNgramEval.gramHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.WordNgramEval.gramHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordNgramHashes =
    copy(child = newChild)
  override def prettyName: String = "word_ngram_hashes"
}

/** Static eval targets (top-level object → static forwarders for Janino). */
object WordNgramEval {

  /** Matches Java regex `\s` exactly — the declarative path tokenizes
    * with split("\\s+"), and `\s` is NOT Character.isWhitespace (it
    * excludes unicode spaces like U+00A0). */
  private def isRegexSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** (start, end) offsets of maximal non-space runs of s. */
  private def tokenOffsets(s: String): (Array[Int], Array[Int], Int) = {
    val len = s.length
    var cap = 8
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var m = 0
    var i = 0
    while (i < len) {
      while (i < len && isRegexSpace(s.charAt(i))) i += 1
      if (i < len) {
        val st = i
        while (i < len && !isRegexSpace(s.charAt(i))) i += 1
        if (m == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(m) = st; ends(m) = i; m += 1
      }
    }
    (starts, ends, m)
  }

  /** Distinct lowercase word n-grams in first-occurrence order — the
    * native twin of array_distinct(wordShingles(tokens(normalizeWs(s)), n)). */
  def gramStrings(s: UTF8String, n: Int): ArrayData = {
    // whole-string lowercase FIRST (exactly like lower() in normalizeWs —
    // unicode lowering can change char counts, so order matters) and via
    // UTF8String.toLowerCase, the SAME routine lower() uses, so the
    // equivalence holds on non-ASCII text under any JVM locale
    val str = s.toLowerCase.toString
    val (starts, ends, m) = tokenOffsets(str)
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((m - n + 1) * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= m - n) {
      sb.setLength(0)
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(str, starts(j), ends(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var w = 0
    while (it.hasNext) { out(w) = UTF8String.fromString(it.next()); w += 1 }
    new GenericArrayData(out)
  }

  /** Sorted distinct hashes of lowercase word n-grams: per-token
    * polynomial char hash, gram hash = polynomial over the n token hashes
    * (tokens contain no spaces, so the token sequence determines the gram
    * string and vice versa), splitmix64 finalizer to decorrelate
    * overlapping windows. One pass, zero gram-string allocation. */
  def gramHashes(s: UTF8String, n: Int): ArrayData = {
    val str = s.toLowerCase.toString
    val (starts, ends, m) = tokenOffsets(str)
    if (m < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      // 64-bit FNV-prime polynomial + splitmix64 finalizer per TOKEN. The
      // multiplier must be large: with h*31+c, same-length tokens whose
      // char diffs satisfy sum(dc_i * 31^k) = 0 (e.g. "b<" vs "a[")
      // collide structurally. With a ~2^40 multiplier a two-char
      // collision would need dc1*p = -dc2 exactly (no mod wrap at these
      // magnitudes) — impossible for char-bounded diffs — and longer
      // spans wrap mod 2^64 into lattice territory, leaving ~2^-64
      // accidental collisions only.
      var h = 1125899906842597L
      var j = starts(i)
      while (j < ends(i)) { h = h * 0x100000001B3L + str.charAt(j); j += 1 }
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
      th(i) = h ^ (h >>> 31)
      i += 1
    }
    val g = m - n + 1
    val hs = new Array[Long](g)
    i = 0
    while (i < g) {
      var h = 0x9E3779B97F4A7C15L
      var j = i
      while (j < i + n) { h = h * 0x100000001B3L + th(j); j += 1 }
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
      hs(i) = h ^ (h >>> 31)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 1
    i = 1
    while (i < g) {
      if (hs(i) != hs(i - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == g) hs else java.util.Arrays.copyOf(hs, w))
  }
}

object WordNgrams {
  def wordNgramStrings(c: Column, n: Int): Column =
    ColumnBridge.column(WordNgramStrings(ColumnBridge.expression(c), n))
  def wordNgramHashes(c: Column, n: Int): Column =
    ColumnBridge.column(WordNgramHashes(ColumnBridge.expression(c), n))
}
