package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bit-parallel Levenshtein kernel (Myers 1999, blocked form per Hyyrö
  * 2003): computes the exact unit-cost edit distance in
  * O(⌈m/64⌉·n) word operations instead of the O(m·n) cell DP the
  * built-in `levenshtein` runs — ~60× fewer operations at the
  * document lengths the fuzzy-dedup verify stage compares (m ≈ n ≈
  * 300). Value-identical to both Spark's and DuckDB's `levenshtein`
  * (code-point based, unit costs); EditDistanceSpec fuzzes the parity.
  *
  * Why it exists: near_dup_edit_verify's corpus is LSH-adversarial
  * (31-token vocabulary → token-Jaccard median 0.63), so banding
  * cannot gate candidates below ~10⁵ pairs and no sound cheap filter
  * separates them at the ratio≤0.3 keep rule (char/token histogram
  * lower bounds top out far below the threshold on same-vocab text).
  * The verify kernel itself has to be fast; this is the classic
  * bit-vector answer, expressed as a codegen'd Catalyst expression so
  * it stays inside whole-stage codegen.
  */
object EditDistanceKernel {
  /** Exact Levenshtein distance over code points. */
  def distance(a: UTF8String, b: UTF8String): Int = {
    // code-point arrays; the common all-ASCII case skips String decode
    val ca = toCodePoints(a)
    val cb = toCodePoints(b)
    // pattern = shorter string → fewest 64-bit blocks
    val (p, t) = if (ca.length <= cb.length) (ca, cb) else (cb, ca)
    val m = p.length
    val n = t.length
    if (m == 0) return n
    val w = (m + 63) >>> 6
    // Peq: per distinct pattern code point, the bitmask of its positions
    val peq = new java.util.HashMap[Integer, Array[Long]](m * 2)
    var i = 0
    while (i < m) {
      var arr = peq.get(p(i))
      if (arr == null) { arr = new Array[Long](w); peq.put(p(i), arr) }
      arr(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    val empty = new Array[Long](w)
    val pv = Array.fill(w)(-1L)
    val mv = new Array[Long](w)
    val lastTop = (m - 1) & 63
    var score = m
    var j = 0
    while (j < n) {
      val eqArr = { val e = peq.get(t(j)); if (e == null) empty else e }
      var hin = 1 // top matrix boundary: D(0,j) − D(0,j−1) = +1
      var bi = 0
      while (bi < w) {
        val eq0 = eqArr(bi)
        val pvb = pv(bi)
        val mvb = mv(bi)
        val xv = eq0 | mvb
        val eq = if (hin < 0) eq0 | 1L else eq0
        val xh = (((eq & pvb) + pvb) ^ pvb) | eq
        var ph = mvb | ~(xh | pvb)
        var mh = pvb & xh
        val top = if (bi == w - 1) lastTop else 63
        var hout = 0
        if (((ph >>> top) & 1L) != 0L) hout += 1
        if (((mh >>> top) & 1L) != 0L) hout -= 1
        ph <<= 1
        mh <<= 1
        if (hin < 0) mh |= 1L
        else if (hin > 0) ph |= 1L
        pv(bi) = mh | ~(xv | ph)
        mv(bi) = ph & xv
        hin = hout
        bi += 1
      }
      score += hin
      j += 1
    }
    score
  }

  private def toCodePoints(s: UTF8String): Array[Int] = {
    val nb = s.numBytes()
    if (s.numChars() == nb) {
      // all-ASCII fast path: bytes ARE the code points
      val out = new Array[Int](nb)
      var i = 0
      while (i < nb) { out(i) = s.getByte(i) & 0xff; i += 1 }
      out
    } else s.toString.codePoints().toArray
  }
}

/** `graft_edit_dist(a, b)` — exact Levenshtein via
  * [[EditDistanceKernel]]; drop-in for `levenshtein(a, b)` where the
  * pair volume makes the cell DP the bottleneck. */
case class EditDistExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def prettyName: String = "graft_edit_dist"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    EditDistanceKernel.distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = org.apache.spark.sql.graftx.EditDistanceKernel.distance($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object EditDistanceExpressions {
  /** Column API: exact Levenshtein distance, bit-parallel kernel. */
  def editDistance(a: Column, b: Column): Column =
    column(EditDistExpr(expression(a), expression(b)))
}
