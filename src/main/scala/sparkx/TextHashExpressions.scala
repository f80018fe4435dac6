package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hash kernels. The library's portable hashing primitives
  * (token polynomial hash, document fingerprint, MinHash signature —
  * TextFunctions.scala) were originally pure-`functions` HOF folds so
  * both engines share one formula; but HOF lambdas are INTERPRETED
  * per element, and tokenHash's per-CHARACTER fold over `split(t, "")`
  * allocates a single-char UTF8String per character — measured
  * ~2-3 ms per 300-char document, which multiplied across the ~30
  * hashing queries made tokenization the headline's hidden constant.
  * These expressions compute the SAME values (fuzz-pinned by
  * TextHashSpec against the HOF forms) in one tight loop over the
  * string's code points, inside whole-stage codegen. The DuckDB oracle
  * mirrors (sqlTokenHash / sqlDocFingerprint / sqlMinhash*) are
  * unchanged — value identity is the contract.
  */
object TextHashKernel {
  val Mod = 1000000007L

  /** fold (acc·31 + codePoint) % Mod over bytes[from, until).
    * Code points decode arithmetically from the UTF-8 bytes (no
    * per-code-point UTF8String/String allocation — the non-ASCII path
    * used to allocate both, making it far slower than the ASCII one);
    * identical to `codePointAt` for all valid sequences, including the
    * 4-byte supplementary plane. Malformed input is explicit: a
    * continuation byte (0x80–0xBF) in lead position contributes U+FFFD
    * and advances one byte. */
  private def hashRange(from: Int, until: Int, bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = from
    while (i < until) {
      val b = bytes(i)
      if (b >= 0) { // ASCII byte == code point
        acc = (acc * 31L + b) % Mod
        i += 1
      } else {
        val ub = b & 0xff
        var cp = 0
        var nb = 1
        if (ub < 0xc0 || // malformed: continuation byte as lead, or a
            // sequence truncated by the range end — both U+FFFD, 1 byte
            i + (if (ub < 0xe0) 2 else if (ub < 0xf0) 3 else 4) > until) {
          cp = 0xfffd
        } else if (ub < 0xe0) {
          nb = 2
          cp = ((ub & 0x1f) << 6) | (bytes(i + 1) & 0x3f)
        } else if (ub < 0xf0) {
          nb = 3
          cp = ((ub & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f)
        } else {
          nb = 4
          cp = ((ub & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
            ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
        }
        acc = (acc * 31L + cp) % Mod
        i += nb
      }
    }
    acc
  }

  def tokenHash(t: UTF8String): Long = {
    val bytes = t.getBytes
    hashRange(0, bytes.length, bytes)
  }

  /** split on ' ' (keeping empty segments, incl. trailing — Spark's
    * split(text, " ") semantics), fold (acc·31 + tokenHash(tok)) % Mod */
  def docFingerprint(text: UTF8String): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    var acc = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        acc = (acc * 31L + hashRange(start, i, bytes)) % Mod
        start = i + 1
      }
      i += 1
    }
    acc
  }

  /** sig[k] = min over tokens of ((2k+1)·h(tok) + 7919·k) % Mod, seeded
    * at Mod. Token-distinctness is a no-op under min (idempotent), so
    * the fold runs over every token. */
  def minhashSig(text: UTF8String, h: Int): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val sig = new Array[Long](h)
    java.util.Arrays.fill(sig, Mod)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        val th = hashRange(start, i, bytes)
        var k = 0
        while (k < h) {
          val cand = ((2L * k + 1L) * th + 7919L * k) % Mod
          if (cand < sig(k)) sig(k) = cand
          k += 1
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** `graft_token_hash(t)` — polynomial code-point hash, ≡ the HOF fold
  * in TextFunctions.tokenHash. */
case class TokenHashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "graft_token_hash"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(t: Any): Any =
    TextHashKernel.tokenHash(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"org.apache.spark.sql.graftx.TextHashKernel.tokenHash($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_doc_fingerprint(text)` — ≡ TextFunctions.docFingerprint's
  * nested HOF fold. */
case class DocFingerprintExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "graft_doc_fingerprint"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(t: Any): Any =
    TextHashKernel.docFingerprint(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"org.apache.spark.sql.graftx.TextHashKernel.docFingerprint($t)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_minhash_sig(text)` — ≡ TextFunctions.minhashSig (H rows). */
case class MinhashSigExpr(child: Expression, h: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "graft_minhash_sig"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any): Any =
    TextHashKernel.minhashSig(t.asInstanceOf[UTF8String], h)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"org.apache.spark.sql.graftx.TextHashKernel.minhashSig($t, $h)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextHashExpressions {
  def tokenHash(t: Column): Column = column(TokenHashExpr(expression(t)))
  def docFingerprint(t: Column): Column = column(DocFingerprintExpr(expression(t)))
  def minhashSig(t: Column, h: Int): Column = column(MinhashSigExpr(expression(t), h))
}
