package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst distance expressions (SURVEY.md §4 "custom Catalyst
  * work #1"): a single fused loop over two ARRAY<DOUBLE> values with
  * whole-stage codegen.
  *
  * The pure-`functions` formulation (`aggregate(zip_with(a, b, …))`)
  * materializes an intermediate array per row-pair — at kNN-join
  * cardinality (n·q rows) that allocation dominates. These expressions
  * generate a tight scalar loop instead: no allocation, no virtual
  * calls, same left-to-right summation order (oracle parity preserved).
  */
abstract class BinaryVectorFold extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  /** Scalar combine step; must match the codegen template below. */
  protected def combine(acc: Double, x: Double, y: Double): Double
  /** Java source for the combine step over vars (acc, x, y). */
  protected def combineCode(acc: String, x: String, y: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc = combine(acc, xs.getDouble(i), ys.getDouble(i)); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $acc = ${combineCode(acc, x, y)};
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })
}

/** Σ (aᵢ−bᵢ)² — fused squared-L2 (distance.go:18-25). */
case class L2SqExpr(left: Expression, right: Expression) extends BinaryVectorFold {
  override def prettyName: String = "graft_l2sq"
  protected def combine(acc: Double, x: Double, y: Double): Double =
    acc + (x - y) * (x - y)
  protected def combineCode(acc: String, x: String, y: String): String =
    s"$acc + ($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ |aᵢ−bᵢ| — fused Manhattan/L1 (the reference roadmap's first listed
  * metric extension, docs/roadmap.md:89; the Metric ADT slot it lands in
  * is metric.go:19-22's interface). */
case class L1Expr(left: Expression, right: Expression) extends BinaryVectorFold {
  override def prettyName: String = "graft_l1"
  protected def combine(acc: Double, x: Double, y: Double): Double =
    acc + math.abs(x - y)
  protected def combineCode(acc: String, x: String, y: String): String =
    s"$acc + java.lang.Math.abs($x - $y)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ aᵢ·bᵢ — fused dot product (distance.go:28-34). */
case class DotExpr(left: Expression, right: Expression) extends BinaryVectorFold {
  override def prettyName: String = "graft_dot"
  protected def combine(acc: Double, x: Double, y: Double): Double = acc + x * y
  protected def combineCode(acc: String, x: String, y: String): String =
    s"$acc + $x * $y"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Shared scalar kernel for sign-LSH bucketing: P hyperplanes derived from
  * the deterministic integer formula of `graft.index.LshIndex` (hnsw-
  * substitution path, SURVEY.md §7 M5), dotted against the vector in one
  * fused loop with the sign bits packed into a LONG.
  *
  * The hyperplane components depend only on (plane, component-index), so
  * the planes×dim table is computed once per JVM per (planes, dim) and
  * reused across every row — the per-row cost drops to planes·dim fused
  * multiply-adds, where the HOF formulation (r3: `aggregate(zip_with(…))`
  * per plane per row) re-derived every component interpreted, allocating
  * (VERDICT r3 #1: 494.6 s to bucket 100k×128 at planes=8).
  *
  * Fold order is identical to the HOF column form and the DuckDB oracle
  * fragment (`LshIndex.sqlBucket`): per plane, components summed in
  * ascending index order — hash-parity preserved.
  */
object LshBucketKernel {
  private val tables = new java.util.concurrent.ConcurrentHashMap[Long, Array[Double]]()

  /** planes×dim row-major hyperplane component table (cached per JVM). */
  def table(planes: Int, dim: Int): Array[Double] = {
    val key = (planes.toLong << 32) | dim.toLong
    var t = tables.get(key)
    if (t == null) {
      t = Array.tabulate(planes * dim) { pi =>
        val p = pi / dim
        val i = pi % dim
        ((p * 2654435761L + i * 40503L) % 1000003L).toDouble / 1000003.0 - 0.5
      }
      tables.putIfAbsent(key, t)
    }
    t
  }

  /** Catalyst-row entry point (called from generated code). */
  def bucket(vec: ArrayData, planes: Int): Long = {
    val dim = vec.numElements()
    val tab = table(planes, dim)
    var acc = 0L
    var p = 0
    while (p < planes) {
      val off = p * dim
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += vec.getDouble(i) * tab(off + i); i += 1 }
      if (dot > 0.0) acc += 1L << p
      p += 1
    }
    acc
  }

  /** Driver-side twin over a primitive array — bit-identical fold. */
  def bucketArray(vec: Array[Double], planes: Int): Long = {
    val dim = vec.length
    val tab = table(planes, dim)
    var acc = 0L
    var p = 0
    while (p < planes) {
      val off = p * dim
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += vec(i) * tab(off + i); i += 1 }
      if (dot > 0.0) acc += 1L << p
      p += 1
    }
    acc
  }
}

/** Native sign-LSH bucket id of an ARRAY<DOUBLE> (LONG with one sign bit
  * per hyperplane). Codegen emits a single static call into the fused
  * [[LshBucketKernel]] loop — stays inside whole-stage codegen, no
  * per-element interpretation. */
case class LshBucketExpr(child: Expression, planes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(planes >= 1 && planes <= 62,
    s"planes must be in [1, 62] to fit a LONG bucket id, got $planes")
  override def prettyName: String = "graft_lsh_bucket"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    LshBucketKernel.bucket(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graftx.LshBucketKernel.bucket($a, $planes)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Matrix × vector against a CONSTANT matrix — `m · v` as one native
  * kernel call. Replaces the `transform(typedLit(m), row => dot(row, v))`
  * form (OpqIndex.rotateCol / Pca.project): the outer `transform` is a
  * higher-order function, so even with the native DotExpr inside, every
  * output element paid an interpreted lambda dispatch — at dim=128 that
  * is 128 interpreted calls per row, the dominant cost of the OPQ encode
  * pass (VERDICT r12 next #7). Per output element the kernel runs the
  * EXACT DotExpr fold (acc + m[i][j]·v[j], ascending j, n = min of the
  * lengths), so values are bit-identical to the HOF form and the DuckDB
  * mirrors. Null semantics: null vector → null result (the HOF form gave
  * an array of nulls; no call site feeds nullable vectors).
  *
  * The matrix rides as a Seq-typed constructor param (value-based
  * equals/hashCode for expression canonicalization — the
  * NearestCentroidExpr discipline), memoized into a primitive array. */
case class MatVecExpr(child: Expression, matrixSeq: Seq[Seq[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  @transient private lazy val matrix: Array[Array[Double]] =
    matrixSeq.map(_.toArray).toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_matvec"

  override def nullSafeEval(v: Any): Any =
    MatVecKernel.apply(matrix, v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("matrix", matrix, "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"org.apache.spark.sql.graftx.MatVecKernel.apply($m, $v)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MatVecKernel {
  def apply(m: Array[Array[Double]], vec: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val nv = vec.numElements()
    val out = new Array[Double](m.length)
    var r = 0
    while (r < m.length) {
      val row = m(r)
      val n = math.min(row.length, nv)
      var acc = 0.0
      var j = 0
      while (j < n) { acc = acc + row(j) * vec.getDouble(j); j += 1 }
      out(r) = acc
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object DistanceExpressions {
  /** Column wrappers over the native expressions. */
  def matVecFast(matrix: Seq[Seq[Double]], v: Column): Column =
    column(MatVecExpr(expression(v), matrix))
  def l2SqFast(a: Column, b: Column): Column = column(L2SqExpr(expression(a), expression(b)))
  def l1Fast(a: Column, b: Column): Column = column(L1Expr(expression(a), expression(b)))
  def dotFast(a: Column, b: Column): Column = column(DotExpr(expression(a), expression(b)))
  def lshBucket(v: Column, planes: Int): Column = column(LshBucketExpr(expression(v), planes))

  /** SQL registration (graft_l2sq / graft_l1 / graft_dot), for spark.sql users. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l2sq", exprs => L2SqExpr(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l1", exprs => L1Expr(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotExpr(exprs(0), exprs(1)), "built-in")
  }
}
