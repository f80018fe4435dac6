package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's native bloom-filter expressions, which
  * Catalyst uses internally for runtime row-level filtering but does not
  * register as SQL functions. Both are codegen'd; `mightContain` requires
  * its filter side foldable, so the built sketch travels as a binary
  * literal (the driver-hoisted-model discipline of the centroid and
  * codebook paths — the sketch is a few hundred KB, far under broadcast
  * sizes the kernels already ship).
  */
object SketchExpressions {

  /** Aggregate a LONG column into a serialized bloom filter (binary). */
  def bloomFilterAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    column(new BloomFilterAggregate(expression(c),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of a LONG column against a built sketch. May return
    * false positives (rate set by the build's bits/item); never false
    * negatives — callers must re-verify positives exactly. */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    column(BloomFilterMightContain(Literal.create(bloom, BinaryType), expression(c)))
}
