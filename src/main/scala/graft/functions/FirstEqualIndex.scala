package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, GraftBridge}

/** Index of the first position where two array<long> columns hold the
  * same value, or -1 — the exactly-once pair predicate for banded
  * joins whose band keys are full 64-bit elements (MinHash band
  * hashes), the sibling of FirstMatchingBand's bit-sliced form.
  *
  * `a.band === FirstEqualIndex(a.bands, b.bands)` keeps each
  * candidate pair at exactly one band, replacing a dropDuplicates
  * shuffle+aggregate over the candidate set — which inflates with
  * band agreement exactly when dedup matters most (an exact-dup pair
  * agrees on ~ALL bands, so a re-crawl corpus pays ~bands× its true
  * candidate volume into that aggregate).
  */
case class FirstEqualIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  /** Per-row entry point shared by eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) return i.toLong
      i += 1
    }
    -1L
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("firstEqualIndex", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstEqualIndex =
    copy(left = newLeft, right = newRight)
}

object FirstEqualIndex {
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(FirstEqualIndex(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
