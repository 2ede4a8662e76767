package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, GraftBridge}

/** First band index at which two word-array LSH signatures agree, or
  * -1 — the pair-dedup predicate of the banded cosine join
  * (`a.band === firstMatchingBand` keeps each candidate pair at
  * exactly one band).
  *
  * This is per-PAIR math on the join's bucket collisions — the §4b
  * hot-path rule: as a Catalyst when-chain it costs two null-checked
  * array loads per band per pair (and the inlined tree threatens the
  * codegen method limit); here it is two `getLong`s per WORD with the
  * band scan running on a local register.  Measured 39 s → 8 s for
  * d_neardup_cosine at sf0.1 (the 0.4 threshold makes ~all of n²/2
  * bucket pairs evaluate this predicate — its constant factor IS the
  * query).
  *
  * `bands` caps the scan: trailing zero bits in the last word would
  * otherwise "match" at band indexes past the real band count (both
  * signatures pad with zeros, xor = 0 ⇒ spurious agreement).
  */
case class FirstMatchingBand(left: Expression, right: Expression,
    bitsPerBand: Int, bands: Int) extends BinaryExpression {
  require(bitsPerBand >= 1 && bitsPerBand <= 64,
    s"bitsPerBand=$bitsPerBand out of [1, 64]")

  override def dataType: DataType = LongType

  // unsigned-shift form, NOT (1L << bits) - 1: at bits = 64 the shift
  // wraps to 1L and the mask would be 0 — every band would "agree" and
  // the join would degenerate to an all-pairs cross product
  private val mask = -1L >>> (64 - bitsPerBand)

  /** Per-row entry point shared by eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val nWords = a.numElements()
    var band = 0
    var w = 0
    while (w < nWords) {
      val x = a.getLong(w) ^ b.getLong(w)
      var off = 0
      while (off < 64 && band < bands) {
        if (((x >>> off) & mask) == 0L) return band.toLong
        off += bitsPerBand
        band += 1
      }
      w += 1
    }
    -1L
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("firstMatchingBand", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstMatchingBand =
    copy(left = newLeft, right = newRight)
}

object FirstMatchingBand {
  def apply(a: Column, b: Column, bitsPerBand: Int, bands: Int): Column =
    GraftBridge.column(FirstMatchingBand(
      GraftBridge.expression(a), GraftBridge.expression(b), bitsPerBand, bands))
}
