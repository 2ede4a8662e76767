package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.{Column, GraftBridge}

/** Native 60-bit SimHash over an array<string> of words (Charikar
  * 2002): per word one xxhash64, ±1 votes per bit, sign-packed.
  * (The class name keeps the conventional "SimHash64" label for the
  * 64-bit-family sketch; the actual width is 60 bits so that it splits
  * into 4 equal 15-bit chunks for banding.  INVARIANT: chunk width ×
  * chunk count must equal the sketch width — hamming ≤ 3 across 4
  * chunks pigeonholes into ≥1 identical chunk ONLY if the chunks cover
  * every sketch bit.  Changing chunking to 4×16 without widening the
  * sketch would silently break candidate completeness.)
  *
  * Replaces an expr-string HOF fold that paid interpreted lambda calls
  * per (word × 60 bits) — 127 s for 5000 docs at sf0.1; this flat
  * per-row loop is ~1000× cheaper.  Bit semantics are identical
  * (`pmod(shiftright(h, j), 2) = 1` ⇔ `((h >> j) & 1) == 1`).
  *
  * doGenCode emits a plain method call into the flat loop, keeping the
  * enclosing stage inside whole-stage codegen (CodegenFallback would
  * have dropped the whole stage to interpreted eval).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  private val Bits = 60

  /** Public per-row entry point, shared by eval and generated code. */
  def compute(words: ArrayData): Long = {
    val n = words.numElements()
    val votes = new Array[Int](Bits)
    var w = 0
    while (w < n) {
      val h = XxHash64Function.hash(words.getUTF8String(w), StringType, 42L)
      var j = 0
      while (j < Bits) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      w += 1
    }
    var sketch = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) > 0) sketch |= (1L << j)
      j += 1
    }
    sketch
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(words: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(words)))
}
