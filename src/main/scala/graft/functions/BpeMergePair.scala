package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge applied to a token array: every adjacent
  * (first, second) occurrence becomes the single merged token
  * "first second", greedily left to right without overlap — the
  * symbol-update step of byte-pair-encoding training (Sennrich et al.
  * 2016: replace the most frequent pair, recount, repeat).
  *
  * The merge pair is a PLAN CONSTANT (like BloomContains' filter
  * bytes): the trainer picks it on the driver from the round's pair
  * counts — K bytes of metadata — and the rewrite itself runs
  * distributed at scan speed.  Per-row this is one flat pass with
  * pointer-equality-first UTF8String compares; the HOF equivalent
  * (aggregate() with a struct accumulator) pays an interpreted lambda
  * per token per round — the §4b anti-pattern, corpus × rounds times.
  */
case class BpeMergePair(child: Expression, first: String, second: String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val a = UTF8String.fromString(first)
  @transient private lazy val b = UTF8String.fromString(second)
  @transient private lazy val merged = UTF8String.fromString(s"$first $second")

  /** Per-row entry point shared by eval and generated code. */
  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && toks.getUTF8String(i).equals(a) &&
          toks.getUTF8String(i + 1).equals(b)) {
        out.add(merged)
        i += 2
      } else {
        out.add(toks.getUTF8String(i))
        i += 1
      }
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size)))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMergePair", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergePair =
    copy(child = newChild)
}

object BpeMergePair {
  def apply(toks: Column, first: String, second: String): Column =
    GraftBridge.column(
      BpeMergePair(GraftBridge.expression(toks), first, second))
}
