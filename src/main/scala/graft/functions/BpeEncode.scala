package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.unsafe.types.UTF8String

/** Full BPE ENCODING of a token array: the trained merge list applied
  * in rank order (Sennrich et al. 2016 — apply merge 1 everywhere,
  * then merge 2 on the result, …), each rank greedily left to right
  * without overlap, i.e. semantically identical to chaining
  * `BpeMergePair` once per rank.  This is the expression a tokenizer
  * APPLICATION pass runs over the whole corpus after training picked
  * the merges (t_bpe_merges) — so it must be one scan-speed
  * projection, not R of them: R chained BpeMergePair projections
  * materialize R intermediate token arrays per row (and at the
  * corpus scale the training loop's per-round localCheckpoint barrier
  * pattern would write the corpus R times); here the R passes run
  * over a thread-local in-memory array inside ONE expression.
  *
  * The merge table rides the plan as a constant (the BloomContains /
  * BpeMergePair pattern): R pairs of driver-side strings — tokenizer
  * metadata, bounded by vocabulary design (R ≈ 30–50k in production
  * BPE; per-row cost is O(len · R) worst-case and in practice each
  * later rank touches few positions). */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val as: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val bs: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._2)).toArray
  @transient private lazy val ms: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(s"${m._1} ${m._2}")).toArray

  /** Per-row entry point shared by eval and generated code. */
  def compute(toks: ArrayData): ArrayData = {
    var cur = new Array[UTF8String](toks.numElements())
    var n = cur.length
    var i = 0
    while (i < n) { cur(i) = toks.getUTF8String(i); i += 1 }
    var r = 0
    while (r < as.length) {
      val a = as(r); val b = bs(r); val m = ms(r)
      var w = 0 // write pointer: merge in place, the array only shrinks
      i = 0
      while (i < n) {
        if (i + 1 < n && cur(i).equals(a) && cur(i + 1).equals(b)) {
          cur(w) = m; i += 2
        } else {
          cur(w) = cur(i); i += 1
        }
        w += 1
      }
      n = w
      r += 1
    }
    val out = new Array[UTF8String](n)
    System.arraycopy(cur, 0, out, 0, n)
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  def apply(toks: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeEncode(GraftBridge.expression(toks), merges))
}
