package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.{Column, GraftBridge}

/** Occurrence count of the most frequent token in a word array — the
  * numerator of Gopher's top-word-fraction repetition signal (Rae et
  * al. 2021), as one flat per-row pass over a small open hash map.
  *
  * This is what lets the repetition gate run SCAN-SIDE: the previous
  * formulation exploded (doc_id, token) into a corpus-wide shuffle and
  * two aggregations just to find each doc's max token count, and
  * d_corpus_funnel then paid a join to fold the flag back in.  Per-row
  * the map is bounded by doc length; the expression is side-effect-
  * free so stages containing it stay in whole-stage codegen.  (The
  * HOF alternative — count via filter inside transform — is the
  * O(words²) §4b anti-pattern.)
  */
case class TopTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  /** Per-row entry point shared by eval and generated code. */
  def compute(words: ArrayData): Long = {
    val n = words.numElements()
    if (n == 0) return 0L
    val counts = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Int](n * 2)
    var top = 0
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      val c = counts.merge(w, 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    top.toLong
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("topTokenCount", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TopTokenCount =
    copy(child = newChild)
}

object TopTokenCount {
  def apply(words: Column): Column =
    GraftBridge.column(TopTokenCount(GraftBridge.expression(words)))
}
