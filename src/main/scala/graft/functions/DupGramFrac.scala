package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.sql.{Column, GraftBridge}

/** Duplicate-k-gram fraction of a word array: (total − distinct)/total
  * over all overlapping word k-grams, duplicates kept — the Gopher
  * repetition signal (CorpusStats.repetition).
  *
  * The HOF formulation (transform over a sequence, array_join of a
  * slice per gram, array_distinct over the gram strings) pays
  * interpreted lambda calls plus a string allocation PER GRAM — it was
  * 6.7 s of t_repetition's 9.8 s at sf0.1, ~70% of the query.  This
  * flat loop hashes each word once and each gram is a k-fold mix of
  * word hashes into a primitive hash set — no strings materialize.
  *
  * Gram identity is the k-TUPLE of words (64-bit mixed), which equals
  * string-join identity because `words` never contain the separator;
  * distinct-count collisions are the usual ~2⁻⁶⁴-per-pair hash risk
  * (same class as exactJaccardVerify's 64-bit sets).  The returned
  * double is 1 − distinct/total with both operands exact integers, so
  * results are bit-identical to the string-based form the DuckDB
  * oracle computes.
  */
case class DupGramFrac(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  /** Per-row entry point shared by eval and generated code. */
  def compute(words: ArrayData): Double = {
    val n = words.numElements()
    val total = n - k + 1
    if (total <= 0) return 0.0
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) {
      wh(i) = XxHash64Function.hash(words.getUTF8String(i), StringType, 42L)
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long](total * 2)
    var distinct = 0
    i = 0
    while (i < total) {
      var h = -7046029254386353131L // golden-ratio seed
      var j = 0
      while (j < k) {
        h = java.lang.Long.rotateLeft(h, 5) * -6148914691236517205L ^ wh(i + j)
        j += 1
      }
      if (seen.add(h)) distinct += 1
      i += 1
    }
    1.0 - distinct.toDouble / total.toDouble
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dupGramFrac", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): DupGramFrac =
    copy(child = newChild)
}

object DupGramFrac {
  def apply(words: Column, k: Int): Column =
    GraftBridge.column(DupGramFrac(GraftBridge.expression(words), k))
}
