package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.{Column, GraftBridge}

/** DISTINCT word-k-gram hashes of a word array, as array<long> — the
  * native form of `explode(shingles(text, k))` for consumers that
  * only need gram IDENTITY (df counts, bloom probes, overlap joins),
  * not gram text.
  *
  * The HOF shingle path builds a string per gram through interpreted
  * transform/array_join lambdas plus an O(g²) string array_distinct —
  * for 8-grams that is ~50 B of allocation per gram and was the bulk
  * of d_substring_overlap's runtime.  Here each word hashes once and
  * grams are k-fold mixes into a primitive set (the DupGramFrac
  * recipe; identical mixing so the two expressions agree on gram
  * identity).  Collisions merge two grams at ~2⁻⁶⁴ per pair — the
  * documented trade of every 64-bit-hash stage in this engine.
  */
case class GramHashes(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Per-row entry point shared by eval and generated code. */
  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    val total = n - k + 1
    if (total <= 0) return new GenericArrayData(Array.empty[Long])
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) {
      wh(i) = XxHash64Function.hash(words.getUTF8String(i), StringType, 42L)
      i += 1
    }
    if (distinct) {
      val seen = new java.util.LinkedHashSet[java.lang.Long](total * 2)
      i = 0
      while (i < total) {
        seen.add(gramAt(wh, i))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    } else {
      // positional form: out(i) = hash of the gram STARTING at word i —
      // posexplode recovers (word offset, gram identity), the input of
      // span-level excision.  Same mixing, so identities agree with the
      // distinct form gram for gram.
      val out = new Array[Long](total)
      i = 0
      while (i < total) { out(i) = gramAt(wh, i); i += 1 }
      new GenericArrayData(out)
    }
  }

  @inline private def gramAt(wh: Array[Long], i: Int): Long = {
    var h = -7046029254386353131L // golden-ratio seed (= DupGramFrac)
    var j = 0
    while (j < k) {
      h = java.lang.Long.rotateLeft(h, 5) * -6148914691236517205L ^ wh(i + j)
      j += 1
    }
    h
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramHashes", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {
  def apply(words: Column, k: Int): Column =
    GraftBridge.column(GramHashes(GraftBridge.expression(words), k))

  /** Per-position (non-distinct) gram hashes — element i is the gram
    * starting at word offset i. */
  def positional(words: Column, k: Int): Column =
    GraftBridge.column(
      GramHashes(GraftBridge.expression(words), k, distinct = false))
}
