package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.{Column, GraftBridge}

/** Native MinHash(k) signature over an array<string> of WORDS.
  * Shingling happens inside the loop: each word is hashed once
  * (xxhash64) and consecutive n word-hashes are mixed into a shingle
  * hash — no shingle strings are ever materialized.  (The HOF
  * `shingles()` + per-shingle hashing formulation spent most of its
  * time in interpreted slice/array_join lambdas.)
  *
  * The HOF formulation (`aggregate(shingles, array_repeat(p,128),
  * (acc,h) -> zip_with(...))`) pays an interpreted lambda call per
  * (shingle × k) — ~32k calls per document, 123 s for 5000 docs at
  * sf0.1.  Here the whole signature is one flat primitive loop per row
  * (shingle hashed once with xxhash64, then k universal-hash
  * permutations a_i·h + b_i mod p), ~30 µs per document.
  *
  * doGenCode emits a plain method call into this flat loop, so the
  * expression participates in whole-stage codegen — CodegenFallback
  * would have knocked the WHOLE enclosing stage (scan → project)
  * back to interpreted InternalRow eval, not just this expression.
  *
  * Matches the published MinHash/LSH construction (Broder 1997);
  * a_i, b_i constants follow SURVEY §2 d_dedup_minhash.
  */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Public per-row entry point, shared by eval and generated code. */
  def compute(words: ArrayData): ArrayData =
    new GenericArrayData(MinHashSig.signature(words, n, k))

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Band hashes of the MinHash signature, computed in the same per-row
  * loop — the LSH banding key.  Emitting only the `bands` 64-bit band
  * hashes (not the k-wide signature) keeps the banding explode+join
  * shuffle at 8 bytes per (doc, band) instead of ~1 KB. */
case class MinHashBands(child: Expression, n: Int, k: Int, bands: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def compute(words: ArrayData): ArrayData = {
    val sig = MinHashSig.signature(words, n, k)
    val rows = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 1125899906842597L
      var i = 0
      while (i < rows) {
        h = h * 31L + sig(b * rows + i)
        i += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashBands", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashSig {
  private val P = 2147483647L // 2^31 - 1
  // universal-hash coefficients, shared by sig and band expressions
  private val MaxK = 1024
  private val as: Array[Long] = Array.tabulate(MaxK)(i => (i.toLong * 40503L + 1299721L) % P + 1L)
  private val bs: Array[Long] = Array.tabulate(MaxK)(i => (i.toLong * 9973L + 15485863L) % P)

  private[functions] def signature(words: ArrayData, n: Int, k: Int): Array[Long] = {
    val nw = words.numElements()
    val sig = Array.fill(k)(P)
    if (nw >= n) {
      // hash each word once
      val wh = new Array[Long](nw)
      var w = 0
      while (w < nw) {
        wh(w) = XxHash64Function.hash(words.getUTF8String(w), StringType, 42L)
        w += 1
      }
      var s = 0
      while (s <= nw - n) {
        // mix n consecutive word hashes into the shingle hash
        var m = 1125899906842597L
        var j = 0
        while (j < n) {
          m = m * 6364136223846793005L + wh(s + j)
          j += 1
        }
        val h = ((m % P) + P) % P
        var i = 0
        while (i < k) {
          val v = (h * as(i) + bs(i)) % P
          if (v < sig(i)) sig(i) = v
          i += 1
        }
        s += 1
      }
    }
    sig
  }

  def apply(words: Column, n: Int, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(words), n, k))

  def bandHashes(words: Column, n: Int, k: Int, bands: Int): Column =
    GraftBridge.column(MinHashBands(GraftBridge.expression(words), n, k, bands))
}
