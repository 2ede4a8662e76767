package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native wide random-hyperplane signature: all nPlanes sign bits of
  * an array<double> embedding in one flat loop, packed into 64-bit
  * words (word w holds planes [64w, 64w+63]).
  *
  * The expression-tree form (one codegen'd DotProduct per plane,
  * OR-reduced) is correct but each column REFERENCE re-inlines the
  * whole nPlanes-dot tree under CollapseProject — the cosine banding
  * stage referenced it per band and needed an eager localCheckpoint
  * as a barrier.  A single native call keeps the tree one node, so
  * plan-level reuse works without materialization, and the loop runs
  * the plane matrix from a per-executor reference object.
  *
  * Bit parity with the tree form: each plane's dot accumulates
  * sequentially ascending (the DotProduct loop), weights come from the
  * same md5-derived planeWeights, and the sign rule is `> 0` — so
  * signatures (and therefore candidates and recall) are unchanged.
  */
case class HyperplaneSigWords(child: Expression, nPlanes: Int, dims: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // deterministic pure function of (plane, dims) — rebuilt per executor
  @transient private lazy val weights: Array[Array[Double]] =
    Array.tabulate(nPlanes)(p => VectorFunctions.planeWeights(p, dims).toArray)

  /** Per-row entry point shared by eval and generated code. */
  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val vd = new Array[Double](n)
    var i = 0
    while (i < n) { vd(i) = v.getDouble(i); i += 1 }
    val out = new Array[Long]((nPlanes + 63) / 64)
    var p = 0
    while (p < nPlanes) {
      val w = weights(p)
      val m = math.min(n, w.length)
      var acc = 0.0
      var j = 0
      while (j < m) { acc += vd(j) * w(j); j += 1 }
      if (acc > 0) out(p / 64) |= 1L << (p % 64)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneSig", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigWords =
    copy(child = newChild)
}
