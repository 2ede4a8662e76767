package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.SparkSession

/** Native codegen'd SQUARED L2 distance over two array<double>
  * columns — the stage-1 ranking key of the PCA projection index
  * (PcaWarehouse.annProbe / annProbeBatch).
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(p, q, (x,y) => (x-y)*(x-y)), 0d, _+_)`) is
  * CodegenFallback: every element rides interpreted lambda evaluation
  * and the surrounding scan falls out of whole-stage codegen.  The
  * projection scan is the lane's one corpus-scale stage — at serving
  * load it evaluates per (standing row × query), exactly the
  * per-(element×k) hot path the DotProduct precedent moved native —
  * so the distance gets the same treatment: a tight primitive double
  * loop in doGenCode, no boxing, WholeStageCodegen preserved.
  *
  * Semantics: sequential left-to-right summation of (x−y)², the same
  * operations in the same order as the HOF fold — bit-identical
  * results (PcaWarehouseSpec pins equality against the HOF
  * expression).  Null if either side is null; mismatched lengths fold
  * the common prefix (inputs are fixed-width projections).
  */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  private val name = "graft_sqdist"

  /** Register graft_sqdist in the session's function registry
    * (idempotent) so query code can use it via expr. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[SqDist].getName, name),
        (children: Seq[Expression]) => SqDist(children.head, children(1)))
    }
  }
}
