package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.SparkSession

/** Native codegen'd dot product over two array<double> columns.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) is CodegenFallback —
  * every element goes through interpreted lambda evaluation, which is
  * ~100× slower and breaks whole-stage codegen for the surrounding
  * plan.  Pairwise similarity over embeddings is the hottest loop in
  * the dedup/KNN operators, so it gets a real Catalyst Expression:
  * doGenCode emits a tight primitive double loop (fused multiply-add
  * shape, no boxing), keeping the 100 TB scan inside WholeStageCodegen.
  *
  * Semantics: sequential left-to-right summation — bit-identical to
  * the HOF fold and to DuckDB's list_dot_product/list_cosine_similarity
  * over DOUBLE[], which the oracle relies on.  Null if either side is
  * null; mismatched lengths dot the common prefix (inputs here are
  * fixed-width embeddings).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  private val name = "graft_dot"

  /** Register graft_dot in the session's function registry (idempotent)
    * so query code can use it via expr("graft_dot(a, b)"). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[DotProduct].getName, name),
        (children: Seq[Expression]) => DotProduct(children.head, children(1)))
    }
  }
}
