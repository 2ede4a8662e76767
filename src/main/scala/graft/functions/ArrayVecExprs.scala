package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd per-ROW array math (optimization r15, guide §4 —
  * eliminate non-codegen expressions in the hot path).
  *
  * `VectorFunctions.toDouble` (`transform(v, _.cast("double"))`) and
  * the normalize shape (`transform(v, x => x / col("nrm"))`) are
  * higher-order functions — CodegenFallback, one interpreted lambda
  * call per ELEMENT, and they break whole-stage codegen for the
  * surrounding scan.  Both sit on every embedding read in the engine
  * (brute/batch KNN, IVF/LSH/PQ/PCA builds and probes, the recall
  * monitors, k-means/logreg prep), i.e. on the corpus-scale scans.
  * The DotProduct/SqDist precedent applies: real Catalyst expressions
  * with tight primitive loops.
  *
  * Bit-exactness contracts (property-pinned in ExpressionPropertySpec):
  *  - ToDoubleArr == transform(v, _.cast("double")) element-for-element
  *    (float→double widening is exact; null elements stay null);
  *  - NormalizeArr(v) == transform(v, x => x / sqrt(DotProduct(v, v)))
  *    with the norm summed in the same sequential element order as
  *    DotProduct — the identical IEEE ops in the identical order.
  */
case class ToDoubleArr(child: Expression) extends UnaryExpression {

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = ArrayType(DoubleType,
    child.dataType.asInstanceOf[ArrayType].containsNull)

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isFloat = elemType == FloatType
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = a.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Double](n)
      i = 0
      while (i < n) {
        out(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) =
          if (a.isNullAt(i)) null
          else if (isFloat) a.getFloat(i).toDouble
          else a.getDouble(i)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val hasNull = ctx.freshName("hasNull")
      val prim = ctx.freshName("prim")
      val boxed = ctx.freshName("boxed")
      s"""
         |int $n = $a.numElements();
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n && !$hasNull; $i++) {
         |  $hasNull = $a.isNullAt($i);
         |}
         |if (!$hasNull) {
         |  double[] $prim = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $prim[$i] = (double) $a.$get($i);
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($prim);
         |} else {
         |  Object[] $boxed = new Object[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $boxed[$i] = $a.isNullAt($i) ? null
         |      : (Object) (double) $a.$get($i);
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ToDoubleArr =
    copy(child = newChild)
}

/** x_i / sqrt(Σ x_j²) per element, the Σ in DotProduct's sequential
  * order — one pass, no checkpointed `nrm` leaf column needed (the
  * old shape needed a localCheckpoint per call purely so
  * CollapseProject would not re-inline the norm per element).  Null
  * elements read as 0.0 into the norm (UnsafeArrayData.getDouble
  * semantics, matching what DotProduct(v, v) computed on such rows)
  * and stay null in the output (the transform-lambda semantics).
  * Zero-norm boundary: IEEE x/0 (NaN per slot) — the old HOF divide
  * THREW under ANSI there; no engine input carries a zero vector
  * (ExpressionPropertySpec pins the boundary + the equivalence). */
case class NormalizeArr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType,
    child.dataType.asInstanceOf[ArrayType].containsNull)

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var hasNull = false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) hasNull = true
      else {
        val x = a.getDouble(i)
        acc += x * x
      }
      i += 1
    }
    val nrm = math.sqrt(acc)
    if (!hasNull) {
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = a.getDouble(i) / nrm; i += 1 }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) = if (a.isNullAt(i)) null else a.getDouble(i) / nrm
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nrm = ctx.freshName("nrm")
      val hasNull = ctx.freshName("hasNull")
      val x = ctx.freshName("x")
      val prim = ctx.freshName("prim")
      val boxed = ctx.freshName("boxed")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $hasNull = true; }
         |  else {
         |    double $x = $a.getDouble($i);
         |    $acc += $x * $x;
         |  }
         |}
         |double $nrm = java.lang.Math.sqrt($acc);
         |if (!$hasNull) {
         |  double[] $prim = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $prim[$i] = $a.getDouble($i) / $nrm;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |    .UnsafeArrayData.fromPrimitiveArray($prim);
         |} else {
         |  Object[] $boxed = new Object[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $boxed[$i] = $a.isNullAt($i) ? null
         |      : (Object) ($a.getDouble($i) / $nrm);
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($boxed);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeArr =
    copy(child = newChild)
}
