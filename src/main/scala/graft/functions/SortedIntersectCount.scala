package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Native codegen'd |A ∩ B| over two SORTED array<long> columns with
  * DISTINCT elements — the exact-Jaccard verify kernel (optimization
  * r15, guide §1.2 per-task work).
  *
  * The `size(array_intersect(a, b))` form pays, per CANDIDATE PAIR, an
  * OpenHashSet build over one side, a hash probe per element of the
  * other, and the allocation of the intersection array it immediately
  * reduces to a count.  The verify stage runs this per surviving
  * candidate — 389k pairs × ~200-element shingle sets on the SimHash
  * channel at sf0.1 — so it gets the DotProduct treatment: a linear
  * merge over the two sorted arrays, no hashing, no allocation.
  *
  * Contract: both inputs sorted ascending with distinct non-null
  * elements (the exactJaccardVerify sets are array_sort'd distinct
  * GramHashes).  Equal to size(array_intersect(a, b)) on such inputs
  * (ExpressionPropertySpec pins it).  Null if either side is null.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
