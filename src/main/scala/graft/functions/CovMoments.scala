package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

/** Per-row covariance MOMENT contributions of an embedding vector, as
  * one array<struct<i:int, j:int, p:long>> — the native form of
  * Pca.moments' Generate input: the d·(d+1)/2 upper-triangle products
  * of the 1e-6-quantized elements, the d dimension sums as j = −1
  * sentinels, and the (−1, −1, 1) count row (2 145 entries at d = 64).
  *
  * The HOF form (nested transform lambdas building the same structs)
  * is interpreted — ~2 080 lambda dispatches + boxed struct
  * allocations per ROW put s_embed_cov at 4 s for 5 000 vectors
  * (measured r7 bench), which is the per-(element×k) hot path the
  * native-expression rule exists for (the t_repetition lesson).  Here
  * the vector quantizes once into a primitive long array and the
  * triangle fills in one tight loop.
  *
  * Quantization is floor(x·1e6 + 0.5) on the float→double-widened
  * value — bit-identical to the HOF form and to the DuckDB oracle
  * (PcaSpec's naive-mirror test pins it).
  */
case class CovMoments(child: Expression, dims: Int) extends UnaryExpression {

  // lazy: the child is an unresolved attribute at construction time
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"CovMoments needs array<float|double>, got $t")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("p", LongType, nullable = false))), containsNull = false)

  /** Per-row entry point shared by eval and generated code. */
  def compute(arr: ArrayData): ArrayData = {
    require(arr.numElements() == dims,
      s"CovMoments(dims=$dims) got a ${arr.numElements()}-element vector")
    val q = new Array[Long](dims)
    var k = 0
    while (k < dims) {
      val x = if (isFloat) arr.getFloat(k).toDouble else arr.getDouble(k)
      q(k) = math.floor(x * 1e6 + 0.5).toLong
      k += 1
    }
    val out = new Array[Any](dims * (dims + 1) / 2 + dims + 1)
    var n = 0
    var i = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        out(n) = new GenericInternalRow(Array[Any](i, j, q(i) * q(j)))
        n += 1
        j += 1
      }
      i += 1
    }
    i = 0
    while (i < dims) {
      out(n) = new GenericInternalRow(Array[Any](i, -1, q(i)))
      n += 1
      i += 1
    }
    out(n) = new GenericInternalRow(Array[Any](-1, -1, 1L))
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("covMoments", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CovMoments =
    copy(child = newChild)
}
