package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over an xxhash64'd value —
  * the same shape as Spark's own runtime-filter machinery
  * (BloomFilterAggregate / BloomFilterMightContain, which only accept
  * scalar-subquery filters injected by the optimizer): the serialized
  * filter is a plan constant that ships with the task closure, each
  * executor deserializes it once, and the probe is a handful of word
  * reads per row — no join, no shuffle.
  *
  * Probes are side-effect-free per-row math, so stages containing this
  * expression stay inside whole-stage codegen.
  */
case class BloomContains(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  // deserialized once per executor (and once on the driver for any
  // constant folding); @transient keeps the closure at bytes-size
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  /** Per-row entry point shared by eval and generated code. */
  def contains(h: Long): Boolean = bloom.mightContainLong(h)

  override protected def nullSafeEval(input: Any): Any =
    contains(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomContains", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.contains($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

object BloomContains {
  private def serialize(bloom: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** Probe `bloom` (built over xxhash64 of the same column domain)
    * with xxhash64(value) — hashing stays a codegen'd builtin. */
  def apply(value: Column, bloom: BloomFilter): Column =
    GraftBridge.column(
      BloomContains(GraftBridge.expression(xxhash64(value)), serialize(bloom)))

  /** Probe with an ALREADY-hashed long column (e.g. GramHashes output)
    * against a bloom built over the same hash domain. */
  def ofHashed(h: Column, bloom: BloomFilter): Column =
    GraftBridge.column(
      BloomContains(GraftBridge.expression(h), serialize(bloom)))
}
