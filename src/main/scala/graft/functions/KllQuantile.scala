package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftBridge}

/** KLL quantile sketches (Karnin, Lang & Liberty 2016) as native
  * typed-imperative aggregates over the DataSketches library — the
  * GUARANTEE-LEVEL lane of the quantile story, for value domains too
  * wide or continuous to quantize into QuantileWarehouse's exact
  * histograms: a KLL sketch is a fixed-size (~KB at k = 200)
  * MERGEABLE summary whose reported quantiles carry a normalized
  * RANK-error bound (~1.3% at k = 200, two-sided w.h.p.) regardless
  * of input size or merge order — the "mergeable summaries" property
  * (Agarwal et al. 2012) that makes per-day sketch states at rest
  * answer any window's quantiles, exactly as HllWarehouse's register
  * states answer any window's distincts.
  *
  * Honesty note (why this is the WEAKEST rung of the warehouse
  * refresh-contract ladder): KLL compaction flips a random coin per
  * level, so two builds over identical data may emit different
  * sketch bytes and slightly different quantiles — refresh ==
  * rebuild holds at GUARANTEE level only (both satisfy the rank-error
  * bound; neither is bit-reproducible).  Hence no oracle (the
  * HLL/Bloom stance) and no bit-equality spec — the spec pins the
  * rank-error bound itself against exact ranks.
  *
  * RETRACTION CONTRACT (the warehouse sketch lane): rebuild-only —
  * compaction randomly discards individual values, so no operation
  * can remove one value's influence from a sketch; deleting data
  * from a (day, denom) state means rebuilding that state from the
  * surviving rows.  The honest bottom rung of the retraction ladder
  * (see BalanceWarehouse's Scaladoc for the full ladder).
  *
  * `KllSketchAgg` folds raw doubles into a sketch (map-side partial
  * aggregation merges partials — the shuffle carries KB-sized states,
  * never values); `KllMergeAgg` unions serialized sketch states (the
  * window-probe side); `KllQuantileAt` reads one quantile off a
  * serialized sketch (scalar, CodegenFallback — evaluated on
  * metadata-scale probe rows only, never in a corpus scan).
  */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_kll_sketch"
}

/** Union of serialized KLL sketch states (BINARY column) — the probe
  * side: any window's sketch is the merge of its members'.
  *
  * The k parameter is a CONTRACT, not just a buffer size: merging a
  * stored sketch built at a smaller k would silently degrade the
  * merged sketch's rank-error bound to the smaller k's while this
  * aggregate still advertises k's — so `update` asserts every
  * heapified input was built at exactly the declared k and fails
  * loudly on mismatch (KllQuantileSpec drives it). */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val sk = KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
      require(sk.getK == k,
        s"graft_kll_merge(k=$k) fed a sketch built at k=${sk.getK}: the merged " +
          "rank-error bound would silently drop to min(k) over inputs — rebuild " +
          "the stored sketches or declare the smaller k explicitly")
      buf.merge(sk)
    }
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_kll_merge"
}

/** Scalar read of one quantile (normalized rank in [0,1]) off a
  * serialized sketch.  CodegenFallback is deliberate: this evaluates
  * on probe OUTPUT rows (denoms × windows — metadata scale), never
  * inside a corpus scan, so interpreted eval costs nothing while a
  * doGenCode would drag sketch heapify into generated code. */
case class KllQuantileAt(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(sk: Any, rank: Any): Any = {
    val s = KllDoublesSketch.heapify(Memory.wrap(sk.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null else s.getQuantile(rank.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantileAt =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_kll_quantile"
}

object KllFunctions {
  /** Coerce any numeric input to DOUBLE at construction — the
    * analyzer can't be asked (AbstractDataType is private[sql]), and
    * a raw asInstanceOf would otherwise CCE mid-job on an INT or
    * DECIMAL argument (a review finding). */
  private[graft] def asDouble(e: Expression): Expression =
    Cast(e, DoubleType)

  /** Aggregate a double column into a serialized KLL sketch. */
  def kllSketch(c: Column, k: Int = 200): Column =
    GraftBridge.column(
      KllSketchAgg(asDouble(GraftBridge.expression(c)), k).toAggregateExpression())

  /** Union a column of serialized KLL sketches. */
  def kllMerge(c: Column, k: Int = 200): Column =
    GraftBridge.column(
      KllMergeAgg(GraftBridge.expression(c), k).toAggregateExpression())

  /** One quantile (normalized rank) off a serialized sketch. */
  def kllQuantile(sk: Column, rank: Column): Column =
    GraftBridge.column(
      KllQuantileAt(GraftBridge.expression(sk), asDouble(GraftBridge.expression(rank))))
}
