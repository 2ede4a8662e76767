package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary (Misra & Gries 1982) as a native
  * typed-imperative AGGREGATE over word arrays — the approximate
  * top-token pass for a corpus too large to groupBy(token):
  * `t_vocab_topk`'s exact word-count shuffles every distinct token;
  * this shuffles at most k counters PER MAP PARTITION (partial
  * aggregation merges summaries, the "mergeable summaries" property of
  * Agarwal et al. 2012), so the corpus scan never explodes tokens into
  * a shuffle at all.
  *
  * Guarantees (hold under ANY partitioning / merge order — asserted by
  * HeavyHittersSpec against the exact counts):
  *  - every token with true frequency > n/(k+1) is in the summary;
  *  - each reported estimate is a LOWER bound, short by at most
  *    n/(k+1) (n = total token occurrences).
  * The reported set/estimates (not the guarantee) depend on merge
  * order; a fixed plan over fixed files is reproducible in practice.
  *
  * Update is the classic counter dance: increment a present token;
  * insert at 1 if a slot is free; otherwise decrement ALL counters
  * (dropping zeros) — amortized O(1) per token since each decrement
  * sweep burns k previously-paid increments.  Merge sums counts, then
  * if over k subtracts the (k+1)-th largest count from everything and
  * drops the non-positive (Agarwal et al.'s merge).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries.Summary] with UnaryLike[Expression] {

  require(k >= 1, s"graft_mg_topk: k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(MisraGries.EntryType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MisraGries.Summary =
    new MisraGries.Summary(k)

  override def update(buf: MisraGries.Summary, input: InternalRow): MisraGries.Summary = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        buf.offer(arr.getUTF8String(i))
        i += 1
      }
    }
    buf
  }

  override def merge(buf: MisraGries.Summary, other: MisraGries.Summary): MisraGries.Summary = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: MisraGries.Summary): Any = MisraGries.emit(buf)

  override def serialize(buf: MisraGries.Summary): Array[Byte] =
    MisraGries.ser(buf)
  override def deserialize(bytes: Array[Byte]): MisraGries.Summary =
    MisraGries.deser(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
  override def prettyName: String = "graft_mg_topk"
}

object MisraGries {

  val EntryType: StructType = StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("est", LongType, nullable = false)))

  /** k counters; decrement-all on a full map keeps at most k survivors. */
  final class Summary(val k: Int) {
    val counts = new java.util.HashMap[UTF8String, java.lang.Long](k * 2)

    def offer(tok: UTF8String): Unit = {
      val cur = counts.get(tok)
      if (cur != null) counts.put(tok, java.lang.Long.valueOf(cur.longValue() + 1L))
      else if (counts.size() < k)
        counts.put(tok.copy(), java.lang.Long.valueOf(1L)) // copy: input UTF8String aliases scan buffers
      else {
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.longValue() == 1L) it.remove()
          else e.setValue(java.lang.Long.valueOf(e.getValue.longValue() - 1L))
        }
      }
    }

    def mergeIn(other: Summary): Unit = {
      other.counts.forEach { (t, c) =>
        val cur = counts.get(t)
        if (cur != null)
          counts.put(t, java.lang.Long.valueOf(cur.longValue() + c.longValue()))
        else counts.put(t, c) // deserialized tokens already own their bytes
      }
      if (counts.size() > k) {
        // subtract the (k+1)-th largest count, drop the non-positive
        val vals = new Array[Long](counts.size())
        var i = 0
        val vit = counts.values().iterator()
        while (vit.hasNext) { vals(i) = vit.next().longValue(); i += 1 }
        java.util.Arrays.sort(vals)
        val d = vals(vals.length - (k + 1)) // (k+1)-th largest
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.longValue() <= d) it.remove()
          else e.setValue(java.lang.Long.valueOf(e.getValue.longValue() - d))
        }
      }
    }
  }

  /** Column entry: Misra–Gries top-k summary of `words` occurrences. */
  def apply(words: Column, k: Int): Column =
    GraftBridge.column(MisraGries(GraftBridge.expression(words), k)
      .toAggregateExpression())

  /** Deterministic emit order: estimate desc, then token asc. */
  private[functions] def emit(buf: Summary): GenericArrayData = {
    import scala.jdk.CollectionConverters._
    val entries = buf.counts.entrySet().asScala.toArray
    val sorted = entries.sortWith { (a, b) =>
      val (av, bv) = (a.getValue.longValue(), b.getValue.longValue())
      if (av != bv) av > bv else a.getKey.compareTo(b.getKey) < 0
    }
    new GenericArrayData(sorted.map(e =>
      InternalRow(e.getKey, e.getValue.longValue())): Array[Any])
  }

  private[functions] def ser(buf: Summary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counts.size())
    buf.counts.forEach { (t, c) =>
      val b = t.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  private[functions] def deser(bytes: Array[Byte], k: Int): Summary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new Summary(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      s.counts.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    s
  }
}

/** Merge of STORED Misra–Gries summaries (array<struct<token,est>>
  * rows read back from a warehouse) — the probe side of keeping MG
  * states at rest: a summary row is itself the complete aggregation
  * state (the (token, count) map), so folding stored rows through
  * Agarwal et al.'s merge yields a valid summary of the union with
  * the SAME n/(k+1) error bound — the "mergeable summaries" theorem
  * that licenses append-only refresh for this family exactly as it
  * does for HLL registers and KLL states. */
case class MisraGriesMerge(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries.Summary] with UnaryLike[Expression] {

  require(k >= 1, s"graft_mg_merge: k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(MisraGries.EntryType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MisraGries.Summary =
    new MisraGries.Summary(k)

  override def update(buf: MisraGries.Summary, input: InternalRow): MisraGries.Summary = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val tmp = new MisraGries.Summary(k)
      var i = 0
      while (i < arr.numElements()) {
        val e = arr.getStruct(i, 2)
        tmp.counts.put(e.getUTF8String(0).copy(),
          java.lang.Long.valueOf(e.getLong(1)))
        i += 1
      }
      buf.mergeIn(tmp)
    }
    buf
  }

  override def merge(buf: MisraGries.Summary, other: MisraGries.Summary): MisraGries.Summary = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: MisraGries.Summary): Any = MisraGries.emit(buf)

  override def serialize(buf: MisraGries.Summary): Array[Byte] =
    MisraGries.ser(buf)
  override def deserialize(bytes: Array[Byte]): MisraGries.Summary =
    MisraGries.deser(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesMerge =
    copy(child = newChild)
  override def prettyName: String = "graft_mg_merge"
}

object MisraGriesMerge {
  /** Column entry: merge stored summary rows. */
  def apply(summaries: Column, k: Int): Column =
    GraftBridge.column(MisraGriesMerge(GraftBridge.expression(summaries), k)
      .toAggregateExpression())
}
