package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.unsafe.types.UTF8String

/** Full BPE ENCODING of a token array: the trained merge list applied
  * in rank order (Sennrich et al. 2016 — apply merge 1 everywhere,
  * then merge 2 on the result, …), each rank greedily left to right
  * without overlap, i.e. semantically identical to chaining
  * `BpeMergePair` once per rank.  This is the expression a tokenizer
  * APPLICATION pass runs over the whole corpus after training picked
  * the merges (t_bpe_merges) — one scan-speed projection with the
  * merge table riding the plan as a constant (the BloomContains /
  * BpeMergePair pattern).
  *
  * EXECUTION is the production tokenizer shape, not the R-sweep
  * (VERDICT-r13 ask #3: the sweep is O(len · R) per row — scan-speed
  * at the registered R = 8, the known-naive BPE apply at a production
  * R ≈ 30–50k): merges are indexed in a pair → rank map and applied
  * GREEDILY BY BEST RANK over a linked list of positions with a
  * lazy-deletion binary heap — each merge costs O(log len) heap work
  * plus O(1) hash lookups for the two new adjacencies, so a row costs
  * O(len · log len) INDEPENDENT OF R (plus one O(R) map build per
  * plan, amortized over every row).
  *
  * Greedy-by-rank equals the rank-order sweep whenever the merge list
  * is TRAINING-ORDERED — every merge's input tokens exist before it
  * (base tokens or outputs of strictly earlier merges), which is what
  * any real BPE trainer emits (CorpusStats.trainMerges does), because
  * then merging rank r can only CREATE pairs of rank > r: a created
  * pair has the rank-r output as an input, so its merge must be
  * later.  Hence greedy consumes ranks in non-decreasing order and,
  * within a rank, leftmost-first — exactly the sweep's pass.  The
  * property is VALIDATED at construction (driver-side, O(R)); a list
  * that violates it — only hand-built lists can — falls back to the
  * literal R-sweep, so the documented semantics holds for every
  * input.  BpeSpec pins greedy == sweep across the suite corpus and
  * on random token arrays (ExpressionPropertySpec). */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
    forceSweep: Boolean = false) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val as: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val bs: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(m._2)).toArray
  @transient private lazy val ms: Array[UTF8String] =
    merges.map(m => UTF8String.fromString(s"${m._1} ${m._2}")).toArray

  /** pair → lowest rank, as a two-level map (left → right → rank):
    * no per-lookup key allocation on the hot path.  A duplicate pair
    * keeps its FIRST rank — in the sweep the second occurrence can
    * never fire (the first pass removed every adjacency and merging
    * other pairs cannot re-create one: neighbors keep their identity). */
  @transient private lazy val rankOf
      : java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Integer]] = {
    val m = new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Integer]]()
    var r = 0
    while (r < as.length) {
      val inner = m.computeIfAbsent(as(r), _ => new java.util.HashMap[UTF8String, Integer]())
      if (!inner.containsKey(bs(r))) inner.put(bs(r), Integer.valueOf(r))
      r += 1
    }
    m
  }

  /** Is the list training-ordered (see class Scaladoc)?  Sufficient
    * check: no merge takes as input a token string that some merge of
    * EQUAL-OR-LATER rank outputs (latest producer wins, so colliding
    * output strings stay safe).  O(R) driver-side, once per plan. */
  @transient private[graft] lazy val trainingOrdered: Boolean = {
    val lastProducer = new java.util.HashMap[UTF8String, Integer]()
    var r = 0
    while (r < ms.length) { lastProducer.put(ms(r), Integer.valueOf(r)); r += 1 }
    var ok = true
    r = 0
    while (ok && r < as.length) {
      val pa = lastProducer.get(as(r)); val pb = lastProducer.get(bs(r))
      if ((pa != null && pa.intValue() >= r) || (pb != null && pb.intValue() >= r))
        ok = false
      r += 1
    }
    ok
  }

  private def lookup(a: UTF8String, b: UTF8String): Int = {
    val inner = rankOf.get(a)
    if (inner == null) -1
    else {
      val r = inner.get(b)
      if (r == null) -1 else r.intValue()
    }
  }

  /** Per-row entry point shared by eval and generated code.
    * `forceSweep` exists for the ScaleCheck complexity-class
    * measurement (greedy vs literal sweep at large R on the same
    * plan) — production callers never set it. */
  def compute(toks: ArrayData): ArrayData =
    if (trainingOrdered && !forceSweep) computeGreedy(toks) else computeSweep(toks)

  /** The production apply: linked list over positions + lazy-deletion
    * min-heap of (rank, leftPos) keys packed into one long.  Entries
    * are validated on pop (still adjacent, pair still carries that
    * rank) — stale ones drop; every live pair is in the heap because
    * every creation pushes.  Ties break on leftPos, and positions
    * preserve original order, so within a rank merging is
    * leftmost-first. */
  private def computeGreedy(toks: ArrayData): ArrayData = {
    val n0 = toks.numElements()
    if (n0 < 2) {
      val out = new Array[UTF8String](n0)
      var i = 0
      while (i < n0) { out(i) = toks.getUTF8String(i); i += 1 }
      return new GenericArrayData(out)
    }
    val tok = new Array[UTF8String](n0)
    val nxt = new Array[Int](n0)
    val prv = new Array[Int](n0)
    var i = 0
    while (i < n0) {
      tok(i) = toks.getUTF8String(i)
      nxt(i) = if (i + 1 < n0) i + 1 else -1
      prv(i) = i - 1
      i += 1
    }
    // binary min-heap of (rank << 32 | leftPos) — both non-negative
    var heap = new Array[Long](math.max(16, n0))
    var hn = 0
    def push(rank: Int, pos: Int): Unit = {
      if (hn == heap.length) heap = java.util.Arrays.copyOf(heap, hn * 2)
      var c = hn
      heap(c) = (rank.toLong << 32) | pos.toLong
      hn += 1
      while (c > 0 && heap((c - 1) / 2) > heap(c)) {
        val p = (c - 1) / 2
        val t = heap(p); heap(p) = heap(c); heap(c) = t
        c = p
      }
    }
    def pop(): Long = {
      val top = heap(0)
      hn -= 1
      heap(0) = heap(hn)
      var c = 0
      var go = true
      while (go) {
        val l = 2 * c + 1; val r = l + 1
        var s = c
        if (l < hn && heap(l) < heap(s)) s = l
        if (r < hn && heap(r) < heap(s)) s = r
        if (s == c) go = false
        else { val t = heap(s); heap(s) = heap(c); heap(c) = t; c = s }
      }
      top
    }
    i = 0
    while (i + 1 < n0) {
      val r = lookup(tok(i), tok(i + 1))
      if (r >= 0) push(r, i)
      i += 1
    }
    var alive = n0
    while (hn > 0) {
      val key = pop()
      val rank = (key >>> 32).toInt
      val pos = (key & 0xffffffffL).toInt
      val j = nxt(pos)
      // lazy deletion: the entry is live iff pos survives, still has a
      // right neighbor, and the CURRENT pair still carries this rank
      if (tok(pos) != null && j != -1 && lookup(tok(pos), tok(j)) == rank) {
        tok(pos) = ms(rank)
        val jn = nxt(j)
        nxt(pos) = jn
        if (jn != -1) prv(jn) = pos
        tok(j) = null
        alive -= 1
        val p = prv(pos)
        if (p != -1) {
          val rp = lookup(tok(p), tok(pos))
          if (rp >= 0) push(rp, p)
        }
        if (jn != -1) {
          val rq = lookup(tok(pos), tok(jn))
          if (rq >= 0) push(rq, pos)
        }
      }
    }
    val out = new Array[UTF8String](alive)
    var w = 0
    i = 0
    while (i != -1) {
      out(w) = tok(i); w += 1
      i = nxt(i)
    }
    new GenericArrayData(out)
  }

  /** The literal Sennrich R-sweep — rank 1 everywhere, then rank 2 on
    * the result, … — O(len · R) per row.  Kept as (a) the DEFINING
    * semantics BpeSpec cross-validates the greedy path against, and
    * (b) the fallback for hand-built merge lists that are not
    * training-ordered (where greedy-by-rank is not equivalent). */
  private[graft] def computeSweep(toks: ArrayData): ArrayData = {
    val cur = new Array[UTF8String](toks.numElements())
    var n = cur.length
    var i = 0
    while (i < n) { cur(i) = toks.getUTF8String(i); i += 1 }
    var r = 0
    while (r < as.length) {
      val a = as(r); val b = bs(r); val m = ms(r)
      var w = 0 // write pointer: merge in place, the array only shrinks
      i = 0
      while (i < n) {
        if (i + 1 < n && cur(i).equals(a) && cur(i + 1).equals(b)) {
          cur(w) = m; i += 2
        } else {
          cur(w) = cur(i); i += 1
        }
        w += 1
      }
      n = w
      r += 1
    }
    val out = new Array[UTF8String](n)
    System.arraycopy(cur, 0, out, 0, n)
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  def apply(toks: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeEncode(GraftBridge.expression(toks), merges))

  /** ScaleCheck-only: the same projection pinned to the R-sweep. */
  private[graft] def sweep(toks: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(
      BpeEncode(GraftBridge.expression(toks), merges, forceSweep = true))
}
