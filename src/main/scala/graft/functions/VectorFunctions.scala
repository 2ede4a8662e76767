package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `array<float>` columns.
  *
  * All math is done through higher-order functions in double precision
  * (cast once, then zip_with/aggregate) — codegen-friendly, no UDF, and
  * bit-identical to a sequential left-fold so the DuckDB oracle (which
  * also folds sequentially over DOUBLE[]) matches to full precision.
  */
object VectorFunctions {
  import org.apache.spark.sql.GraftBridge

  /** array<float> → array<double> (exact widening).  Native codegen'd
    * (ToDoubleArr — optimization r15): the transform-HOF form was
    * CodegenFallback, one interpreted lambda per element on every
    * embedding scan in the engine.  Element-for-element identical
    * (float→double widening is exact, nulls stay null;
    * ExpressionPropertySpec pins bit-equality). */
  def toDouble(v: Column): Column =
    GraftBridge.column(ToDoubleArr(GraftBridge.expression(v)))

  /** x/|x| per element, |x| summed in DotProduct's sequential order —
    * native codegen'd (NormalizeArr, optimization r15).  Replaces the
    * checkpoint-then-transform normalize shape: the HOF divide was
    * interpreted per element, and the checkpointed `nrm` leaf existed
    * only to keep CollapseProject from re-inlining the norm per
    * element.  Bit-identical to transform(v, _ / sqrt(dot(v, v)))
    * (ExpressionPropertySpec). */
  def normalize(v: Column): Column =
    GraftBridge.column(NormalizeArr(GraftBridge.expression(v)))

  /** Native codegen'd dot product (see graft.functions.DotProduct) —
    * the only per-PAIR math in similarity joins, so it must stay inside
    * whole-stage codegen. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Squared L2 distance of two double arrays — native codegen'd
    * (SqDist); bit-identical to the HOF zip_with/aggregate fold. */
  def sqdist(a: Column, b: Column): Column =
    GraftBridge.column(SqDist(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** |A ∩ B| over two SORTED distinct array<long> columns — native
    * linear merge (SortedIntersectCount, optimization r15); equals
    * size(array_intersect(a, b)) on such inputs without the per-pair
    * hash set + intersection-array allocation. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Cosine similarity of two double arrays.  Prefer precomputing
    * norms per row before a pairwise join (norm is per-ROW math). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Per-row gradient term vector roundx(err·x_j, 9) (GradTermsArr —
    * optimization r16): the logreg trainers' no-explode kernel; see
    * GradSum.scala's bit-exactness contract. */
  def gradTerms(vn: Column, err: Column): Column =
    GraftBridge.column(GradTermsArr(
      GraftBridge.expression(vn), GraftBridge.expression(err)))

  /** Elementwise Exact.sumx over array<double> rows (SumxArrAgg):
    * slot j == sumx of the rows' j-th elements, bit-for-bit. */
  def sumxArr(c: Column): Column =
    GraftBridge.column(SumxArrAgg(GraftBridge.expression(c))
      .toAggregateExpression())

  /** Deterministic pseudo-random hyperplane weights in [-1, 1), derived
    * from md5 of "plane<p>:<dim>".  Computed once driver-side (they are
    * constants) and shipped as array literals — zero per-row hashing. */
  def planeWeights(plane: Int, dims: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dims).map { d =>
      val hex = md.digest(s"plane$plane:$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      (h % 20001L - 10000L).toDouble / 10000.0
    }
  }

  /** nPlanes-bit random-hyperplane signature of an embedding (the
    * classic cosine-LSH sketch): bit p = [dot(v, plane_p) > 0].
    * Single-long form — nPlanes must fit one word; bits combine with
    * OR (a `+` reduce trips the ANSI overflow check once bit 63 is
    * involved, and `1L << p` silently wraps past 64). */
  def hyperplaneSignature(v: Column, nPlanes: Int, dims: Int = 64): Column = {
    require(nPlanes <= 64, s"single-long signature holds at most 64 bits, got $nPlanes" +
      " — use hyperplaneSignatureWords")
    val bits = (0 until nPlanes).map { p =>
      val w = typedLit(planeWeights(p, dims)).cast("array<double>")
      when(dot(v, w) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** Wide signature as an array of 64-bit words (word w packs planes
    * [64w, 64w+63]) — the production cosine-LSH parameterizations
    * (e.g. 16 bands × 8 bits = 128 planes) exceed one long.  Native
    * single-node expression (see HyperplaneSigWords): safe to
    * reference repeatedly without CollapseProject re-inlining an
    * nPlanes-dot tree per reference. */
  def hyperplaneSignatureWords(v: Column, nPlanes: Int, dims: Int = 64): Column =
    GraftBridge.column(HyperplaneSigWords(GraftBridge.expression(v), nPlanes, dims))

  /** The `bands` LSH band keys of a word-array signature, as one array
    * column (posexplode it for banded rows).  Unsigned-shift mask so
    * full-word bands don't wrap (the WideBandSpec lesson); bands must
    * not straddle words.  ONE definition shared by the inline range-
    * search plan and the LshWarehouse layout, so a probe computed here
    * always agrees with keys at rest. */
  def bandKeys(sig: Column, bitsPerBand: Int, bands: Int): Column = {
    require(bitsPerBand >= 1 && bitsPerBand <= 64 && 64 % bitsPerBand == 0,
      s"bitsPerBand=$bitsPerBand must divide the 64-bit signature words")
    // the last band reads word ((bands-1)·bitsPerBand) div 64; an
    // undersized signature would make element_at return NULL band keys
    // in non-ANSI mode and SILENTLY drop candidates — fail loudly
    // instead (one size() compare per row; negligible next to the
    // nBits dot products that built the signature)
    val wordsNeeded = ((bands * bitsPerBand) + 63) / 64
    val guard = assert_true(size(sig) >= lit(wordsNeeded),
      lit(s"bandKeys: signature shorter than $wordsNeeded words for " +
        s"bands=$bands x bitsPerBand=$bitsPerBand — sign with nBits >= ${bands * bitsPerBand}"))
    val mask = -1L >>> (64 - bitsPerBand)
    val keys = array((0 until bands).map(b =>
      shiftrightunsigned(element_at(sig, b * bitsPerBand / 64 + 1),
        (b * bitsPerBand) % 64).bitwiseAND(lit(mask))): _*)
    when(guard.isNull, keys)
  }
}
