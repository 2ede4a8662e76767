package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Exact.{roundx, sumx}
import graft.functions.TextFunctions.words
import graft.sources.Tables

/** Lexical retrieval over the `documents` table — the OTHER leg of a
  * retrieval stack (the vector leg is the Knn family), and the fusion
  * of the two.  A training-data pipeline needs lexical scoring for
  * benchmark decontamination sweeps ("find training docs wording-close
  * to this eval item" — embeddings miss verbatim-but-rephrased-context
  * overlaps, BM25 misses paraphrase; production sweeps run both) and
  * for more-like-this corpus audits.
  *
  * BM25 (Robertson & Spärck Jones probabilistic relevance framework;
  * Okapi k1/b form, literature defaults k1=1.2, b=0.75):
  *
  *   score(q,d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
  *   idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))
  *
  * Spark shape — the inverted-index layout, not a doc×doc loop:
  *  - ONE tokenize+explode pass builds (term, doc_id, tf); df rides a
  *    term-keyed aggregate over the SAME shuffle key, so the posting
  *    join (tf ⋈ df ON term) is co-partitioned — no extra exchange.
  *    At 100 TB this table IS the index at rest (bucketed by term,
  *    exactly the IvfWarehouse/LshWarehouse pattern for text).
  *  - the query side is |Q| docs' term sets — a broadcast relation;
  *    candidates are posting-list hits only (docs sharing ≥1 term),
  *    never the full corpus per query.
  *  - per-(query, doc) scores sum through the Exact DECIMAL route
  *    (order-independent), and per-query top-k is the rank window
  *    Spark rewrites to WindowGroupLimit partial heaps.
  *  - corpus stats (N, Σ|d|) are TWO driver scalars — metadata, the
  *    Kmeans-history pattern.
  *
  * Engine-exactness (why this is oracle-able): every input to the
  * float math is integer-derived (tf, df, N, |d|), every *, /, +
  * is IEEE-correctly-rounded and therefore bit-identical across
  * engines, ln is the one ≤1-ulp-licensed op and feeds a term that is
  * 9-dp rounded then DECIMAL(30,6)-quantized before summing — a 1-ulp
  * input wobble (~1e-16 relative) cannot move a 6-dp quantization
  * except within ~1e-10 of a boundary, which transcendental ln outputs
  * don't sit on (they're never terminating decimals).  Ordering and
  * the top-k cut compare the ROUNDED score with doc_id tiebreak — the
  * rangeSearch tie-stability discipline.
  *
  * Hot-term note: stopword-class terms (df ≈ N) contribute idf ≈ 0 but
  * dominate posting-list volume; at 100 TB the index prunes df > cap
  * terms at WRITE time (the d_dedup_ngram hot-shingle cap) — kept
  * exact here so the oracle pairing is unconditional at test SF.
  */
object Bm25 {

  private[similarity] val K1 = 1.2
  private[similarity] val B = 0.75
  // k1+1 and 1−b as decimal LITERALS, defined ONCE for both the inline
  // leg and Bm25Warehouse.probe (computing 1.2+1.0 in Scala lands
  // within 0.5 ulp of a rounding tie against DuckDB's parse of "2.2" —
  // literal parity is the only safe route for non-representable
  // constants, and a single definition is the only safe route against
  // build/probe drift if k1/b ever change)
  private[similarity] val K1Plus1 = 2.2
  private[similarity] val OneMinusB = 0.25
  require(math.abs(K1Plus1 - (K1 + 1.0)) < 1e-12 &&
    math.abs(OneMinusB - (1.0 - B)) < 1e-12,
    "BM25 derived literals out of sync with k1/b")
  private val RrfK = 60L // Cormack et al. 2009 reciprocal-rank-fusion constant

  /** Top-`k` BM25 matches per query doc (query side = the term sets of
    * doc_id < nQueries; self excluded — the more-like-this shape). */
  def bm25(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 10): DataFrame = {
    val t = Tables(spark, dir)
    // tokenize ONCE (optimization r15): the token arrays feed lens,
    // tf, the query side and the stats scalars — un-pinned, the
    // documents scan + words() ran once per consumer
    val toks = t.documents.select(col("doc_id"), words(col("text")).as("toks"))
      .localCheckpoint()
    val lens = toks.select(col("doc_id"),
      size(col("toks")).cast("long").as("len"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // the posting table with stats attached — at rest this IS the
    // index layout; df is vocabulary-bounded (AQE broadcasts it at
    // test SF; at 100 TB it sort-merges on the term key the tf
    // aggregate already shuffled on)
    val index = tf.join(df, Seq("term")).join(lens, Seq("doc_id"))
    // corpus size and total token count ride the plan as a broadcast
    // 1-row relation (the Bm25Warehouse.probe shape, optimization r15)
    // instead of an eager head() job per run — value-identical math
    val stats = broadcast(lens.agg(count(lit(1)).as("__n"),
      sum(col("len")).as("__sl")))
    val avgdl = col("__sl").cast("double") / col("__n").cast("double")
    // query side needs ONLY (query_id, term) — built from tf, not the
    // stats-joined index, so the plan doesn't re-run the df/len joins
    // under the pushed doc_id < nQueries filter (seen in explain)
    val q = tf.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("term"))
    // expression tree mirrored token-for-token in the oracle SQL; the
    // k1+1 and 1−b constants are the shared K1Plus1/OneMinusB literals
    // (see their definition for the ulp story)
    val idf = log(((col("__n") - col("df")).cast("double") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val term = idf * ((col("tf") * lit(K1Plus1)) /
      (col("tf") + lit(K1) * (lit(OneMinusB) + lit(B) * (col("len") / avgdl))))
    val byQ = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25").desc, col("doc_id"))
    index.join(broadcast(q),
        index("term") === q("term") && col("doc_id") =!= col("query_id"))
      .crossJoin(stats)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sumx(roundx(term, 9)).as("score"))
      .withColumn("bm25", roundx(col("score"), 4))
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("bm25"),
        col("rnk").cast("long").as("rnk"))
  }

  /** HYBRID retrieval: reciprocal-rank fusion (RRF, Cormack et al.
    * 2009) of the lexical leg (bm25) and the vector leg (Knn.knnBatch
    * over the parallel embeddings table — vec_id ≡ doc_id in this
    * corpus), rrf(q,d) = Σ_legs 1/(60 + rank_leg(q,d)).  Rank fusion
    * deliberately ignores score scales, so the two legs need no
    * calibration — which is why RRF is the production default for
    * lexical+vector stacks.
    *
    * Spark shape: each leg is already a |Q|·k relation (top-k per
    * query), so fusion is a UNION of two tiny frames + one
    * (query, doc) aggregate + the top-k window — the legs' corpus
    * scans dominate; fusion itself is metadata-scale.  All-rational
    * arithmetic (1/(60+rnk)) through the DECIMAL sum route:
    * engine-exact, no ln anywhere. */
  def hybridRrf(spark: SparkSession, dir: String,
      nQueries: Int = 10, k: Int = 10): DataFrame = {
    val lex = bm25(spark, dir, nQueries, k)
      .select(col("query_id"), col("doc_id"), col("rnk"))
    val vec = Knn.knnBatch(spark, dir, nQueries, k)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rnk"))
    val byQ = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    lex.unionAll(vec)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sumx(roundx(lit(1.0) / (lit(RrfK) + col("rnk")), 9)).as("score"),
        count(lit(1)).as("n_legs"))
      .withColumn("rrf", roundx(col("score"), 6))
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("doc_id"), col("rrf"),
        col("n_legs"), col("rnk").cast("long").as("rnk"))
  }
}
