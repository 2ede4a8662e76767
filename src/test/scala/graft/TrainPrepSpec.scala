package graft

import org.apache.spark.sql.functions._
import graft.operators.TrainPrep

/** Invariants of the training-prep operators that the value-level
  * oracle can't express: chunk coverage/overlap, split stability for
  * duplicate content, dense per-shard ordinals. */
class TrainPrepSpec extends GraftSpec {

  test("chunks cover every word and respect the stride grid") {
    val docs = graft.sources.Tables(spark, Dir).documents
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_words"))
    val perDoc = TrainPrep.chunkDocs(spark, Dir)
      .groupBy(col("doc_id"))
      .agg(max(col("chunk_id")).as("last_chunk"),
        max(col("chunk_id") * 48 + col("n_tokens")).as("max_covered"),
        min(col("n_tokens")).as("min_tokens"))
      .join(docs, Seq("doc_id"))
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val (last, covered, n) =
        (r.getAs[Long]("last_chunk"), r.getAs[Long]("max_covered"), r.getAs[Int]("n_words"))
      assert(covered == n, s"doc ${r.get(0)}: covered $covered of $n words")
      // no chunk past the end: the grid point after last must start beyond n
      assert(last * 48 < n || last == 0, s"doc ${r.get(0)}: empty trailing chunk")
      assert(r.getAs[Long]("min_tokens") > 0)
    }
  }

  test("identical texts get identical split and shard (leakage safety)") {
    val t = graft.sources.Tables(spark, Dir).documents
      .select(col("doc_id"), md5(col("text")).as("h"))
    val splits = TrainPrep.sampleSplit(spark, Dir).join(t, Seq("doc_id"))
      .groupBy(col("h")).agg(countDistinct(col("split")).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(splits == 1L, "duplicate texts assigned to different splits")
    val shards = TrainPrep.trainShards(spark, Dir).join(t, Seq("doc_id"))
      .groupBy(col("h")).agg(countDistinct(col("shard")).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(shards == 1L, "duplicate texts assigned to different shards")
  }

  test("stratified sampling downsamples only the targeted language, deterministically") {
    val s = TrainPrep.sampleStratified(spark, Dir)
    // non-targeted languages are kept in full
    val droppedOther = s.filter(col("lang") =!= "en" && col("kept") === 0).count()
    assert(droppedOther == 0, "non-en docs were dropped")
    // en is actually downsampled (rate 400/1000 — binomial tail makes
    // a zero-drop corpus astronomically unlikely)
    val en = s.filter(col("lang") === "en")
    val enKept = en.filter(col("kept") === 1).count()
    assert(enKept < en.count(), "en not downsampled at all")
    // duplicate texts share a fate: sampling and dedup commute
    val t = graft.sources.Tables(spark, Dir).documents
      .select(col("doc_id"), md5(col("text")).as("h"))
    val fates = s.join(t, Seq("doc_id")).groupBy(col("h"))
      .agg(countDistinct(col("kept")).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(fates == 1L, "duplicate texts got different sampling fates")
  }

  test("bloom decontamination matches the exact-join path (no misses; FPs bounded)") {
    val exact = TrainPrep.decontaminate(spark, Dir)
      .select(col("doc_id"), col("n_shared_grams")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = TrainPrep.bloomDecontaminate(spark, Dir)
      .select(col("doc_id"), col("n_flagged_grams")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Bloom filters have no false negatives: every exact hit is flagged
    // with at least its exact gram count
    exact.foreach { case (id, n) =>
      assert(bloom.contains(id), s"doc $id flagged by exact join but missed by bloom")
      assert(bloom(id) >= n, s"doc $id: bloom count ${bloom(id)} < exact $n")
    }
    // false positives are the operator's contract, not a defect: they
    // may ADD flagged docs (never remove), and with the fixed Bloom
    // seed the outcome is deterministic per corpus/hash-domain.  Bound
    // them instead of asserting exact equality — this corpus draws one
    // single-gram FP doc under the GramHashes domain.
    val extras = bloom.keySet -- exact.keySet
    assert(extras.size <= 2, s"too many false-positive docs: $extras")
    extras.foreach { id =>
      assert(bloom(id) <= 2, s"FP doc $id flagged with ${bloom(id)} grams — too many for chance")
    }
  }

  test("corpus funnel agrees with the registered per-signal queries") {
    val f = TrainPrep.corpusFunnel(spark, Dir).localCheckpoint()
    // keep is exactly the conjunction of its gates
    val badKeep = f.filter(col("keep") =!=
      (col("is_canonical") === 1 && col("quality_ok") === 1 &&
        col("lang_known") === 1 && col("sample_kept") === 1 &&
        col("repetitive") === 0).cast("int").cast("long")).count()
    assert(badKeep == 0)
    // gates match the standalone signal queries they were factored from
    val q = graft.operators.TextAnalysis.quality(spark, Dir)
      .select(col("doc_id"), (col("quality_score") >= 0.25).cast("int").cast("long").as("x"))
    assert(f.join(q, Seq("doc_id")).filter(col("quality_ok") =!= col("x")).count() == 0)
    val l = graft.operators.TextAnalysis.langId(spark, Dir)
      .select(col("doc_id"), (col("pred_lang") =!= "unknown").cast("int").cast("long").as("x"))
    assert(f.join(l, Seq("doc_id")).filter(col("lang_known") =!= col("x")).count() == 0)
    val s = TrainPrep.sampleStratified(spark, Dir).select(col("doc_id"), col("kept"))
    assert(f.join(s, Seq("doc_id")).filter(col("sample_kept") =!= col("kept")).count() == 0)
    // the funnel must split the corpus, not pass or drop everything
    val kept = f.filter(col("keep") === 1).count()
    assert(kept > 0 && kept < f.count())
  }

  test("packing fills each shard stream contiguously and deterministically") {
    val rows = operators.TrainPrep.packSequences(spark, Dir).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("stream_offset"),
        r.getAs[Long]("seq_id"), r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")))
    // per shard: offsets start at 0 and are gap-free (each chunk begins
    // where the previous ended), so sequences pack back to back
    val chunkTokens = operators.TrainPrep.chunkDocs(spark, Dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) -> r.getAs[Long]("n_tokens"))
      .toMap
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      val ordered = rs.sortBy(_._2)
      assert(ordered.head._2 == 0L, s"shard $shard stream must start at 0")
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2 == a._2 + chunkTokens((a._4, a._5)),
            s"gap in shard $shard stream at offset ${a._2}")
        case _ =>
      }
      // seq_id is the offset's 256-token bin
      ordered.foreach { case (_, off, seq, _, _) => assert(seq == off / 256) }
    }
    // deterministic: a second run packs identically
    val again = operators.TrainPrep.packSequences(spark, Dir).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("stream_offset"),
        r.getAs[Long]("seq_id"), r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")))
    assert(rows.toSet == again.toSet)
  }

  test("pack stats agree with a driver-side recomputation off the packing itself") {
    val stats = operators.TrainPrep.packStats(spark, Dir).collect()
      .map(r => r.getAs[Long]("shard") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_seqs"), r.getAs[Long]("n_straddlers"),
          r.getAs[Long]("fill_ppm"))).toMap
    val chunkTokens = operators.TrainPrep.chunkDocs(spark, Dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) -> r.getAs[Long]("n_tokens"))
      .toMap
    val packed = operators.TrainPrep.packSequences(spark, Dir).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("stream_offset"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")))
    val byShard = packed.groupBy(_._1)
    assert(stats.keySet == byShard.keySet)
    byShard.foreach { case (shard, rs) =>
      val toks = rs.map(r => chunkTokens((r._3, r._4)))
      val nTokens = toks.sum
      val nSeqs = (nTokens + 255) / 256
      val straddlers = rs.count { r =>
        val t = chunkTokens((r._3, r._4))
        r._2 / 256 != (r._2 + t - 1) / 256
      }
      val fill = nTokens * 1000000L / (nSeqs * 256L)
      assert(stats(shard) == ((rs.length.toLong, nTokens, nSeqs,
        straddlers.toLong, fill)),
        s"shard $shard stats diverge: ${stats(shard)}")
      // back-to-back packing wastes only the tail sequence's padding
      assert(fill > 900000L && fill <= 1000000L,
        s"shard $shard fill rate $fill out of the back-to-back band")
    }
  }

  test("fertility: per-lang aggregate of the t_tokens measures; regex >= whitespace") {
    val rows = operators.TextAnalysis.fertility(spark, Dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("ws_tokens"),
          r.getAs[Long]("re_tokens"), r.getAs[Long]("fertility_ppm"))).toMap
    val docs = operators.TextAnalysis.tokens(spark, Dir)
      .join(sources.Tables(spark, Dir).documents.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("ws_tokens"), r.getAs[Long]("re_tokens")))
    val byLang = docs.groupBy(_._1)
    assert(rows.keySet == byLang.keySet)
    byLang.foreach { case (lang, ds) =>
      val (ws, re) = (ds.map(_._2).sum, ds.map(_._3).sum)
      assert(rows(lang) == ((ds.length.toLong, ws, re, re * 1000000L / ws)),
        s"$lang fertility diverges")
      // on THIS corpus's single-spaced text every whitespace word
      // holds >= 1 token character, so the regex tokenization can
      // only refine: fertility >= 1.0 (a corpus-contract property —
      // consecutive spaces would produce empty "words"; review r12b)
      assert(rows(lang)._4 >= 1000000L, s"$lang fertility below 1.0")
    }
  }

  test("shard ordinals are dense 1..count per shard") {
    val bad = TrainPrep.trainShards(spark, Dir)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
        min(col("pos")).as("mn"), countDistinct(col("pos")).as("d"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("d") =!= col("n"))
      .count()
    assert(bad == 0)
  }

  test("domain mix realizes the target mixture without upsampling") {
    val out = TrainPrep.domainMix(spark, Dir).localCheckpoint()
    // the DETERMINISTIC contract: expected kept tokens per source
    // (keep_ppm·src_tokens/10⁶) are proportional to the target
    // weights (src0=240, others 40), exactly up to the two integer
    // floors.  The REALIZED sample adds hash-bucket binomial noise —
    // huge at sf0.001's 25 docs/source — so that part only gets a
    // robust dominance check.
    val bySrc = out.groupBy(col("source"))
      .agg(first(col("keep_ppm")).as("keep_ppm"),
        sum(col("n_tokens")).as("src_tokens"),
        sum(when(col("kept") === 1, col("n_tokens")).otherwise(0L)).as("kept_tokens"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("keep_ppm"), r.getAs[Long]("src_tokens"), r.getAs[Long]("kept_tokens"))))
      .toMap
    val expected = bySrc.map { case (s, (ppm, t, _)) => s -> ppm.toDouble * t / 1e6 }
    val expTotal = expected.values.sum
    assert(expTotal > 0)
    val weights = bySrc.keys.map(s => s -> (if (s == "src0") 240.0 else 40.0)).toMap
    val wTotal = weights.values.sum
    expected.foreach { case (s, e) =>
      val share = e / expTotal
      val target = weights(s) / wTotal
      assert(math.abs(share - target) < 2e-4,
        s"$s expected-kept share $share vs target $target (floors only)")
    }
    // realized: the 6×-boosted source must dominate every other source
    val realized = bySrc.map { case (s, (_, _, k)) => s -> k }
    assert(realized("src0") > realized.filter(_._1 != "src0").values.max,
      s"boosted src0 not dominant: $realized")
    // no source upsamples: keep_ppm <= 1e6 and the binding source
    // (largest weight per token) keeps ~everything
    assert(out.filter(col("keep_ppm") > 1000000L).count() == 0)
    // the binding source keeps ~everything (two integer floors can
    // shave single ppm off the exact 10⁶, never more than g+1)
    assert(out.filter(col("keep_ppm") >= 999000L).count() > 0,
      "some source must bind at keep-everything")
    // deterministic: same inputs, same keep set
    val again = TrainPrep.domainMix(spark, Dir)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
  }

  test("domain cap keeps at most cap docs per source via WindowGroupLimit") {
    val df = TrainPrep.domainCap(spark, Dir, cap = 20)
    // the rank<=cap filter must push partial top-cap heaps BELOW the
    // source exchange — a dominant domain never funnels all its rows
    // through one reducer
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "rank<=cap should compile to WindowGroupLimit")
    val rows = df.collect()
    val bySource = rows.groupBy(_.getString(1))
    assert(bySource.values.forall(_.length <= 20))
    assert(bySource.values.exists(_.length == 20), "some source should saturate the cap")
    // within a source, kept docs are the quality-ranked prefix: ranks
    // are dense 1..n and scores non-increasing in rank order
    bySource.values.foreach { g =>
      val sorted = g.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to g.length).toSeq)
      val scores = sorted.map(_.getDouble(3)).toSeq
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("dsir ranks raw docs sharing the target vocabulary on top") {
    // the real corpus has NO lang→token correlation (measured: en-marker
    // rates are flat across langs), so the semantic claim needs an
    // INJECTED distribution: target (en) docs speak pool A, raw docs
    // split between pool A ("looks like target") and pool B.  All
    // hashing is md5 → the test is fully deterministic.
    import spark.implicits._
    val poolA = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val poolB = Seq("omicron", "sigma", "tau", "upsilon", "phi", "chi")
    def doc(pool: Seq[String], i: Int) =
      (0 until 12).map(j => pool((i + j) % pool.size)).mkString(" ")
    val rows =
      (0L until 20L).map(i => (i, "en", doc(poolA, i.toInt))) ++       // target
      (100L until 110L).map(i => (i, "es", doc(poolA, i.toInt))) ++    // target-like raw
      (200L until 210L).map(i => (i, "de", doc(poolB, i.toInt)))       // off-target raw
    val docs = rows.toDF("doc_id", "lang", "text")
    val out = TrainPrep.dsirSampleOf(docs, topK = 20).collect()
    assert(out.length == 20)
    val (top10, bottom10) = out.partition(_.getAs[Long]("rnk") <= 10)
    assert(top10.forall(r => r.getAs[Long]("doc_id") < 200 && r.getAs[Double]("dsir") > 0),
      "pool-A raw docs should fill the top ranks with positive weight")
    assert(bottom10.forall(r => r.getAs[Long]("doc_id") >= 200 && r.getAs[Double]("dsir") < 0),
      "pool-B raw docs should rank below with negative weight")
  }

  test("leakage-safe split: no near-dup group straddles a split boundary") {
    val s = TrainPrep.leakageSafeSplit(spark, Dir)
    // the property d_sample_split cannot give: group-atomic assignment
    val straddlers = s.groupBy(col("group_id"))
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(straddlers == 0, "a near-dup group crosses train/val/test")
    // singleton groups (group_id == doc_id ∧ size 1) must get exactly
    // the split d_sample_split gives — the operator only MOVES docs
    // whose group crosses a boundary
    val singles = s.groupBy(col("group_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") === 1).select(col("group_id").as("doc_id"))
    val diverged = s.join(singles, Seq("doc_id"))
      .join(TrainPrep.sampleSplit(spark, Dir).withColumnRenamed("split", "plain"),
        Seq("doc_id"))
      .filter(col("split") =!= col("plain")).count()
    assert(diverged == 0, "a singleton group diverged from the content-hash split")
    // every doc is assigned, and all three splits are populated
    assert(s.count() == graft.sources.Tables(spark, Dir).documents.count())
    assert(s.select(col("split")).distinct().count() == 3)
  }

  test("dsir registered query: structure and determinism") {
    val out = TrainPrep.dsirSample(spark, Dir).collect()
    assert(out.length == 100)
    assert(out.map(_.getAs[Long]("rnk")).sorted.toSeq == (1L to 100L).toSeq)
    assert(out.forall(_.getAs[String]("lang") != "en"), "target docs leaked into the selection")
    // deterministic selection: the reproducibility property that makes
    // a data-selection run auditable
    val again = TrainPrep.dsirSample(spark, Dir).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("weighted sample: exponential-race keys match the driver mirror, deterministic") {
    val r = TrainPrep.sampleWeighted(spark, Dir).collect()
    assert(r.length == 64)
    assert(r.map(_.getLong(0)).distinct.length == 64)
    val keys = r.map(_.getDouble(2))
    assert(keys.sliding(2).forall(p => p(0) <= p(1)), "race keys not ascending")
    // recompute each key from the md5-52-bit uniform and the emitted
    // weight — pins the hash parse, the rational u, and the formula
    def r9(x: Double) = {
      val v = math.abs(x) * 1e9; val fl = math.floor(v)
      math.signum(x) * (if (v - fl >= 0.5) fl + 1 else fl) / 1e9
    }
    r.foreach { row =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(row.getLong(0).toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / ((1L << 52).toDouble + 1.0)
      val want = r9(-math.log(u) / row.getDouble(1))
      assert(row.getDouble(2) == want,
        s"doc ${row.getLong(0)}: key ${row.getDouble(2)} vs mirror $want")
    }
    // weights must influence the draw: winners' mean weight exceeds
    // the corpus mean (quality-weighted race on a quality-spread corpus)
    val corpusMean = graft.operators.TextAnalysis.quality(spark, Dir)
      .agg(org.apache.spark.sql.functions.avg("quality_score")).head().getDouble(0)
    val winnersMean = r.map(_.getDouble(1)).sum / r.length
    assert(winnersMean > corpusMean,
      s"winners mean $winnersMean not above corpus mean $corpusMean")
  }
}
