package graft

import org.apache.spark.sql.functions._

/** Relational operator sanity specs on sf0.001 — cross-checked
  * invariants, not golden values (the golden check is the driver's
  * DuckDB oracle at sf0.01). */
class OperatorsSpec extends GraftSpec {

  test("every registered query runs and matches its declared shape") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, Dir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      val n = df.count()
      assert(n >= 0, s"$name failed to execute")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without query impl: $extra")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("txvol cumulative is monotone per denom and ends at the total") {
    val daily = operators.Dashboard.txVolDaily(spark, Dir)
    val cum = operators.Dashboard.txVolCumulative(spark, Dir)
    val totalByDenom = daily.groupBy("denom")
      .agg(round(sum("tx_volume"), 2).as("t")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val lastCum = cum.groupBy("denom")
      .agg(round(max("cum_volume"), 2).as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    totalByDenom.foreach { case (d, t) =>
      assert(math.abs(lastCum(d) - t) < 0.05, s"denom $d cum end $lastCum vs total $t")
    }
  }

  test("account growth total equals distinct users") {
    val users = sources.Tables(spark, Dir).events
      .select(countDistinct("user_id")).head().getLong(0)
    val lastTotal = operators.Dashboard.accountGrowth(spark, Dir)
      .agg(max("total_accounts")).head().getLong(0)
    assert(lastTotal == users)
  }

  test("registered accounts series is the lag-diff of the growth rollup, first interval dropped") {
    val growth = operators.Dashboard.accountGrowth(spark, Dir)
      .orderBy("date").collect()
    val reg = operators.Dashboard.registeredAccounts(spark, Dir)
      .orderBy("date").collect()
    assert(reg.length == growth.length - 1, "slice(1): first rollup row must be absent")
    reg.zip(growth.drop(1).zip(growth.dropRight(1))).foreach { case (r, (g, prev)) =>
      assert(r.getAs[java.sql.Date]("date") == g.getAs[java.sql.Date]("date"))
      assert(r.getAs[Long]("total_accounts") == g.getAs[Long]("total_accounts"))
      assert(r.getAs[Long]("periodic_accounts") ==
        g.getAs[Long]("total_accounts") - prev.getAs[Long]("total_accounts"))
    }
  }

  test("validators voting power weights sum to 1") {
    val s = operators.Staking.validatorsByPower(spark, Dir)
      .agg(sum("voting_power_weight")).head().getDouble(0)
    assert(math.abs(s - 1.0) < 1e-6)
  }

  test("asof join price is the latest click at or before each purchase") {
    val out = operators.Olap.asofJoin(spark, Dir)
    val events = sources.Tables(spark, Dir).events.collect()
    val clicks = events.filter(_.getAs[String]("event_type") == "click")
      .map(r => (r.getAs[java.sql.Timestamp]("ts").getTime, r.getAs[Double]("value")))
      .sortBy(_._1)
    val purchases = events.filter(_.getAs[String]("event_type") == "purchase")
      .map(r => (r.getAs[Long]("event_id"), r.getAs[java.sql.Timestamp]("ts").getTime))
      .toMap
    val got = out.collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("price_at_ts")).map(_.toDouble))
      .toMap
    assert(got.size == purchases.size)
    purchases.foreach { case (id, ts) =>
      val expected = clicks.takeWhile(_._1 <= ts).lastOption.map(c => math.rint(c._2 * 1e4) / 1e4)
      assert(got(id) == expected, s"event $id: got ${got(id)} want $expected")
    }
  }

  test("sessionize: session counts partition the events") {
    val sess = operators.Olap.sessionize(spark, Dir)
    val nEvents = sess.agg(sum("n_events")).head().getLong(0)
    val total = sources.Tables(spark, Dir).events.count()
    assert(nEvents == total)
    // every session respects the 30-min gap rule internally is enforced
    // by construction; check session_seq starts at 1 per user
    val minSeq = sess.groupBy("user_id").agg(min("session_seq").as("m"))
      .agg(max("m")).head().getLong(0)
    assert(minSeq == 1L)
  }

  test("richlist shares are ordered and below 100%") {
    val rows = operators.Staking.richlist(spark, Dir).collect()
    assert(rows.length == 20)
    val balances = rows.map(_.getAs[Double]("balance"))
    assert(balances.sameElements(balances.sorted.reverse))
  }

  test("approx gas-price medians track the exact medians") {
    val exact = operators.Transactions.gasPrices(spark, Dir).collect()
      .map(r => r.getAs[String]("denom") -> r.getAs[Double]("median_price")).toMap
    val approx = operators.Transactions.gasPricesApprox(spark, Dir).collect()
      .map(r => r.getAs[String]("denom") -> r.getAs[Double]("median_price")).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (d, m) =>
      assert(math.abs(approx(d) - m) <= math.max(0.01 * math.abs(m), 0.05),
        s"denom $d approx ${approx(d)} vs exact $m")
    }
  }

  test("approx daily active accounts track the exact distinct counts") {
    val exact = operators.Dashboard.activeAccountsDaily(spark, Dir).collect()
      .map(r => r.getAs[java.sql.Date]("date").toString -> r.getAs[Long]("active_accounts")).toMap
    val approx = operators.Dashboard.activeAccountsApproxDaily(spark, Dir).collect()
      .map(r => r.getAs[java.sql.Date]("date").toString -> r.getAs[Long]("active_accounts")).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (d, n) =>
      assert(math.abs(approx(d) - n) <= math.max(0.02 * n, 2.0),
        s"date $d approx ${approx(d)} vs exact $n")
    }
  }

  test("account staking view: sections reconcile with the raw ledger") {
    val t = sources.Tables(spark, Dir)
    val rows = operators.Staking.accountStaking(spark, Dir).collect()
    assert(rows.nonEmpty)
    val totalEntries = rows.map(_.getAs[Long]("n_entries")).sum
    val direct = t.lineitem.join(
        t.orders.filter(col("o_custkey") === 7), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(totalEntries == direct)
    rows.foreach { r =>
      assert(r.getAs[Double]("delegated") >= 0 && r.getAs[Double]("undelegated") >= 0)
    }
  }

  test("vesting supply: issued = unvested + circulating, both non-trivial") {
    val r = operators.Treasury.vestingSupply(spark, Dir).head()
    val (iss, unv, circ) = (r.getAs[Double]("issued"),
      r.getAs[Double]("unvested"), r.getAs[Double]("circulating"))
    assert(math.abs(iss - (unv + circ)) < 0.01, s"$iss != $unv + $circ")
    // the 30-day corpus with weekly tranches must leave SOME of both
    assert(unv > 0 && circ > 0)
  }

  test("retention cohorts: offset-0 cell is the whole cohort, cells never exceed it") {
    val rows = operators.Olap.retentionCohort(spark, Dir).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[java.sql.Date]("cohort_day"))
    byCohort.foreach { case (day, cells) =>
      val size = cells.head.getAs[Long]("cohort_size")
      val zero = cells.find(_.getAs[Long]("day_offset") == 0L)
      assert(zero.isDefined, s"cohort $day missing its own first day")
      // every member is active on its first day by construction
      assert(zero.get.getAs[Long]("n_active") == size)
      cells.foreach { c =>
        assert(c.getAs[Long]("n_active") <= size)
        assert(c.getAs[Double]("retention") <= 1.0)
      }
    }
    // cohort sizes sum to the distinct purchasing-user population
    val t = graft.sources.Tables(spark, Dir)
    val buyers = t.events.filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(byCohort.values.map(_.head.getAs[Long]("cohort_size")).sum == buyers)
  }

  test("funnel steps are monotone non-increasing and windows bind") {
    val rows = operators.Olap.funnelSteps(spark, Dir).orderBy("step").collect()
    assert(rows.map(_.getAs[String]("event_type")).toSeq ==
      Seq("signup", "view", "purchase"))
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2))
    // the 6h/24h windows must actually exclude someone (the unwindowed
    // funnel is degenerate on this corpus: everyone converts)
    assert(ns(1) < ns(0))
    assert(rows(0).getAs[Double]("conv_from_prev") == 1.0)
    assert(rows(2).getAs[Double]("conv_from_first") <= ns(1).toDouble / ns(0))
  }

  test("gini: textbook planted values, zero-total NULL, input-order invariance") {
    val s = spark
    import s.implicits._
    val bals = Seq(
      ("A", 1.0), ("A", 1.0), ("A", 1.0), ("A", 1.0), // equality → 0
      ("B", 0.0), ("B", 0.0), ("B", 0.0), ("B", 0.04), // one holder → 0.75
      ("C", 0.0), ("C", 0.0)) // zero total → NULL
    val m = operators.Staking.giniOf(bals.toDF("denom", "bal")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m("A").getAs[Double]("gini") == 0.0)
    assert(m("A").getAs[Long]("n_accounts") == 4 &&
      m("A").getAs[Long]("total_bal_x100") == 400)
    // (2·16 − 5·4)/(4·4) = 0.75 — the single-holder concentration
    assert(m("B").getAs[Double]("gini") == 0.75)
    assert(m("C").isNullAt(m("C").fieldIndex("gini")))
    // histogram identity: input order cannot matter
    val shuffled = operators.Staking.giniOf(
      new scala.util.Random(7).shuffle(bals).toDF("denom", "bal")).collect()
      .map(r => r.getString(0) -> r.toSeq).toMap
    assert(shuffled == m.map { case (k, v) => k -> v.toSeq })
    // and the registered query agrees with a row_number reference
    val reg = operators.Staking.richlistGini(spark, Dir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("gini")).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("denom")).orderBy(col("q"), col("c_custkey"))
    val t = sources.Tables(spark, Dir)
    val naive = t.customer
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("denom"), col("c_custkey"),
        floor(col("c_acctbal") * 100 + 0.5).cast("long").as("q"))
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("denom")).agg(
        count(lit(1)).as("n"),
        sum(col("q").cast("decimal(38,0)")).as("sq"),
        sum((col("i") * col("q")).cast("decimal(38,0)")).as("siq"))
      .select(col("denom"),
        graft.functions.Exact.roundx(
          (lit(2) * col("siq") - (col("n") + 1) * col("sq")).cast("double") /
            (col("n") * col("sq")).cast("double"), 6).as("gini"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(reg == naive, s"histogram vs row_number: $reg vs $naive")
    assert(reg.values.forall(g => g >= 0.0 && g < 1.0))
  }

  test("gopher rules: each measure and the conjunction behave on constructed docs") {
    val s = spark
    import s.implicits._
    val good = (1 to 60).map(i => if (i % 7 == 0) "the" else s"word$i").mkString(" ")
    val docs = Seq(
      (1L, good),                                   // passes everything
      (2L, "too short of a doc"),                   // < 50 words
      (3L, (1 to 60).map(_ => "### ... ###").mkString(" ")), // symbols + no alpha
      (4L, (1 to 60).map(i => s"- bullet$i").mkString("\n")) // all bullet lines
    ).toDF("doc_id", "text")
    val m = operators.TextAnalysis.gopherRulesOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Long]("gopher_pass") == 1L, s"good doc failed: ${m(1L)}")
    assert(m(1L).getAs[Long]("n_words") == 60 && m(1L).getAs[Long]("stop_hits") == 8)
    assert(m(2L).getAs[Long]("gopher_pass") == 0L)
    assert(m(3L).getAs[Double]("symbol_ratio") > 0.1 &&
      m(3L).getAs[Double]("alpha_frac") == 0.0 && m(3L).getAs[Long]("gopher_pass") == 0L)
    assert(m(4L).getAs[Double]("bullet_frac") == 1.0 && m(4L).getAs[Long]("gopher_pass") == 0L)
  }

  test("c4 rules: line retention, sentence gate, lorem/brace flags on constructed docs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      // 3 lines, each ending '.', each 5 words, 3 sentences → passes
      (1L, "this is a good line.\nhere is another fine line.\nand a third sentence line."),
      // case-insensitive lorem match → fails on the page flag alone
      (2L, "Lorem Ipsum dolor sit amet line.\nmore filler text in this line.\nthird sentence to clear gates."),
      // code page: curly brace
      (3L, "function f() { return 1; }\nthis doc looks like code overall.\nyes it does truly now then."),
      // < 3 sentences
      (4L, "only one sentence here friend."),
      // 3 sentences but NO retained line (one unterminated, one short)
      (5L, "no terminal punctuation on this line what. so. ever\nshort line.")
    ).toDF("doc_id", "text")
    val m = operators.TextAnalysis.c4RulesOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(1L).getAs[Long]("c4_pass") == 1L, s"good doc failed: ${m(1L)}")
    assert(m(1L).getAs[Long]("n_lines") == 3 && m(1L).getAs[Long]("n_kept") == 3 &&
      m(1L).getAs[Double]("kept_frac") == 1.0 && m(1L).getAs[Long]("n_sentences") == 3)
    assert(m(2L).getAs[Long]("has_lorem") == 1L && m(2L).getAs[Long]("c4_pass") == 0L)
    assert(m(3L).getAs[Long]("has_brace") == 1L && m(3L).getAs[Long]("c4_pass") == 0L)
    assert(m(4L).getAs[Long]("n_sentences") == 1L && m(4L).getAs[Long]("c4_pass") == 0L)
    assert(m(5L).getAs[Long]("n_sentences") == 3L && m(5L).getAs[Long]("n_kept") == 0L &&
      m(5L).getAs[Long]("c4_pass") == 0L)
  }

  test("tf-idf terms: planted two-source corpus yields the textbook scores and ranks") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "apple apple banana", "A"),
      (2L, "banana cherry cherry cherry", "B")
    ).toDF("doc_id", "text", "source")
    val m = operators.CorpusStats.tfidfTermsOf(docs, k = 10).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("term")) -> r).toMap
    // S=2; df(apple)=1, df(banana)=2, df(cherry)=1 → idf ln2, 0, ln2
    val ln2 = BigDecimal(math.log(2.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(("A", "apple")).getAs[Double]("idf") == ln2)
    assert(m(("A", "banana")).getAs[Double]("idf") == 0.0)
    assert(m(("A", "apple")).getAs[Long]("tf") == 2 &&
      m(("A", "apple")).getAs[Long]("df") == 1)
    // rank: the shared term scores 0 and sinks below the exclusive one
    assert(m(("A", "apple")).getAs[Long]("rank") == 1L &&
      m(("A", "banana")).getAs[Long]("rank") == 2L)
    assert(m(("B", "cherry")).getAs[Long]("rank") == 1L &&
      m(("B", "banana")).getAs[Long]("rank") == 2L)
    assert(m(("B", "cherry")).getAs[Double]("score") ==
      BigDecimal(3 * ln2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("word entropy: zero for constant docs, ln(n) for all-distinct, order-free") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, (1 to 32).map(_ => "same").mkString(" ")),
      (2L, (1 to 32).map(i => s"w$i").mkString(" ")),
      (3L, "a a a a b b c d") // H = ln8 − (4ln4 + 2ln2)/8
    ).toDF("doc_id", "text")
    val m = operators.TextAnalysis.wordEntropyOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct"), r.getAs[Double]("entropy"))).toMap
    assert(m(1L) == ((32L, 1L, 0.0)), s"constant doc: ${m(1L)}")
    assert(m(2L)._3 == BigDecimal(math.log(32)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      s"distinct doc: ${m(2L)}")
    val expected3 = math.log(8) - (4 * math.log(4) + 2 * math.log(2)) / 8
    assert(math.abs(m(3L)._3 - expected3) < 1e-5, s"mixed doc: ${m(3L)}")
  }
}
