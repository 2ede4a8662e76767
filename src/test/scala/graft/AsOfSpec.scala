package graft

import graft.operators.AsOf

/** AsOf.joinLatest semantics on adversarial shapes the sf testdata
  * doesn't cover: multi-day tick gaps (boundary stitch must reach the
  * next EXISTING tick-day), same-µs ties (later tie wins), facts before
  * the first tick (null), facts far past the last tick (still covered
  * by the end-cap), and exactly-one-match-per-fact. */
class AsOfSpec extends GraftSpec {

  test("joinLatest: gaps, ties, nulls, end-cap — matches hand-computed truth") {
    import spark.implicits._
    val DayUs = 86400000000L
    val ticks = Seq(
      (100L, 1L, 10.0), // same-µs tie, earlier — empty interval, never matches
      (100L, 2L, 11.0), // same-µs tie, later — wins at ts=100
      (5000L, 3L, 12.0), // last tick of day 0; days 1-2 have NO ticks
      (3 * DayUs + 7L, 4L, 13.0) // next tick only on day 3
    ).toDF("p_us", "p_id", "p_val")
    val facts = Seq(
      (1L, 50L), // before any tick -> no match
      (2L, 100L), // exactly at the tie -> later tie (p_id 2)
      (3L, 4999L), // inside day 0 -> still p_id 2
      (4L, DayUs + 5L), // gap day 1 -> day 0's last tick (p_id 3)
      (5L, 2 * DayUs), // gap day 2 -> p_id 3
      (6L, 3 * DayUs + 7L), // exactly at day-3 tick -> p_id 4
      (7L, 9 * DayUs) // far past the last tick -> p_id 4 (end-cap)
    ).toDF("f_id", "f_us")
    val rows = AsOf.joinLatest(facts, "f_us", ticks, "p_us", "p_id")
      .select("f_id", "p_id", "p_val").collect()
    assert(rows.length == 7, "every fact exactly once (no interval overlap/dup)")
    val got = rows.map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> -1L, 2L -> 2L, 3L -> 2L, 4L -> 3L,
      5L -> 3L, 6L -> 4L, 7L -> 4L))
  }
}
