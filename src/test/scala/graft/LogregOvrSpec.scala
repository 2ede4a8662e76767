package graft

import org.apache.spark.sql.functions._
import graft.similarity.Logreg

/** One-vs-rest multiclass classification over the jointly-trained K
  * binary classifiers: argmax consistency, accuracy on the separable
  * synthetic clusters, and bit-determinism (the binary trainer's
  * DECIMAL-route guarantee must survive the joint aggregation). */
class LogregOvrSpec extends GraftSpec {

  private lazy val out = Logreg.logregOvr(spark, Dir).collect()

  test("every vector is classified and the run is bit-deterministic") {
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 9))
    val again = Logreg.logregOvr(spark, Dir).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet,
      "jointly-trained weights must be bit-deterministic")
  }

  // the 10 noisy classes cap a LINEAR model at ~0.40 on this corpus
  // (nearest-centroid 0.374, 1000-iter reference GD 0.404); the
  // registered 40-iter run lands ~0.35 — the assert is a floor well
  // above chance, not a separability claim
  test("accuracy far above the majority baseline") {
    val n = out.length.toDouble
    val acc = out.count(_.getLong(4) == 1L) / n
    val majority = out.groupBy(_.getLong(1)).map(_._2.length).max / n
    info(f"ovr accuracy = $acc%.3f (majority baseline $majority%.3f, n = ${out.length})")
    assert(acc > 2 * majority,
      f"accuracy $acc%.3f should dwarf the $majority%.3f majority baseline")
    assert(out.count(_.getLong(4) == 1L) ==
      out.count(r => r.getLong(2) == r.getLong(1)), "correct flag inconsistent")
  }

  // the 5-round bench cost probe rides the identical code path; it
  // must classify the whole corpus deterministically (its accuracy is
  // NOT asserted — undertrained by design, it exists to time the
  // K-independent one-shuffle-per-round claim)
  test("5-round cost probe classifies every vector deterministically") {
    val probe = Logreg.logregOvr5(spark, Dir).collect()
    assert(probe.length == out.length, "probe must cover the corpus")
    assert(probe.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 9))
    val again = Logreg.logregOvr5(spark, Dir).collect()
    assert(probe.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }
}
