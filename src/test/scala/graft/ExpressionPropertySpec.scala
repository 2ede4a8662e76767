package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check => scCheck, Parameters}

/** Property-based checks of the native expression layer against plain
  * Scala reference implementations — randomized inputs catch the
  * boundary cases fixed corpora miss (the round-3 `1L << 64` wrap was
  * exactly such a case). */
class ExpressionPropertySpec extends GraftSpec {

  private def holds(p: Prop): Unit = {
    val r = scCheck(Parameters.default.withMinSuccessfulTests(60), p)
    assert(r.passed, r.status.toString)
  }

  private val tokenGen = Gen.oneOf("a", "b", "c", "ab", "a b") // includes a space-carrying merged token
  private val toksGen = Gen.listOfN(12, tokenGen).flatMap(l => Gen.choose(0, 12).map(l.take))

  test("BpeMergePair == greedy left-to-right reference on random streams") {
    val s = spark
    import s.implicits._
    def ref(d: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < d.length) {
        if (i + 1 < d.length && d(i) == a && d(i + 1) == b) { out += s"$a $b"; i += 2 }
        else { out += d(i); i += 1 }
      }
      out.result()
    }
    holds(forAll(toksGen, tokenGen, tokenGen) { (toks, a, b) =>
      val got = Seq(toks).toDF("toks")
        .select(graft.functions.BpeMergePair(col("toks"), a, b)).head().getSeq[String](0)
      got == ref(toks.toVector, a, b)
    })
  }

  test("GramHashes positional/distinct modes agree on gram identity") {
    val s = spark
    import s.implicits._
    holds(forAll(toksGen, Gen.choose(1, 4)) { (toks, k) =>
      val df = Seq(toks).toDF("toks")
      val pos = df.select(graft.functions.GramHashes.positional(col("toks"), k))
        .head().getSeq[Long](0)
      val dis = df.select(graft.functions.GramHashes(col("toks"), k))
        .head().getSeq[Long](0)
      // positional emits n-k+1 hashes in order; distinct = first-seen
      // order dedup of exactly those
      pos.length == math.max(toks.length - k + 1, 0) &&
        dis == pos.distinct
    })
  }

  test("TopTokenCount == max groupBy count on random token streams") {
    val s = spark
    import s.implicits._
    holds(forAll(toksGen) { toks =>
      val got = Seq(toks).toDF("toks")
        .select(graft.functions.TopTokenCount(col("toks"))).head().getLong(0)
      val ref = if (toks.isEmpty) 0L
        else toks.groupBy(identity).map(_._2.length).max.toLong
      got == ref
    })
  }

  test("FirstMatchingBand == naive band scan on random signatures") {
    val s = spark
    import s.implicits._
    val sigGen = Gen.listOfN(2, Gen.long)
    val widthGen = Gen.oneOf(1, 2, 4, 8, 16, 32, 64)
    holds(forAll(sigGen, sigGen, widthGen) { (a, b, bits) =>
      val bands = 128 / bits // 2 words of 64 bits
      def ref: Long = {
        val mask = -1L >>> (64 - bits)
        (0 until bands).collectFirst {
          case band if {
            val word = band * bits / 64
            val off = (band * bits) % 64
            (((a(word) ^ b(word)) >>> off) & mask) == 0L
          } => band.toLong
        }.getOrElse(-1L)
      }
      val got = Seq((a, b)).toDF("a", "b")
        .select(graft.functions.FirstMatchingBand(col("a"), col("b"), bits, bands))
        .head().getLong(0)
      got == ref
    })
  }
}
