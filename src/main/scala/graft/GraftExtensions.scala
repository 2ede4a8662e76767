package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Sum
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

import graft.functions.{BpeMergePair, DotProduct, DupGramFrac, FirstMatchingBand, GramHashes, HyperplaneSigWords, MinHashBands, MinHashSig, SimHash64, SqDist}

/** Library integration point: registers graft's native expressions and
  * exactness helpers as SQL functions, so `spark.sql` users get them
  * with zero code — either
  *
  *   spark.sql.extensions=graft.GraftExtensions        (config), or
  *   SparkSession.builder.withExtensions(new GraftExtensions)
  *
  * (GraftSession.builder wires the latter for every graft entrypoint.)
  *
  * Registered surface:
  *   graft_dot(a, b)                    codegen'd array<double> dot product
  *   graft_sqdist(a, b)                 codegen'd squared L2 distance
  *   graft_cosine(a, b)                 cosine similarity (dot / norms)
  *   graft_minhash(words, n, k)         MinHash(k) signature over n-word shingles
  *   graft_minhash_bands(words, n, k, b) LSH band hashes of the signature
  *   graft_simhash(words)               60-bit SimHash sketch
  *   graft_dupgram_frac(words, k)       duplicate-k-gram fraction (repetition)
  *   graft_top_token_count(words)       most-frequent-token count (repetition)
  *   graft_mg_topk(words, k)            Misra-Gries heavy-hitters aggregate
  *   graft_mg_merge(entries, k)         merge of stored MG summary rows
  *   graft_kll_sketch(x, k)             KLL quantile sketch aggregate (binary state)
  *   graft_kll_merge(sk, k)             union of serialized KLL states
  *   graft_kll_quantile(sk, rank)       one quantile off a serialized state
  *   graft_gram_hashes(words, k)        distinct k-gram hashes, array<long>
  *   graft_gram_hashes_pos(words, k)    per-position k-gram hashes (spans)
  *   graft_hyperplane_sig(v, planes, dims) wide cosine-LSH signature words
  *   graft_first_matching_band(a, b, bits, bands) banded-signature agreement index
  *   graft_bpe_merge(toks, 'a', 'b')    one greedy BPE merge rewrite
  *   graft_sumx(x)                      order-independent DECIMAL-routed sum
  *   graft_roundx(x, n)                 binary-value half-away rounding
  *
  * Shape-parameters (n, k, bands, digits) must be integer literals —
  * they size per-row primitive loops at codegen time, they are not data.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {

  private def intLit(fn: String, pos: Int, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an INTEGER literal, got $other")
  }

  private def strLit(fn: String, pos: Int, e: Expression): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be a STRING literal, got $other")
  }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  /** Catalyst mirror of Exact.roundx: round(|x|·10ⁿ) half-away on the
    * BINARY value, re-signed — semantics identical to the Column
    * formulation (the analyzer's type coercion inserts the same
    * double/long casts the Column API does). */
  private def roundxExpr(x: Expression, digits: Int): Expression = {
    val p = Literal(math.pow(10, digits))
    val v = Multiply(Abs(x), p)
    val fl = Floor(v)
    val r = Cast(
      CaseWhen(Seq((GreaterThanOrEqual(Subtract(v, fl), Literal(0.5)),
        Add(fl, Literal(1L)))), Some(fl)),
      DoubleType)
    Divide(Multiply(Signum(x), r), p)
  }

  private[graft] val functions: Seq[(String, FunctionBuilder)] = Seq(
    "graft_dot" -> { args =>
      arity("graft_dot", 2, args); DotProduct(args(0), args(1))
    },
    "graft_sqdist" -> { args =>
      arity("graft_sqdist", 2, args); SqDist(args(0), args(1))
    },
    "graft_cosine" -> { args =>
      arity("graft_cosine", 2, args)
      val (a, b) = (args(0), args(1))
      Divide(DotProduct(a, b),
        Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
    },
    "graft_minhash" -> { args =>
      arity("graft_minhash", 3, args)
      MinHashSig(args(0),
        intLit("graft_minhash", 2, args(1)), intLit("graft_minhash", 3, args(2)))
    },
    "graft_minhash_bands" -> { args =>
      arity("graft_minhash_bands", 4, args)
      MinHashBands(args(0), intLit("graft_minhash_bands", 2, args(1)),
        intLit("graft_minhash_bands", 3, args(2)), intLit("graft_minhash_bands", 4, args(3)))
    },
    "graft_simhash" -> { args =>
      arity("graft_simhash", 1, args); SimHash64(args(0))
    },
    "graft_top_token_count" -> { args =>
      arity("graft_top_token_count", 1, args)
      graft.functions.TopTokenCount(args(0))
    },
    "graft_mg_topk" -> { args =>
      arity("graft_mg_topk", 2, args)
      graft.functions.MisraGries(args(0), intLit("graft_mg_topk", 2, args(1)))
        .toAggregateExpression()
    },
    "graft_mg_merge" -> { args =>
      arity("graft_mg_merge", 2, args)
      graft.functions.MisraGriesMerge(args(0), intLit("graft_mg_merge", 2, args(1)))
        .toAggregateExpression()
    },
    // numeric args coerce to DOUBLE at construction (KllFunctions
    // .asDouble): a bare `0.5` literal parses as DECIMAL and an INT
    // value column would otherwise CCE mid-job (a review finding)
    "graft_kll_sketch" -> { args =>
      arity("graft_kll_sketch", 2, args)
      graft.functions.KllSketchAgg(
        graft.functions.KllFunctions.asDouble(args(0)),
        intLit("graft_kll_sketch", 2, args(1)))
        .toAggregateExpression()
    },
    "graft_kll_merge" -> { args =>
      arity("graft_kll_merge", 2, args)
      graft.functions.KllMergeAgg(args(0), intLit("graft_kll_merge", 2, args(1)))
        .toAggregateExpression()
    },
    "graft_kll_quantile" -> { args =>
      arity("graft_kll_quantile", 2, args)
      graft.functions.KllQuantileAt(args(0),
        graft.functions.KllFunctions.asDouble(args(1)))
    },
    "graft_dupgram_frac" -> { args =>
      arity("graft_dupgram_frac", 2, args)
      DupGramFrac(args(0), intLit("graft_dupgram_frac", 2, args(1)))
    },
    "graft_gram_hashes" -> { args =>
      arity("graft_gram_hashes", 2, args)
      GramHashes(args(0), intLit("graft_gram_hashes", 2, args(1)))
    },
    "graft_gram_hashes_pos" -> { args =>
      arity("graft_gram_hashes_pos", 2, args)
      GramHashes(args(0), intLit("graft_gram_hashes_pos", 2, args(1)),
        distinct = false)
    },
    "graft_hyperplane_sig" -> { args =>
      arity("graft_hyperplane_sig", 3, args)
      HyperplaneSigWords(args(0), intLit("graft_hyperplane_sig", 2, args(1)),
        intLit("graft_hyperplane_sig", 3, args(2)))
    },
    "graft_first_matching_band" -> { args =>
      arity("graft_first_matching_band", 4, args)
      FirstMatchingBand(args(0), args(1),
        intLit("graft_first_matching_band", 3, args(2)),
        intLit("graft_first_matching_band", 4, args(3)))
    },
    "graft_bpe_merge" -> { args =>
      arity("graft_bpe_merge", 3, args)
      BpeMergePair(args(0), strLit("graft_bpe_merge", 2, args(1)),
        strLit("graft_bpe_merge", 3, args(2)))
    },
    "graft_sumx" -> { args =>
      arity("graft_sumx", 1, args)
      Cast(Sum(Cast(args(0), DecimalType(30, 6))).toAggregateExpression(), DoubleType)
    },
    "graft_roundx" -> { args =>
      arity("graft_roundx", 2, args)
      roundxExpr(args(0), intLit("graft_roundx", 2, args(1)))
    })
}
