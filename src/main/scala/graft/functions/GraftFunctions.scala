package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import VectorExpressions._
import LayoutExpressions.{HilbertIndex2D, InterleaveBits}

/** SQL registration for the custom expressions, so `spark.sql` users
  * get the same operators the Column API exposes:
  *
  *   graft_dot(a, b)                 dot product of two double arrays
  *   graft_simhash(tokens)           64-bit SimHash of a token array
  *   graft_minhash(shingles, n)      n-hash MinHash signature
  *   graft_minhash_ngram(toks, g, n) fused word-g-gram MinHash
  *   graft_hyperplane_sig(v, d, b[, off])   random-hyperplane LSH signature
  *   graft_hyperplane_band_keys(v, d, r, b) all LSH band keys, one pass
  *
  * Two registration paths: `GraftFunctions.register(spark)` for an
  * existing session, or `spark.sql.extensions=graft.functions.
  * GraftExtensions` at session build (the standard extensions hook).
  */
object GraftFunctions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  private def boolArg(e: Expression, fn: String, pos: Int): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be a boolean literal, got $other")
  }

  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", "dot product of two array<double>",
      es => DotProduct(es(0), es(1))),
    ("graft_simhash", "SimHash of array<string> tokens (tokens[, portable])",
      es => {
        require(es.length == 1 || es.length == 2, s"graft_simhash: " +
          s"expected 1 or 2 arguments (tokens[, portableHash]), got ${es.length}")
        SimHash64(es(0),
          if (es.length == 2) boolArg(es(1), "graft_simhash", 1) else false)
      }),
    ("graft_minhash", "MinHash signature of array<string> shingles",
      es => MinHashSig(es(0), intArg(es(1), "graft_minhash", 1))),
    ("graft_minhash_ngram",
      "fused word-ngram MinHash signature (toks, g, n[, portable])",
      es => {
        require(es.length == 3 || es.length == 4, s"graft_minhash_ngram: " +
          s"expected 3 or 4 arguments (toks, g, n[, portableHash]), got ${es.length}")
        MinHashNgramSig(es(0), intArg(es(1), "graft_minhash_ngram", 1),
          intArg(es(2), "graft_minhash_ngram", 2),
          if (es.length == 4) boolArg(es(3), "graft_minhash_ngram", 3) else false)
      }),
    ("graft_hyperplane_sig", "random-hyperplane LSH bit signature",
      es => {
        // 3-arg (vec, dim, bits) or 4-arg (vec, dim, bits, planeOffset)
        require(es.length == 3 || es.length == 4, s"graft_hyperplane_sig: " +
          s"expected 3 or 4 arguments (vec, dim, bits[, planeOffset]), got ${es.length}")
        HyperplaneSig(es(0), intArg(es(1), "graft_hyperplane_sig", 1),
          intArg(es(2), "graft_hyperplane_sig", 2),
          if (es.length == 4) intArg(es(3), "graft_hyperplane_sig", 3) else 0)
      }),
    ("graft_hyperplane_band_keys", "all LSH band keys (array<bigint>) in one pass",
      es => {
        require(es.length == 4, s"graft_hyperplane_band_keys: " +
          s"expected 4 arguments (vec, dim, rowsPerBand, bands), got ${es.length}")
        HyperplaneBandKeys(es(0), intArg(es(1), "graft_hyperplane_band_keys", 1),
          intArg(es(2), "graft_hyperplane_band_keys", 2),
          intArg(es(3), "graft_hyperplane_band_keys", 3))
      }),
    ("graft_kmv_distinct", "KMV distinct-count sketch aggregate (value, k)",
      es => SketchAggregates.KmvDistinct(es(0), intArg(es(1), "graft_kmv_distinct", 1))),
    ("graft_cm_topk", "Count-Min heavy-hitters aggregate (value, k[, depth, width])",
      es => {
        require(es.length == 2 || es.length == 4, s"graft_cm_topk: " +
          s"expected 2 or 4 arguments (value, k[, depth, width]), got ${es.length}")
        if (es.length == 2)
          SketchAggregates.CmTopK(es(0), intArg(es(1), "graft_cm_topk", 1))
        else
          SketchAggregates.CmTopK(es(0), intArg(es(1), "graft_cm_topk", 1),
            intArg(es(2), "graft_cm_topk", 2), intArg(es(3), "graft_cm_topk", 3))
      }),
    ("graft_interleave_bits", "Morton z-value of bigint ranks (rank..., bits)",
      es => {
        require(es.length >= 2, "graft_interleave_bits: expected (rank..., bits)")
        InterleaveBits(es.init, intArg(es.last, "graft_interleave_bits", es.length - 1))
      }),
    ("graft_hilbert_2d", "2-D Hilbert curve index (x, y, bits)",
      es => HilbertIndex2D(es(0), es(1), intArg(es(2), "graft_hilbert_2d", 2))))

  /** Register on a live session's function registry. */
  def register(spark: SparkSession): Unit = all.foreach { case (name, _, builder) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
  }
}

/** `spark.sql.extensions` entry point: SQL functions + the range-join
  * rewrite rule (naive non-equi range joins → bucketed equi joins).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.VectorExpressions", null, name, usage, ""),
        builder))
    }
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite())
  }
}
