package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{LayoutExpressions, VectorExpressions}

/** [extension] Space-filling-curve data layouts — multi-dimensional
  * clustering so parquet min/max footer stats prune on EVERY layout
  * dimension, not just the leading sort key (the public technique
  * behind Delta's OPTIMIZE ZORDER BY; constructions from the Morton
  * and Hilbert curve literature, re-expressed with public Spark
  * operators).
  *
  * A lexicographic sort on (x, y) clusters x tightly but leaves every
  * file spanning the full y domain — a filter on y reads everything.
  * Sorting by a space-filling-curve value bounds BOTH dimensions per
  * file: a k-dim layout over 2^(k·b) cells gives each of n files a
  * region whose per-dimension span shrinks like n^(-1/k). The Hilbert
  * variant additionally never jumps (adjacent curve positions are
  * adjacent cells), so its partition bounding boxes are at least as
  * tight as Morton's.
  *
  * Plan shape: per-dimension min/max from ONE 1-row aggregate
  * (broadcast back — operator stays lazy, same pattern as
  * TextAnalysis.termStats), linear scale to b-bit ranks, one fused
  * curve-index expression, then repartitionByRange +
  * sortWithinPartitions on the curve value. Exactly one extra shuffle
  * (the range partition), which IS the layout being produced.
  */
object ZOrder {

  /** Lazily scale `cols` to [0, 2^bits) long ranks: returns the frame
    * cross-joined with its broadcast 1-row min/max stats plus the rank
    * expressions (stat columns still attached — callers drop
    * `statNames(cols)` after consuming the ranks). NULL → rank 0
    * (nulls cluster first, the usual layout convention).
    */
  private def withRanks(df: DataFrame, cols: Seq[String], bits: Int)
      : (DataFrame, Seq[Column]) = {
    // internal stat aliases use a positional index, never the caller's
    // name (dots/backticks would corrupt the alias)
    val names = statNames(cols)
    names.foreach(n => require(!df.columns.contains(n),
      s"zorder: internal column '$n' collides with an input column"))
    def q(name: String) = col("`" + name.replace("`", "``") + "`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(q(c).cast("double")).as(s"_zmin_$i"),
        max(q(c).cast("double")).as(s"_zmax_$i"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val maxRank = (1L << bits) - 1
    val ranks = cols.zipWithIndex.map { case (c, i) =>
      val x = q(c).cast("double")
      val lo = col(s"_zmin_$i")
      val hi = col(s"_zmax_$i")
      val scaled = when(x.isNull || hi <= lo, lit(0L))
        .otherwise(((x - lo) / (hi - lo) * maxRank).cast("long"))
      least(greatest(scaled, lit(0L)), lit(maxRank))
    }
    (df.crossJoin(broadcast(stats)), ranks)
  }

  private def statNames(cols: Seq[String]): Seq[String] =
    cols.indices.flatMap(i => Seq(s"_zmin_$i", s"_zmax_$i"))

  private def requireFreshColumn(df: DataFrame, zCol: String): Unit =
    require(!df.columns.contains(zCol),
      s"zorder: output column '$zCol' already exists — pass a different zCol")

  /** Scale numeric columns to [0, 2^bits) ranks and attach the
    * Morton-interleaved z-value as `zCol`.
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 16,
      zCol: String = "_z"): DataFrame = {
    require(cols.nonEmpty, "zorder: need at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"zorder: bits·dims must fit a long, got $bits × ${cols.size}")
    requireFreshColumn(df, zCol)
    val (ranked, ranks) = withRanks(df, cols, bits)
    ranked
      .withColumn(zCol, LayoutExpressions.interleaveBits(ranks, bits))
      .drop(statNames(cols): _*)
  }

  /** 2-D Hilbert variant of [[withZValue]]. */
  def withHilbertValue(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16, zCol: String = "_h"): DataFrame = {
    require(bits > 0 && bits <= 31, // 2*bits would overflow Int before a <=63 check
      s"hilbert: need 0 < bits <= 31, got $bits")
    requireFreshColumn(df, zCol)
    val cols = Seq(xCol, yCol)
    val (ranked, ranks) = withRanks(df, cols, bits)
    ranked
      .withColumn(zCol, LayoutExpressions.hilbert2D(ranks(0), ranks(1), bits))
      .drop(statNames(cols): _*)
  }

  /** Z-ordered layout: range-partition into `numFiles` partitions by
    * z-value and sort within each — writing the result yields files
    * whose min/max stats are tight on every `cols` dimension.
    */
  def layout(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 16, zCol: String = "_z"): DataFrame =
    curveLayout(withZValue(df, cols, bits, zCol), zCol, numFiles)

  /** Hilbert-curve layout for exactly two dimensions — tighter
    * bounding boxes than Morton at the same partition count (the curve
    * never jumps). Same lazy scaling, same single extra shuffle.
    */
  def hilbertLayout(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int, bits: Int = 16, zCol: String = "_h"): DataFrame =
    curveLayout(withHilbertValue(df, xCol, yCol, bits, zCol), zCol, numFiles)

  private def curveLayout(indexed: DataFrame, zCol: String, numFiles: Int): DataFrame = {
    require(numFiles > 0, s"zorder: numFiles must be positive, got $numFiles")
    indexed.repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(zCol)
      .drop(zCol)
  }
}
