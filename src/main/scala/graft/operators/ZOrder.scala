package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** [extension] Z-order (Morton-curve) data layout — multi-dimensional
  * clustering so parquet min/max footer stats prune on EVERY layout
  * dimension, not just the leading sort key (the public technique
  * behind Delta's OPTIMIZE ZORDER BY; construction from the Morton
  * curve literature, re-expressed with public Spark operators).
  *
  * A lexicographic sort on (x, y) clusters x tightly but leaves every
  * file spanning the full y domain — a filter on y reads everything.
  * Sorting by the interleaved-bit z-value bounds BOTH dimensions per
  * file: a k-dim z-layout over 2^(k·b) cells gives each of n files a
  * region whose per-dimension span shrinks like n^(-1/k).
  *
  * Plan shape: per-dimension min/max from ONE 1-row aggregate
  * (broadcast back — operator stays lazy, same pattern as
  * TextAnalysis.termStats), linear scale to b-bit ranks, one fused
  * bit-interleave expression, then repartitionByRange +
  * sortWithinPartitions on the z-value. Exactly one extra shuffle
  * (the range partition), which IS the layout being produced.
  */
object ZOrder {

  /** Scale numeric columns to [0, 2^bits) ranks and attach the
    * interleaved z-value as `zCol`. NULL in any dimension → rank 0
    * (nulls cluster first, the usual layout convention).
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 16,
      zCol: String = "_z"): DataFrame = {
    require(cols.nonEmpty, "zorder: need at least one column")
    require(bits > 0 && bits * cols.size <= 63,
      s"zorder: bits·dims must fit a long, got $bits × ${cols.size}")
    // internal stat aliases use a positional index, never the caller's
    // name (dots/backticks would corrupt the alias); zCol and the stat
    // names must not collide with existing columns — silently
    // overwriting caller data is worse than failing
    require(!df.columns.contains(zCol),
      s"zorder: output column '$zCol' already exists — pass a different zCol")
    val statNames = cols.indices.flatMap(i => Seq(s"_zmin_$i", s"_zmax_$i"))
    statNames.foreach(n => require(!df.columns.contains(n),
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
    df.crossJoin(broadcast(stats))
      .withColumn(zCol, VectorExpressions.interleaveBits(ranks, bits))
      .drop(statNames: _*)
  }

  /** Z-ordered layout: range-partition into `numFiles` partitions by
    * z-value and sort within each — writing the result yields files
    * whose min/max stats are tight on every `cols` dimension.
    */
  def layout(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 16, zCol: String = "_z"): DataFrame = {
    val z = withZValue(df, cols, bits, zCol)
    z.repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(zCol)
      .drop(zCol)
  }
}
