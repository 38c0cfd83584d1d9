package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance: keep a per-key aggregate STATE
  * (count / exact decimal sum / min / max — the mergeable tier; mean
  * derives as sm/cnt) and fold delta batches into it WITHOUT
  * rescanning the base data. This is materialized-view maintenance
  * for the feature-store shape: at 100 TB the daily refresh
  * aggregates only the day's partition (|delta|) and merges against
  * state (|keys|), instead of re-aggregating the full history —
  * the same contract the reference's `compute_and_write(mode='merge')`
  * offers for raw feature rows
  * (`/root/reference/Feature_Store_Telco_Churn_Flight_School.py:104-108`),
  * lifted to aggregates. [extension] beyond that reference surface.
  *
  * Invariant (spec-enforced, oracle-gated): for any split base ∪ delta,
  * `merge(build(base), delta) ≡ build(base ∪ delta)` — count and sum
  * because both are exact (decimal) mergeable sums, min/max because
  * they are idempotent semilattice ops. Non-mergeable aggregates
  * (exact distinct, exact percentile) do NOT fit this state; use the
  * sketch tier (`functions/SketchAggregates`) whose state is mergeable
  * by construction.
  */
object IncrementalAgg {

  private val stateCols = Seq("cnt", "sm", "mn", "mx")

  /** Aggregate `df` into per-key state. The sum runs in
    * DECIMAL(38,2): exact, so merged state is bit-equal to a full
    * recompute (double sums would drift with association order).
    */
  def build(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    require(keys.nonEmpty, "IncrementalAgg.build: need at least one key")
    val v = col(valueCol)
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("cnt"),
      sum(v.cast(DecimalType(18, 2))).cast(DecimalType(38, 2)).as("sm"),
      min(v).as("mn"),
      max(v).as("mx"))
  }

  /** Fold a delta batch into existing state: aggregate the delta
    * (|delta| rows, one shuffle), then merge state rows per key — a
    * USING full-outer join so keys new to the delta and keys absent
    * from it both survive. No base-data scan anywhere in the plan.
    */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    require(stateCols.forall(state.columns.contains),
      s"IncrementalAgg.merge: state must carry ${stateCols.mkString("/")} " +
        s"(from build), got ${state.columns.mkString(",")}")
    val d = build(delta, keys, valueCol)
    val a = state.as("a")
    val b = d.as("b")
    def either(c: String, f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column) =
      // a key lives on >= 1 side, so at most one operand is NULL
      when(col(s"a.$c").isNull, col(s"b.$c"))
        .when(col(s"b.$c").isNull, col(s"a.$c"))
        .otherwise(f(col(s"a.$c"), col(s"b.$c")))
    a.join(b, keys, "full_outer").select(
      keys.map(col) ++ Seq(
        (coalesce(col("a.cnt"), lit(0L)) + coalesce(col("b.cnt"), lit(0L))).as("cnt"),
        either("sm", _ + _).cast(DecimalType(38, 2)).as("sm"),
        either("mn", least(_, _)).as("mn"),
        either("mx", greatest(_, _)).as("mx")): _*)
  }
}
