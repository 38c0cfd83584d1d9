package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [extension] Stream-stream interval join: attach to each left event
  * the right-stream events of the same key landing inside
  * [left.ts, left.ts + window) — the streaming counterpart of
  * `graft.operators.RangeJoin` (attribution windows, purchase→follow-up
  * correlation).
  *
  * Built on Spark's symmetric-hash stream-stream join: watermarks on
  * BOTH sides plus the time-range join condition are what let the state
  * store evict rows once the watermark passes their join horizon —
  * without the range bound the join state grows forever. Key equality
  * keeps the shuffle an ordinary hash partition on the key; the range
  * predicate is evaluated within matching key groups.
  *
  * Scale: state per side is (watermark delay + window) worth of rows,
  * partitioned by key — the documented production shape for
  * stream-stream joins at any volume.
  */
object StreamJoins {

  /** Inner interval join of two streams on `keyCol` with
    * right.ts ∈ [left.ts, left.ts + window). Column names (other than
    * `keyCol`) must be disjoint, as for any join. Both inputs must be
    * streaming frames; watermarks are applied here.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      window: String,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val w = graft.operators.RangeJoin.parseWidthMicros(window)
    val l = left.withWatermark(leftTsCol, watermarkDelay)
    val r = right.withWatermark(rightTsCol, watermarkDelay)
    l.join(r,
      l(keyCol) === r(keyCol) &&
        r(rightTsCol) >= l(leftTsCol) &&
        r(rightTsCol) < l(leftTsCol) + expr(s"INTERVAL $w MICROSECONDS"),
      "inner")
      .drop(r(keyCol))
  }
}
