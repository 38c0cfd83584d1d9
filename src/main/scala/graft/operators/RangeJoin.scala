package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [extension] Scalable range (interval) join — the operator class the
  * reference stack leans on for event-to-window joins and that naive
  * Spark SQL executes as a BroadcastNestedLoopJoin (every non-equi join
  * condition drops to O(n·m) pair evaluation).
  *
  * Construction (the standard bucketed-range-join used by Spark-on-
  * Databricks range-join hints, Flink interval joins, and kdb-style
  * window joins, re-expressed with public Spark operators only):
  *   1. each interval [s, e) explodes to the bucket ids its span
  *      covers: `sequence(s div w, (e-1) div w)` for bucket width w;
  *   2. each point row computes its single bucket id `ts div w`;
  *   3. shuffle equi-join on the bucket id;
  *   4. residual filter `s <= ts < e` keeps true matches.
  * A point lies in exactly ONE bucket, so a matching (interval, point)
  * pair meets exactly once — no post-join dedup pass.
  *
  * Scale posture: the only shuffle is a hash partition on bucket id;
  * per-bucket work is |intervals covering b| × |points in b|, bounded
  * by choosing w near the typical interval length (cost degrades
  * linearly, never to n·m). Hot buckets are ordinary join skew — AQE's
  * skew-join split applies (OptimizeSkewedJoin); a 100 TB event table
  * range-joins with the same plan shape. Integer `div` (truncation)
  * is used on BOTH sides, so bucket assignment is consistent for any
  * epoch sign; no floating-point division is involved (a double floor
  * mis-buckets points whose ts is an exact bucket-boundary multiple).
  */
object RangeJoin {

  /** Join `intervals` (half-open [startCol, endCol) timestamp columns)
    * with `points` (timestamp `tsCol`): one output row per (interval,
    * point) with the point's ts inside the interval. Column names must
    * be disjoint across the two frames (standard pre-aliasing, as for
    * any self-join). Intervals with end <= start match nothing.
    *
    * `bucketWidth` trades replication for per-bucket fan-in: intervals
    * spanning k buckets appear k times in the shuffle. Default 1 minute
    * suits second-scale intervals; pick w ≈ median interval length.
    */
  def intervalJoin(
      intervals: DataFrame,
      points: DataFrame,
      startCol: String,
      endCol: String,
      tsCol: String,
      bucketWidth: String = "1 minute"): DataFrame = {
    val w = parseWidthMicros(bucketWidth)
    requireFresh(intervals, "intervals", "_rj_s", "_rj_e", "_rj_bucket")
    requireFresh(points, "points", "_rj_t", "_rj_bucket")
    // All comparisons run on epoch-micros longs (a tz-vs-ntz column
    // comparison fails analysis otherwise). The mapping must be
    // MONOTONIC or bucket and filter could disagree with ts order:
    // `cast(ntz as timestamp)` is NOT monotonic in a DST session zone
    // (spring-forward wall times invert around the gap), so ntz/date
    // columns map via timestampdiff against the ntz epoch —
    // timezone-free wall-clock micros. Absolute timestamps use
    // unix_micros directly. Mixing an ntz side with a tz side is the
    // caller's semantic call (wall vs absolute); same-family sides are
    // exact.
    val iv = intervals
      .withColumn("_rj_s", epochMicros(intervals, startCol))
      .withColumn("_rj_e", epochMicros(intervals, endCol))
      .filter(col("_rj_e") > col("_rj_s"))
      .withColumn("_rj_bucket",
        explode(sequence(expr(s"_rj_s div ${w}L"), expr(s"(_rj_e - 1) div ${w}L"))))
    val pt = points
      .withColumn("_rj_t", epochMicros(points, tsCol))
      .withColumn("_rj_bucket", expr(s"_rj_t div ${w}L"))
    iv.join(pt, Seq("_rj_bucket"))
      .filter(col("_rj_t") >= col("_rj_s") && col("_rj_t") < col("_rj_e"))
      .drop("_rj_bucket", "_rj_s", "_rj_e", "_rj_t")
  }

  /** Monotonic epoch-micros image of a time column. ntz/date →
    * wall-clock micros since the ntz epoch via pure FIELD EXTRACTION
    * (unix_date + hour/minute/fractional-second): every instant-based
    * route (cast-to-timestamp, even timestampdiff on ntz) converts
    * through the session zone and inverts order across a DST
    * spring-forward gap. Absolute timestamp → unix_micros.
    */
  private def epochMicros(df: DataFrame, name: String): Column = {
    import org.apache.spark.sql.types.{DateType, TimestampNTZType}
    df.schema(name).dataType match {
      case TimestampNTZType | DateType =>
        val c = s"cast(${quote(name)} as timestamp_ntz)"
        expr(s"unix_date(cast($c as date)) * 86400000000L" +
          s" + hour($c) * 3600000000L + minute($c) * 60000000L" +
          s" + cast(date_part('second', $c) * 1000000 as bigint)")
      // quoted here too: the ntz branch quotes, and a dotted/backticked
      // caller name must resolve the same way in both branches
      case _ => unix_micros(expr(s"cast(${quote(name)} as timestamp)"))
    }
  }

  private def quote(name: String): String = "`" + name.replace("`", "``") + "`"

  /** The join builds (and later drops) internal `_rj_*` columns via
    * withColumn — a caller column with one of these names would be
    * silently overwritten and then destroyed. Fail loudly instead
    * (mirrors ZOrder.withRanks's collision guard).
    */
  private def requireFresh(df: DataFrame, side: String, names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"rangeJoin: $side input already has internal column(s) " +
        s"${clash.mkString(", ")} — rename them before joining")
  }

  /** Band join: pairs (l, r) with |l.ts − r.ts| ≤ tolerance — the
    * symmetric special case (each left row is the interval
    * [ts − tol, ts + tol]). Inclusive on both ends.
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      leftTsCol: String,
      rightTsCol: String,
      tolerance: String): DataFrame = {
    val tol = parseWidthMicros(tolerance)
    requireFresh(left, "left", "_rj_band_s", "_rj_band_e")
    // timestampadd preserves the column's family (ntz stays ntz, tz
    // stays tz), so the band bounds always compare same-family against
    // the left ts and the derived epoch mapping stays monotonic
    val iv = left
      .withColumn("_rj_band_s",
        expr(s"timestampadd(MICROSECOND, ${-tol}, ${quote(leftTsCol)})"))
      // +1 µs: intervalJoin is half-open, the band is inclusive
      .withColumn("_rj_band_e",
        expr(s"timestampadd(MICROSECOND, ${tol + 1L}, ${quote(leftTsCol)})"))
    intervalJoin(iv, right, "_rj_band_s", "_rj_band_e", rightTsCol,
      bucketWidth = tolerance)
      .drop("_rj_band_s", "_rj_band_e")
  }

  /** Numeric twin of `intervalJoin` for long-typed dimensions (byte
    * offsets, ids, integer timestamps): [startCol, endCol) against
    * `ptCol`, bucketed at `bucketWidth`.
    */
  def intervalJoinLong(
      intervals: DataFrame,
      points: DataFrame,
      startCol: String,
      endCol: String,
      ptCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"rangeJoin: bucketWidth must be positive, got $bucketWidth")
    requireFresh(intervals, "intervals", "_rj_bucket")
    requireFresh(points, "points", "_rj_bucket")
    // caller-supplied names are backtick-quoted before splicing into
    // expr(): a name like "a.b" or "start ts" must stay one identifier
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_rj_bucket",
        explode(sequence(expr(s"${quote(startCol)} div ${bucketWidth}L"),
          expr(s"(${quote(endCol)} - 1) div ${bucketWidth}L"))))
    val pt = points
      .withColumn("_rj_bucket", expr(s"${quote(ptCol)} div ${bucketWidth}L"))
    iv.join(pt, Seq("_rj_bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_rj_bucket")
  }

  /** "1 minute" / "30 seconds" / "500 milliseconds" → microseconds.
    * CalendarInterval parsing would admit month-scale units whose
    * micro length is undefined; restrict to fixed-length units.
    */
  private[graft] def parseWidthMicros(width: String): Long = {
    val m = "(?i)^\\s*(\\d+)\\s*(day|hour|minute|second|millisecond|microsecond)s?\\s*$".r
    width match {
      case m(n, unit) =>
        val per = unit.toLowerCase match {
          case "day"         => 86400000000L
          case "hour"        => 3600000000L
          case "minute"      => 60000000L
          case "second"      => 1000000L
          case "millisecond" => 1000L
          case "microsecond" => 1L
        }
        val v = n.toLong * per
        require(v > 0, s"rangeJoin: width must be positive, got $width")
        v
      case _ => throw new IllegalArgumentException(
        s"rangeJoin: cannot parse bucket width '$width' (use e.g. '1 minute', '30 seconds')")
    }
  }
}
