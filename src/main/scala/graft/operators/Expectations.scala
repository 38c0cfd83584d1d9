package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [extension] Declarative data-quality expectations — the
  * constraint-audit pass a training-data pipeline runs before
  * trusting a 100 TB table (the public pattern behind AWS Deequ /
  * Delta Live Tables expectations, re-expressed as plain Spark
  * aggregates).
  *
  * All row-local checks compile into ONE aggregation over ONE scan:
  * each check contributes a `sum(CASE WHEN violated)` column, plus one
  * shared `count(*)`; uniqueness rides the same plan as a
  * count-distinct. No per-check scans — at 100 TB the audit costs
  * exactly one pass regardless of how many checks it carries.
  * Referential integrity needs the dimension side, so it is the one
  * check that adds a join (left-anti count against the dim keys —
  * broadcast when small, shuffle otherwise; AQE decides).
  */
object Expectations {

  sealed trait Expectation { def name: String }
  /** `col` must never be NULL. */
  case class NotNull(col: String) extends Expectation {
    def name = s"not_null($col)"
  }
  /** `col` must lie in [lo, hi] (NULLs are not range violations —
    * pair with NotNull to forbid them).
    */
  case class InRange(col: String, lo: Double, hi: Double) extends Expectation {
    def name = s"in_range($col,$lo,$hi)"
  }
  /** `col` must be one of `values` (NULLs excluded, as above). */
  case class InSet(col: String, values: Seq[String]) extends Expectation {
    def name = s"in_set($col)"
  }
  /** `cols` must be a unique key: violations = rows beyond the first
    * per duplicated combination.
    */
  case class UniqueKey(cols: Seq[String]) extends Expectation {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** Arbitrary boolean predicate that every row must satisfy. */
  case class Satisfies(predicate: Column, label: String) extends Expectation {
    def name = s"satisfies($label)"
  }
  /** Every non-NULL `col` value must exist in `dimCol` of `dim`. */
  case class RefIntegrity(col: String, dim: DataFrame, dimCol: String) extends Expectation {
    def name = s"ref_integrity($col)"
  }

  /** Per-row violation predicate for the row-local checks (the ones a
    * single row can decide). UniqueKey/RefIntegrity need global
    * context and are audit-only.
    */
  private def rowViolation(e: Expectation): Column = e match {
    case NotNull(c)         => col(c).isNull
    case InRange(c, lo, hi) => col(c).isNotNull && (col(c) < lo || col(c) > hi)
    case InSet(c, vs)       => col(c).isNotNull && !col(c).isInCollection(vs)
    case Satisfies(p, _)    => !coalesce(p, lit(false))
    case other => throw new IllegalArgumentException(
      s"expectations: ${other.name} is not row-local — enforce() takes " +
        "NotNull/InRange/InSet/Satisfies; run audit() for global checks")
  }

  /** Validate that every check is row-local (and the list non-empty)
    * without building a plan — callers that defer execution (streaming
    * foreachBatch) use this to fail at the call site instead of inside
    * the first micro-batch.
    */
  private[graft] def requireRowLocal(checks: Seq[Expectation]): Unit = {
    require(checks.nonEmpty, "expectations: need at least one check")
    checks.foreach(rowViolation)
  }

  /** Enforcement split (the expectations-with-quarantine pattern):
    * returns (clean rows, quarantined rows + a `violations` column
    * naming every failed check). One narrow projection each — no
    * shuffle, no second scan of the checks.
    */
  def enforce(df: DataFrame, checks: Seq[Expectation]): (DataFrame, DataFrame) = {
    require(checks.nonEmpty, "expectations: need at least one check")
    // the split builds (and drops from the clean side) a `violations`
    // column — an existing column of that name would be silently
    // replaced and lost in both outputs
    require(!df.columns.contains("violations"),
      "expectations: input already has a 'violations' column — rename it before enforce()")
    val reasons = array(checks.map(e =>
      when(rowViolation(e), lit(e.name))): _*)
    val tagged = df.withColumn("violations",
      filter(reasons, r => r.isNotNull))
    val good = tagged.filter(size(col("violations")) === 0).drop("violations")
    val bad = tagged.filter(size(col("violations")) > 0)
    (good, bad)
  }

  /** Audit `df` against `checks`: one row per check with
    * (check, total_rows, violations, passed). Row-local checks and
    * unique keys share a single scan; each RefIntegrity adds one
    * anti-join count.
    */
  def audit(df: DataFrame, checks: Seq[Expectation]): DataFrame = {
    require(checks.nonEmpty, "expectations: need at least one check")
    def violations(e: Expectation): Option[Column] = e match {
      case NotNull(c) => Some(sum(when(col(c).isNull, 1L).otherwise(0L)))
      case InRange(c, lo, hi) =>
        Some(sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L).otherwise(0L)))
      case InSet(c, vs) =>
        Some(sum(when(col(c).isNotNull && !col(c).isInCollection(vs), 1L).otherwise(0L)))
      case UniqueKey(cs) =>
        // duplicates beyond the first = rows − distinct combinations
        // (NULL-bearing combos count via the struct, like SQL GROUP BY)
        Some(count(lit(1)) - countDistinct(struct(cs.map(col): _*)))
      case Satisfies(p, _) => Some(sum(when(!coalesce(p, lit(false)), 1L).otherwise(0L)))
      case RefIntegrity(_, _, _) => None
    }

    // positional internal aliases: check names carry parens/commas,
    // which Dataset.col would try to parse
    val localChecks = checks.zipWithIndex
      .flatMap { case (e, i) => violations(e).map(v => (e, v.cast("long").as(s"_c$i"), i)) }
    val aggRow =
      if (localChecks.isEmpty) df.agg(count(lit(1)).as("_total"))
      else df.agg(count(lit(1)).as("_total"), localChecks.map(_._2): _*)

    val localReport = aggRow.select(
      explode(array(localChecks.map { case (e, _, i) =>
        struct(lit(e.name).as("check"), col("_total").as("total_rows"),
          col(s"_c$i").as("violations"))
      }: _*)).as("r"))
      .select(col("r.check"), col("r.total_rows"), col("r.violations"))

    // fully lazy: the anti-join count and total ride the returned plan
    // as 1-row aggregates, no driver-side action during construction
    val refReports = checks.collect { case e @ RefIntegrity(c, dim, dc) =>
      val totalDf = df.agg(count(lit(1)).cast("long").as("total_rows"))
      val badDf = df.filter(col(c).isNotNull)
        .join(dim.select(col(dc).as(c)).distinct(), Seq(c), "left_anti")
        .agg(count(lit(1)).cast("long").as("violations"))
      totalDf.crossJoin(badDf)
        .select(lit(e.name).as("check"), col("total_rows"), col("violations"))
    }

    val reports =
      (if (localChecks.nonEmpty) Seq(localReport) else Nil) ++ refReports
    reports.reduce(_.unionByName(_))
      .withColumn("passed", col("violations") === 0L)
  }
}
