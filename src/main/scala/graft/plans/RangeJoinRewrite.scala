package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DayTimeIntervalType, IntegerType, LongType, ShortType, TimestampType}

/** Optimizer rule (builder-brief preference (c): custom `Rule
  * [LogicalPlan]` via `SparkSessionExtensions`): rewrite a pure
  * range-condition inner join — which Spark plans as a
  * BroadcastNestedLoopJoin, O(n·m) — into the bucketed equi-join of
  * `graft.operators.RangeJoin`, directly at the logical-plan level, so
  * NAIVE user SQL like
  *
  *   SELECT ... FROM intervals i JOIN points p
  *   ON p.ts >= i.start AND p.ts < i.end
  *
  * scales without the user knowing the operator exists.
  *
  * Fires only when the join has NO equi predicate (Spark already
  * hash-partitions equi joins; adding buckets there would only inflate
  * the build side) and the condition contains a half-open range
  * `t >= s AND t < e` with `t` from one side and `s`, `e` from the
  * other, all three TIMESTAMP-typed (long/ntz ranges are left to the
  * explicit operator: arbitrary long domains need a caller-chosen
  * width, ntz a DST-safe mapping). The rewritten join carries the bucket
  * equality PLUS the original condition, so semantics are unchanged —
  * the spec asserts result equality and the disappearance of the
  * nested loop.
  *
  * Also fires on the symmetric BAND shape `abs(a − b) <= tol` (both
  * `<`/`<=` orientations) for TIMESTAMP pairs with an interval
  * tolerance AND for integral pairs with an integral tolerance — in
  * the band case the tolerance itself is the bucket width, so integral
  * domains have a principled width the interval path lacks. One side
  * emits its quotient ±1, the other its single quotient; each
  * qualifying pair meets exactly once and the original condition rides
  * along as the residual.
  *
  * Bucket width: `spark.graft.rangejoin.bucket.micros` (default 1
  * minute). The output join has an equi key, so the rule cannot
  * re-fire on its own output.
  *
  * Long-interval cliff guard: an interval spanning more than
  * `spark.graft.rangejoin.max.buckets` buckets (default 10,000 — ~7
  * days at the 1-minute default width) does NOT explode; it emits the
  * single OVERFLOW sentinel bucket, and every point row emits its real
  * bucket PLUS the sentinel. Long intervals thus pair with all points
  * inside one join bucket — bounded degradation (ordinary join skew,
  * AQE-splittable) instead of a ~500k× row amplification (or a
  * Sequence array-length error) on month/year-scale intervals the
  * naive BNLJ never had. Each (interval, point) pair still meets
  * exactly once: a long interval exists ONLY in the sentinel bucket, a
  * short one only in real buckets, and a point has exactly one row in
  * each. The cost is one extra narrow row per point in the shuffle.
  */
case class RangeJoinRewrite(bucketMicros: Long = 60000000L)
    extends Rule[LogicalPlan] with PredicateHelper {

  /** The documented tuning knob; falls back to the constructor default
    * (1 minute). Read per-invocation so a `SET` takes effect.
    */
  private def bucketWidthMicros: Long = {
    val v = conf.getConfString("spark.graft.rangejoin.bucket.micros",
      bucketMicros.toString).toLong
    require(v > 0, s"spark.graft.rangejoin.bucket.micros must be positive, got $v")
    v
  }

  /** Per-interval explode cap; beyond it the interval takes the
    * sentinel-bucket path instead (see class doc).
    */
  private def maxBucketsPerInterval: Long = {
    val v = conf.getConfString("spark.graft.rangejoin.max.buckets", "10000").toLong
    require(v > 0, s"spark.graft.rangejoin.max.buckets must be positive, got $v")
    v
  }

  // no real bucket can be Long.MinValue: bucket = ts div w with w >= 1,
  // and Spark's timestamp domain (±~0.3M years) is far inside Long µs
  private val OverflowBucket = Literal(Long.MinValue, LongType)

  // temporal columns ONLY: for an arbitrary long domain the fixed
  // micros-scale bucket width is meaningless (ids in [0, 1e6) would all
  // land in bucket 0, collapsing the join into one task — worse than
  // the nested loop). Long-typed ranges go through the explicit
  // operator, whose caller picks the width.
  private def micros(e: Expression): Option[Expression] = e.dataType match {
    case TimestampType => Some(UnixMicros(e))
    case _             => None
  }

  private def fromSide(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case Equality(a, b) => // EqualTo and EqualNullSafe both hash-join
          (fromSide(a, left) && fromSide(b, right)) ||
            (fromSide(a, right) && fromSide(b, left))
        case _ => false
      }
      // (t, s, e, inclusiveUpper) with t from the point side, s/e from
      // the interval side; `t BETWEEN s AND e` parses to >= plus <=,
      // so the closed upper bound is the common user shape
      val range = if (hasEqui) None else {
        val lower = conjuncts.collectFirst[(Expression, Expression)] {
          case GreaterThanOrEqual(t, s) if fromSide(t, right) && fromSide(s, left) => (t, s)
          case LessThanOrEqual(s, t) if fromSide(t, right) && fromSide(s, left) => (t, s)
        }
        val upper = conjuncts.collectFirst[(Expression, Expression, Boolean)] {
          case LessThan(t, e) if fromSide(t, right) && fromSide(e, left) => (t, e, false)
          case GreaterThan(e, t) if fromSide(t, right) && fromSide(e, left) => (t, e, false)
          case LessThanOrEqual(t, e) if fromSide(t, right) && fromSide(e, left) => (t, e, true)
          case GreaterThanOrEqual(e, t) if fromSide(t, right) && fromSide(e, left) => (t, e, true)
        }
        (lower, upper) match {
          case (Some((t1, s)), Some((t2, e, incl))) if t1.semanticEquals(t2) &&
              // a conjunct like `s <= t AND t >= s` must not pair the
              // SAME bound as both lower and upper
              !s.semanticEquals(e) =>
            Some((t1, s, e, incl))
          case _ => None
        }
      }
      // symmetric band `abs(a − b) <= tol` — the other naive shape that
      // nests loops. Both sides are points and the TOLERANCE is the
      // natural bucket width, so (unlike the interval path, which has
      // no principled width for arbitrary longs) integral domains are
      // rewritable here too: with w = max(tol, 1), |a−b| <= tol implies
      // the truncating quotients a div w and b div w differ by at most
      // 1, so one side emits {q−1, q, q+1} and the other its single
      // bucket — each qualifying pair meets exactly once (the three
      // left buckets are distinct), misses are impossible, and false
      // bucket neighbors die on the retained original condition.
      val rangePlan: Option[LogicalPlan] =
        range.flatMap { case (t, s, e, inclusiveUpper) =>
        for (tUs <- micros(t); sUs <- micros(s); eUs <- micros(e)) yield {
          val w = Literal(bucketWidthMicros, LongType)
          // empty/inverted intervals match nothing — without this
          // filter Sequence(start > stop) THROWS at runtime where the
          // nested loop simply produced no rows (operator parity:
          // RangeJoin.intervalJoin filters _rj_e > _rj_s). Closed
          // intervals are non-empty at e == s.
          val nonEmpty =
            if (inclusiveUpper) GreaterThanOrEqual(eUs, sUs) else GreaterThan(eUs, sUs)
          val guarded = Filter(nonEmpty, left)
          // interval side: explode covering buckets [s div w, X div w]
          // where X is the last µs inside the interval (e for closed,
          // e-1 for half-open)
          val bucketL = AttributeReference("_rj_bucket_l", LongType, nullable = true)()
          val lastUs =
            if (inclusiveUpper) eUs else Subtract(eUs, Literal(1L, LongType))
          val startDiv = IntegralDivide(sUs, w)
          val lastDiv = IntegralDivide(lastUs, w)
          // Sequence is TimeZoneAwareExpression: unresolved until a zone
          // is attached, even over longs
          val seqExpr = new Sequence(startDiv, lastDiv,
            Some(Literal(1L, LongType))).withTimeZone(conf.sessionLocalTimeZone)
          // cliff guard: intervals spanning more than maxBuckets buckets
          // take the sentinel path (If only evaluates the taken branch,
          // so the oversized Sequence is never materialized)
          val bucketCount =
            Add(Subtract(lastDiv, startDiv), Literal(1L, LongType))
          val cappedBuckets = If(
            LessThanOrEqual(bucketCount, Literal(maxBucketsPerInterval, LongType)),
            seqExpr,
            CreateArray(Seq(OverflowBucket)))
          val gen = Generate(Explode(cappedBuckets), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(bucketL),
            child = guarded)
          // point side: its real bucket plus the sentinel (the row that
          // can meet long intervals)
          val bucketR = AttributeReference("_rj_bucket_r", LongType, nullable = true)()
          val genR = Generate(
            Explode(CreateArray(Seq(IntegralDivide(tUs, w), OverflowBucket))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(bucketR), child = right)
          val newCond = And(EqualTo(bucketL, bucketR), cond)
          Project(j.output, Join(gen, genR, Inner, Some(newCond), hint))
        }
      }
      // gate the band on the range PLAN, not the range PATTERN: a
      // structural range match over non-timestamp columns yields no
      // rewrite, and a band conjunct alongside it must still fire
      val band: Option[(Expression, Expression, Long)] =
        if (hasEqui || rangePlan.isDefined) None
        else {
          def tolValue(x: Expression): Option[Long] = x match {
            case l if l.foldable => l.dataType match {
              // DayTimeIntervalType stores micros as Long — same unit
              // as UnixMicros
              case _: DayTimeIntervalType | ByteType | ShortType |
                  IntegerType | LongType =>
                Option(l.eval()).map(_.asInstanceOf[Number].longValue())
                  .filter(_ >= 0) // abs <= negative matches nothing; skip
              case _ => None
            }
            case _ => None
          }
          // both results long-valued: epoch µs for timestamps, raw for
          // integrals
          def absDiff(x: Expression): Option[(Expression, Expression)] = x match {
            case Abs(SubtractTimestamps(a, b, _, _), _)
                if a.dataType == TimestampType && b.dataType == TimestampType =>
              Some((UnixMicros(a), UnixMicros(b)))
            case Abs(Subtract(a, b, _), _)
                if Seq(a, b).forall(e => Seq[org.apache.spark.sql.types.DataType](
                  ByteType, ShortType, IntegerType, LongType).contains(e.dataType)) =>
              Some((Cast(a, LongType), Cast(b, LongType)))
            case _ => None
          }
          def bandOf(c: Expression): Option[(Expression, Expression, Long)] = c match {
            case LessThanOrEqual(x, tolE) =>
              for { ab <- absDiff(x); tol <- tolValue(tolE) } yield (ab._1, ab._2, tol)
            case LessThan(x, tolE) =>
              for { ab <- absDiff(x); tol <- tolValue(tolE) } yield (ab._1, ab._2, tol)
            case GreaterThanOrEqual(tolE, x) =>
              for { ab <- absDiff(x); tol <- tolValue(tolE) } yield (ab._1, ab._2, tol)
            case GreaterThan(tolE, x) =>
              for { ab <- absDiff(x); tol <- tolValue(tolE) } yield (ab._1, ab._2, tol)
            case _ => None
          }
          conjuncts.view.flatMap(bandOf).headOption
        }
      val bandPlan: Option[LogicalPlan] = band.flatMap { case (x, y, tol) =>
        // abs is symmetric: normalize to (left-side value, right-side value)
        val sides =
          if (fromSide(x, left) && fromSide(y, right)) Some((x, y))
          else if (fromSide(y, left) && fromSide(x, right)) Some((y, x))
          else None
        sides.map { case (aL, bR) =>
          val w = Literal(math.max(tol, 1L), LongType)
          val aDiv = IntegralDivide(aL, w)
          val bl = AttributeReference("_rj_band_l", LongType, nullable = true)()
          // LEGACY (wrapping) arithmetic: under ANSI, aDiv ± 1 would
          // throw at the Long extremes (a = ±Long extreme with w = 1)
          // where the naive plan returned the pair. A wrapped neighbor
          // bucket can only co-locate pairs the naive plan evaluated
          // too, and the retained original condition decides them.
          val genL = Generate(Explode(CreateArray(Seq(
              Subtract(aDiv, Literal(1L, LongType), EvalMode.LEGACY), aDiv,
              Add(aDiv, Literal(1L, LongType), EvalMode.LEGACY)))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(bl), child = left)
          val br = AttributeReference("_rj_band_r", LongType, nullable = true)()
          val genR = Generate(Explode(CreateArray(Seq(IntegralDivide(bR, w)))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(br), child = right)
          Project(j.output,
            Join(genL, genR, Inner, Some(And(EqualTo(bl, br), cond)), hint))
        }
      }
      rangePlan.orElse(bandPlan).getOrElse(j)
  }
}
