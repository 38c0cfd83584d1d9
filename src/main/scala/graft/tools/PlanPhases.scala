package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.QueryPlanningTracker

/** Catalyst phase timing for one or more queries (guide §7.3 — "is
  * the driver planning?"): builds the query's DataFrame, then forces
  * analysis/optimization/planning twice and prints the tracker's
  * phase durations plus top rules by time. Diagnostic only.
  *
  * Usage: sbt "runMain graft.tools.PlanPhases q232_idn_host_fold"
  */
object PlanPhases {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").map(_.trim).toSeq)
      .getOrElse(sys.error("usage: PlanPhases <query[,query...]>"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.all.foreach { n =>
      try graft.Tables.load(spark, sfDir, n).count() catch { case _: Throwable => () }
    }
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val qe = df.queryExecution
        qe.executedPlan // force analysis + optimization + planning
        val t2 = System.nanoTime()
        val phases = qe.tracker.phases.map { case (k, v) =>
          s"$k=${v.durationMs}ms"
        }.mkString(" ")
        println(f"== $name pass $pass build=${(t1 - t0) / 1e9}%.3f s " +
          f"plan=${(t2 - t1) / 1e9}%.3f s  $phases")
        val rules = qe.tracker.rules.toSeq
          .sortBy(-_._2.totalTimeNs).take(12)
        rules.foreach { case (rule, m) =>
          println(f"   ${m.totalTimeNs / 1e6}%8.1f ms  inv=${m.numInvocations}%5d " +
            f"eff=${m.numEffectiveInvocations}%4d  ${rule.split('.').last}")
        }
        val nodes = qe.optimizedPlan.collect { case p => p.expressions.map(_.collect { case e => e }.size).sum }.sum
        println(s"   optimizedPlan expr-node count ≈ $nodes")
      }
    }
    spark.stop()
  }
}
