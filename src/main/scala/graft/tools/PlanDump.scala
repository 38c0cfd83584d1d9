package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named queries to
  * `plans/<round>/<query>_<suffix>.txt` (round from SPARK_GRAFT_PLANS_DIR,
  * default r19) — the optimization round's plan evidence files. Usage:
  *
  *   sbt "runMain graft.tools.PlanDump before q81_semdedup_clustered,q66_cosine_lsh"
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_SCAN_SPREAD to toggle
  * the Tables.load scan spread for before/after pairs. Diagnostic
  * only — never part of a query path.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <suffix> <query[,query...]>")
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Paths.get("plans",
      sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "r19"))
    Files.createDirectories(dir)
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(dir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote ${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
