package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Wall-time attribution probe (guide §1.1 / §7.3 — where does the
  * driver-side gap go?): for every named query (default: all), runs
  * two passes through the noop sink and reports, for the second
  * (steady-state) pass:
  *
  *   - build_s: time spent INSIDE the query function before the final
  *     DataFrame returns (fixture generation, sub-jobs, checkpoints,
  *     streaming runs — everything a multi-action gate does eagerly),
  *   - exec_s: the noop save of the returned frame,
  *   - stage_s: sum of per-stage wall spans inside exec (task time),
  *   - njobs/nstages: scheduling volume,
  *   - cpu_s: executor CPU of the whole query,
  *   - gc_s: JVM GC time attributed to tasks.
  *
  * exec_s − stage_s ≈ planning + codegen + job-submission latency of
  * the final action; build_s captures everything eager upstream.
  * Diagnostic only — never part of a query path.
  *
  * Usage: sbt "runMain graft.tools.DriverProbe [q1,q2,...]"
  */
object DriverProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.filter(_.nonEmpty)
      .map(_.split(",").map(_.trim).toSet)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.all.foreach { n =>
      try graft.Tables.load(spark, sfDir, n).count() catch { case _: Throwable => () }
    }
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val stageWallMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val i = e.stageInfo
        stageWallMs.addAndGet(
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L))
        gcMs.addAndGet(i.taskMetrics.jvmGCTime)
        cpuNs.addAndGet(i.taskMetrics.executorCpuTime)
      }
    })
    def drain(): Unit =
      org.apache.spark.graftmetrics.GraftTaskMetrics.flush(spark.sparkContext)
    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.forall(_.contains(n)) }
    println("query,build_s,exec_s,stage_s,njobs,nstages,cpu_s,gc_s")
    selected.foreach { case (name, fn) =>
      (1 to 2).foreach { pass =>
        graft.Pipelines.invalidateStoreCaches()
        spark.catalog.clearCache()
        drain()
        jobs.set(0); stages.set(0); stageWallMs.set(0); gcMs.set(0); cpuNs.set(0)
        val t0 = System.nanoTime()
        val df = try Some(fn(spark, sfDir)) catch { case _: Throwable => None }
        val t1 = System.nanoTime()
        df.foreach { d =>
          try d.write.mode("overwrite").format("noop").save()
          catch { case _: Throwable => () }
        }
        val t2 = System.nanoTime()
        drain()
        if (pass == 2) {
          println(f"$name,${(t1 - t0) / 1e9}%.3f,${(t2 - t1) / 1e9}%.3f," +
            f"${stageWallMs.get / 1e3}%.3f,${jobs.get},${stages.get}," +
            f"${cpuNs.get / 1e9}%.3f,${gcMs.get / 1e3}%.3f")
        }
      }
    }
    spark.stop()
  }
}
