package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming-gate latency attribution (guide §1.1): runs the named
  * gate queries twice and prints every micro-batch's progress JSON
  * (durationMs breakdown: addBatch / getBatch / latestOffset /
  * queryPlanning / walCommit / commitOffsets / stateOperators), plus
  * query start→first-batch and last-batch→stop spans. Diagnostic
  * only — never part of a query path.
  *
  * Usage: sbt "runMain graft.tools.StreamProbe q197_stream_interval_join"
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").map(_.trim).toSeq)
      .getOrElse(sys.error("usage: StreamProbe <query[,query...]>"))
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
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[stream] started ${e.name} at ${System.nanoTime() / 1000000} ms")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"[stream] batch ${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs} state=${p.stateOperators.mkString(";")}")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[stream] terminated at ${System.nanoTime() / 1000000} ms")
    })
    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      (1 to 2).foreach { pass =>
        graft.Pipelines.invalidateStoreCaches()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"== $name pass $pass wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
