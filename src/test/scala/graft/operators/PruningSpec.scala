package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition-layout pruning — the scan-side half of the 100 TB story:
  * a date-partitioned table must prune statically on a literal filter
  * and dynamically (DPP) from a dim-side filter at join time.
  */
class PruningSpec extends SparkSpec {

  private lazy val partedDir = {
    val dir = Files.createTempDirectory("graft-parted-").toString
    graft.Tables.load(spark, sfDir, "events")
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    dir
  }

  test("static partition pruning: literal day filter reaches PartitionFilters") {
    val day = spark.read.parquet(partedDir)
      .select(col("day")).distinct().orderBy("day").limit(1)
      .collect()(0).getDate(0)
    val q = spark.read.parquet(partedDir).filter(col("day") === lit(day))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(day"),
      s"no partition filter in scan:\n$scan")
    // pruned scan reads exactly the one partition
    val n = q.count()
    val total = spark.read.parquet(partedDir).count()
    assert(n > 0 && n < total)
  }

  test("dynamic partition pruning: dim filter prunes the fact scan at join time") {
    val prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly")
    try {
      // allow DPP even when the build side isn't broadcast-reused
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
      val fact = spark.read.parquet(partedDir)
      import spark.implicits._
      // DPP requires a SELECTIVE predicate on the build side (its
      // planner rule skips unfiltered dims) and a real source relation
      val allDays = fact.select(col("day")).distinct().orderBy("day")
        .collect().map(_.getDate(0))
      val days = allDays.take(2)
      val dimDir = Files.createTempDirectory("graft-dim-").toString
      allDays.map(d => (d, if (days.contains(d)) "keep" else "drop")).toSeq
        .toDF("dim_day", "tag").write.mode("overwrite").parquet(dimDir)
      val dim = spark.read.parquet(dimDir).filter(col("tag") === "keep")
      val joined = fact.join(dim, col("day") === col("dim_day"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning") || plan.contains("dynamicpruningexpression"),
        s"no dynamic pruning subquery on the fact scan:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", prev)
  }
}
