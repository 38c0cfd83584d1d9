package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime bloom-filter join pruning — at 100 TB the fact join
  * (lineitem ⋈ selective orders) should not shuffle fact rows that
  * can't match: Catalyst's InjectRuntimeFilter builds a bloom filter
  * from the selective build side and applies `might_contain` on the
  * probe side BEFORE its shuffle. The engine leans on this instead of
  * hand-rolling semi-join pruning (SURVEY §4: don't hand-schedule what
  * the optimizer already does); this spec pins the behavior so a
  * config regression can't silently drop it. Thresholds are lowered
  * because the gate data is far below the 10 GB production default.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective join injects a bloom filter on the probe side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val orders = graft.Tables.load(spark, sfDir, "orders")
        .filter(col("o_totalprice") > 400000) // highly selective build side
      val li = graft.Tables.load(spark, sfDir, "lineitem")
      val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
      // pruning must not change results
      val n = joined.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = li.join(orders, col("l_orderkey") === col("o_orderkey")).count()
      assert(n == plain, s"bloom-filtered join changed results: $n vs $plain")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
