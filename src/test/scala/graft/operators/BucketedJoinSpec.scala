package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Co-located joins via bucketing — the 100 TB plan for repeated
  * training-set joins on the same key (SURVEY.md §7.7): persist both
  * sides bucketed by the join key and the sort-merge join needs NO
  * shuffle exchange at all.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bucket-wh-")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_buckets LOCATION '$wh/db'")
    spark.sql("DROP TABLE IF EXISTS graft_buckets.cust_b")
    spark.sql("DROP TABLE IF EXISTS graft_buckets.feat_b")

    val customer = graft.Tables.load(spark, sfDir, "customer")
    val feats = graft.etl.Features.orderFeatures(
      graft.Tables.load(spark, sfDir, "orders"))

    customer.write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/cust_b").saveAsTable("graft_buckets.cust_b")
    feats.write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/feat_b").saveAsTable("graft_buckets.feat_b")

    // disable broadcast so the join must be sort-merge — the case where
    // bucketing pays
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_buckets.cust_b")
        .join(spark.table("graft_buckets.feat_b"), Seq("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // same join on the raw (unbucketed) frames DOES shuffle
      val unbucketed = customer.join(feats, Seq("c_custkey"))
        .queryExecution.executedPlan.toString
      assert(unbucketed.contains("Exchange"))
      // and the result matches the unbucketed join
      assert(joined.count() == customer.join(feats, Seq("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
