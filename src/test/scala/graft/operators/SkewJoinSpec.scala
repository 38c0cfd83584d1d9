package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin ≡ plain join for inner and left_outer") {
    val probe = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (9L, "e"))
      .toDF("k", "pv")
    val build = Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "bv")
    for (jt <- Seq("inner", "left_outer")) {
      val plain = probe.join(build, Seq("k"), jt)
        .select("k", "pv", "bv").collect().toSeq
        .map(r => (r.get(0), r.get(1), r.get(2))).sortBy(_.toString)
      val salted = SkewJoin.saltedJoin(probe, build, "k", salts = 4, joinType = jt)
        .select("k", "pv", "bv").collect().toSeq
        .map(r => (r.get(0), r.get(1), r.get(2))).sortBy(_.toString)
      assert(salted == plain, s"joinType=$jt")
    }
  }

  test("saltedJoin rejects right/full outer (salting-incompatible)") {
    val probe = Seq((1L, "a")).toDF("k", "pv")
    val build = Seq((1L, 10)).toDF("k", "bv")
    for (jt <- Seq("right_outer", "full", "full_outer")) {
      val e = intercept[IllegalArgumentException] {
        SkewJoin.saltedJoin(probe, build, "k", salts = 4, joinType = jt)
      }
      assert(e.getMessage.contains(jt))
    }
  }

  test("AQE splits a skewed join partition (the no-salting scale path)") {
    // The operator scaladocs lean on "AQE handles bucket skew" for the
    // LSH/range-join shuffles; this pins that OptimizeSkewedJoin
    // actually fires under our session shape. One hot key (~150k rows)
    // against uniform keys, thresholds lowered so the hot partition
    // counts as skewed at test scale.
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = spark.range(200000)
        .select(when(col("id") % 4 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("pv"))
      val build = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("bv"))
      val joined = probe.join(build, Seq("k"))
      // run THIS dataset's physical plan (count() builds a separate
      // QueryExecution and would leave this one un-finalized under AQE)
      joined.queryExecution.executedPlan.execute().count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"no skew-join split in final AQE plan:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("saltedJoin on testdata matches plain join aggregate") {
    val probe = graft.Tables.load(spark, sfDir, "events")
      .withColumnRenamed("user_id", "c_custkey")
    val build = graft.Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val salted = SkewJoin.saltedJoin(probe, build, "c_custkey", salts = 8)
      .groupBy("c_custkey").count().orderBy("c_custkey")
      .as[(Long, Long)].collect().toSeq
    val plain = probe.join(build, Seq("c_custkey"))
      .groupBy("c_custkey").count().orderBy("c_custkey")
      .as[(Long, Long)].collect().toSeq
    assert(salted == plain)
  }
}
