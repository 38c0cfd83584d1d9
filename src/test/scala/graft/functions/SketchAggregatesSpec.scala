package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchAggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("KMV estimate is exact below k and within bounds above k") {
    // exact regime: 100 distinct < k=256
    val small = spark.range(1000).select((col("id") % 100).as("v"))
    val exactSmall = small.agg(
      SketchAggregates.kmvDistinct(col("v"), 256).as("est")).as[Long].collect()(0)
    assert(exactSmall == 100L)

    // estimate regime: 60k distinct >> k=256; KMV rse ≈ 1/sqrt(k-2) ≈ 6.3%
    val big = spark.range(60000).select(col("id").as("v")).repartition(8)
    val est = big.agg(
      SketchAggregates.kmvDistinct(col("v"), 256).as("est")).as[Long].collect()(0)
    assert(math.abs(est - 60000.0) / 60000.0 < 0.25, s"KMV estimate $est too far from 60000")
  }

  test("merge is partition-independent: same estimate for any layout") {
    val data = spark.range(30000).select((col("id") * 7919 % 50021).as("v"))
    def estWith(parts: Int): Long =
      data.repartition(parts).agg(
        SketchAggregates.kmvDistinct(col("v"), 128).as("est")).as[Long].collect()(0)
    // the k smallest hashes of a fixed value set are layout-invariant,
    // so partial-agg + merge must give bit-identical results
    assert(estWith(1) == estWith(2) && estWith(2) == estWith(16))
  }

  test("works per-group and over strings; NULLs ignored") {
    val df = Seq(
      ("a", Some("x")), ("a", Some("y")), ("a", None), ("a", Some("x")),
      ("b", Some("z"))).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(SketchAggregates.kmvDistinct(col("v"), 64).as("est"))
      .orderBy("g").as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 2L), ("b", 1L)))
  }

  test("SQL registration: graft_kmv_distinct usable from spark.sql") {
    GraftFunctions.register(spark)
    spark.range(500).select((col("id") % 37).as("v"))
      .createOrReplaceTempView("kmv_probe")
    val est = spark.sql("SELECT graft_kmv_distinct(v, 64) FROM kmv_probe")
      .as[Long].collect()(0)
    assert(est == 37L)
  }

  test("estimates agree with exact distinct on the documents corpus") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val r = docs.agg(
      SketchAggregates.kmvDistinct(col("text"), 256).as("est"),
      countDistinct(col("text")).as("exact")).collect()(0)
    val (est, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(est - exact) / exact < 0.25, s"KMV $est vs exact $exact")
  }

  // ------------------------------------------------------- Count-Min

  /** Zipf-ish skew: value v_i appears ~ N/(i+1) times — unambiguous
    * heavy hitters with a long tail, the CM target distribution.
    */
  private def skewed(n: Int, distinct: Int) =
    spark.range(n).select(
      concat(lit("v"), (floor(pow(lit(distinct).cast("double"),
        rand(seed = 7))) - 1).cast("long")).as("v"))

  private def cmTop(dfParts: Int, k: Int, depth: Int, width: Int) =
    skewed(20000, 500).repartition(dfParts)
      .agg(SketchAggregates.cmTopK(col("v"), k, depth, width).as("top"))
      .select(explode(col("top")).as("hh"))
      .select(col("hh.item"), col("hh.est"))
      .as[(String, Long)].collect().toSeq

  test("CM: exact when cardinality fits the sketch and candidate heap") {
    val df = Seq("a", "a", "a", "b", "b", "c", null).toDF("v")
    val got = df.agg(SketchAggregates.cmTopK(col("v"), 3).as("top"))
      .select(explode(col("top")).as("hh"))
      .select(col("hh.item"), col("hh.est"))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 3L), ("b", 2L), ("c", 1L)),
      s"low-cardinality CM must be exact and NULL-skipping, got $got")
  }

  test("CM: overestimate-only with the e/w error bound under collisions") {
    // width 64 over 500 distinct values FORCES collisions; depth 5.
    // CM guarantees est >= true always; est <= true + ε·N (ε = e/w)
    // w.p. 1−e^−d per item — deterministic here (fixed data + seeds).
    val exact = skewed(20000, 500).groupBy("v").count()
      .as[(String, Long)].collect().toMap
    val top = cmTop(dfParts = 8, k = 20, depth = 5, width = 64)
    assert(top.nonEmpty)
    val epsN = math.ceil(math.E / 64 * 20000).toLong
    top.foreach { case (v, est) =>
      val t = exact(v)
      assert(est >= t, s"CM must never underestimate: $v est $est < true $t")
      assert(est <= t + epsN, s"CM $v est $est exceeds true $t + εN $epsN")
    }
  }

  test("CM: top-k is layout-invariant on skewed data") {
    // counters merge additively (layout-invariant by construction);
    // the candidate heap re-ranks against merged counters, so the
    // final top-k agrees across partitionings for clear-cut hitters
    val a = cmTop(dfParts = 1, k = 10, depth = 5, width = 8192)
    val b = cmTop(dfParts = 13, k = 10, depth = 5, width = 8192)
    assert(a == b, s"layout changed the top-k: $a vs $b")
  }

  test("CM: top-k matches the exact groupBy top-k on skewed data") {
    val exact = skewed(20000, 500).groupBy("v").count()
      .orderBy(desc("count"), asc("v")).limit(10)
      .as[(String, Long)].collect().toSeq
    val got = cmTop(dfParts = 8, k = 10, depth = 5, width = 8192)
    assert(got == exact, s"CM top-10 $got != exact $exact")
  }

  test("CM: streaming aggregation across micro-batches equals batch") {
    // the custom TypedImperativeAggregate must round-trip its buffer
    // through the state store between micro-batches; 2 files +
    // maxFilesPerTrigger=1 forces at least 2 batches with a merge
    val dir = java.nio.file.Files.createTempDirectory("graft-cm-stream-").toString
    skewed(20000, 500).repartition(2).write.mode("overwrite").parquet(dir)
    def top(df: org.apache.spark.sql.DataFrame) = df
      .agg(SketchAggregates.cmTopK(col("v"), 10).as("top"))
      .select(explode(col("top")).as("hh"))
      .select(col("hh.item"), col("hh.est"))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = top(stream).writeStream.outputMode("complete")
      .format("memory").queryName("cm_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-cm-ck-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "streaming CM query timed out")
    val got = spark.table("cm_stream").as[(String, Long)].collect().toSeq
    val batch = top(spark.read.parquet(dir)).as[(String, Long)].collect().toSeq
    assert(got == batch, s"streaming CM $got != batch $batch")
  }

  test("CM: candidate values longer than 64 KiB survive buffer serialization") {
    // partial buffers serialize for the shuffle; writeUTF would throw
    // UTFDataFormatException past 64 KiB (regression)
    val big = "x" * 70000
    val df = spark.range(100).select(
      when(col("id") % 2 === 0, lit(big))
        .otherwise(concat(lit("y"), col("id"))).as("v"))
      .repartition(4)
    val got = df.agg(SketchAggregates.cmTopK(col("v"), 1).as("top"))
      .select(explode(col("top")).as("hh"))
      .select(col("hh.item"), col("hh.est"))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq((big, 50L)))
  }

  test("CM: SQL registration + non-string input rejected") {
    GraftFunctions.register(spark)
    Seq("x", "x", "y").toDF("v").createOrReplaceTempView("cm_probe")
    val got = spark.sql(
      "SELECT inline(graft_cm_topk(v, 2)) FROM cm_probe")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("x", 2L), ("y", 1L)))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_cm_topk(CAST(v AS BINARY), 2) FROM cm_probe").collect()
    }
    assert(err.getMessage.contains("graft_cm_topk"),
      s"expected the type-check message, got: ${err.getMessage}")
  }
}
