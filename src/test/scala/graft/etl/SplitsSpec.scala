package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** chronoSplitEmbargo: exact integer boundary arithmetic, the no-leak
  * ordering invariant, and the NULL-timestamp guard. (hashSplit /
  * stratifiedHashSplit are covered in CleanseSpec / SamplingSpec.)
  */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = new Timestamp(us / 1000)

  test("chronoSplitEmbargo: boundary = lo + (span*num) div den, exact; three-way labels") {
    // span 10 days from epoch-day 0; 4/5 boundary = day 8; 1-day embargo
    val day = 86400000000L
    val rows = (0 to 10).map(i => (i.toLong, ts(i * day)))
    val out = Splits.chronoSplitEmbargo(rows.toDF("id", "t"), "t",
        trainNum = 4, trainDen = 5, embargoUs = day)
      .select(col("id"), col("split")).as[(Long, String)].collect().toMap
    // boundary us = 0 + (10*day * 4) div 5 = 8*day → day 8 is train,
    // day 9 is the embargo, day 10 on is test
    assert((0L to 8L).forall(out(_) == "train"), out)
    assert(out(9L) === "embargo")
    assert(out(10L) === "test")
  }

  test("chronoSplitEmbargo: no-leak invariant max(train)+embargo < min(test); embargo=0 degenerates") {
    val day = 86400000000L
    val rows = (0 until 50).map(i => (i.toLong, ts(i * 3600000000L + 17)))
    val labeled = Splits.chronoSplitEmbargo(rows.toDF("id", "t"), "t", 3, 4, day / 2)
    val spans = labeled.groupBy("split")
      .agg(min(unix_micros(col("t"))).as("lo"), max(unix_micros(col("t"))).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(spans("train")._2 + day / 2 < spans("test")._1)
    if (spans.contains("embargo")) {
      assert(spans("train")._2 < spans("embargo")._1)
      assert(spans("embargo")._2 <= spans("train")._2 + day / 2)
    }
    val noGap = Splits.chronoSplitEmbargo(rows.toDF("id", "t"), "t", 3, 4, 0L)
    assert(noGap.filter(col("split") === "embargo").count() === 0L)
  }

  test("chronoSplitEmbargo: NULL timestamp raises; fraction guards") {
    val df = Seq((1L, ts(0L)), (2L, null.asInstanceOf[Timestamp]))
      .toDF("id", "t")
    val ex = intercept[Exception](
      Splits.chronoSplitEmbargo(df, "t", 1, 2, 0L).collect())
    assert(ex.getMessage.contains("chronoSplitEmbargo") ||
      Option(ex.getCause).exists(_.getMessage.contains("chronoSplitEmbargo")))
    intercept[IllegalArgumentException](
      Splits.chronoSplitEmbargo(df, "t", 5, 5, 0L))
    intercept[IllegalArgumentException](
      Splits.chronoSplitEmbargo(df, "t", 1, 2, -1L))
  }
}
