package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GlobalIndexSpec extends SparkSpec {
  import spark.implicits._

  test("index is dense 0..n-1 and agrees with the local sort") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val got = GlobalIndex
      .withGlobalIndex(docs, Seq(col("n_chars"), col("doc_id")))
      .select(col("idx"), col("doc_id")).as[(Long, Long)]
      .collect().sortBy(_._1)
    val want = docs.select(col("n_chars"), col("doc_id")).as[(Long, Long)]
      .collect().sortBy(identity).map(_._2)
    assert(got.map(_._1).toSeq == (0L until want.length).toSeq, "dense 0..n-1")
    assert(got.map(_._2).toSeq == want.toSeq, "order matches local sort")
  }

  test("indices stay correct across many input partitions") {
    val df = spark.range(0, 1000).select(
      (col("id") * 37 % 1000).as("key"), col("id"))
    val out = GlobalIndex
      .withGlobalIndex(df.repartition(13), Seq(col("key")), "pos")
    // 37 is coprime to 1000, so key is a permutation: pos == key
    assert(out.filter(col("pos") =!= col("key")).isEmpty)
  }

  test("output order is the sorted order, partition by partition") {
    val df = spark.range(0, 500).select((col("id") * 7 % 500).as("k"))
    val out = GlobalIndex.withGlobalIndex(df, Seq(col("k")), "i")
    // no exchange after the numbering: collect preserves it
    val seq = out.select(col("i")).as[Long].collect().toSeq
    assert(seq == seq.sorted, "rows emerge globally ordered")
  }

  test("empty input yields an empty indexed frame") {
    val df = spark.range(0, 10).filter(col("id") < 0).toDF("id")
    assert(GlobalIndex.withGlobalIndex(df, Seq(col("id"))).isEmpty)
  }
}
