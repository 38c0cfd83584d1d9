package graft.fs

import org.scalacheck.{Gen, rng}

import graft.SparkSpec

/** ScalaCheck-generated property tests for the merge-upsert core
  * (SURVEY.md §5.2 item 4): idempotence, key-union cardinality,
  * last-writer-wins. Drawn with a fixed seed (no scalatestplus bridge
  * in the offline cache, so samples are taken directly from Gen).
  */
class MergeProperties extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Double)]] =
    Gen.listOfN(12, Gen.zip(Gen.choose(0L, 9L), Gen.choose(-100.0, 100.0)))
      .map(_.groupBy(_._1).map(_._2.head).toList) // unique keys

  private def samples(n: Int): Seq[List[(Long, Double)]] = {
    val params = Gen.Parameters.default
    (0 until n).map { i =>
      rowsGen(params, rng.Seed(42L + i)).getOrElse(List((1L, 1.0)))
    }
  }

  test("merge properties: idempotent, key-union cardinality, new wins") {
    val cases = samples(10).grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq
    for (((oldRows, newRows), i) <- cases.zipWithIndex if oldRows.nonEmpty && newRows.nonEmpty) {
      val store = FeatureStore.temp(spark)
      val oldDf = oldRows.toDF("id", "x")
      val newDf = newRows.toDF("id", "x")
      store.createTable(FeatureTableSpec("t", Seq("id"), oldDf.schema))
      store.writeTable("t", oldDf, WriteMode.Merge)
      store.writeTable("t", newDf, WriteMode.Merge)
      val once = store.readTable("t").as[(Long, Double)].collect().toMap
      withClue(s"case $i old=$oldRows new=$newRows: ") {
        // cardinality = |old keys ∪ new keys|
        assert(once.keySet == (oldRows.map(_._1) ++ newRows.map(_._1)).toSet)
        // new rows win on key collision, old survive otherwise
        assert(once == oldRows.toMap ++ newRows.toMap)
        // idempotence
        store.writeTable("t", newDf, WriteMode.Merge)
        val twice = store.readTable("t").as[(Long, Double)].collect().toMap
        assert(twice == once)
      }
      store.deleteTable("t")
    }
  }
}

/** Remaining SURVEY §5.2-item-4 properties: U1 range, fillna
  * non-null preservation, hash determinism.
  */
class ExprProperties extends graft.SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val words = org.scalacheck.Gen.oneOf("Yes", "No", "No internet service", "", "yes")
  private def sample[T](g: org.scalacheck.Gen[T], seed: Long): T =
    g(org.scalacheck.Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get

  test("U1 numOptionalServices ∈ [0, 6] for arbitrary service values") {
    val cols = graft.etl.Features.optionalServiceCols
    val rows = (0 until 40).map { i =>
      (sample(words, i * 31L), sample(words, i * 31L + 1), sample(words, i * 31L + 2),
        sample(words, i * 31L + 3), sample(words, i * 31L + 4), sample(words, i * 31L + 5))
    }
    val df = rows.toDF(cols: _*)
      .select(graft.etl.Features.numOptionalServices(cols).as("n"))
    val ns = df.collect().map(_.getInt(0))
    assert(ns.forall(n => n >= 0 && n <= 6))
    // count equals the Scala-side reimplementation
    val expected = rows.map(r =>
      r.productIterator.count(_ == "Yes"))
    assert(ns.toSeq == expected)
  }

  test("fillna leaves non-null values untouched") {
    val df = Seq[(java.lang.Long, java.lang.Double)]((1L, 1.5), (2L, null), (3L, -2.0))
      .toDF("id", "x")
    val filled = df.na.fill(Map("x" -> 0.0)).orderBy("id")
      .as[(Long, Double)].collect().toSeq
    assert(filled == Seq((1L, 1.5), (2L, 0.0), (3L, -2.0)))
  }

  test("hash/xxhash64 determinism across invocations") {
    val df = Seq("a", "b", "c").toDF("s")
      .select(hash(col("s")).as("h32"), xxhash64(col("s")).as("h64"))
    val r1 = df.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val r2 = df.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(r1 == r2)
    // stable well-known value: Spark's Murmur3 of "a" with seed 42
    assert(r1.map(_._1).distinct.size == 3)
  }
}
