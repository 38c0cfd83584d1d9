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
