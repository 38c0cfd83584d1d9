package graft.ext

import graft.SparkSpec

/** distinctNgramDiversity: hand-computed exact distinct counts, the
  * template-collapse signal, and the NULL/empty/single-token edges.
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("distinctNgramDiversity: hand-computed counts and ratios") {
    val docs = Seq(
      // diverse source: every token and bigram unique
      ("a", "one two three"), ("a", "four five"),
      // template source: the same doc thrice — per-doc stats identical,
      // corpus-level distincts collapse
      ("b", "spam ham spam"), ("b", "spam ham spam"), ("b", "spam ham spam"),
      // degenerate source: empty + NULL + single token
      ("c", ""), ("c", null), ("c", "lonely"))
      .toDF("source", "text")
    val out = CorpusStats.distinctNgramDiversity(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert((a.getLong(1), a.getLong(2), a.getLong(3)) === ((2L, 5L, 5L)))
    assert(a.getDouble(4) === 1.0)                    // ttr
    assert((a.getLong(5), a.getLong(6)) === ((3L, 3L))) // bigrams all unique
    assert(a.getDouble(7) === 1.0)
    val b = out("b")
    // 9 tokens but only {spam, ham}; 6 bigrams but only {spam ham, ham spam}
    assert((b.getLong(1), b.getLong(2), b.getLong(3)) === ((3L, 9L, 2L)))
    assert(b.getDouble(4) === 2.0 / 9.0)
    assert((b.getLong(5), b.getLong(6)) === ((6L, 2L)))
    assert(b.getDouble(7) === 2.0 / 6.0)
    val c = out("c")
    // one real token across three docs; no bigrams → NULL ratios there
    assert((c.getLong(1), c.getLong(2), c.getLong(3)) === ((3L, 1L, 1L)))
    assert(c.getDouble(4) === 1.0)
    assert(c.getLong(5) === 0L && c.getLong(6) === 0L)
    assert(c.isNullAt(7))
  }

  test("distinctNgramDiversity: all-empty source reports zero counts, NULL ratios") {
    val docs = Seq(("z", ""), ("z", null)).toDF("source", "text")
    val r = CorpusStats.distinctNgramDiversity(docs).head()
    assert(r.getLong(1) === 2L && r.getLong(2) === 0L && r.getLong(3) === 0L)
    assert(r.isNullAt(4) && r.isNullAt(7))
  }

  test("distinctNgramDiversity: NULL source is a real group with real counts (r12 audit)") {
    val docs = Seq((null.asInstanceOf[String], "x y x"), (null.asInstanceOf[String], "x z"))
      .toDF("source", "text")
    val r = CorpusStats.distinctNgramDiversity(docs).head()
    assert(r.isNullAt(0))
    // an equi-join on the NULL key would have zeroed these
    assert(r.getLong(2) === 5L && r.getLong(3) === 3L)
    assert(r.getLong(6) === 3L) // "x y", "y x", "x z"
  }

  test("distinctNgramDiversity: case folds before counting (Spam == spam)") {
    val docs = Seq(("s", "Spam spam SPAM ham")).toDF("source", "text")
    val r = CorpusStats.distinctNgramDiversity(docs).head()
    assert(r.getLong(2) === 4L && r.getLong(3) === 2L)
  }
}
