package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount: whitespace tokens, empty/blank → 0") {
    val df = Seq("a b  c", "  x ", "", "   ", "one").toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(3, 1, 0, 0, 1))
  }

  test("foldDiacritics: marks strip from any source form; base letters survive") {
    // precomposed é, decomposed e+U+0301, ü, ñ all fold; ß/æ have no
    // decomposition and survive (folding ≠ transliteration); ASCII
    // passes through untouched
    val df = Seq("café", "café", "Müller", "mañana", "straße æon",
        "plain ascii").toDF("text")
      .select(TextAnalysis.foldDiacritics(col("text")).as("f"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("cafe", "cafe", "Muller", "manana", "straße æon", "plain ascii"))
  }

  test("foldDiacritics: non-Latin combining marks are NOT diacritic noise") {
    // r17 ADVICE: Hebrew niqqud (bet+sheva+dagesh), Arabic harakat
    // (beh+fatha) and Devanagari vowel signs (ka+vowel-sign-i) are
    // \p{M} but semantically load-bearing — the Latin-scoped strip
    // must leave them intact (NFC-recomposed), while Latin marks in
    // the SAME string still fold.
    val hebrew = "בְּ"      // bet + sheva + dagesh
    val arabic = "بَ"            // beh + fatha
    val devanagari = "कि"        // ka + vowel sign i
    val mixed = s"café $hebrew"       // Latin folds, Hebrew survives
    val df = Seq(hebrew, arabic, devanagari, mixed).toDF("text")
      .select(TextAnalysis.foldDiacritics(col("text")).as("f"))
    val out = df.collect().map(_.getString(0)).toSeq
    val nfc = (s: String) =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    assert(out(0) == nfc(hebrew), s"niqqud stripped: ${out(0)}")
    assert(out(1) == nfc(arabic), s"harakat stripped: ${out(1)}")
    assert(out(2) == nfc(devanagari), s"vowel sign stripped: ${out(2)}")
    assert(out(3) == nfc(s"cafe $hebrew"), s"mixed wrong: ${out(3)}")
  }

  test("fingerprint: case/whitespace-insensitive, content-sensitive") {
    val df = Seq("Hello  World", "hello world", "hello worlds").toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
    val fps = df.collect().map(_.getString(0)).toSeq
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("predictedLang: stopword argmax with fixed tie-break") {
    val df = Seq(
      "the cat and the dog is in a house",   // en
      "der hund und die katze ist nicht da", // de
      "xyzzy qwerty")                        // no hits → tie → en (first)
      .toDF("text").select(TextAnalysis.predictedLang(col("text")).as("lang"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("en", "de", "en"))
  }

  test("predictedLang: CJK text is classified zh (no \\b around CJK)") {
    val df = Seq("我是一个学生，这是我的书，他在这里")
      .toDF("text").select(TextAnalysis.predictedLang(col("text")).as("lang"),
        TextAnalysis.langScore(col("text"), "zh").as("score_zh"))
    val r = df.collect()(0)
    assert(r.getString(0) == "zh", s"got ${r.getString(0)}")
    assert(r.getInt(1) > 0)
  }

  test("qualityScore in [0,1], higher for stopword-rich mid-length text") {
    val good = "the quick brown fox and the lazy dog is a classic of the genre " * 3
    val bad = "zz"
    val df = Seq(good, bad).toDF("text")
      .select(TextAnalysis.qualityScore(col("text")).as("q"))
    val Seq(qg, qb) = df.collect().map(_.getDouble(0)).toSeq
    assert(qg > qb && qg <= 1.0 && qb >= 0.0)
  }

  test("repetitionStats: counts duplicate bigrams; degenerate docs → 0") {
    val df = Seq(
      "a b a b a",   // bigrams: ab, ba, ab, ba → 4 total, 2 distinct
      "w x y z",     // 3 distinct of 3
      "solo",        // <2 tokens → no bigrams
      "").toDF("text")
    val cols = TextAnalysis.repetitionStats(col("text"))
    val got = df.select(cols.map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((4L, 2L, 0.5), (3L, 3L, 0.0), (0L, 0L, 0.0), (0L, 0L, 0.0)))
  }

  test("fused ngram fingerprints/stats equal the HOF-chain construction") {
    val docs = Seq(
      "the cat sat on the mat the cat sat again",
      "a b a b a b a b",
      "unique words only here now",
      "solo",
      "", null.asInstanceOf[String],
      "x " * 300 + "tail").toDF("text")
    // the pre-fusion HOF chain, inlined as the oracle; the fused
    // expression emits BinaryType digests, so hex it back to the
    // portable oracle form for the comparison (bijective)
    def hofFingerprints(text: org.apache.spark.sql.Column, n: Int, maxTokens: Int) = {
      val w = slice(TextAnalysis.tokens(text), 1, maxTokens)
      array_distinct(transform(TextAnalysis.wordNgramsOf(w, n), g => md5(g)))
    }
    val both = docs.select(
      transform(TextAnalysis.ngramFingerprints(col("text"), 3, maxTokens = 64),
        g => lower(hex(g))).as("fused"),
      hofFingerprints(col("text"), 3, 64).as("hof"))
    val rows = both.collect()
    rows.foreach { r =>
      val fused = if (r.isNullAt(0)) null else r.getSeq[String](0)
      val hof = if (r.isNullAt(1)) null else r.getSeq[String](1)
      assert(fused == hof, s"fused=$fused hof=$hof")
    }
    // stats parity against hand counts is covered by the
    // repetitionStats spec above; here pin the struct path on a doc
    // with repeated bigrams
    val s = Seq("a b a b a").toDF("text")
      .select(TextAnalysis.repetitionStats(col("text"))
        .map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Double)].head()
    assert(s == ((4L, 2L, 0.5)))
  }

  test("scrubPii redacts emails and phones; piiCount counts them") {
    val s = "mail a.b+c@site.org or x@y.io, call 123-456-7890; id 12-34 stays"
    val got = Seq(s).toDF("text").select(
      TextAnalysis.scrubPii(col("text")).as("c"),
      TextAnalysis.piiCount(col("text")).as("n"))
      .as[(String, Long)].collect()(0)
    assert(got._1 == "mail <EMAIL> or <EMAIL>, call <PHONE>; id 12-34 stays")
    assert(got._2 == 3L)
    // a phone-shaped substring INSIDE an email is redacted once by the
    // sequential scrub, so it must be counted once
    val overlap = Seq("reach 555-867-5309@example.com now").toDF("text").select(
      TextAnalysis.scrubPii(col("text")).as("c"),
      TextAnalysis.piiCount(col("text")).as("n"))
      .as[(String, Long)].collect()(0)
    assert(overlap._1 == "reach <EMAIL> now" && overlap._2 == 1L, s"got $overlap")
  }

  test("contaminationHits: substring hits per doc; corpus side never shuffles") {
    val docs = Seq((1L, "the quick brown fox jumps"), (2L, "quick brown"),
      (3L, "nothing here")).toDF("id", "txt")
    val probes = Seq("quick brown", "fox").toDF("p")
    val hits = TextAnalysis.contaminationHits(docs, "id", "txt", probes, "p")
    val got = hits.orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 1L)), s"got $got")
    // the only exchanges allowed are the broadcast of the probe side
    // and the final group-by agg — never a corpus-wide repartition join
    val plan = hits.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled for the join:\n$plan")
  }

  test("contaminationHitsNgram: shared word runs hit, dedup within doc") {
    val run = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"prefix $run suffix"),        // contains the 8-gram run
      (2L, s"$run $run"),                  // run twice → still distinct grams
      (3L, "no overlap at all here truly none ever")).toDF("id", "txt")
    val probes = Seq(run).toDF("ptxt")
    val got = TextAnalysis
      .contaminationHitsNgram(docs, "id", "txt", probes, "ptxt", n = 8)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    // doc 1: exactly the probe's single 8-gram; doc 2 contains it too
    // (and other grams the probe does not have); doc 3 clean
    assert(got == Seq((1L, 1L), (2L, 1L)), s"got $got")
    // short docs (< n tokens) produce no grams and cannot match
    val short = Seq((9L, "one two three")).toDF("id", "txt")
    assert(TextAnalysis
      .contaminationHitsNgram(short, "id", "txt", probes, "ptxt", 8)
      .collect().isEmpty)
  }

  test("contaminationHitsNgramBloom: exact equality with the shuffle path, bloom cut in plan") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val probes = docs.filter(col("doc_id").isin(3, 7, 11, 19, 23))
    val bloom = TextAnalysis.contaminationHitsNgramBloom(
      docs, "doc_id", "text", probes, "text", n = 8, expectedGrams = 1L << 16)
    val exact = TextAnalysis.contaminationHitsNgram(
      docs, "doc_id", "text", probes, "text", n = 8)
    val got = bloom.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val want = exact.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == want, "bloom FPs must die in the confirming join")
    // the corpus gram stream is cut by might_contain BEFORE the join
    val plan = bloom.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected bloom filter cut:\n$plan")
  }

  test("termStats: correct tf/df/idf, and plan construction fires no Spark job") {
    // listener events are async, so count by JobStart submission time:
    // an eager job during operator construction would be submitted (and,
    // being blocking, completed) before t0
    val jobTimes = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobTimes.add(js.time); ()
      }
    }
    val tReg = System.currentTimeMillis()
    spark.sparkContext.addSparkListener(listener)
    try {
      val docs = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
      val stats = TextAnalysis.termStats(docs, "text", "doc_id")
      Thread.sleep(5)
      val t0 = System.currentTimeMillis()
      spark.range(1).count() // sentinel: proves listener sees jobs ≥ t0
      val deadline = System.nanoTime() + 10_000_000_000L
      while (!jobTimes.iterator().hasNext && System.nanoTime() < deadline) Thread.sleep(10)
      import scala.jdk.CollectionConverters._
      val times = jobTimes.iterator().asScala.map(_.toLong).toSeq
      assert(times.exists(_ >= t0), "sentinel job not observed")
      val eager = times.filter(t => t >= tReg && t < t0)
      assert(eager.isEmpty, s"operator construction ran ${eager.size} eager job(s)")
      val got = stats.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(got == Set(
        ("a", 1L, 2L, 2L, 1.0),  // term a: doc 1 tf=2, df=2, idf_ratio=2/2
        ("a", 2L, 1L, 2L, 1.0),
        ("b", 1L, 1L, 1L, 2.0),
        ("c", 2L, 1L, 1L, 2.0)))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("pruneTopWords: top-k by df (ties by word), order-preserving rebuild") {
    val docs = Seq(
      (1L, "the cat the hat"),   // df: the→3, cat→2, hat→1, dog→1, a→2
      (2L, "a cat the dog"),
      (3L, "a the")).toDF("doc_id", "text")
    // k=2 → stop = {the(3), a(2)}: 'a' beats 'cat' (same df) by word order
    val got = TextAnalysis.pruneTopWords(docs, k = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "cat hat"), (2L, "cat dog"), (3L, "")))
  }

  test("pruneTopWords: k=0 is identity; k >= vocab empties every doc") {
    val docs = Seq((1L, "x y"), (2L, "y z")).toDF("doc_id", "text")
    val id = TextAnalysis.pruneTopWords(docs, 0).orderBy("doc_id").collect()
    assert(id.map(_.getString(1)).toSeq == Seq("x y", "y z"))
    val all = TextAnalysis.pruneTopWords(docs, 10).orderBy("doc_id").collect()
    assert(all.map(_.getString(1)).toSeq == Seq("", ""))
  }

  // --- DSIR importance + bigram-LM brute-force references -----------

  private def md5Hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  private val dsirDocs = Seq(
    (1L, "the cat sat", true),       // target
    (2L, "the dog ran far", true),   // target
    (3L, "el gato corre", false),
    (4L, "", false),                 // empty → 0 tokens, score 0
    (5L, "the the the", false))

  test("hashedImportanceScores equals a driver-side brute force") {
    val df = dsirDocs.toDF("doc_id", "text", "is_t")
    val got = TextAnalysis.hashedImportanceScores(df, "doc_id", "text",
      col("is_t"), bucketHexLen = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    // brute force, mirroring the §5.3 quantization exactly
    val toks = dsirDocs.map { case (id, t, isT) =>
      (id, t.trim.toLowerCase match {
        case "" => Seq.empty[String]
        case s  => s.split("\\s+").toSeq
      }, isT)
    }
    val bucketOf = (w: String) => md5Hex(w).take(2)
    val cr = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val ct = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for ((_, ws, isT) <- toks; w <- ws) {
      cr(bucketOf(w)) += 1; if (isT) ct(bucketOf(w)) += 1
    }
    val (tr, tt) = (cr.values.sum, ct.values.sum)
    val b = 256L
    def qb(bk: String): Long =
      math.floor(((ct(bk) + 1L) * (tr + b)).toDouble /
        ((cr(bk) + 1L) * (tt + b)).toDouble * 1e6 + 0.5).toLong
    val expected = toks.map { case (id, ws, _) =>
      (id, ws.size.toLong, ws.map(w => qb(bucketOf(w))).sum)
    }.sortBy(_._1)
    assert(got === expected)
  }

  test("importanceLogWeights equals a driver-side brute force (ulp tolerance)") {
    val df = dsirDocs.toDF("doc_id", "text", "is_t")
    val got = TextAnalysis.importanceLogWeights(df, "doc_id", "text",
      col("is_t"), bucketHexLen = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    val toks = dsirDocs.map { case (id, t, isT) =>
      (id, t.trim.toLowerCase match {
        case "" => Seq.empty[String]
        case s  => s.split("\\s+").toSeq
      }, isT)
    }
    val bucketOf = (w: String) => md5Hex(w).take(2)
    val cr = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val ct = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    for ((_, ws, isT) <- toks; w <- ws) {
      cr(bucketOf(w)) += 1; if (isT) ct(bucketOf(w)) += 1
    }
    val (tr, tt) = (cr.values.sum, ct.values.sum)
    val b = 256L
    def lw(bk: String): Double =
      math.log(((ct(bk) + 1L) * (tr + b)).toDouble /
        ((cr(bk) + 1L) * (tt + b)).toDouble)
    for (((id, n, w), (eid, ews, _)) <- got.zip(toks.sortBy(_._1))) {
      assert(id == eid && n == ews.size.toLong)
      val ew = ews.map(x => lw(bucketOf(x))).sum
      assert(math.abs(w - ew) <= 1e-9 * math.max(1.0, math.abs(ew)),
        s"doc $id: $w != $ew")
    }
    // target docs score higher than the off-target doc
    val byId = got.map(r => r._1 -> r._3).toMap
    assert(byId(1L) / 3 > byId(3L) / 3)
  }

  test("hashedLinearScore equals brute force; degenerate docs score 0; no shuffle") {
    val docs = Seq((1L, "The quick Brown fox"), (2L, "solo"), (3L, ""),
      (4L, "a b a b")).toDF("doc_id", "text")
    val got = TextAnalysis.hashedLinearScore(docs, "doc_id", "text")
    val rows = got.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    def wt(g: String): Long =
      (java.lang.Long.parseLong(md5Hex(g).take(13), 16) % 2001L) - 1000L
    def feats(t: String): Seq[String] = {
      val ws = t.trim.toLowerCase match {
        case "" => Seq.empty[String]; case s => s.split("\\s+").toSeq
      }
      ws ++ ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val expected = Seq((1L, "The quick Brown fox"), (2L, "solo"), (3L, ""),
      (4L, "a b a b")).map { case (id, t) =>
      (id, feats(t).size.toLong, feats(t).map(wt).sum)
    }
    assert(rows === expected)
    // pure scan projection: no exchange anywhere in the plan
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("bigramLmScores: hand-computed interpolation incl. first-token backoff") {
    // corpus: "a b" x2, "a c", "z" (single token), "" (empty)
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z"), (5L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScores(docs, "doc_id", "text", lambda = 0.7)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // unigram: a→3, b→2, c→1, z→1, tot=7; bigram: (a,b)→2, (a,c)→1; cp(a)=3
    // mirror the engine's IEEE arithmetic exactly: 1.0−0.7 ≠ 0.3
    val lam = 0.7; val om = 1.0 - lam
    def q(p: Double): Long = math.floor(p * 1e9 + 0.5).toLong
    val first = (w: Long) => q(om * (w.toDouble / 7.0))  // (1−λ)·p(w)
    val bg = (cb: Long, cp: Long, cu: Long) =>
      q(lam * (cb.toDouble / cp.toDouble) + om * (cu.toDouble / 7.0))
    val expected = Seq(
      (1L, 2L, first(3) + bg(2, 3, 2)),   // "a" + "b|a"
      (2L, 2L, first(3) + bg(2, 3, 2)),
      (3L, 2L, first(3) + bg(1, 3, 1)),   // "a" + "c|a"
      (4L, 1L, first(1)),                 // single token: backoff only
      (5L, 0L, 0L))                       // empty: left-join zero
    assert(got === expected)
  }

  test("bigramLmScoresWithStats: unseen pairs/terms take backoff, positions never drop") {
    // model fit on corpus A = "a b a": uni a→2, b→1, tot=3; pair
    // (a,b)→1, (b,a)→1; cp(a)=1, cp(b)=1. Serve batch B with tokens
    // the model has never seen.
    val modelDocs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val termCounts = TextAnalysis.termOccurrenceCounts(modelDocs, "text")
    val pairCounts = TextAnalysis.bigramPairCounts(modelDocs, "text")
    val batch = Seq(
      (10L, "a c"),   // pair (a,c) unseen, term c unseen
      (11L, "b a"),   // fully covered
      (12L, "x y"))   // nothing covered at all
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScoresWithStats(batch, "doc_id", "text",
        termCounts, pairCounts, lambda = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val lam = 0.5; val om = 1.0 - lam
    def q(p: Double): Long = math.floor(p * 1e9 + 0.5).toLong
    val expected = Seq(
      // "a": (1−λ)·2/3; "c|a": pair unseen → λ·0, c unseen → (1−λ)·0
      (10L, 2L, q(om * (2.0 / 3.0)) + q(0.0)),
      // "b": (1−λ)·1/3; "a|b": λ·1/1 + (1−λ)·2/3
      (11L, 2L, q(om * (1.0 / 3.0)) + q(lam * 1.0 + om * (2.0 / 3.0))),
      // both positions fully unseen — still counted, scored 0
      (12L, 2L, q(0.0) + q(0.0)))
    assert(got === expected)
  }

  test("hashedImportanceScoresWithStats: buckets absent from the model score the smoothed default") {
    // model state covers corpus A only; batch B introduces new tokens
    // whose buckets may be absent — every position must still count
    // and absent buckets take the add-one-smoothed default ratio
    val modelDocs = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
    val pred = col("doc_id") === 1L
    val stats = TextAnalysis.dsirBucketCounts(modelDocs, "text", pred)
    val batch = Seq((10L, "zeta theta kappa unseen tokens here"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.hashedImportanceScoresWithStats(batch, "doc_id",
        "text", stats)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    assert(got._2 == 6L, s"all 6 positions must count, got ${got._2}")
    // model totals tr = tt = 3 and every model bucket has ct = cr
    // (all-target corpus), so BOTH the absent-bucket default
    // (3+256)/(3+256) and any collision bucket's exact ratio equal 1
    // → every position contributes exactly 1e6
    assert(got._3 == 6000000L, s"expected 6e6, got ${got._3}")
  }

  test("corpusCard: hand-computed per-source stats incl. dups, empties, languages") {
    val docs = Seq(
      (1L, "hello world", "en", "web"),
      (2L, "hello  world ", "en", "web"),  // same fingerprint as 1 (ws-normalized)
      (3L, "", "en", "web"),               // empty
      (4L, "hallo welt", "de", "web"),
      (5L, "one two three", "en", "books"))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.corpusCard(docs, "text", "source")
      .orderBy("source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // web: 4 docs, tokens 2+2+0+2 = 6, chars 11+13+0+10 = 34, 1 empty,
    // 3 en, 3 distinct fingerprints (docs 1 and 2 collapse) → 1 dup
    assert(got("web") == ((4L, 6L, 34L, 1L, 3L, 3L, 1L)))
    assert(got("books") == ((1L, 3L, 13L, 0L, 1L, 1L, 0L)))
  }

  test("contentManifest/manifestDiff: order-invariant digest, change detection") {
    val docs = Seq(
      (1L, "hello world", "web"), (2L, "more text here", "web"),
      (3L, "one two three", "books"))
      .toDF("doc_id", "text", "source")
    // the digest must not depend on row order / partitioning
    val m1 = TextAnalysis.contentManifest(docs, "text", "source")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val m2 = TextAnalysis.contentManifest(
        docs.orderBy(org.apache.spark.sql.functions.col("doc_id").desc)
          .repartition(7), "text", "source")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m1 === m2)
    // identical snapshots: nothing changed
    val same = TextAnalysis.manifestDiff(docs, docs, "text", "source")
      .collect().map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(same.values.forall(_ == false))
    // one edited doc flips exactly its source (count unchanged — the
    // digest alone must catch it); a dropped source reports 0/0
    val edited = Seq(
      (1L, "hello world!", "web"), (2L, "more text here", "web"))
      .toDF("doc_id", "text", "source")
    val diff = TextAnalysis.manifestDiff(docs, edited, "text", "source")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(5))).toMap
    assert(diff("web")._3 === true && diff("web")._1 === diff("web")._2)
    assert(diff("books") === ((1L, 0L, true)))
  }

  test("contentManifest: digest stays width-stable past the BIGINT wrap point (r12)") {
    // 4500 ~2^51-mean terms in ONE group: a plain long sum would wrap;
    // the mod-2^52 digest must equal the exact BigInt sum mod 2^52
    val n = 4500
    val docs = (0 until n).map(i => (i.toLong, s"doc$i", "s")).toDF("id", "text", "source")
    val got = TextAnalysis.contentManifest(docs, "text", "source").head()
    val expected = (0 until n).map { i =>
      BigInt(org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"doc$i").take(13), 16)
    }.sum.mod(BigInt(1L) << 52)
    assert(got.getLong(1) === n.toLong)
    assert(BigInt(got.getLong(2)) === expected)
    assert(got.getLong(2) >= 0L && got.getLong(2) < (1L << 52))
  }

  test("bpeTrain: hand-computed merges on the classic corpus, then segment composition") {
    // Sennrich et al.'s canonical corpus: low×5, lower×2, newest×6,
    // widest×3. Hand-run: round 1 counts give es=9/st=9 (tie → (e,s)
    // lexicographic), then est=9, then lo=7/ow=7 (tie → (l,o)), then
    // low=7, then ew/ne/w-est all 6 (tie → (e,w)).
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest newest newest newest"),
      (4L, "widest widest widest")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, "text", numMerges = 5)
    assert(merges == Seq("e" -> "s", "es" -> "t", "l" -> "o",
      "lo" -> "w", "e" -> "w"))
    // the learned table feeds the application operator directly:
    // "lowest" = low + est under these merges
    val seg = TextAnalysis.bpeSegment(
        Seq((1L, "lowest")).toDF("doc_id", "text"), "text", merges)
      .select("bpe_segments").as[Seq[String]].collect().head
    assert(seg == Seq("low est"))
  }

  test("bpeTrain: stops early when no pair reaches minCount") {
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrain(docs, "text", numMerges = 5).isEmpty)
    // with minCount 1 it keeps merging deterministically
    val m = TextAnalysis.bpeTrain(docs, "text", numMerges = 2, minCount = 1L)
    assert(m == Seq("a" -> "b", "c" -> "d"))
  }

  test("bpeSegment: hand-computed segmentations, merge order, overlap, empties") {
    val merges = Seq("t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
      "an" -> "d", "in" -> "g")
    val docs = Seq(
      (1L, "thinking"),       // t+h, i+n, in+g but NOT th+e
      (2L, "the theater"),    // th+e twice (second merge consumes first's output)
      (3L, "aaa"),            // overlap guard: no (a,a) merge -> 3 pieces
      (4L, "rain"),           // order: (i,n) wins before (a,n) can apply
      (5L, "and"),            // a+n then an+d -> single piece
      (6L, ""),               // empty text -> no words
      (7L, "TH IN"))          // lowercased before segmentation
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeSegment(docs, "text", merges)
      .orderBy("doc_id")
      .select("bpe_segments").as[Seq[String]].collect().toSeq
    assert(got == Seq(
      Seq("th in k ing"),
      Seq("the", "the a t e r"), // no (e,r) merge in this table
      Seq("a a a"),
      Seq("r a in"),
      Seq("and"),
      Seq.empty,
      Seq("th", "in")))
    // piece stream flattening: words contribute pieces in order
    val pieces = TextAnalysis.bpeSegment(docs.filter(col("doc_id") === 1L), "text", merges)
      .select(TextAnalysis.bpePieces(col("bpe_segments")).as("p"))
      .as[Seq[String]].collect().head
    assert(pieces == Seq("th", "in", "k", "ing"))
    // an in-text U+001F must not forge token boundaries: it is stripped
    // before wrapping, so "th\u001fe" segments exactly like "the"
    val withSep = Seq((1L, "th\u001fe")).toDF("doc_id", "text")
    val sepGot = TextAnalysis.bpeSegment(withSep, "text", merges)
      .select("bpe_segments").as[Seq[String]].collect().head
    assert(sepGot == Seq("the"), s"got $sepGot")
    // same guard on the training side: counts merge with the clean word
    val trainSep = Seq((1L, "a\u001fb a\u001fb ab")).toDF("doc_id", "text")
    val trainClean = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrain(trainSep, "text", numMerges = 1) ==
      TextAnalysis.bpeTrain(trainClean, "text", numMerges = 1))
  }

  test("withSegmentLangProfile classifies per line; zero-hit segments stay unknown") {
    val en = "the cat is in the house"
    val es = "el perro es de la casa"
    val unk = "zzzz qqqq wwww rrrr tttt"
    def profile(t: String) = TextAnalysis.withSegmentLangProfile(
      Seq((1L, t)).toDF("id", "text"), "text", out = "p")
    val got = profile(s"$en\nshort\n$es\n$unk\n$en")
      .select("p.n_segments", "p.n_classified", "p.n_en", "p.n_es",
        "p.n_fr", "p.majority_lang", "p.is_mixed")
      .head()
    // 'short' dies at the minChars floor; the zero-hit line counts as
    // a segment but never classifies; es's 'la' (also a French
    // stopword) must not flip the line to fr
    assert((got.getInt(0), got.getInt(1), got.getInt(2), got.getInt(3),
      got.getInt(4), got.getString(5), got.getBoolean(6))
      === ((4, 3, 2, 1, 0, "en", true)))
    // equal counts tie toward langOrder (en before es); NULL text is
    // an empty profile with a NULL majority
    assert(profile(s"$en\n$es").select("p.majority_lang")
      .as[String].head() === "en")
    val empty = TextAnalysis.withSegmentLangProfile(
        Seq((1L, null: String)).toDF("id", "text"), "text", out = "p")
      .select("p.n_segments", "p.majority_lang", "p.is_mixed").head()
    assert(empty.getInt(0) === 0)
    assert(empty.isNullAt(1))
    assert(empty.getBoolean(2) === false)
  }

  test("gopherQualityFlags: boundary inclusivity, unicode bullets, word-bounded stopwords") {
    def flags(t: String, minWords: Int = 2) =
      Seq(t).toDF("text")
        .select(TextAnalysis.gopherQualityFlags(col("text"),
          minWords = minWords).as("g"))
        .select("g.n_words", "g.bullet_line_ratio", "g.alpha_word_ratio",
          "g.n_stopword_hits", "g.pass").head()
    // '•' bullets count like '-'/'*'; ratio exactly at 0.9 would pass,
    // 1.0 fails
    val b = flags("• the cat and dog")
    assert(b.getDouble(1) === 1.0)
    assert(!b.getBoolean(4))
    // 'to' inside 'afternoons' must NOT hit (word-bounded match);
    // a doc with zero hits fails the stopword floor alone
    val s = flags("cats nap during quiet afternoons here today now")
    assert(s.getInt(3) === 0)
    assert(!s.getBoolean(4))
    // empty/NULL text: all-zero metrics, fails the word floor
    val e = Seq((1L, null: String)).toDF("id", "text")
      .select(TextAnalysis.gopherQualityFlags(col("text")).as("g"))
      .select("g.n_words", "g.mean_word_len", "g.pass").head()
    assert((e.getInt(0), e.getDouble(1), e.getBoolean(2)) === ((0, 0.0, false)))
    // a clean passing doc at relaxed minWords
    val ok = flags("the cat and dog have fun with toys here daily.")
    assert(ok.getBoolean(4))
  }

  test("c4CleanLines: terminal punctuation, word floor, boilerplate drops") {
    def clean(t: String) = Seq(t).toDF("text")
      .select(TextAnalysis.c4CleanLines(col("text")).as("c"))
      .select("c.text", "c.n_kept", "c.n_dropped", "c.keep_doc").head()
    val got = clean("Good long sentence here.\nbad no punct\nshort one.\n" +
      "Uses { braces } badly.\nEnable JavaScript now please.\n" +
      "lorem ipsum dolor sit amet.\nHe said \"fine.\"\nAlso quite good!")
    assert(got.getString(0) ===
      "Good long sentence here.\nHe said \"fine.\"\nAlso quite good!")
    assert((got.getInt(1), got.getInt(2), got.getBoolean(3)) === ((3, 5, true)))
    // everything dropped → empty rebuild, doc flagged out
    val none = clean("all bad\n{ code }.")
    assert((none.getString(0), none.getInt(1), none.getBoolean(3))
      === (("", 0, false)))
  }

  test("dropRepeatedLines keeps first occurrences in original form, blanks survive") {
    val text = "Nav Bar\ncontent a\nnav bar\n\ncontent b\n\nNav Bar\ncontent a"
    val got = Seq(text).toDF("text")
      .select(TextAnalysis.dropRepeatedLines(col("text")).as("r"))
      .select("r.text", "r.n_removed").head()
    // case-variant 'nav bar' and exact repeats die; the FIRST form
    // ('Nav Bar', capitalized) is what survives; both blanks stay
    assert(got.getString(0) === "Nav Bar\ncontent a\n\ncontent b\n")
    assert(got.getInt(1) === 3)
    // no-op on clean docs and on NULL
    val clean = Seq("a\nb").toDF("text")
      .select(TextAnalysis.dropRepeatedLines(col("text")).as("r"))
      .select("r.text", "r.n_removed").head()
    assert((clean.getString(0), clean.getInt(1)) === (("a\nb", 0)))
    val nul = Seq((1L, null: String)).toDF("id", "text")
      .select(TextAnalysis.dropRepeatedLines(col("text")).as("r"))
      .select("r.text", "r.n_removed").head()
    assert((nul.getString(0), nul.getInt(1)) === (("", 0)))
  }

  test("dedupLinesGlobal: first corpus occurrence wins ACROSS docs, blanks survive") {
    val docs = Seq(
      (1L, "banner\nbody one\n\ntail"),
      (2L, "banner\nbody two\n\ntail"),
      (3L, " banner \nbody three")).toDF("id", "text")
    val got = TextAnalysis.dedupLinesGlobal(docs, "id", "text")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    // doc 1 keeps everything (first occurrences); doc 2 loses banner
    // AND tail but keeps its blank; doc 3's whitespace-padded banner
    // dedupes by TRIMMED identity (the padded form dies)
    assert(got === Seq(
      (1L, "banner\nbody one\n\ntail", 4L, 0L),
      (2L, "body two\n", 4L, 2L),
      (3L, "body three", 2L, 1L)))
    // minChars 0 is a named error (would pool every blank line)
    val e = intercept[IllegalArgumentException](
      TextAnalysis.dedupLinesGlobal(docs, "id", "text", minChars = 0))
    assert(e.getMessage.contains("minChars"))
  }
}

class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: the same full-batch recurrence over plain
    * Scala maps — an independent implementation, not a re-derivation of
    * the Spark plan.
    */
  private def reference(docs: Seq[(Long, String, Boolean)],
      iterations: Int): Map[Long, Long] = {
    def bucket(term: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(term.getBytes("UTF-8"))
      java.lang.Long.parseLong(f"${md(0) & 0xFF}%02x", 16)
    }
    val feats = docs.map { case (id, text, _) =>
      id -> text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(bucket).map { case (b, ts) => b -> ts.length.toLong }
    }.toMap
    val ys = docs.map { case (id, _, p) => id -> (if (p) 1L else -1L) }.toMap
    val w = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (_ <- 1 to iterations) {
      val mis = docs.map(_._1).filter { id =>
        val mar = feats(id).map { case (b, c) => w(b) * c }.sum + w(256L)
        ys(id) * mar <= 0
      }
      mis.foreach { id =>
        feats(id).foreach { case (b, c) => w(b) += ys(id) * c }
        w(256L) += ys(id)
      }
    }
    w.toMap
  }

  test("batchPerceptronHashed ≡ driver-side reference on a mixed corpus") {
    val docs = Seq(
      (1L, "good clean text about spark", true),
      (2L, "mehr guter text", false),
      (3L, "spark spark quality data", true),
      (4L, "schlechter text hier", false),
      (5L, "data pipelines for the win", true),
      (6L, "", false)) // token-less doc: bias-only margin, still votes
    val df = docs.map { case (id, t, p) => (id, t, p) }
      .toDF("doc_id", "text", "pos_label")
    val got = Perceptron.batchPerceptronHashed(df, "doc_id", "text",
        positive = col("pos_label"), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = reference(docs, 4)
    assert((0L to 256L).forall(p => got(p) == ref.getOrElse(p, 0L)),
      s"weight mismatch: got ${got.filter(_._2 != 0)}, ref ${ref.filter(_._2 != 0)}")
  }

  test("hashedPerceptronScore: literal-weight projection matches training-side margins, no Exchange") {
    val docs = Seq(
      (1L, "alpha beta gamma", true),
      (2L, "delta epsilon", false),
      (3L, "alpha alpha zeta", true),
      (4L, "", false)) // bias-only margin
      .toDF("doc_id", "text", "pos_label")
    val w = Perceptron.batchPerceptronHashed(docs, "doc_id", "text",
        positive = col("pos_label"), iterations = 3)
      .orderBy("pos").collect().map(_.getLong(1)).toSeq
    val scored = Perceptron.hashedPerceptronScore(docs, "doc_id", "text", w)
    // independent margin: reference feature counts x reference weights
    def bucket(term: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(term.getBytes("UTF-8"))
      java.lang.Long.parseLong(f"${md(0) & 0xFF}%02x", 16)
    }
    val expect = docs.collect().map { r =>
      val terms = r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      r.getLong(0) -> (terms.map(t => w(bucket(t).toInt)).sum + w(256))
    }.toMap
    scored.collect().foreach { r =>
      assert(r.getLong(1) == expect(r.getLong(0)),
        s"margin mismatch for doc ${r.getLong(0)}")
      assert(r.getBoolean(2) == (expect(r.getLong(0)) > 0))
    }
    // the serving plan is a pure projection: no Exchange anywhere
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"serving plan must not shuffle:\n$plan")
  }

  test("batchPerceptronHashed learns a separable planted problem") {
    // positives always contain 'alpha', negatives 'omega' — linearly
    // separable in the hashed space unless the two buckets collide
    // (they don't: distinct md5 prefixes)
    val df = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, s"alpha common$i filler", true)
      else (i.toLong, s"omega common$i filler", false)
    }.toDF("doc_id", "text", "pos_label")
    val w = Perceptron.batchPerceptronHashed(df, "doc_id", "text",
        positive = col("pos_label"), iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def bucket(term: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(term.getBytes("UTF-8"))
      java.lang.Long.parseLong(f"${md(0) & 0xFF}%02x", 16)
    }
    assert(w(bucket("alpha")) > 0, s"alpha weight should be positive")
    assert(w(bucket("omega")) < 0, s"omega weight should be negative")
  }
}

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  // corpus + one planted exact-direction duplicate per vector (scaled
  // copy → cosine exactly 1.0 with its original, id shifted up so the
  // original is always the survivor under the earliest-survivor rule)
  private lazy val planted = {
    val base = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    base.unionByName(base
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .withColumn("embedding",
        transform(col("embedding"), x => x * lit(1.5f))))
  }

  test("retainExact: drops exactly the ids with an earlier neighbor >= t") {
    val t0 = 0.45
    val pairs = Similarity.cosineNearDupPairs(planted, t0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val dropped = pairs.map(_._2).toSet
    val all = planted.select("vec_id").collect().map(_.getLong(0)).toSet
    val got = SemanticDedup.retainExact(planted, t0)
      .collect().map(_.getLong(0)).toSet
    assert(got == all -- dropped)
    // every planted copy has its original as an earlier cos=1 neighbor
    val plantedIds = all.filter(_ >= 1000000L)
    assert(plantedIds.subsetOf(dropped), "planted duplicates must drop")
    assert(got.forall(_ < 1000000L))
  }

  test("retainExact: threshold above every pair retains everything") {
    val base = graft.Tables.load(spark, sfDir, "embeddings")
    val n = base.count()
    assert(SemanticDedup.retainExact(base, 0.999999).count() == n)
  }

  test("retainClustered: superset of exact; no surviving intra-cell pair >= t") {
    val t0 = 0.45
    val exact = SemanticDedup.retainExact(planted, t0)
      .collect().map(_.getLong(0)).toSet
    val kept = SemanticDedup.retainClustered(planted, t0, nlist = 4)
    val keptRows = kept.collect().map(r => (r.getLong(0), r.getInt(1)))
    // cross-cell near-dups are never examined → clustered keeps ⊇ exact keeps
    assert(exact.subsetOf(keptRows.map(_._1).toSet))
    // contract: among survivors sharing a cell, no pair at/above threshold
    val byId = planted.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    for {
      Seq((ida, cella), (idb, cellb)) <- keptRows.sortBy(_._1).toSeq.combinations(2)
      if cella == cellb
    } assert(cos(byId(ida), byId(idb)) < t0,
      s"surviving intra-cell pair ($ida,$idb) at >= $t0")
  }
}

class GraftFunctionsSpec extends SparkSpec {

  test("custom expressions callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  graft_simhash(array('a','b')) AS sh,
        |  size(graft_minhash(array('a','b'), 16)) AS mh,
        |  size(graft_minhash_ngram(array('a','b','c'), 2, 8)) AS mg,
        |  graft_hyperplane_sig(array(0.5D, -0.5D), 2, 8) AS hp
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getInt(2) == 16 && r.getInt(3) == 8)
    // non-literal count arg is rejected with a named error
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array('a'), 1 + 1)").collect()
    }
    assert(err.getMessage.contains("graft_minhash") ||
      err.getCause != null && err.getCause.getMessage.contains("graft_minhash"))
  }

  test("portable-hash flavors reachable from SQL and match the Column API (r12)") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_minhash_ngram(array('a','b','c'), 2, 8, true) AS mgp,
        |  graft_simhash(array('a','b'), true) AS shp,
        |  graft_simhash(array(), true) AS shp_empty
        |""".stripMargin).collect()(0)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val api = Seq(1).toDF("x").select(
      graft.functions.VectorExpressions.minhashNgramSig(
        typedLit(Seq("a", "b", "c")), 2, 8, portableHash = true).as("mgp"),
      graft.functions.VectorExpressions.simhash64(
        typedLit(Seq("a", "b")), portableHash = true).as("shp")).collect()(0)
    assert(r.getSeq[Long](0) == api.getSeq[Long](0))
    assert(r.getLong(1) == api.getLong(1))
    assert(r.isNullAt(2)) // token-less portable simhash is NULL, not 0
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("balanced: unknown-size (huge-stat) inputs are NOT repartitioned") {
    // LogicalRDD without stats reports spark.sql.defaultSizeInBytes
    // (Long.MaxValue) — regression: a narrowing cast wrapped negative
    // and forced a full shuffle of exactly the inputs that must not
    // shuffle
    val rdd = spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L, "x")), 2)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val df = spark.createDataFrame(rdd, schema)
    assert(df.queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(Int.MaxValue))
    assert(Dedup.balanced(df) eq df, "huge-stat input was repartitioned")
    // ...while a small parquet-backed input IS fanned out
    val small = graft.Tables.load(spark, sfDir, "documents")
    assert(!(Dedup.balanced(small) eq small), "small input not fanned out")
  }

  test("balanced: widen-only — already-wide small inputs are never coalesced") {
    // regression: the stats-only check coalesced any small-stat frame to
    // defaultParallelism, shrinking inputs that were already wider (many
    // files, an upstream shuffle) through a pointless full shuffle
    val p = spark.sparkContext.defaultParallelism
    val wide = graft.Tables.load(spark, sfDir, "documents").repartition(p * 4)
    val out = Dedup.balanced(wide)
    assert(out eq wide, "already-wide small input was reshuffled")
    assert(out.rdd.getNumPartitions == p * 4)
  }

  test("balanced: decides from the plan, never by running it (no eager job)") {
    // the old df.rdd probe instantiated the physical plan; under AQE on
    // a shuffled input that materializes stages — i.e. runs jobs —
    // during operator CONSTRUCTION. Same async-listener idiom as the
    // termStats spec: an eager job would be submitted before t0.
    val jobTimes = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobTimes.add(js.time); ()
      }
    }
    val p = spark.sparkContext.defaultParallelism
    // build the inputs BEFORE the measured window: spark.read.parquet
    // schema inference may run its own (legitimate) footer-reading job
    val narrow = graft.Tables.load(spark, sfDir, "documents")
    val wide = graft.Tables.load(spark, sfDir, "documents").repartition(p * 4)
    val tReg = System.currentTimeMillis()
    spark.sparkContext.addSparkListener(listener)
    try {
      // both branches of the small-stats check: a raw file scan and a
      // shuffled (AQE-wrapped) input
      Dedup.balanced(narrow)
      Dedup.balanced(wide)
      Thread.sleep(5)
      val t0 = System.currentTimeMillis()
      spark.range(1).count() // sentinel: proves the listener sees jobs ≥ t0
      val deadline = System.nanoTime() + 10_000_000_000L
      while (!jobTimes.iterator().hasNext && System.nanoTime() < deadline) Thread.sleep(10)
      import scala.jdk.CollectionConverters._
      val times = jobTimes.iterator().asScala.map(_.toLong).toSeq
      assert(times.exists(_ >= t0), "sentinel job not observed")
      val eager = times.filter(t => t >= tReg && t < t0)
      assert(eager.isEmpty, s"balanced() ran ${eager.size} eager job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again today"),  // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog again and again tonight"),// near dup of 1
    (4L, "completely different content about spark catalyst optimizer rules"),
    (5L, "THE QUICK  BROWN fox jumps over the lazy dog again and again today")) // dup modulo case/ws
    .toDF("doc_id", "text")

  test("exactGroups: normalized dups collapse, keep min id") {
    val g = Dedup.exactGroups(docs).orderBy("keep_id").collect()
    assert(g.length == 3)
    assert(g.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L), (3L, 1L), (4L, 1L)))
  }

  test("exactDedup keeps first doc per fingerprint") {
    val kept = Dedup.exactDedup(docs).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("minhash estimate tracks true shingle jaccard") {
    def shingleSet(s: String, k: Int): Set[String] = {
      val norm = s.toLowerCase.replaceAll("\\s+", " ").trim
      (0 to math.max(norm.length - k, 0)).map(i => norm.substring(i, math.min(i + k, norm.length))).toSet
    }
    val rows = docs.select(col("doc_id"),
      Dedup.minhashSignature(col("text"), 5, 64).as("sig")).collect()
    val sigs = rows.map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def est(a: Long, b: Long) =
      sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toDouble / 64
    def truth(a: Long, b: Long) = {
      val (sa, sb) = (shingleSet(texts(a), 5), shingleSet(texts(b), 5))
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    // exact dup pair → signature identical
    assert(est(1L, 2L) == 1.0 && truth(1L, 2L) == 1.0)
    // near dup: high on both; unrelated: low on both
    assert(math.abs(est(1L, 3L) - truth(1L, 3L)) < 0.25)
    assert(truth(1L, 3L) > 0.7 && est(1L, 3L) > 0.6)
    assert(truth(1L, 4L) < 0.2 && est(1L, 4L) < 0.35)
  }

  test("minhashPairs surfaces dup/near-dup pairs, not unrelated ones") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id",
      k = 2, numHashes = 32, bands = 8, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 5L)))  // dup modulo normalization
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("short docs (no grams) never pair as duplicates") {
    val shorties = Seq(
      (1L, "hello"), (2L, "goodbye"), (3L, ""),   // < 2 tokens → no bigram
      (4L, "the quick brown fox again today"),
      (5L, "the quick brown fox again today"))    // real dup pair
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(shorties, "text", "doc_id",
      k = 2, numHashes = 32, bands = 8, minJaccard = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((4L, 5L)),
      s"short docs paired spuriously: $pairs")
  }

  test("minhashPairs: portable md5 flavor finds the xxh64 flavor's pair set (gate data)") {
    // the two base hashes are independent draws of the same MinHash
    // estimator; on the gate corpus (planted first-word-dropped dups,
    // q26's construction) their banded pair SETS must agree — this is
    // the production-default xxh64 flavor's correctness tether now that
    // the hash gates run the portable flavor
    val sf = graft.Tables.load(spark, sfDir, "documents")
    val planted = sf.unionByName(sf
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("text", regexp_replace(col("text"), "^\\S+\\s*", "")))
    def pairSet(portable: Boolean): Set[(Long, Long)] =
      Dedup.minhashPairs(planted, "text", "doc_id", k = 2, numHashes = 32,
        bands = 8, minJaccard = 0.5, portableHash = portable)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val xx = pairSet(portable = false)
    val md = pairSet(portable = true)
    assert(xx == md,
      s"flavors diverge: only-xxh64=${(xx -- md).take(5)} only-md5=${(md -- xx).take(5)}")
    assert(xx.nonEmpty)
  }

  test("simhashPairs portable flavor: dups pair at hamming 0, token-less docs drop out") {
    val fixture = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, ""),                       // no tokens → NULL signature
      (4L, null.asInstanceOf[String]) // NULL text → NULL signature
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(fixture, "text", "doc_id",
      maxHamming = 8, portableHash = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.get((1L, 2L)).contains(0))
    assert(!pairs.keySet.exists(p => Set(p._1, p._2).exists(Set(3L, 4L))),
      s"token-less docs paired: ${pairs.keySet}")
  }

  test("simhash: identical docs same hash; near dups within hamming 16") {
    val sh = Dedup.simhash(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) <= 16)
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(4L)) > 16)
  }

  test("ngramJaccardPairs: exact jaccard on LSH candidates") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 2, k = 2, numHashes = 32, bands = 8, minEstJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0)
    pairs.get((1L, 3L)).foreach(j => assert(j > 0.5 && j < 1.0))
  }

  test("wordNgrams: fewer tokens than n → empty") {
    val df = Seq("one two", "a b c d").toDF("text")
      .select(Dedup.wordNgrams(col("text"), 3).as("g"))
    val gs = df.collect().map(_.getSeq[String](0).toSeq)
    assert(gs(0) == Seq.empty)
    assert(gs(1) == Seq("a b c", "b c d"))
  }

  test("editDistancePairs equals brute force, incl. below-guarantee-length strings") {
    // "ab"/"b" are shorter than (maxDist+1)*q = 6: the q-gram count
    // filter cannot guarantee a shared gram for them — the short-string
    // broadcast band must recover those pairs
    val names = Seq("cat", "cart", "charts", "dog", "dogs", "ab", "b",
      "red widget", "red widgets", "blue widget")
    val df = names.toDF("nm")
    val got = Dedup.editDistancePairs(df, "nm", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- names; b <- names if a < b
      dd = lev(a, b) if dd <= 2
    } yield (a, b) -> dd).toMap
    assert(got == want)
    assert(got.contains(("ab", "b")) && got(("ab", "b")) == 1)
    assert(got(("cart", "charts")) == 2)
  }

  test("editDistancePairs hot-gram case equals brute force (count filter, not existence)") {
    // every name shares the hot 2-gram "er": existence-only filtering
    // would make one quadratic bucket; the ED-Join count filter must
    // still lose no pair. Includes repeated-gram strings ("aaaaaa")
    // where a distinct-gram count would wrongly prune, and
    // char-disjoint tiny pairs ("ab"/"cd") that only the sentinel
    // bucket can produce.
    val names = Seq("tiger", "tigers", "tigerss", "singer", "winger",
      "wingers", "finger", "fingers", "powders", "powderss", "mergers",
      "mergerss", "aaaaaa", "aaaaab", "aaabaa", "ab", "cd", "b", "",
      "ersers", "errser")
    val df = names.toDF("nm")
    val got = Dedup.editDistancePairs(df, "nm", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- names; b <- names if a < b
      dd = lev(a, b) if dd <= 2
    } yield (a, b) -> dd).toMap
    assert(got == want)
    assert(got(("aaaaaa", "aaaaab")) == 1) // multiset counts, not distinct
    assert(got(("ab", "cd")) == 2)         // char-disjoint tiny pair
    assert(got(("", "b")) == 1)            // empty string pairs via sentinel
  }

  test("editDistancePairs plan contains no nested-loop or cartesian join") {
    val df = Seq("cat", "cart", "charts", "ab", "b").toDF("nm")
    val plan = Dedup.editDistancePairs(df, "nm", maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("editDistancePairs on part names matches brute force at sf0.001") {
    val part = graft.Tables.load(spark, sfDir, "part")
    val got = Dedup.editDistancePairs(part, "p_name", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val names = part.select("p_name").distinct()
    val brute = names.select(col("p_name").as("a"))
      .crossJoin(names.select(col("p_name").as("b")))
      .filter(col("a") < col("b") && levenshtein(col("a"), col("b")) <= 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == brute)
    assert(brute.nonEmpty, "fixture should contain near-identical names")
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)))  // opposite of 0
    .toDF("vec_id", "embedding")

  test("cosine: identity 1, orthogonal 0, opposite -1") {
    val c = vecs.crossJoin(vecs.select(col("vec_id").as("id2"), col("embedding").as("e2")))
      .filter(col("vec_id") === 0)
      .select(col("id2"),
        Similarity.cosine(Similarity.asDouble(col("embedding")),
          Similarity.asDouble(col("e2"))).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(c(0L) - 1.0) < 1e-12)
    assert(math.abs(c(2L)) < 1e-12)
    assert(math.abs(c(3L) + 1.0) < 1e-12)
    assert(c(1L) > 0.95 && c(1L) < 1.0)
  }

  test("bruteForceTopK: correct ranking, excludes self") {
    val got = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("lshTopK: subset of brute-force results, correctly ranked") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 3)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 20)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, queries, k = 5, dim = 64)
      .collect()
    // every LSH hit is a real vector pair with correctly computed cosine,
    // ranks are 1..k contiguous per query
    val byQuery = lsh.groupBy(_.getLong(0))
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
    }
    // sanity: candidates overlap meaningfully with true top-20
    val lshPairs = lsh.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(lshPairs.intersect(bf).nonEmpty)
  }

  test("ivfTopK: recall vs brute force on real embeddings") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, k = 5, nlist = 8, nprobe = 4)
      .collect()
    val byQuery = ivf.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
    }
    // probing half the cells should recover a meaningful share of the
    // true top-5 (recall isn't 1.0 by design)
    val ivfPairs = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivfPairs.intersect(bf).size >= bf.size / 3,
      s"IVF recall too low: ${ivfPairs.intersect(bf).size}/${bf.size}")
  }

  test("ivfIndexedTopK: statically pruned scan, parity with in-session ivf") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfidx-").toString
    Similarity.ivfIndexWrite(emb, dir, nlist = 8)
    val q = emb.filter(col("vec_id") === 0)
    val res = Similarity.ivfIndexedTopK(spark, dir, q, k = 5, nprobe = 2)
      .orderBy("rank")
    // the corpus scan must read ONLY the probed cells' directories:
    // 1 query × nprobe 2 → at most 2 of the 8 partitions listed
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => scansOf(a.inputPlan)
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("/data")) => Seq(f)
    }.flatten
    val scans = scansOf(res.queryExecution.executedPlan)
    assert(scans.nonEmpty, "no parquet scan over the index data found")
    assert(scans.exists(_.partitionFilters.nonEmpty),
      "cell filter did not become a static PartitionFilter")
    val parts = scans.map(_.selectedPartitions.partitionCount).max
    assert(parts <= 2, s"expected <= 2 of 8 partitions read, got $parts")
    // parity: same corpus, same seeds → the same quantizer, so the
    // indexed read answers exactly like the in-session operator
    val insession = Similarity.ivfTopK(emb, q, k = 5, nlist = 8, nprobe = 2)
      .orderBy("rank")
    assert(res.collect().toSeq == insession.collect().toSeq)
  }

  test("ivfIndexAppend: append + probe ≡ full rewrite + probe on the combined corpus") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val first = emb.filter(col("vec_id") % 2 === 0)
    val second = emb.filter(col("vec_id") % 2 === 1)
    val dirA = java.nio.file.Files.createTempDirectory("graft-ivfapp-a-").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-ivfapp-b-").toString
    // index on the first half, then append the second half under the
    // FROZEN centroids
    Similarity.ivfIndexWrite(first, dirA, nlist = 8)
    Similarity.ivfIndexAppend(second, dirA)
    // reference: one-shot write of the combined corpus under the SAME
    // centroid set (read from the appended index's sidecar — geometry
    // identical by construction)
    val cents = spark.read.parquet(s"$dirA/centroids").orderBy("cell")
      .collect().map(_.getSeq[Double](1).toArray)
    Similarity.ivfIndexWriteWithCentroids(emb, dirB, cents)
    val q = emb.filter(col("vec_id").isin(0L, 7L, 42L))
    def probe(dir: String) =
      Similarity.ivfIndexedTopK(spark, dir, q, k = 5, nprobe = 3)
        .orderBy("query_id", "rank").collect().toSeq
    assert(probe(dirA) == probe(dirB),
      "appended index answers differently from a rewrite of the combined corpus")
  }

  test("ivfIndexStaleness: in-distribution appends keep drift ~0, a shifted corpus inflates it") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings").limit(256)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfstale-").toString
    Similarity.ivfIndexWrite(emb, dir, nlist = 4)
    // freshly written index: current stats == fit stats exactly
    val base = Similarity.ivfIndexStaleness(spark, dir).collect()
    assert(base.nonEmpty)
    base.foreach { r =>
      assert(math.abs(r.getAs[Double]("drift")) < 1e-12,
        s"fresh index must have zero drift, got $r")
    }
    // append a far-shifted copy (every coordinate += 10): assignment
    // quality degrades, drift must go clearly positive somewhere
    val shifted = emb
      .withColumn("embedding",
        transform(col("embedding"), x => x + lit(10.0f)))
      .withColumn("vec_id", col("vec_id") + 100000L)
    Similarity.ivfIndexAppend(shifted, dir)
    val after = Similarity.ivfIndexStaleness(spark, dir).collect()
    assert(after.exists(r => r.getAs[Double]("drift") > 1.0),
      s"shifted append should inflate drift, got ${after.mkString(", ")}")
  }

  test("ivfIndexedTopK: an over-cap query batch fails fast with a named error") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfcap-").toString
    Similarity.ivfIndexWrite(emb.limit(64), dir, nlist = 4)
    val err = intercept[IllegalArgumentException] {
      Similarity.ivfIndexedTopK(spark, dir, emb, k = 3, nprobe = 2,
        maxBatch = 16)
    }
    assert(err.getMessage.contains("maxBatch"))
    assert(err.getMessage.contains("ivfTopK"), "error should name the fallback")
    // at or below the cap the same call succeeds
    val ok = Similarity.ivfIndexedTopK(spark, dir, emb.limit(16), k = 3,
      nprobe = 2, maxBatch = 16)
    assert(ok.count() > 0)
  }

  test("cosineNearDupPairs: only pairs above threshold, a<b") {
    val pairs = Similarity.cosineNearDupPairs(vecs, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.forall { case (a, b, c) => a < b && c >= 0.9 })
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 1L)))
  }

  test("lshBandParams: recall budget honored, selectivity grows with threshold") {
    // t=0.4: p1 ≈ 0.631 ⇒ r=4, b=67 under the 512-bit default budget
    val (r4, b4) = Similarity.lshBandParams(0.4)
    assert((r4, b4) == (4, 67), s"got ($r4, $b4)")
    // per-pair miss at the threshold stays within budget
    val p1 = 1.0 - math.acos(0.4) / math.Pi
    assert(math.pow(1.0 - math.pow(p1, r4), b4) <= 1e-5)
    // higher threshold ⇒ more selective bands (larger r)
    val (r9, _) = Similarity.lshBandParams(0.9)
    assert(r9 > r4)
    // low thresholds: band counts explode past Long range for large r —
    // the result must stay a valid positive configuration within the
    // bit budget (regression: saturated-cast products wrapped negative)
    for (t <- Seq(0.05, 0.1, 0.15, 0.3)) {
      val (r, b) = Similarity.lshBandParams(t)
      assert(r > 0 && b > 0 && r.toLong * b <= 512, s"t=$t gave ($r, $b)")
    }
    intercept[IllegalArgumentException](Similarity.lshBandParams(0.0))
    intercept[IllegalArgumentException](Similarity.lshBandParams(1.0))
  }

  test("cosineNearDupPairsLsh: equals the exact all-pairs oracle on gate data") {
    // the q30 contract: banded LSH + exact re-rank must reproduce the
    // exhaustive join bit-for-bit on the driver's embeddings tables
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val emb = graft.Tables.load(spark, dir, "embeddings")
      val exact = Similarity.cosineNearDupPairs(emb, threshold = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val lsh = Similarity.cosineNearDupPairsLsh(emb, threshold = 0.4, dim = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(lsh == exact, s"$dir: LSH=${lsh.size} exact=${exact.size} " +
        s"missed=${(exact -- lsh).take(5)} extra=${(lsh -- exact).take(5)}")
    }
  }

  test("cosineNearDupPairsLsh: plan has no BroadcastNestedLoopJoin") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val plan = Similarity.cosineNearDupPairsLsh(emb, threshold = 0.4, dim = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), s"O(n²) join in plan:\n$plan")
    // ...while the exact oracle variant is (by design) the nested loop
    val exactPlan = Similarity.cosineNearDupPairs(emb, threshold = 0.4)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("BroadcastNestedLoop"))
  }

  test("cosineAllPairsTiled: equals the nested-loop oracle, no BNLJ, no dup pairs") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val oracle = Similarity.cosineNearDupPairs(emb, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val tiled = Similarity.cosineAllPairsTiled(emb, threshold = 0.3, tiles = 4)
    val got = tiled.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == got.toSet.size, "tiling produced duplicate pairs")
    assert(got.toSet == oracle,
      s"tiled=${got.length} oracle=${oracle.size} missed=${(oracle -- got.toSet).take(3)}")
    val plan = tiled.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), s"O(n²) shape in plan:\n$plan")
  }

  test("lshCandidatePairs: selective at near-dup thresholds on planted dups") {
    import spark.implicits._
    // 200 isotropic-ish vectors + 20 planted near-identical copies
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0L until 200L).map(i => (i, vec()))
    val dups = base.take(20).map { case (i, v) =>
      (i + 1000L, v.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val (r, b) = Similarity.lshBandParams(0.9)
    val cands = Similarity.lshCandidatePairs(df, 64, r, b, "vec_id", "embedding")
    val nCands = cands.count()
    val nAll = 220L * 219 / 2
    // candidates ≪ all pairs, and every planted dup pair survives
    assert(nCands < nAll / 5, s"no pruning: $nCands of $nAll")
    val candSet = cands.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    base.take(20).foreach { case (i, _) =>
      assert(candSet.contains((i, i + 1000L)), s"planted dup $i missed")
    }
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.fromText(
    Seq((1L, "hello world"), (2L, ""), (3L, "abc")).toDF("doc_id", "text"))

  test("media schema: binary payload + typed metadata struct") {
    val m = media
    assert(m.schema("payload").dataType.typeName == "binary")
    assert(m.schema("meta").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(m.count() == 3)
  }

  test("extractFeatures: pluggable decoder is used for every row") {
    val constDecoder = new Multimodal.MediaDecoder {
      override def decode(p: Array[Byte]): (Double, Array[Long]) =
        (42.0, Array.fill(8)(1L))
    }
    val f = Multimodal.extractFeatures(media, constDecoder).collect()
    assert(f.nonEmpty && f.forall(_.mean_intensity == 42.0))
  }

  test("extractFeatures: partition-parallel decode with deterministic stats") {
    val f = Multimodal.extractFeatures(media).collect().map(x => x.media_id -> x).toMap
    assert(f(1L).n_bytes == 11)
    assert(f(2L).n_bytes == 0 && f(2L).mean_intensity == 0.0)
    assert(f(1L).histogram.sum == 11)
    // 'hello world' ASCII bytes average
    val expected = "hello world".getBytes("UTF-8").map(_ & 0xFF).sum / 11.0
    assert(math.abs(f(1L).mean_intensity - expected) < 1e-12)
  }

  test("resizePayload bounds payload size") {
    val r = Multimodal.resizePayload(media, 5)
      .select(length(col("payload")).as("len")).as[Int].collect()
    assert(r.forall(_ <= 5))
  }

  test("sampleFrames strides the payload") {
    val s = Multimodal.sampleFrames(media, 2)
      .filter(col("media_id") === 1)
      .select(col("payload"), col("meta.n_frames")).collect()(0)
    val sampled = s.getAs[Array[Byte]](0)
    assert(new String(sampled, "UTF-8") == "hlowrd")
    assert(s.getInt(1) == 6)
  }

  private def pngBytes(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoDecoder: real PNG decode, exact luma stats, distributed") {
    // solid gray 64x64 (r=g=b=100 → luma 100, mid-bin — luma of 128
    // floats to 127.999…, a bin boundary) and a black/white half split
    // 32x32 (mean luma 127.5, histogram split between bins 0 and 7)
    val gray = pngBytes(64, 64, (_, _) => 0x646464)
    val split = pngBytes(32, 32, (x, _) => if (x < 16) 0x000000 else 0xFFFFFF)
    val rows = Seq((1L, gray), (2L, split)).toDF("media_id", "payload")
      .withColumn("meta", struct(lit("image/png").as("format"),
        lit(0).as("width"), lit(0).as("height"), lit(1).as("n_frames")))

    val f = Multimodal.extractFeatures(rows, Multimodal.ImageIoDecoder)
      .collect().map(x => x.media_id -> x).toMap
    assert(math.abs(f(1L).mean_intensity - 100.0) < 1e-9)
    assert(f(1L).histogram.toSeq == Seq(0L, 0L, 0L, 4096L, 0L, 0L, 0L, 0L))
    assert(math.abs(f(2L).mean_intensity - 127.5) < 1e-9)
    assert(f(2L).histogram(0) == 512L && f(2L).histogram(7) == 512L)
    assert(f(2L).histogram.sum == 1024L)
  }

  test("resizeImages: real pixel rescale, dims/meta updated, round-trips") {
    // 4x4 quadrant image: nearest-neighbor 2x2 picks one pixel per
    // quadrant, so every output pixel color is exactly one input color
    val quad = pngBytes(4, 4, (x, y) =>
      (if (x < 2) 0 else 0xFF0000) | (if (y < 2) 0 else 0x0000FF))
    val rows = Seq((1L, quad)).toDF("media_id", "payload")
      .withColumn("meta", struct(lit("image/png").as("format"),
        lit(4).as("width"), lit(4).as("height"), lit(1).as("n_frames")))
    val out = Multimodal.resizeImages(rows, 2, 2).collect().head
    val meta = out.getStruct(2)
    assert(meta.getString(0) == "image/png")
    assert(meta.getInt(1) == 2 && meta.getInt(2) == 2)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]](1)))
    assert(img.getWidth == 2 && img.getHeight == 2)
    val colors = for (y <- 0 until 2; x <- 0 until 2)
      yield img.getRGB(x, y) & 0xFFFFFF
    // one pixel per source quadrant, each an exact source color
    assert(colors.toSet.subsetOf(Set(0x000000, 0xFF0000, 0x0000FF, 0xFF00FF)))
    assert(colors.toSet.size == 4)
    // resized output feeds straight back into the real decoder
    val f = Multimodal.extractFeatures(Multimodal.resizeImages(rows, 2, 2),
      Multimodal.ImageIoDecoder).collect().head
    assert(f.histogram.sum == 4L)
  }

  test("ImageIoDecoder rejects non-image payloads instead of zero-filling") {
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decode("not an image".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decode(Array.emptyByteArray)
    }
    // valid PNG magic + truncated body: the PNG reader throws
    // IIOException mid-decode; the contract folds it into
    // IllegalArgumentException too
    val truncated = pngBytes(16, 16, (_, _) => 0x336699).take(40)
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoDecoder.decode(truncated)
    }
  }

  /** WAV bytes for 16-bit signed little-endian mono PCM samples. */
  private def wavBytes16(samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      data(2 * i) = (s & 0xFF).toByte
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WavPcmDecoder: real WAV decode, exact sample stats, distributed") {
    // silence: every 16-bit sample 0 → intensity (0+32768)>>8 = 128,
    // bin 4; extremes: -32768 → 0 (bin 0), 32767 → 255 (bin 7)
    val silence = wavBytes16(Array.fill(1000)(0.toShort))
    val extremes = wavBytes16(
      Array.fill(250)(Short.MinValue) ++ Array.fill(250)(Short.MaxValue))
    val rows = Seq((1L, silence), (2L, extremes)).toDF("media_id", "payload")
      .withColumn("meta", struct(lit("audio/wav").as("format"),
        lit(0).as("width"), lit(0).as("height"), lit(1).as("n_frames")))
    val f = Multimodal.extractFeatures(rows, Multimodal.WavPcmDecoder)
      .collect().map(x => x.media_id -> x).toMap
    assert(f(1L).mean_intensity == 128.0)
    assert(f(1L).histogram.toSeq == Seq(0L, 0L, 0L, 0L, 1000L, 0L, 0L, 0L))
    assert(f(2L).mean_intensity == 127.5)
    assert(f(2L).histogram(0) == 250L && f(2L).histogram(7) == 250L)
    assert(f(2L).histogram.sum == 500L)
  }

  test("sampleAudioFrames: real every-kth-frame WAV resample round-trips") {
    // frames carry their own index as the sample value: after
    // every-3rd sampling the surviving PCM values must be 0,3,6,...
    val src = wavBytes16((0 until 30).map(_.toShort).toArray)
    val rows = Seq((1L, src)).toDF("media_id", "payload")
      .withColumn("meta", struct(lit("audio/wav").as("format"),
        lit(0).as("width"), lit(0).as("height"), lit(30).as("n_frames")))
    val out = Multimodal.sampleAudioFrames(rows, 3)
      .select("payload", "meta.n_frames", "meta.format").collect().head
    assert(out.getInt(1) == 10)
    assert(out.getString(2) == "audio/wav")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]](0)))
    val pcm = ais.readAllBytes()
    val got = (0 until pcm.length / 2).map(i =>
      (((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xFF))).toShort)
    assert(got == (0 until 30 by 3).map(_.toShort))
    // sampled output feeds straight back into the real decoder
    val f = Multimodal.extractFeatures(
      Multimodal.sampleAudioFrames(rows, 3), Multimodal.WavPcmDecoder)
      .collect().head
    assert(f.histogram.sum == 10L)
  }

  test("WavPcmDecoder rejects non-audio payloads instead of zero-filling") {
    intercept[IllegalArgumentException] {
      Multimodal.WavPcmDecoder.decode("definitely not audio".getBytes("UTF-8"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.WavPcmDecoder.decode(Array.emptyByteArray)
    }
    intercept[IllegalArgumentException] {
      Multimodal.WavPcmDecoder.decode(wavBytes16(Array.fill(8)(1.toShort)).take(20))
    }
  }

  // ---- MJPEG-in-AVI video (r12: the last stub surface closed for
  // ---- JRE-expressible formats)

  /** A solid-color JPEG frame encoded through ImageIO. */
  private def jpegFrame(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("AVI round-trip: parser recovers the writer's JPEG frames byte-exactly") {
    val frames = Seq(0x102030, 0x405060, 0x708090, 0xA0B0C0, 0xD0E0F0)
      .map(jpegFrame(16, 12, _))
    val avi = Multimodal.aviFromJpegFrames(frames, 16, 12)
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    val back = Multimodal.aviVideoFrames(avi)
    assert(back.length == frames.length)
    back.zip(frames).foreach { case (b, f) =>
      assert(java.util.Arrays.equals(b, f), "frame bytes differ")
    }
  }

  test("sampleVideoFrames: every k-th frame kept byte-exactly, meta updated, no transcode") {
    val frames = (0 until 7).map(i => jpegFrame(20, 10, i * 0x112233))
    val avi = Multimodal.aviFromJpegFrames(frames, 20, 10)
    val media = Seq((1L, avi)).toDF("media_id", "payload")
      .withColumn("meta", org.apache.spark.sql.functions.struct(
        org.apache.spark.sql.functions.lit("video/x-msvideo").as("format"),
        org.apache.spark.sql.functions.lit(20).as("width"),
        org.apache.spark.sql.functions.lit(10).as("height"),
        org.apache.spark.sql.functions.lit(7).as("n_frames")))
    val out = Multimodal.sampleVideoFrames(media, everyK = 3).collect()(0)
    val meta = out.getStruct(out.fieldIndex("meta"))
    assert(meta.getAs[Int]("n_frames") == 3) // frames 0, 3, 6
    assert(meta.getAs[String]("format").contains("mjpeg"))
    assert(meta.getAs[Int]("width") == 20 && meta.getAs[Int]("height") == 10)
    val kept = Multimodal.aviVideoFrames(out.getAs[Array[Byte]]("payload"))
    assert(kept.length == 3)
    kept.zip(Seq(frames(0), frames(3), frames(6))).foreach { case (b, f) =>
      assert(java.util.Arrays.equals(b, f), "sampled frame bytes differ (transcoded?)")
    }
  }

  test("MjpegAviDecoder: pooled luma stats equal the per-frame ImageIO stats") {
    val f1 = jpegFrame(8, 8, 0x000000)
    val f2 = jpegFrame(8, 8, 0xFFFFFF)
    val avi = Multimodal.aviFromJpegFrames(Seq(f1, f2), 8, 8)
    val (mean, hist) = Multimodal.MjpegAviDecoder.decode(avi)
    val (m1, h1) = Multimodal.ImageIoDecoder.decode(f1)
    val (m2, h2) = Multimodal.ImageIoDecoder.decode(f2)
    assert(math.abs(mean - (m1 + m2) / 2) < 1e-9) // equal pixel counts
    assert(hist.toSeq == h1.zip(h2).map { case (a, b) => a + b }.toSeq)
    // and it rejects non-AVI payloads (the decoder-family contract)
    intercept[IllegalArgumentException] {
      Multimodal.MjpegAviDecoder.decode("not a container".getBytes("UTF-8"))
    }
  }
}
