package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The IVF index lifecycle: versioned create → append → staleness
  * trigger → rebuild with atomic pointer swap (VERDICT r10 #1).
  * Contracts under test:
  *   - rebuild ≡ a fresh ivfIndexWrite of the combined corpus;
  *   - a probe resolved before the swap still answers from the OLD
  *     snapshot (old-or-new, never mixed);
  *   - post-swap staleness returns to ~0;
  *   - retention prunes versions older than the previous one.
  */
class IvfLifecycleSpec extends SparkSpec {

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ivflc-$tag-").toString

  private def emb = graft.Tables.load(spark, sfDir, "embeddings")

  private def probe(dir: String, ids: Seq[Long], nprobe: Int = 3) =
    Similarity.ivfIndexedTopK(spark, dir,
        emb.filter(col("vec_id").isin(ids.map(java.lang.Long.valueOf): _*)),
        k = 5, nprobe = nprobe)
      .orderBy("query_id", "rank").collect().toSeq

  test("create: versioned root answers exactly like a flat index on the same corpus") {
    val root = tmpRoot("create")
    val flat = tmpRoot("flat")
    IvfIndex.create(emb, root, nlist = 8)
    Similarity.ivfIndexWrite(emb, flat, nlist = 8)
    assert(IvfIndex.currentVersion(spark, root).contains(1))
    assert(IvfIndex.resolveDir(spark, root) == s"$root/v1")
    // same corpus + deterministic fit → identical answers
    assert(probe(root, Seq(0L, 7L, 42L)) == probe(flat, Seq(0L, 7L, 42L)))
    // double-create must fail fast, not silently overwrite a live index
    val e = intercept[IllegalArgumentException] {
      IvfIndex.create(emb, root, nlist = 8)
    }
    assert(e.getMessage.contains("already a versioned index"))
  }

  test("rebuild ≡ fresh ivfIndexWrite on the combined corpus; staleness returns to ~0") {
    val root = tmpRoot("rebuild")
    val fresh = tmpRoot("fresh")
    val first = emb.filter(col("vec_id") % 2 === 0)
    // shifted second half: appended under FROZEN v1 centroids, so the
    // staleness trigger fires before the rebuild
    val second = emb.filter(col("vec_id") % 2 === 1)
      .withColumn("embedding", transform(col("embedding"), x => x + lit(4.0f)))
    IvfIndex.create(first, root, nlist = 8)
    Similarity.ivfIndexAppend(second, root)
    val before = Similarity.ivfIndexStaleness(spark, root).collect()
    assert(before.exists(r => r.getAs[Double]("drift") > 0.5),
      s"shifted append should trip the re-fit trigger, got ${before.mkString(", ")}")

    val newV = IvfIndex.rebuild(spark, root, nlist = 8)
    assert(newV == 2)
    assert(IvfIndex.currentVersion(spark, root).contains(2))
    // post-swap: geometry re-fit on the full corpus → drift ≈ 0 again
    val after = Similarity.ivfIndexStaleness(spark, root).collect()
    after.foreach { r =>
      assert(math.abs(r.getAs[Double]("drift")) < 1e-9,
        s"rebuilt index must have ~zero drift, got $r")
    }
    // equivalence: rebuild reads v1's data (first ∪ shifted-second) —
    // a fresh write of that same combined corpus must answer identically
    val combined = first.unionByName(second)
    Similarity.ivfIndexWrite(combined, fresh, nlist = 8)
    assert(probe(root, Seq(0L, 7L, 42L)) == probe(fresh, Seq(0L, 7L, 42L)),
      "rebuilt snapshot answers differently from a fresh index of the combined corpus")
  }

  test("probe-during-swap: a pre-swap resolution answers from the old snapshot") {
    val root = tmpRoot("swap")
    val first = emb.filter(col("vec_id") % 2 === 0)
    val second = emb.filter(col("vec_id") % 2 === 1)
    IvfIndex.create(first, root, nlist = 8)
    // a probe plan resolved against the live (v1) snapshot...
    val preSwap = Similarity.ivfIndexedTopK(spark, root,
      emb.filter(col("vec_id") === 0), k = 5, nprobe = 3)
    val v1Answer = preSwap.orderBy("rank").collect().toSeq
    // ...then the index rebuilds (corpus unchanged) and ingests the
    // second half into v2
    IvfIndex.rebuild(spark, root, nlist = 8)
    Similarity.ivfIndexAppend(second, root)
    // the old plan still reads v1 only — late-materialized, it must
    // neither fail nor see v2's appended rows
    assert(preSwap.orderBy("rank").collect().toSeq == v1Answer,
      "pre-swap plan leaked post-swap data (mixed snapshot read)")
    // a NEW probe resolves v2 and sees the appended vectors: with the
    // odd half present, some odd neighbor enters vec 0's top-5
    val post = probe(root, Seq(0L))
    assert(post.exists(r => r.getLong(2) % 2 == 1),
      s"post-swap probe should see appended odd ids, got $post")
  }

  test("rebuildIfStale: fresh index is a no-op, drifted index re-fits back to ~0") {
    val root = tmpRoot("ifstale")
    val first = emb.filter(col("vec_id") % 2 === 0)
    IvfIndex.create(first, root, nlist = 8)
    // freshly created: every cell at fit-time quality → no rebuild
    assert(IvfIndex.rebuildIfStale(spark, root, maxDrift = 0.5, nlist = 8).isEmpty)
    assert(IvfIndex.currentVersion(spark, root).contains(1))
    // shifted append trips the trigger → rebuild runs, drift resets
    val shifted = emb.filter(col("vec_id") % 2 === 1)
      .withColumn("embedding", transform(col("embedding"), x => x + lit(4.0f)))
    Similarity.ivfIndexAppend(shifted, root)
    assert(IvfIndex.rebuildIfStale(spark, root, maxDrift = 0.5, nlist = 8)
      .contains(2))
    assert(Similarity.ivfIndexStaleness(spark, root).collect()
      .forall(r => math.abs(r.getAs[Double]("drift")) < 1e-9))
    // and the refreshed index is fresh again → next check is a no-op
    assert(IvfIndex.rebuildIfStale(spark, root, maxDrift = 0.5, nlist = 8).isEmpty)
  }

  test("crash before pointer swap: the orphan v<N+1> is reclaimed by the next rebuild (r12 audit)") {
    val root = tmpRoot("crash")
    IvfIndex.create(emb, root, nlist = 8)
    // simulate the crash: write the v2 snapshot EXACTLY as rebuild()
    // would — read the live data, ivfIndexWrite to v2 — but die before
    // commitPointer; then corrupt the orphan's stats to a half-written
    // state so reclamation is observable
    val corpus = spark.read.parquet(s"$root/v1/data")
    Similarity.ivfIndexWrite(corpus, s"$root/v2", nlist = 8,
      idCol = "neighbor_id", embCol = "c_emb")
    val statsDir = java.nio.file.Paths.get(s"$root/v2/stats")
    org.apache.commons.io.FileUtils.deleteDirectory(statsDir.toFile)
    // readers never resolve the orphan
    assert(IvfIndex.currentVersion(spark, root).contains(1))
    assert(IvfIndex.resolveDir(spark, root) == s"$root/v1")
    assert(probe(root, Seq(0L, 7L)).nonEmpty)
    // the retried rebuild computes the SAME next version and
    // overwrites the orphan wholesale — committed v2 is complete and
    // fresh (staleness ~0), no version skipped
    val next = IvfIndex.rebuild(spark, root, nlist = 8)
    assert(next == 2)
    assert(IvfIndex.currentVersion(spark, root).contains(2))
    assert(java.nio.file.Files.isDirectory(statsDir))
    val drifts = Similarity.ivfIndexStaleness(spark, root)
      .select("drift").collect().flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Double]))
    assert(drifts.forall(d => math.abs(d) < 1e-9), drifts.mkString(","))
    assert(probe(root, Seq(0L, 7L)).nonEmpty)
  }

  test("rebuildIfRecallBelow: measured recall decay triggers a re-fit that restores the floor (r13 ask #6)") {
    import spark.implicits._
    // 2-d geometry chosen so the degradation is STRUCTURAL, not noise:
    // clusters A (90°) and B (0°) fit the v1 quantizer (nlist=2); an
    // appended cluster C straddles the 45° Voronoi boundary between
    // the two FROZEN centroids, so its members split across both cells
    // while every C-query's true neighbor set spans the split — the
    // exact decay mode rebuildIfStale's drift metric under-reports
    // (C sits no farther from the centroids than A/B's own spread).
    def vec(angleDeg: Double, r: Double): Array[Float] = {
      val a = math.toRadians(angleDeg)
      Array((r * math.cos(a)).toFloat, (r * math.sin(a)).toFloat)
    }
    val clusterA = (0 until 20).map(i => (i.toLong, vec(90.0 - i * 0.05, 10.0)))
    val clusterB = (0 until 20).map(i => (100L + i, vec(0.0 + i * 0.05, 10.0)))
    // C: 10 points fanned ±4.5° around 45° — the nearest-by-cosine
    // ordering from a 45° query alternates sides, so ANY top-5 truth
    // set contains members of both halves of the split
    val clusterC = (0 until 10).map(j => (200L + j, vec(45.0 + (j - 4.5) * 1.0, 9.9)))
    val queries = (0 until 4).map(i => (900L + i, vec(45.0 + i * 0.01, 10.0)))
      .toDF("vec_id", "embedding")
    val root = tmpRoot("recall")
    IvfIndex.create((clusterA ++ clusterB).toDF("vec_id", "embedding"),
      root, nlist = 2)
    Similarity.ivfIndexAppend(clusterC.toDF("vec_id", "embedding"), root)
    val degraded = IvfIndex.recallProbe(spark, root, queries, k = 5, nprobe = 1)
    assert(degraded < 0.9,
      s"straddling append should degrade nprobe=1 recall, got $degraded")
    // the trigger: measured recall < floor → re-fit at a finer nlist
    // that gives C its own cell
    val (measured, rebuilt) = IvfIndex.rebuildIfRecallBelow(spark, root,
      queries, k = 5, nprobe = 1, floor = 0.9, nlist = 3)
    assert(measured == degraded, "the trigger must report what it measured")
    assert(rebuilt.contains(2), s"expected a v2 rebuild, got $rebuilt")
    val restored = IvfIndex.recallProbe(spark, root, queries, k = 5, nprobe = 1)
    assert(restored >= 0.9,
      s"the re-fit quantizer must restore the recall floor, got $restored")
    // a fresh index must NOT re-trigger (the loop converges)
    val (after, again) = IvfIndex.rebuildIfRecallBelow(spark, root,
      queries, k = 5, nprobe = 1, floor = 0.9, nlist = 3)
    assert(after >= 0.9 && again.isEmpty,
      s"restored index re-triggered: recall=$after rebuilt=$again")
  }

  test("retention: rebuild keeps current + previous, prunes older") {
    val root = tmpRoot("retain")
    IvfIndex.create(emb.limit(128), root, nlist = 4)
    IvfIndex.rebuild(spark, root, nlist = 4)
    assert(IvfIndex.versions(spark, root) == Seq(1, 2))
    IvfIndex.rebuild(spark, root, nlist = 4)
    assert(IvfIndex.versions(spark, root) == Seq(2, 3),
      "v1 must be pruned once v3 is live (retainVersions=2)")
    assert(IvfIndex.currentVersion(spark, root).contains(3))
    // rebuild on a flat (un-versioned) dir is a named error
    val flat = tmpRoot("flaterr")
    Similarity.ivfIndexWrite(emb.limit(128), flat, nlist = 4)
    val e = intercept[IllegalArgumentException] {
      IvfIndex.rebuild(spark, flat, nlist = 4)
    }
    assert(e.getMessage.contains("not a versioned index root"))
  }
}
