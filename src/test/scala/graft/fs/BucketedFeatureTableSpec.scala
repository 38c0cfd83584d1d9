package graft.fs

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed feature tables (SURVEY §7.7's last line, r11 verdict ask
  * #7): a `FeatureTableSpec(buckets = n)` table is written CLUSTERED BY
  * its keys INTO n BUCKETS (sorted within each), committed through the
  * same versioned claim-rename as every write, and read back through a
  * catalog declaration — so the J3 lookup join plans with NO Exchange
  * and NO Sort on the feature side. This is the 100 TB
  * repeated-training-set-join story (FS:321's join at scale) made
  * concrete: the expensive feature side is shuffled ONCE at write time,
  * then every training-set assembly reuses that layout for free.
  */
class BucketedFeatureTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore() = FeatureStore.temp(spark)

  private def orderFeats = graft.etl.Features.orderFeatures(
    graft.Tables.load(spark, sfDir, "orders"))

  test("bucketed table round-trips through the versioned commit; merge keeps the layout") {
    val store = freshStore()
    val feats = orderFeats
    store.createTable(FeatureTableSpec("of_b", Seq("c_custkey"), feats.schema,
      "bucketed order features", buckets = 4))
    store.writeTable("of_b", feats, WriteMode.Overwrite)
    // round-trip equality with the plain frame
    val back = store.readTable("of_b")
    assert(back.orderBy("c_custkey").collect().toSeq ==
      feats.orderBy("c_custkey").collect().toSeq)
    // merge writes through the same bucketed path and version bump
    val delta = feats.limit(5).withColumn("total_spent", col("total_spent") + 1.0)
    store.writeTable("of_b", delta, WriteMode.Merge)
    assert(store.tableVersion("of_b") == 2)
    val merged = store.readTable("of_b")
    assert(merged.count() == feats.count())
    // time travel still reads v1 (bucketed read path, schema from files)
    assert(store.readTableVersion("of_b", 1).count() == feats.count())
    store.deleteTable("of_b")
  }

  test("J3 lookup join over a bucketed feature table: NO Exchange on the feature side") {
    val store = freshStore()
    val feats = orderFeats
    store.createTable(FeatureTableSpec("of_b2", Seq("c_custkey"), feats.schema,
      "bucketed order features", buckets = 4))
    store.writeTable("of_b2", feats, WriteMode.Overwrite)

    val spine = graft.Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force sort-merge: the case where the bucketed layout pays
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val ts = FeatureStoreClient.createTrainingSet(store, spine,
        FeatureLookup.allFeatures(store, "of_b2", Seq("c_custkey")),
        label = "c_mktsegment").loadDf
      val plan = ts.queryExecution.executedPlan
      val planStr = plan.toString
      assert(planStr.contains("SortMergeJoin"), s"expected SMJ:\n$planStr")
      // exactly ONE exchange in the whole plan — the spine side; the
      // bucketed feature side must contribute neither Exchange nor Sort
      val exchanges = planStr.linesIterator.count(_.contains("Exchange"))
      assert(exchanges == 1, s"expected 1 exchange (spine only), got $exchanges:\n$planStr")
      // the feature-side scan subtree: locate the bucketed scan and
      // assert the join consumes it without an Exchange in between —
      // equivalently, the scan advertises its bucketed output
      // partitioning
      assert(planStr.contains("Bucketed: true"),
        s"feature scan not bucketed:\n$planStr")
      // and the result matches the unbucketed join
      val expect = spine.join(feats, Seq("c_custkey"), "left_outer")
      assert(ts.count() == expect.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    store.deleteTable("of_b2")
  }

  test("rollback + re-write reclaims the version number with a FRESH catalog entry") {
    val store = freshStore()
    val feats = orderFeats
    store.createTable(FeatureTableSpec("of_rb", Seq("c_custkey"), feats.schema,
      "bucketed rollback", buckets = 4))
    store.writeTable("of_rb", feats, WriteMode.Overwrite)           // v1
    store.writeTable("of_rb", feats.withColumn("extra", lit(1)),
      WriteMode.Overwrite)                                          // v2 (+col)
    store.readTable("of_rb").count()  // declare the v2 catalog entry
    store.rollbackTable("of_rb")      // discard v2
    // the next write reclaims v2 WITHOUT the extra column — a stale
    // catalog declaration would serve the discarded schema
    store.writeTable("of_rb",
      feats.withColumn("total_spent", col("total_spent") + 2.0),
      WriteMode.Overwrite)
    val back = store.readTable("of_rb")
    assert(store.tableVersion("of_rb") == 2)
    assert(!back.columns.contains("extra"),
      s"stale catalog schema served: ${back.columns.toSeq}")
    assert(back.count() == feats.count())
    store.deleteTable("of_rb")
  }

  test("optimizeTable: z-order rewrite preserves content, tightens per-file spans, keeps time travel") {
    val store = freshStore()
    val feats = orderFeats
    store.createTable(FeatureTableSpec("of_z", Seq("c_custkey"), feats.schema,
      "zorder maintenance"))
    store.writeTable("of_z", feats, WriteMode.Overwrite)            // v1
    store.optimizeTable("of_z", Seq("n_orders", "total_spent"),
      targetPartitions = 4)                                          // v2
    assert(store.tableVersion("of_z") == 2)
    val back = store.readTable("of_z")
    // layout-only: content identical
    assert(back.orderBy("c_custkey").collect().toSeq ==
      feats.orderBy("c_custkey").collect().toSeq)
    // v1 (pre-optimize) still readable — the rewrite went through the
    // versioned commit
    assert(store.readTableVersion("of_z", 1).count() == feats.count())
    // per-file spans on the SECOND zorder dimension are tighter than a
    // lexicographic single-dim sort would leave them: every file's
    // total_spent span must be well below the full domain
    val files = back.groupBy(input_file_name().as("f"))
      .agg(min("total_spent").as("lo"), max("total_spent").as("hi"),
        count(lit(1)).as("n"))
      .collect()
    assert(files.length == 4, s"expected 4 files, got ${files.length}")
    val domain = feats.agg(max("total_spent") - min("total_spent"))
      .head.getDouble(0)
    val meanSpan = files.map(r => r.getDouble(2) - r.getDouble(1)).sum / files.length
    assert(meanSpan < domain * 0.95,
      s"z-order left per-file spans at the full domain: $meanSpan vs $domain")
    // bucketed tables refuse the rewrite
    store.createTable(FeatureTableSpec("of_zb", Seq("c_custkey"), feats.schema,
      "bucketed", buckets = 4))
    store.writeTable("of_zb", feats, WriteMode.Overwrite)
    val e = intercept[IllegalArgumentException] {
      store.optimizeTable("of_zb", Seq("n_orders"))
    }
    assert(e.getMessage.contains("bucketed"))
    store.deleteTable("of_z"); store.deleteTable("of_zb")
  }

  test("optimizeTable under retainVersions = 1: the self-read rewrite survives its source being pruned (r13 audit)") {
    // the rewrite reads the current version and commits a new one; with
    // a 1-version window the source dir is deleted in the SAME write —
    // safe only because the temp-dir write materializes the lazy read
    // BEFORE the prune runs (writeTable's write→claim→prune order)
    val store = FeatureStore.temp(spark, retainVersions = 1)
    val feats = orderFeats
    store.createTable(FeatureTableSpec("of_z1", Seq("c_custkey"), feats.schema,
      "zorder at retain=1"))
    store.writeTable("of_z1", feats, WriteMode.Overwrite)            // v1
    store.optimizeTable("of_z1", Seq("n_orders"), targetPartitions = 2) // v2; v1 pruned
    assert(store.tableVersion("of_z1") == 2)
    assert(store.readTable("of_z1").orderBy("c_custkey").collect().toSeq ==
      feats.orderBy("c_custkey").collect().toSeq)
    // v1 really was pruned (retention window honored)
    val e = intercept[IllegalArgumentException] {
      store.readTableVersion("of_z1", 1)
    }
    assert(e.getMessage.contains("pruned"))
    store.deleteTable("of_z1")
  }

  test("repeated rollbacks drop their bucketed catalog entries (r13: was only version+1-bounded at delete)") {
    val store = freshStore()
    val feats = orderFeats
    store.createTable(FeatureTableSpec("of_rr", Seq("c_custkey"), feats.schema,
      "rollback catalog hygiene", buckets = 4))
    store.writeTable("of_rr", feats, WriteMode.Overwrite)            // v1
    store.writeTable("of_rr",
      feats.withColumn("total_spent", col("total_spent") + 1.0),
      WriteMode.Overwrite)                                            // v2
    // touch v2 through the catalog so its entry exists, then roll back
    assert(store.readTable("of_rr").count() == feats.count())
    val catBefore = spark.catalog.listTables()
      .filter(col("name").startsWith("graft_fs_of_rr")).count()
    store.rollbackTable("of_rr")                                      // back to v1
    val catAfter = spark.catalog.listTables()
      .filter(col("name").startsWith("graft_fs_of_rr")).count()
    assert(catAfter < catBefore,
      s"rollback left the discarded version's catalog entry ($catBefore -> $catAfter)")
    // the re-written v2 must serve the NEW snapshot, not a stale entry
    store.writeTable("of_rr",
      feats.withColumn("total_spent", col("total_spent") + 9.0),
      WriteMode.Overwrite)                                            // v2 reclaimed
    val v2 = store.readTable("of_rr").agg(sum("total_spent")).head.getDouble(0)
    val want = feats.agg(sum(col("total_spent") + 9.0)).head.getDouble(0)
    assert(math.abs(v2 - want) < 1e-6)
    store.deleteTable("of_rr")
    // nothing left behind in the session catalog
    assert(spark.catalog.listTables()
      .filter(col("name").startsWith("graft_fs_of_rr")).count() == 0)
  }

  test("guards: buckets and partitionBy are mutually exclusive; buckets >= 0") {
    val schema = orderFeats.schema
    intercept[IllegalArgumentException] {
      FeatureTableSpec("bad", Seq("c_custkey"), schema,
        partitionBy = Seq("n_orders"), buckets = 4)
    }
    intercept[IllegalArgumentException] {
      FeatureTableSpec("bad2", Seq("c_custkey"), schema, buckets = -1)
    }
  }
}
