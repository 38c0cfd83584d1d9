package graft.fs

import java.util.Properties

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The online-serving half of [[FeatureStore]] (K7): range-partitioned
  * key-sorted publish (parquet snapshot or JDBC), the publish-time
  * per-file key manifest, manifest-pruned point lookups, and snapshot
  * compaction. Split out of FeatureStore.scala in r12 (the >700-line
  * file discipline) — same instance, same commit machinery; the seam
  * is offline transactions vs online serving.
  */
private[fs] trait FeatureStoreOnline { this: FeatureStore =>

  /** K7 — publish the offline table to an "online" store for point
    * lookups (SO:374-387 publishes to MySQL over JDBC). With zero egress
    * the stand-in is a key-range-partitioned, per-file key-sorted
    * parquet snapshot under `<root>/_online/<name>` — the shape a KV
    * bulk-load consumes (each range file is one ingest unit; sorted
    * runs build the KV index without re-sorting). `numPartitions`
    * controls write parallelism and file count; the default follows the
    * session's parallelism so a 1000-executor cluster writes 1000-way,
    * never through one task. A real deployment swaps the parquet sink
    * for JDBC — [[publishTableJdbc]] builds exactly that plan.
    */
  def publishTable(name: String,
      numPartitions: Int = spark.sparkContext.defaultParallelism): String = {
    val online = onlinePath(name)
    publishFrame(name, numPartitions)
      .write.mode("overwrite").parquet(online.toString)
    writeKeyManifest(name, loadSpec(name)._1.keys.head)
    online.toString
  }

  /** K7 over JDBC — the reference's actual online sink
    * (Feature_Store_Telco_Churn_Sean_Original.py:374-387 publishes to
    * MySQL over JDBC): the same range-partitioned key-sorted publish
    * plan written through Spark's JDBC relation (`numPartitions`
    * concurrent INSERT streams, truncate-not-drop overwrite so the
    * serving store keeps its indexes). FeatureStoreSpec executes the
    * full round trip against embedded Derby (write → read-back →
    * lookupOnline parity → truncate republish) in addition to
    * asserting the sink options.
    */
  def publishTableJdbc(name: String, url: String, table: String,
      props: Properties = new Properties(),
      numPartitions: Int = spark.sparkContext.defaultParallelism): Unit =
    publishFrame(name, numPartitions)
      .write.format("jdbc").mode("overwrite")
      .options(FeatureStore.jdbcPublishOptions(url, table, props))
      .save()

  /** The publish plan shared by every online sink: range-partition by
    * key (contiguous key ranges → point-lookup locality + bounded
    * per-task memory) and sort within each partition.
    */
  private[fs] def publishFrame(name: String, numPartitions: Int): DataFrame = {
    require(numPartitions > 0, s"publishTable($name): numPartitions must be > 0")
    val (spec, _) = loadSpec(name)
    readTable(name)
      .repartitionByRange(numPartitions, spec.keys.map(col): _*)
      .sortWithinPartitions(spec.keys.map(col): _*)
  }

  private def onlinePath(name: String) = new Path(new Path(rootPath, "_online"), name)
  // underscore prefix: parquet readers ignore it, so the snapshot stays
  // readable as a plain parquet directory
  private def manifestFile(name: String) = new Path(onlinePath(name), "_key_manifest")

  def readOnlineTable(name: String): DataFrame =
    spark.read.parquet(onlinePath(name).toString)

  /** Online point lookup over the published snapshot — the serving-side
    * read the reference delegates to its online store (the MySQL table
    * publish_table feeds, Sean_Original.py:374-387). The publish-time
    * key manifest (per-file min/max of the leading key over the
    * range-partitioned, key-sorted files) prunes the read to the files
    * whose key range intersects the requested keys, so a point lookup
    * touches O(1) files regardless of snapshot size — the bulk-loaded-
    * KV access pattern, without a database in the container. Tables
    * with a composite key prune and filter on the LEADING key (the
    * range-partitioning major order); callers needing full-tuple
    * lookups filter the result. Falls back to a pushed-down filter of
    * the whole snapshot when no manifest exists (non-integral,
    * non-string leading key).
    */
  def lookupOnline(name: String, keys: Seq[Any]): DataFrame = {
    require(keys.nonEmpty, s"lookupOnline($name): need at least one key")
    require(fs.exists(onlinePath(name)),
      s"lookupOnline($name): table is not published — call publishTable first")
    val keyCol = loadSpec(name)._1.keys.head
    readKeyManifest(name) match {
      case Some((typeName, entries)) =>
        // The manifest min/max were computed by Spark aggregates, which
        // order strings as UTF8String — unsigned UTF-8 byte comparison.
        // Java String <= is UTF-16 code-unit order; the two disagree
        // when supplementary chars (>= U+10000) mix with [U+E000,
        // U+FFFF], so string stats must be compared with the SAME
        // comparator they were written under — UTF8String.compareTo —
        // or a containing file gets wrongly pruned.
        def u8(s: String) =
          org.apache.spark.unsafe.types.UTF8String.fromString(s)
        // Integral manifests are only ever written for integral key
        // columns, so lo/hi always parse; a CALLER key that does not
        // parse can match no file (instead of throwing an opaque
        // NumberFormatException from inside the prune).
        val contains: ManifestEntry => Boolean =
          if (typeName == "string") {
            val wanted = keys.map(k => u8(k.toString))
            e => (e.kmin, e.kmax) match {
              case (Some(lo), Some(hi)) =>
                val (l, h) = (u8(lo), u8(hi))
                wanted.exists(k => l.compareTo(k) <= 0 && k.compareTo(h) <= 0)
              case _ => true // a file with no stats (all-null keys) is never pruned
            }
          } else {
            val wanted = keys.flatMap(k => scala.util.Try(k.toString.toLong).toOption)
            e => (e.kmin, e.kmax) match {
              case (Some(lo), Some(hi)) =>
                wanted.exists(k => lo.toLong <= k && k <= hi.toLong)
              case _ => true
            }
          }
        val files = entries.collect { case e if contains(e) => e.file }
        if (files.isEmpty)
          spark.createDataFrame(java.util.Collections.emptyList[Row](),
            spark.read.parquet(onlinePath(name).toString).schema)
        else spark.read.parquet(files: _*).filter(col(keyCol).isin(keys: _*))
      case None =>
        readOnlineTable(name).filter(col(keyCol).isin(keys: _*))
    }
  }

  private case class ManifestEntry(file: String, kmin: Option[String], kmax: Option[String])

  /** One manifest line per snapshot file: `file \t min \t max` of the
    * leading key (header line carries the key's type name). Collected
    * at publish time — one row per FILE, bounded by `numPartitions`,
    * not data size. Written only for integral/string leading keys whose
    * rendered stats can't contain the separators; anything else simply
    * gets no manifest and lookups fall back to a full filtered scan.
    */
  private def writeKeyManifest(name: String, keyCol: String): Unit = {
    import org.apache.spark.sql.types._
    val snap = spark.read.parquet(onlinePath(name).toString)
    val dt = snap.schema(keyCol).dataType
    val integral = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!integral && dt != StringType) return
    val stats = snap
      .groupBy(input_file_name().as("file"))
      .agg(min(col(keyCol)).cast("string").as("kmin"),
        max(col(keyCol)).cast("string").as("kmax"))
      .collect()
    def ok(s: String) = s == null || !(s.contains("\t") || s.contains("\n"))
    if (!stats.forall(r => ok(r.getString(1)) && ok(r.getString(2)))) return
    val header = if (integral) "integral" else "string"
    val body = stats.map { r =>
      val lo = Option(r.getString(1)).getOrElse("")
      val hi = Option(r.getString(2)).getOrElse("")
      s"${r.getString(0)}\t$lo\t$hi"
    }.mkString("\n")
    val out = fs.create(manifestFile(name), true)
    try out.write(s"$header\n$body".getBytes("UTF-8")) finally out.close()
  }

  private def readKeyManifest(name: String): Option[(String, Seq[ManifestEntry])] = {
    val p = manifestFile(name)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 65536, false)
      buf.toString("UTF-8")
    } finally in.close()
    val lines = text.split("\n", -1).toSeq
    val entries = lines.drop(1).filter(_.nonEmpty).map { l =>
      val parts = l.split("\t", -1)
      ManifestEntry(parts(0),
        Some(parts(1)).filter(_.nonEmpty), Some(parts(2)).filter(_.nonEmpty))
    }
    Some((lines.head, entries))
  }

  /** Compact the current snapshot into `targetPartitions` files (repeated
    * merges leave one file per shuffle partition per write — at 100 TB
    * the equivalent is OPTIMIZE/bin-packing; here: read → repartition on
    * the keys → rewrite as a new version through the same commit path).
    */
  def compact(name: String, targetPartitions: Int = 1): Unit = {
    val (spec, version) = loadSpec(name)
    require(version > 0, s"compact($name): table has no data yet")
    val compacted = readTable(name)
      .repartition(targetPartitions, spec.keys.map(col): _*)
    writeTable(name, compacted, WriteMode.Overwrite)
  }

  /** OPTIMIZE … ZORDER BY analog (r12) — the other half of the Delta
    * maintenance pair next to [[compact]]: rewrite the current
    * snapshot laid out along the space-filling curve over `zorderBy`
    * (`graft.operators.ZOrder.layout` — range partition + sort on the
    * fused Morton value), THROUGH the same versioned commit, so
    * readers swap atomically, time travel keeps the pre-optimize
    * snapshot, and rollback undoes the rewrite. Content-identical by
    * construction — only the file layout changes, which is what makes
    * parquet min/max footer stats prune on EVERY zorder dimension for
    * the range-scan queries a feature table serves (the q59/ZOrderSpec
    * geometry, now reachable as table maintenance). Bucketed tables
    * refuse: their physical layout IS the bucket spec.
    */
  def optimizeTable(name: String, zorderBy: Seq[String],
      targetPartitions: Int = spark.sparkContext.defaultParallelism): Unit = {
    require(zorderBy.nonEmpty, s"optimizeTable($name): need zorderBy columns")
    val (spec, version) = loadSpec(name)
    require(version > 0, s"optimizeTable($name): table has no data yet")
    require(spec.buckets == 0,
      s"optimizeTable($name): bucketed tables fix their own layout " +
        "(CLUSTERED BY keys); compact by rewriting at the same bucket spec")
    val bad = zorderBy.filterNot(spec.schema.fieldNames.contains)
    require(bad.isEmpty,
      s"optimizeTable($name): zorderBy column(s) ${bad.mkString(", ")} not in schema")
    val laidOut = graft.operators.ZOrder
      .layout(readTable(name), zorderBy, numFiles = targetPartitions)
    writeTable(name, laidOut, WriteMode.Overwrite)
  }
}
