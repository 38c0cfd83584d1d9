package graft.fs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch scoring — the reference's `fs.score_batch("models:/name/v",
  * batch_df, result_type)` (FS:363, FS:388; SO:275, SO:300): the model
  * artifact carries its `FeatureLookup`s, scoring replays the SAME
  * lookup joins as training (J4 = J3) against the *current* feature
  * tables, then appends a `prediction` column.
  *
  * MLflow itself is out of engine scope (SURVEY.md §2.7); what we keep
  * is the data semantics: a registry addressed by `models:/name/version`
  * holding scorers that are pure column expressions over the joined
  * feature row — executed inside whole-stage codegen, eliminating the
  * reference's per-batch JVM→Python pyfunc boundary (SURVEY.md §3.3).
  */
trait Scorer {
  def name: String
  def version: Int
  def lookups: Seq[FeatureLookup]
  /** Column expression over the feature-joined DataFrame. */
  def scoreColumn(joined: DataFrame): Column
  /** Whole-DataFrame hook for scorers that aren't a single expression
    * (spark.ml PipelineModels append columns via transform). Default:
    * append `prediction` = scoreColumn. Output contract either way:
    * the joined columns plus a `prediction` column.
    */
  def scoreDf(joined: DataFrame): DataFrame =
    joined.withColumn("prediction", scoreColumn(joined))
}

/** U3 — a trained spark.ml PipelineModel as a registry scorer (the
  * reference registers its sklearn pipeline through
  * `fs.log_model(..., flavor=mlflow.sklearn)` and scores it with
  * `fs.score_batch`, FS:343-363). transform() runs distributed inside
  * the JVM — no pandas collect, no per-batch Python boundary.
  * `numericCols`/`numericFill` replay the training-side na.fill so
  * train/serve preprocessing stays identical; ONLY those declared
  * feature columns are filled (they come back filled in the output —
  * exactly the values the model consumed), every other joined column
  * passes through untouched so callers can still see which lookups
  * missed.
  */
final case class MlModelScorer(
    name: String,
    version: Int,
    lookups: Seq[FeatureLookup],
    model: org.apache.spark.ml.PipelineModel,
    numericCols: Seq[String] = Seq.empty,
    numericFill: Double = 0.0) extends Scorer {

  override def scoreColumn(joined: DataFrame): Column =
    throw new UnsupportedOperationException(
      s"MlModelScorer $name scores whole DataFrames via scoreDf")

  override def scoreDf(joined: DataFrame): DataFrame = {
    require(!joined.columns.contains("prediction"),
      s"scoreBatch($name): batch already carries a 'prediction' column")
    val filled =
      if (numericCols.isEmpty) joined else joined.na.fill(numericFill, numericCols)
    val scored = model.transform(filled)
    // result_type='string' semantics (FS:363): binary prediction as
    // "True"/"False"; pipeline work columns are dropped, non-feature
    // columns pass through with their original (unfilled) values
    scored.select(joined.columns.map(col) :+
      when(col("prediction") > 0.5, "True").otherwise("False").as("prediction"): _*)
  }
}

/** Deterministic stand-in for the reference's GBT classifier (FS:333):
  * a logistic model over numeric feature columns. NULL features (spine
  * rows missing from a feature table after the left-outer join)
  * contribute 0 — matching sklearn-pipeline behavior after the
  * reference's fillna. `result_type='string'` (FS:363) ⇒ prediction is
  * the string "True"/"False", which callers recast (FS:364).
  */
final case class LogisticScorer(
    name: String,
    version: Int,
    lookups: Seq[FeatureLookup],
    weights: Map[String, Double],
    bias: Double = 0.0) extends Scorer {

  def scoreColumn(joined: DataFrame): Column = {
    val z = weights.toSeq.sortBy(_._1).map { case (c, w) =>
      coalesce(col(c).cast("double"), lit(0.0)) * lit(w)
    }.foldLeft(lit(bias))(_ + _)
    // sigmoid(z) > 0.5  ⟺  z > 0 — threshold on z avoids exp() in the
    // hot path and keeps the oracle SQL exactly portable.
    when(z > 0, "True").otherwise("False")
  }
}

/** The observable slice of the reference's MLflow run tracking
  * (FS:314-349 — autolog/start_run/log_metric): per (model, version),
  * the training metrics and run params a registry should answer
  * WITHOUT the training session. Metrics are doubles (accuracy, row
  * counts); params are strings (feature-data version, split seed, ...).
  * Durable registries persist this as a `run.properties` sidecar next
  * to `scorer.properties`.
  */
final case class RunInfo(
    name: String,
    version: Int,
    metrics: Map[String, Double],
    params: Map[String, String] = Map.empty)

final class ScorerRegistry private[fs] (persistence: Option[ScorerPersistence]) {
  def this() = this(None)

  private var scorers = Map.empty[(String, Int), Scorer]
  private var runs = Map.empty[(String, Int), RunInfo]

  /** Register (and, for a durable registry, persist) a scorer. */
  def register(s: Scorer): Unit = synchronized {
    persistence.foreach(_.save(s))
    scorers += ((s.name, s.version) -> s)
  }

  /** Record the training run behind a registered model version — the
    * fs.log_model + log_metric pairing (FS:340-349). Re-logging a
    * (name, version) overwrites, same contract as [[register]].
    */
  def logRun(run: RunInfo): Unit = synchronized {
    persistence.foreach(_.saveRun(run))
    runs += ((run.name, run.version) -> run)
  }

  /** Read a model version's training metrics; durable registries fall
    * back to the `run.properties` sidecar, so runs logged in an
    * earlier session resolve here too.
    */
  def getRun(name: String, version: Int): Option[RunInfo] = synchronized {
    runs.get((name, version))
      .orElse(persistence.flatMap(_.loadRun(name, version)).map { r =>
        runs += ((name, version) -> r); r
      })
  }

  /** Resolve `models:/name/version` (FS:363's URI scheme). A durable
    * registry falls back to its sidecar files, so models registered in
    * an earlier session resolve here too (the registry-survives-the-
    * notebook semantics of FS:342-349 / FS:376-377).
    */
  def resolve(uri: String): Scorer = {
    val parsed = uri.stripPrefix("models:/").split("/")
    require(parsed.length == 2, s"bad model URI: $uri (want models:/name/version)")
    val key = (parsed(0), parsed(1).toInt)
    synchronized {
      scorers.get(key)
        .orElse(persistence.flatMap(_.load(key._1, key._2)).map { s =>
          scorers += (key -> s); s
        })
        .getOrElse(
          throw new NoSuchElementException(s"no scorer registered for $uri"))
    }
  }

  /** J4 — replay the training joins against current feature tables and
    * append `prediction` (FS:363). Uses the same LookupJoins builder as
    * TrainingSet.loadDf, so train/serve parity holds by construction.
    */
  def scoreBatch(store: FeatureStore, uri: String, batch: DataFrame): DataFrame = {
    val scorer = resolve(uri)
    val joined = LookupJoins.attach(store, batch, scorer.lookups)
    scorer.scoreDf(joined)
  }
}

object ScorerRegistry {
  /** A durable registry rooted at `root` (typically the feature-store
    * root): each registered model writes a `scorer.properties` sidecar
    * under `<root>/_models/<name>/v<version>/` — the same
    * metadata-next-to-data pattern as [[FeatureTableSpec]] — plus the
    * spark.ml artifact for [[MlModelScorer]]s, so `models:/name/v`
    * resolves in a fresh session against the same root.
    */
  def persistent(spark: org.apache.spark.sql.SparkSession, root: String): ScorerRegistry =
    new ScorerRegistry(Some(new ScorerPersistence(spark, root)))
}

/** Sidecar serialization for the two scorer shapes the engine ships.
  * Registration is single-writer per (name, version) — re-registering
  * overwrites, racing writers are out of scope (the reference's model
  * registry has the same contract).
  */
private[fs] final class ScorerPersistence(
    spark: org.apache.spark.sql.SparkSession, root: String) {
  import java.util.Properties
  import org.apache.hadoop.fs.Path

  private val modelsRoot = new Path(root, "_models")
  private val fs = modelsRoot.getFileSystem(spark.sessionState.newHadoopConf())

  private def dir(name: String, version: Int) = new Path(modelsRoot, s"$name/v$version")
  private def propsFile(name: String, version: Int) =
    new Path(dir(name, version), "scorer.properties")

  private def putLookups(p: Properties, lookups: Seq[FeatureLookup]): Unit = {
    p.setProperty("lookups.n", lookups.size.toString)
    lookups.zipWithIndex.foreach { case (l, i) =>
      p.setProperty(s"lookups.$i.table", l.table)
      p.setProperty(s"lookups.$i.feature", l.feature)
      p.setProperty(s"lookups.$i.keys.n", l.lookupKey.size.toString)
      l.lookupKey.zipWithIndex.foreach { case (k, j) =>
        p.setProperty(s"lookups.$i.keys.$j", k)
      }
    }
  }

  private def getLookups(p: Properties): Seq[FeatureLookup] =
    (0 until p.getProperty("lookups.n").toInt).map { i =>
      FeatureLookup(
        p.getProperty(s"lookups.$i.table"),
        p.getProperty(s"lookups.$i.feature"),
        (0 until p.getProperty(s"lookups.$i.keys.n").toInt)
          .map(j => p.getProperty(s"lookups.$i.keys.$j")))
    }

  def save(s: Scorer): Unit = {
    val p = new Properties()
    p.setProperty("name", s.name)
    p.setProperty("version", s.version.toString)
    putLookups(p, s.lookups)
    s match {
      case l: LogisticScorer =>
        p.setProperty("kind", "logistic")
        p.setProperty("bias", l.bias.toString) // Double.toString round-trips exactly
        val ws = l.weights.toSeq.sortBy(_._1)
        p.setProperty("weights.n", ws.size.toString)
        ws.zipWithIndex.foreach { case ((c, w), i) =>
          p.setProperty(s"weights.$i.col", c)
          p.setProperty(s"weights.$i.val", w.toString)
        }
      case m: MlModelScorer =>
        p.setProperty("kind", "mlmodel")
        p.setProperty("numericFill", m.numericFill.toString)
        p.setProperty("numericCols.n", m.numericCols.size.toString)
        m.numericCols.zipWithIndex.foreach { case (c, i) =>
          p.setProperty(s"numericCols.$i", c)
        }
        m.model.write.overwrite().save(new Path(dir(s.name, s.version), "model").toString)
      case other => throw new IllegalArgumentException(
        s"cannot persist scorer kind ${other.getClass.getName} — register it per-session")
    }
    fs.mkdirs(dir(s.name, s.version))
    val out = fs.create(propsFile(s.name, s.version), true)
    try p.store(out, null) finally out.close()
  }

  private def runFile(name: String, version: Int) =
    new Path(dir(name, version), "run.properties")

  def saveRun(run: RunInfo): Unit = {
    val p = new Properties()
    p.setProperty("name", run.name)
    p.setProperty("version", run.version.toString)
    val ms = run.metrics.toSeq.sortBy(_._1)
    p.setProperty("metrics.n", ms.size.toString)
    ms.zipWithIndex.foreach { case ((k, v), i) =>
      p.setProperty(s"metrics.$i.key", k)
      p.setProperty(s"metrics.$i.val", v.toString) // Double round-trips exactly
    }
    val ps = run.params.toSeq.sortBy(_._1)
    p.setProperty("params.n", ps.size.toString)
    ps.zipWithIndex.foreach { case ((k, v), i) =>
      p.setProperty(s"params.$i.key", k)
      p.setProperty(s"params.$i.val", v)
    }
    fs.mkdirs(dir(run.name, run.version))
    val out = fs.create(runFile(run.name, run.version), true)
    try p.store(out, null) finally out.close()
  }

  def loadRun(name: String, version: Int): Option[RunInfo] = {
    val rf = runFile(name, version)
    if (!fs.exists(rf)) return None
    val p = new Properties()
    val in = fs.open(rf)
    try p.load(in) finally in.close()
    val metrics = (0 until p.getProperty("metrics.n", "0").toInt).map { i =>
      p.getProperty(s"metrics.$i.key") -> p.getProperty(s"metrics.$i.val").toDouble
    }.toMap
    val params = (0 until p.getProperty("params.n", "0").toInt).map { i =>
      p.getProperty(s"params.$i.key") -> p.getProperty(s"params.$i.val")
    }.toMap
    Some(RunInfo(name, version, metrics, params))
  }

  def load(name: String, version: Int): Option[Scorer] = {
    val pf = propsFile(name, version)
    if (!fs.exists(pf)) return None
    val p = new Properties()
    val in = fs.open(pf)
    try p.load(in) finally in.close()
    val lookups = getLookups(p)
    p.getProperty("kind") match {
      case "logistic" =>
        val weights = (0 until p.getProperty("weights.n").toInt).map { i =>
          p.getProperty(s"weights.$i.col") -> p.getProperty(s"weights.$i.val").toDouble
        }.toMap
        Some(LogisticScorer(name, version, lookups, weights,
          p.getProperty("bias").toDouble))
      case "mlmodel" =>
        val numericCols = (0 until p.getProperty("numericCols.n").toInt)
          .map(i => p.getProperty(s"numericCols.$i"))
        Some(MlModelScorer(name, version, lookups,
          org.apache.spark.ml.PipelineModel.load(
            new Path(dir(name, version), "model").toString),
          numericCols, p.getProperty("numericFill").toDouble))
      case k => throw new IllegalStateException(s"unknown scorer kind '$k' in $pf")
    }
  }
}
