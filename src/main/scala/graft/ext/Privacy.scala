package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-anonymity generalization — the privacy gate a training-data
  * pipeline runs before releasing any record-level table that carries
  * quasi-identifiers (attributes that single people out in
  * combination: region × segment × balance band, not any one alone).
  * A released equivalence class smaller than k re-identifies its
  * members; the standard mitigation is a generalization LADDER: try
  * the full quasi-identifier tuple, and where a class is too small,
  * coarsen (drop the most specific attribute), repeating until the
  * class clears k or the record is fully suppressed.
  *
  * Reference scope: the reference pipelines
  * (`/root/reference/Feature_Store_Telco_Churn_Flight_School.py`,
  * which publishes per-customer feature tables keyed by raw IDs)
  * have no anonymization stage — §8.2 extension surface.
  *
  * Semantics (the honest, iterative form): level-0 classes with ≥ k
  * members release at level 0; only the REMAINDER re-groups at level
  * 1, so a level-1 class must hold ≥ k still-unreleased records to
  * release — counting the whole level-1 class would overstate the
  * guarantee, because members already released at level 0 are
  * published with finer values and do not hide anyone. And so on down
  * the ladder; records failing every level are suppressed.
  *
  * Scale shape: the iteration runs entirely on the CLASS table (one
  * `groupBy` over the data → at most one row per distinct
  * quasi-tuple, partial-aggregated map-side), and the per-record
  * decision comes back through ONE broadcast join — the 100 TB input
  * is scanned once and never re-shuffled per ladder level. The
  * class-table windows are cheap at any scale because the class
  * table's size is bounded by the quasi-identifier domain, not the
  * record count.
  */
object Privacy {

  /** Generalize `df` so every released quasi-identifier class has at
    * least `k` members.
    *
    * @param ladder generalization levels, most specific first; each
    *   level is the set of quasi columns RETAINED at that level and
    *   must be a strict subset of the previous level (monotone
    *   coarsening). `ladder.head` is the full quasi-identifier set.
    * @param maxClasses fail-fast bound on the class table (r14 verdict
    *   #7): the per-class decision is driver-BROADCAST, so a
    *   high-cardinality quasi column (class count ~ row count) would
    *   OOM the driver silently. The bound is probed with a
    *   `limit(n+1).count()` (the Decontamination `maxProbes`
    *   discipline — early-exits, never counts the full class table)
    *   and the error names the knob. The default (2²⁰ classes ≈ tens
    *   of MB broadcast) is far past any quasi set that could ever be
    *   k-anonymous: a table with a million classes over fewer than
    *   k·10⁶ rows suppresses almost everything anyway.
    * @return the input columns plus `anon_level` (0-based ladder
    *   index; `ladder.size` = suppressed) and one `rel_<col>` string
    *   per quasi column — the value where released at the record's
    *   level, `"*"` where generalized away.
    */
  def kAnonymize(df: DataFrame, ladder: Seq[Seq[String]], k: Int,
      maxClasses: Int = 1 << 20): DataFrame = {
    require(k >= 1, s"Privacy.kAnonymize: k must be >= 1, got $k")
    require(maxClasses >= 1,
      s"Privacy.kAnonymize: maxClasses must be >= 1, got $maxClasses")
    require(ladder.nonEmpty, "Privacy.kAnonymize: ladder must be non-empty")
    ladder.sliding(2).foreach {
      case Seq(finer, coarser) =>
        require(coarser.toSet.subsetOf(finer.toSet) && coarser.size < finer.size,
          s"Privacy.kAnonymize: each ladder level must strictly coarsen the " +
            s"previous (got $finer then $coarser)")
      case _ => ()
    }
    val quasi = ladder.head
    val suppressedLevel = ladder.size

    // class table: one row per finest quasi tuple, with its member count
    var cls = df.groupBy(quasi.map(col): _*).agg(count(lit(1)).as("n_0"))
    val classProbe = cls.limit(maxClasses + 1).count()
    require(classProbe <= maxClasses,
      s"Privacy.kAnonymize: more than $maxClasses distinct quasi-identifier " +
        s"classes under ${quasi.mkString("(", ", ", ")")} — the class " +
        "decision table is driver-broadcast and a quasi set this " +
        "fine-grained would exhaust driver memory. Coarsen the ladder head " +
        "(drop or band the high-cardinality column) or raise maxClasses " +
        "if the driver can genuinely hold the table.")
    cls = cls.withColumn("_rel_0", col("n_0") >= k)
    for (i <- 1 until ladder.size) {
      val unreleased = (0 until i).map(j => !col(s"_rel_$j")).reduce(_ && _)
      val w = Window.partitionBy(ladder(i).map(col): _*)
      // still-unreleased record mass in this coarser class — the count
      // that actually hides the records released here
      cls = cls
        .withColumn(s"n_$i",
          sum(when(unreleased, col("n_0")).otherwise(lit(0L))).over(w))
        .withColumn(s"_rel_$i", unreleased && col(s"n_$i") >= k)
    }
    val level = (0 until ladder.size)
      .foldRight(lit(suppressedLevel)) { (i, rest) =>
        when(col(s"_rel_$i"), lit(i)).otherwise(rest)
      }
    val decision = cls.select(quasi.map(col) :+ level.cast("int").as("anon_level"): _*)

    // NULL-SAFE join back: groupBy above groups null quasi values as
    // their own class (a real population — "segment unknown" — that
    // must be counted and released/generalized like any other), so the
    // join must match them too; a plain equi-join would silently DROP
    // every null-keyed record from the release
    val l = df.alias("_ka_l")
    val r = broadcast(decision).alias("_ka_r")
    val out = l.join(r,
        quasi.map(c => col(s"_ka_l.$c") <=> col(s"_ka_r.$c")).reduce(_ && _))
      .select(col("_ka_l.*") +: col("_ka_r.anon_level") +: Nil: _*)
    quasi.foldLeft(out) { (acc, c) =>
      // level at which c falls off the ladder; monotone subsets mean c
      // is present at exactly the levels below that
      val dropLevel = ladder.indexWhere(l => !l.contains(c)) match {
        case -1 => ladder.size
        case d  => d
      }
      acc.withColumn(s"rel_$c",
        when(col("anon_level") < dropLevel, col(c).cast("string"))
          .otherwise(lit("*")))
    }
  }
}
