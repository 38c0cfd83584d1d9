package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [extension] Salted join for skewed keys (SURVEY.md build brief).
  *
  * AQE's skew-join handling only splits sort-merge partitions at
  * runtime; when a hot key concentrates in one build-side row group —
  * or the join must stay hash-based — explicit salting is the standard
  * fix: the probe side scatters each row into one of `salts` sub-keys,
  * the build side replicates each row to all `salts` sub-keys, and the
  * join runs on (key, salt). Correctness is independent of which salt a
  * probe row gets; the salt only balances partitions.
  *
  * Cost model: build side is duplicated `salts`× (keep it the smaller
  * side), probe side untouched — the hot key now spreads over `salts`
  * reducers.
  */
object SkewJoin {

  private val supportedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross")

  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Right/full-outer are NOT salting-compatible: the build side is
    // replicated per salt, so its non-matching replicas would surface
    // as salts-1 spurious (null-probe, build) rows.
    require(supportedJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin does not support joinType=$joinType (build-side replication " +
        "breaks right/full outer semantics)")
    // Deterministic scatter: salt from the row's key plus a cheap
    // disambiguator (partition-local row position via input ordering is
    // unnecessary — any per-row value balances; xxhash64 of all probe
    // columns keeps it deterministic for testing).
    val probeSalted = probe.withColumn("_salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(salts)).cast("int"))
    val buildSalted = build
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    probeSalted.join(buildSalted, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
