package graft.ext

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [extension] Maximal-Marginal-Relevance diversity re-ranking
  * (Carbonell & Goldstein, SIGIR 1998) over a bounded candidate list —
  * the eval-set / few-shot-pool selection step where plain top-k
  * returns k near-copies of the best hit: each pick maximizes
  * λ·relevance − (1−λ)·max-similarity-to-already-picked.
  *
  * Execution contract (the rrfFuse candidate-list discipline): the
  * input must already be a SMALL candidate frame — produce it with one
  * corpus scan (`Retrieval.truncatedCosineTopK`, `bm25TopK`, an IVF
  * probe); the greedy loop is inherently sequential, so it runs as
  * per-iteration 1-row argmax jobs with only MODEL-sized state (the
  * picked ids + quantized vectors) round-tripping the driver — the
  * k-means/BPE iteration discipline. Each iteration's
  * max-sim-to-picked is a codegen'd chain of dot products against the
  * picked vectors folded back as LITERAL arrays (the q35 centroid
  * discipline), so the candidate frame is scanned k times and never
  * joined to anything.
  *
  * All arithmetic is exact-integer and engine-portable: vectors
  * quantize to 1e6-scaled BIGINTs, similarities to the q29/q146
  * 1e9-quantized cosine, and λ enters as a RATIONAL num/den so the
  * selection key den·score = num·rel − (den−num)·maxsim stays in
  * BIGINTs (argmax over den·score ≡ argmax over score; a double λ
  * would put an ulp coin-flip inside every argmax). Ties break on the
  * id, so the selected SEQUENCE is deterministic and the whole greedy
  * trajectory hash-gates as an unrolled oracle recurrence.
  *
  * Tie determinism across engines (r12 audit): an EXACT score tie —
  * two candidates with equal den·score at the same iteration, e.g.
  * duplicate vectors with equal relevance — is resolved by the
  * (_mmr DESC, _id) total order, and because every score ingredient
  * is an exact integer (dot products of 1e6-quantized vectors stay
  * < 2⁵³, so the one double division per cosine is a single
  * correctly-rounded IEEE op both engines share), the tie EXISTS in
  * both engines or in neither — the oracle recurrence picks the same
  * id. MmrSpec pins this with a deliberate duplicate-candidate tie.
  */
object Mmr {

  /** Greedily select `k` of the candidates. `candidates` must carry
    * the id, an integer relevance (`relCol`, e.g. cos_tq/bm25_q) and
    * the RAW embedding (`vecCol`); emits (rnk, id, mmr_q) in pick
    * order, where mmr_q = num·rel − (den−num)·maxsim (den-scaled —
    * the first pick's maxsim is 0 by convention).
    *
    * HARD CAPS (enforced, `IllegalArgumentException` at call time —
    * introduced after the initial release, so callers upgrading from
    * earlier versions may hit them where the old code silently
    * accepted): `k <= 128` (each pick folds all previous picks back
    * as literal-vector dot products, so an unbounded k grows the
    * final argmax codegen quadratically) and `candidates <=
    * maxCandidates` rows. For larger selections compose a top-k scan
    * with clustering instead of MMR.
    *
    * EAGER semantics (the rrfFuse contract): the greedy loop executes
    * at CALL time — k argmax jobs — and the returned frame is
    * driver-local (a LocalTableScan); ids are assumed unique.
    */
  def mmrRerank(candidates: DataFrame, vecCol: String, idCol: String,
      relCol: String, k: Int, dims: Int,
      lambdaNum: Int = 1, lambdaDen: Int = 2,
      maxCandidates: Int = 4096): DataFrame = {
    require(dims >= 1, s"mmrRerank: dims must be >= 1, got $dims")
    require(k >= 1, s"mmrRerank: k must be >= 1, got $k")
    // each pick folds ALL previous picks back as literal-vector dot
    // products, so iteration i carries an O(i·dims) expression —
    // unbounded k would grow the final argmax's codegen quadratically
    // (the maxCandidates discipline, enforced not advisory)
    require(k <= 128,
      s"mmrRerank: k=$k exceeds 128 — MMR re-ranks a short display/pool " +
        "list; for larger selections compose a top-k scan with clustering")
    require(lambdaDen >= 1 && lambdaNum >= 0 && lambdaNum <= lambdaDen,
      s"mmrRerank: lambda must be a rational in [0,1], got $lambdaNum/$lambdaDen")
    val spark = candidates.sparkSession
    val quant = transform(slice(col(vecCol), 1, dims),
      x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))
    val cand = candidates
      .select(col(idCol).cast("long").as("_id"),
        col(relCol).cast("long").as("_rel"), quant.as("_qv"))
      .withColumn("_n2",
        aggregate(col("_qv"), lit(0L), (acc, x) => acc + x * x))
      .cache()
    val n = cand.count()
    require(n <= maxCandidates,
      s"mmrRerank: $n candidates exceeds maxCandidates=$maxCandidates — " +
        "generate candidates with a top-k scan first (this operator is " +
        "for re-ranking bounded lists, not corpora)")

    def simTo(sv: Seq[Long], sn2: Long): Column = {
      val dot = aggregate(zip_with(col("_qv"), typedLit(sv), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x)
      if (sn2 == 0L) lit(0L)
      else when(col("_n2") === 0, lit(0L))
        .otherwise(floor(dot.cast("double") / sqrt(col("_n2").cast("double"))
          / sqrt(lit(sn2.toDouble)) * lit(1e9) + lit(0.5)).cast("long"))
    }

    val out = ArrayBuffer.empty[(Long, Long, Long)]
    var remaining = cand
    var sel = List.empty[(Seq[Long], Long)] // (quantized vector, its n2)
    var i = 0
    while (i < k && i < n) {
      val maxSim =
        if (sel.isEmpty) lit(0L)
        else sel.map { case (v, n2) => simTo(v, n2) }
          .reduceLeft((a, b) => greatest(a, b))
      val score = (lit(lambdaNum.toLong) * col("_rel") -
        lit((lambdaDen - lambdaNum).toLong) * maxSim).as("_mmr")
      val row = remaining.select(col("_id"), score, col("_qv"), col("_n2"))
        .orderBy(col("_mmr").desc, col("_id"))
        .limit(1).collect()(0)
      val id = row.getLong(0)
      out += ((i + 1L, id, row.getLong(1)))
      sel = (row.getSeq[Long](2), row.getLong(3)) :: sel
      remaining = remaining.filter(col("_id") =!= id)
      i += 1
    }
    cand.unpersist()
    import spark.implicits._
    out.toSeq.toDF("rnk", idCol, "mmr_q")
  }
}
