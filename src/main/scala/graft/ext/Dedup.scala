package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [extension] Deduplication operators for LLM-data pipelines
  * (SURVEY.md §7.6). Exact dedup is a hash groupBy; near-dup families
  * (MinHash+LSH, SimHash, n-gram Jaccard) generate candidate pairs with
  * a band-bucket join — never an O(n²) cross product — so they scale to
  * 100 TB: cost is (docs × signature) map work plus one shuffle per
  * band join, with AQE handling bucket skew.
  *
  * Algorithms are the standard public constructions: MinHash resemblance
  * (Broder, "On the resemblance and containment of documents", 1997),
  * banded LSH (Indyk & Motwani 1998; banding exposition as in Mining of
  * Massive Datasets ch.3), SimHash (Charikar, "Similarity estimation
  * techniques from rounding algorithms", STOC 2002) with the pigeonhole
  * block-probe of Manku/Jain/Sarma (WWW 2007).
  */
object Dedup {

  /** Single-file parquet inputs arrive as one partition; CPU-bound
    * per-row signature work then runs on one core. Fan small inputs out
    * to the session's parallelism (no-op when the source is already
    * split, as a 100 TB table would be). The split estimate comes from
    * optimizer statistics (bytes / maxPartitionBytes — the same ratio
    * FileSourceScan uses to split files), NOT from df.rdd: probing the
    * RDD would instantiate the physical plan and its lineage on every
    * operator build.
    */
  private[ext] def balanced(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // Fan-out target max(4, p/4), not p (r18 optimization, same
    // measurement as Tables.loadSpread): every task carries a fixed
    // cost roughly proportional to its serialized plan subtree (task
    // deserialization, agg-map setup, JIT-cold codegen), so a p-way
    // fan-out of a small frame pays p fixed costs for per-row work
    // that a quarter of the tasks amortize just as well; the divisor
    // also scales the fan-out down for low-core sessions.
    val target = math.max(4, p / 4)
    val maxPartitionBytes = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // compare in BigInt: stats can be Long.MaxValue (unknown-size
    // sources) or products of child sizes — any narrowing cast here
    // would wrap and repartition exactly the huge inputs this must
    // leave alone
    if (bytes >= BigInt(p) * maxPartitionBytes) df
    // Stats imply a narrow input; confirm against the width the plan
    // would execute with, so a frame that is already wide despite small
    // stats (many files, an upstream shuffle) is never coalesced down.
    else if (plannedWidth(df, target) < target) df.repartition(target)
    else df
  }

  /** The partition count the physical plan would execute with, read
    * from the PLAN — never from `df.rdd`, which would instantiate the
    * physical plan's lineage (and, under AQE, run its stages) on every
    * operator build. AQE wrappers are unwrapped to the plan they would
    * adaptively execute: a pinned `repartition(n)` shuffle
    * (REPARTITION_BY_NUM — exempt from coalescing) answers with its
    * declared width, but a coalescible shuffle (ENSURE_REQUIREMENTS
    * etc.) counts as narrow, because on this small-stats branch AQE
    * routinely coalesces it to very few (even 1) partitions at runtime
    * — the old "wide by construction" answer skipped the widening that
    * is balanced()'s whole purpose. A file scan answers with Spark's
    * own file-split packing over its listed files (exact here — no
    * file on this branch exceeds the split size); purely local data
    * (LocalTableScan test fixtures) counts as 1.
    */
  private def plannedWidth(df: DataFrame, p: Int): Int = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.{REPARTITION_BY_NUM, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.datasources.FilePartition
    val session = df.sparkSession
    // "coalescible shuffle counts as narrow" only holds when AQE
    // coalescing will actually run; otherwise the exchange executes at
    // its declared width and must be reported as such
    val conf = session.sessionState.conf
    val coalesces =
      conf.getConf(org.apache.spark.sql.internal.SQLConf.ADAPTIVE_EXECUTION_ENABLED) &&
      conf.getConf(org.apache.spark.sql.internal.SQLConf.COALESCE_PARTITIONS_ENABLED)
    def width(plan: SparkPlan): Option[Int] = plan.collectFirst {
      case a: AdaptiveSparkPlanExec => width(a.inputPlan).getOrElse(1)
      case e: ShuffleExchangeLike =>
        if (e.shuffleOrigin == REPARTITION_BY_NUM || !coalesces) e.numPartitions
        else 1
      case f: FileSourceScanExec =>
        val listing = f.selectedPartitions
        FilePartition.getFilePartitions(session, listing.toPartitionArray.toSeq,
          FilePartition.maxSplitBytes(session, listing)).size
    }
    width(df.queryExecution.executedPlan).getOrElse(1)
  }

  // ------------------------------------------------------------- exact

  /** Exact duplicate groups by normalized-text fingerprint: for every
    * text, the surviving doc (min id) and the group size. Deterministic
    * (unlike dropDuplicates, which keeps an arbitrary row).
    */
  def exactGroups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Deterministic exact dedup: keep the min-id row per fingerprint.
    * Window over the fingerprint — single shuffle, no join.
    */
  def exactDedup(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol))).orderBy(col(idCol))
    docs.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  // ----------------------------------------------------------- minhash

  /** Character k-shingles (distinct) of normalized text: substrings of
    * length k at every start position. No shuffle — one array column.
    */
  def shingles(text: Column, k: Int): Column = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(norm) - (k - 1), lit(1))),
        i => norm.substr(i, lit(k))))
  }

  /** MinHash signature: for permutation j, min over shingles of
    * ((a_j · (xxhash64(shingle) mod p) + b_j) mod p) with p = 2³¹−1 and
    * a_j, b_j ∈ [1, p) — the standard universal hash family. The outer
    * mod is what makes each h_j a (near-)permutation rather than a
    * monotonic rescaling of the same base hash: without it every h_j
    * would select the same argmin shingle and all signatures of docs
    * sharing one globally-minimal shingle would collide. Products stay
    * < 2⁶², safe under Spark's default ANSI overflow checking. One
    * array column, no shuffle.
    */
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column =
    graft.functions.VectorExpressions.minhashSig(shingles(text, k), numHashes)

  /** LSH band keys: split the signature into `bands` bands of
    * `rows = numHashes/bands` hashes; each band hashes to one bucket
    * key. Docs sharing ANY band bucket are candidates.
    */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(slice(sig, b * rows + 1, rows)).as("bucket"))
    }: _*)

  /** MinHash signature over word n-gram shingles — the standard unit
    * for document-level near-dup (char shingles are non-selective on
    * low-vocabulary corpora: most docs share most char k-grams). The
    * gram construction is fused into the hash expression; only the
    * (codegen'd) tokenization happens in SQL space.
    *
    * `portableHash` = true swaps the xxh64 base hash for the
    * md5-13-hex flavor the DuckDB oracle can replay — what the hash
    * gates run; production keeps the (faster) default, with the two
    * flavors' pair sets pinned equal on gate data by DedupSpec.
    */
  def minhashSignatureWords(text: Column, n: Int, numHashes: Int,
      portableHash: Boolean = false): Column =
    graft.functions.VectorExpressions.minhashNgramSig(
      TextAnalysis.tokens(lower(text)), n, numHashes, portableHash)

  /** Candidate near-duplicate pairs via MinHash+LSH with estimated
    * Jaccard attached. Plan, tuned for scale:
    *   1. signature per doc (narrow map, custom expression);
    *   2. explode band keys and self-join on (band,bucket) carrying ONLY
    *      ids — signatures never ride the candidate shuffle;
    *   3. distinct() on the narrow (id_a,id_b) pairs;
    *   4. re-attach the two signatures by broadcast join and estimate
    *      Jaccard as the fraction of agreeing minhashes.
    * The signature table is ~(numHashes·8 bytes)/doc; at true 100 TB
    * corpus scale the re-attach join falls back to a shuffle join on id
    * — still narrow rows, still no O(n²) anywhere.
    */
  def minhashPairs(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 3, numHashes: Int = 32, bands: Int = 8,
      minJaccard: Double = 0.5, portableHash: Boolean = false): DataFrame = {
    val rows = numHashes / bands
    // cache: the signature subtree is read 4× (self-join left/right +
    // two re-attach joins); without the cache each subtree recomputes
    // the full tokenize+hash pipeline. At 100 TB the equivalent is
    // materializing the signature table once. Deliberately never
    // unpersisted: the returned DataFrame stays lazy over this plan, so
    // eager unpersist would just force recomputation; the frames are
    // numHashes·8 bytes/doc and Spark's storage LRU evicts them.
    // docs too short to produce any gram have NULL signatures — they
    // carry no similarity evidence and must not pair with each other
    val withSig = balanced(docs).select(col(idCol).as("id"),
      minhashSignatureWords(col(textCol), k, numHashes, portableHash).as("sig"))
      .filter(col("sig").isNotNull).cache()
    withSig.count() // eager: lazy cache would race among the 4 readers,
                    // each recomputing the signature pipeline
    // pinned width on the band key (r18, the SetSimJoin.pinnedWidth
    // measurement): AQE's 1 MB parallelism-first floor coalesced the
    // narrow candidate self-join of a small corpus to one task; the
    // pinned repartition replaces the join's own exchange
    // (REPARTITION_BY_NUM is coalesce-exempt) and BOTH sides reuse it.
    val pinParts = math.max(4,
      docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt / 4)
    val exploded = withSig.select(col("id"),
      explode(bandKeys(col("sig"), bands, rows)).as("bk"))
      .repartition(pinParts, col("bk"))
    val cands = exploded.select(col("id").as("id_a"), col("bk"))
      .join(exploded.select(col("id").as("id_b"), col("bk")), Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    // no broadcast hint: the signature table scales with the corpus —
    // AQE broadcasts while it fits and falls back to a shuffle join
    cands
      .join(withSig.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(withSig.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          bo => bo)).cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= minJaccard)
  }

  // ----------------------------------------------------------- simhash

  /** 64-bit SimHash over whitespace tokens of case-normalized text:
    * per bit, majority vote of token-hash bits. One narrow pass via the
    * fused SimHash64 expression — no explode, no shuffle.
    */
  def simhash(docs: DataFrame, textCol: String, idCol: String,
      portableHash: Boolean = false): DataFrame =
    balanced(docs).select(col(idCol).as("id"),
      graft.functions.VectorExpressions.simhash64(
        TextAnalysis.tokens(lower(col(textCol))), portableHash).as("simhash"))

  /** SimHash near-dup candidates: block on 4 sub-keys (any block equal
    * → candidate; guarantees recall for hamming ≤ 3 by pigeonhole on 4
    * blocks), then filter on exact hamming distance. Default flavor:
    * 64-bit xxh64 signature, 16-bit blocks; `portableHash` = true runs
    * the md5-derived 52-bit signature in 13-bit blocks — the
    * oracle-replayable gate flavor (token-less docs drop out via their
    * NULL signature there; join keys on NULL never match).
    */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, portableHash: Boolean = false): DataFrame = {
    val blockBits =
      if (portableHash) graft.functions.VectorExpressions.SimHash64.portableBits / 4
      else 16
    val blockMask = (1L << blockBits) - 1
    // NULL signatures (NULL text; token-less docs in the portable
    // flavor) carry no similarity evidence — drop them explicitly
    // rather than relying on NULL-key join semantics through the
    // struct bucket key
    val sh = simhash(docs, textCol, idCol, portableHash)
      .filter(col("simhash").isNotNull)
      .cache() // read by both join sides
    sh.count()
    val blocked = sh.select(col("id"), col("simhash"),
      explode(array((0 until 4).map { blk =>
        struct(lit(blk).as("blk"),
          shiftrightunsigned(col("simhash"), blk * blockBits).bitwiseAND(lit(blockMask)).as("key"))
      }: _*)).as("bk"))
    val a = blocked.select(col("id").as("id_a"), col("simhash").as("sh_a"), col("bk"))
    val b = blocked.select(col("id").as("id_b"), col("simhash").as("sh_b"), col("bk"))
    a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------- n-gram Jaccard

  /** Word n-grams (distinct) of case-normalized text — near-dup units
    * are case-insensitive, like `TextAnalysis.fingerprint`. Built on
    * the shared lambda-BOUND builder: the earlier inline form re-ran
    * the tokenization regex inside the window lambda once per gram
    * (higher-order functions evaluate interpreted — no subexpression
    * reuse), which multiplied the per-doc cost by the gram count.
    */
  def wordNgrams(text: Column, n: Int): Column =
    array_distinct(
      TextAnalysis.wordNgramsOf(TextAnalysis.tokens(lower(text)), n))

  /** Exact edit-distance pairs over the DISTINCT values of a string
    * column (dedupe first — at corpus scale the same surface repeats
    * thousands of times and pair counts would square). Every stage is
    * an EQUI join — no nested-loop join at any scale:
    *
    *   - Strings with length ≥ (maxDist+1)·q meet through shared
    *     q-grams with ED-Join COUNT FILTERING (Gravano et al. VLDB
    *     2001; Xiao et al. VLDB 2008): one edit destroys at most q
    *     overlapping q-grams, so ed(a,b) ≤ maxDist implies the gram
    *     MULTISETS share ≥ (max(|a|,|b|)−q+1) − maxDist·q grams. The
    *     count is on multisets (Σ min(cnt_a, cnt_b) per gram) —
    *     distinct-gram counting undercounts repeated grams
    *     ("aaaaaa" has one distinct 2-gram) and would wrongly prune.
    *     The count filter, not mere gram existence, is what keeps a
    *     hot gram ("er", "an") from flooding the levenshtein stage.
    *   - Strings below that length meet through shared 1-grams with
    *     the same bound at q=1 (shared chars ≥ max(|a|,|b|) − maxDist,
    *     ≥ 1 whenever the longer side has length ≥ maxDist+1),
    *     joined against the length band |Δlen| ≤ maxDist.
    *   - Tiny strings (length ≤ maxDist) are ALL pairwise within
    *     maxDist (ed ≤ max length); they meet in one sentinel bucket
    *     — a 2-char "gram" no real 1-gram can equal — so the pair
    *     set, inherently Θ(|tiny|²) because every pair is an output
    *     row, is produced by the same hash equi join.
    *
    * The exact banded `levenshtein(·,·,maxDist)` runs on candidates
    * only. Length filtering (|Δlen| ≤ maxDist) rides every join.
    *
    * `foldKeys` (r18, the r17 verdict composition ask): match on
    * case-folded, diacritic-folded KEYS
    * ([[TextAnalysis.foldDiacritics]] + lower) instead of raw
    * strings — `José`/`José`/`jose` collapse to ONE distinct
    * key before blocking, so diacritic variants stop splitting into
    * spurious near-miss pairs and the emitted `name_a`/`name_b` are
    * the folded keys (callers keeping original surfaces join back on
    * their own folded column). Default off: raw-surface matching is
    * the q92 contract.
    */
  def editDistancePairs(df: DataFrame, textCol: String,
      maxDist: Int = 2, q: Int = 2, foldKeys: Boolean = false): DataFrame = {
    require(maxDist >= 0, s"editDistancePairs: maxDist must be >= 0, got $maxDist")
    require(q >= 1, s"editDistancePairs: q must be >= 1, got $q")
    val key = if (foldKeys) lower(TextAnalysis.foldDiacritics(col(textCol)))
      else col(textCol)
    val names = balanced(df.select(key.as("name"))
      .filter(col("name").isNotNull).distinct())
      .withColumn("len", length(col("name")))
    val minSafe = (maxDist + 1) * q

    // gram multiset counts: one row per (name, gram) with its
    // occurrence count. Map-side partial agg absorbs most of the
    // groupBy (all grams of a name sit in one input partition).
    def gramCounts(sub: DataFrame, g: Int): DataFrame =
      sub.filter(col("len") >= g)
        .select(col("name"), col("len"),
          explode(transform(sequence(lit(1), col("len") - (g - 1)),
            i => col("name").substr(i, lit(g)))).as("gram"))
        .groupBy("name", "len", "gram").agg(count(lit(1)).as("cnt"))
    def asA(g: DataFrame): DataFrame = g.select(col("name").as("name_a"),
      col("len").as("len_a"), col("gram"), col("cnt").as("cnt_a"))
    def asB(g: DataFrame): DataFrame = g.select(col("name").as("name_b"),
      col("len").as("len_b"), col("gram"), col("cnt").as("cnt_b"))

    // long × long: q-gram equi join + multiset count filter
    val longG = gramCounts(names.filter(col("len") >= minSafe), q)
    val candLong = asA(longG).join(asB(longG), Seq("gram"))
      .filter(col("name_a") < col("name_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist)
      .groupBy("name_a", "name_b")
      .agg(sum(least(col("cnt_a"), col("cnt_b"))).as("shared"),
        max(greatest(col("len_a"), col("len_b"))).as("mx"))
      .filter(col("shared") >= col("mx") - (q - 1) - maxDist * q)
      .select("name_a", "name_b")

    // short side (len < minSafe) × its reachable length band: 1-gram
    // equi join + count filter at q=1. Tiny strings additionally carry
    // the sentinel row so char-disjoint tiny pairs ("ab"/"cd") still
    // meet; for any pair with max len ≤ maxDist the count threshold is
    // ≤ 0, so the sentinel never has to lie about real shared chars.
    val sentinel = names.filter(col("len") <= maxDist)
      .select(col("name"), col("len"), lit("\u0000\u0000").as("gram"),
        lit(1L).as("cnt"))
    val shortG = gramCounts(names.filter(col("len") < minSafe), 1)
      .unionByName(sentinel)
    val bandG = gramCounts(names.filter(col("len") < minSafe + maxDist), 1)
      .unionByName(sentinel)
    val candShort = asA(shortG).join(asB(bandG), Seq("gram"))
      .filter(abs(col("len_a") - col("len_b")) <= maxDist &&
        // one orientation per unordered pair: short×short by name
        // order; short×long only ever joins with the long on the right
        (col("len_b") >= minSafe || col("name_a") < col("name_b")))
      .groupBy(least(col("name_a"), col("name_b")).as("name_a"),
        greatest(col("name_a"), col("name_b")).as("name_b"))
      .agg(sum(least(col("cnt_a"), col("cnt_b"))).as("shared"),
        max(greatest(col("len_a"), col("len_b"))).as("mx"))
      .filter(col("shared") >= col("mx") - maxDist)
      .select("name_a", "name_b")

    // 3-arg levenshtein: banded O(maxDist·n) with early exit (-1 past
    // the threshold) instead of the full O(n²) table per candidate.
    // The OR with an always-false nondeterministic arm pins this
    // filter HERE: levenshtein must run once per count-filtered pair,
    // but Catalyst would otherwise push the predicate through the
    // distinct and the pair aggregation into the gram joins, where it
    // evaluates per (pair, shared-gram) row — on a hot gram's
    // quadratic bucket, exactly the flood the count filter exists to
    // prevent. A plain AND-ed conjunct doesn't work: pushdown splits
    // conjunctions and pushes the deterministic parts alone.
    candLong.unionByName(candShort).distinct()
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("int"))
      .filter((col("dist") >= 0 && col("dist") <= maxDist) ||
        monotonically_increasing_id() < 0)
  }

  /** End-to-end near-duplicate dedup — the composition a training-data
    * pipeline actually runs: MinHash+LSH candidate pairs
    * ([[minhashPairs]]) close into duplicate clusters
    * ([[Components.connectedComponents]], O(log n) star rounds), and
    * each cluster keeps only its minimum-id document. Transitive
    * semantics by construction (A~B, B~C drops both B and C even when
    * A~C was never estimated) — the group-level contract pairwise
    * earliest-survivor rules (SemanticDedup) cannot give. Plan: the
    * pair pipeline's band-bucket equi joins, the component rounds'
    * window passes, then ONE left-anti hash join of the corpus against
    * the non-min cluster members; the corpus itself is never shuffled.
    */
  def nearDupRetain(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", k: Int = 3, numHashes: Int = 32,
      bands: Int = 8, minJaccard: Double = 0.5,
      portableHash: Boolean = false): DataFrame =
    retainFromPairs(docs,
      minhashPairs(docs, textCol, idCol, k, numHashes, bands, minJaccard,
          portableHash)
        .select(col("id_a").as("src"), col("id_b").as("dst")), idCol)

  /** The retention half of [[nearDupRetain]], decoupled from the
    * candidate generator: close ANY duplicate pair set (MinHash bands,
    * exact tiled cosine, SimHash — anything emitting (src, dst) id
    * pairs) into components and keep each component's minimum-id row.
    * Separating the stages lets the composition be verified against an
    * exact pair set (the q138 gate runs it over the tiled-cosine edges,
    * where a DuckDB recursive closure is the ground truth) while
    * production keeps whatever candidate tier fits the corpus.
    */
  def retainFromPairs(docs: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame = {
    val dropped = Components.connectedComponents(
        pairs.select(col("src"), col("dst")))
      .filter(col("node") =!= col("component"))
      .select(col("node").as("_drop_id"))
    docs.join(dropped, col(idCol) === col("_drop_id"), "left_anti")
  }

  /** [[retainFromPairs]] under the "keep the most-REPRESENTATIVE
    * duplicate" policy: each cluster keeps its highest-PageRank member
    * (ties to the lowest id) instead of the minimum id — a template
    * document touching every rewrite outranks an arbitrary first id.
    * Plan: the pair set closes into components (star rounds) and ranks
    * (5 quantized-PageRank iterations) off ONE checkpointed edge list;
    * the per-cluster argmax is a window over |cluster| rows; retention
    * stays one left-anti join, the corpus never shuffles. Singletons
    * (no edges) are untouched by construction.
    */
  def retainFromPairsByRank(docs: DataFrame, pairs: DataFrame,
      idCol: String, iterations: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // consumed by BOTH the component rounds and the rank iterations
    // lazy (r19): the component rounds' first count materializes the
    // blocks; the rank iterations reuse them — one standalone job less
    val p = pairs.select(col("src"), col("dst")).localCheckpoint(false)
    val comp = Components.connectedComponents(p)
    val ranks = Components.pageRankQuantized(p, iterations = iterations)
    val w = Window.partitionBy(col("component"))
      .orderBy(col("rq").desc, col("node"))
    val dropped = comp.join(ranks, Seq("node"))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") > 1)
      .select(col("node").as("_drop_id"))
    docs.join(dropped, col(idCol) === col("_drop_id"), "left_anti")
  }

  /** Exact n-gram Jaccard for candidate pairs produced by MinHash LSH:
    * re-load each side's n-gram set and compute |∩|/|∪|. The LSH stage
    * bounds the pair count, so this never goes quadratic.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, k: Int = 3, numHashes: Int = 32, bands: Int = 8,
      minEstJaccard: Double = 0.2, portableHash: Boolean = false): DataFrame = {
    val cands = minhashPairs(docs, textCol, idCol, k, numHashes, bands,
      minEstJaccard, portableHash)
    val grams = balanced(docs)
      .select(col(idCol).as("id"), wordNgrams(col(textCol), n).as("grams")).cache()
    grams.count() // eager: both re-attach joins read this frame; a lazy
                  // cache lets their scans race, each recomputing the
                  // tokenize+ngram pipeline before blocks land
    cands
      .join(grams.withColumnRenamed("id", "id_a").withColumnRenamed("grams", "grams_a"), Seq("id_a"))
      .join(grams.withColumnRenamed("id", "id_b").withColumnRenamed("grams", "grams_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("grams_a"), col("grams_b"))).cast("double") /
          size(array_union(col("grams_a"), col("grams_b")))).as("jaccard"))
  }
}
