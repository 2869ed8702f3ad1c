package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextOps.h32

/** Document deduplication for training-data pipelines: exact (hash),
  * MinHash+LSH banding, SimHash, and direct n-gram Jaccard.
  *
  * Scale design: MinHash signatures are 16 independent min-aggregates over
  * the shingle table (one shuffle keyed by doc); LSH banding turns the
  * quadratic near-dup search into an equi-join on (band, signature) — the
  * same bucket-join shape a 1000-executor job needs at 100 TB. Only
  * candidate pairs (same band) pay the exact-Jaccard verification join.
  */
object DedupOps {

  val P: Long = 2147483647L // 2^31-1, modulus for the affine permutations

  /** Exact dedup summary over md5(text): corpus size vs distinct payloads. */
  def exactDedupStats(docs: DataFrame): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text"))).as("n_unique"))

  /** Distinct 3-token shingles per doc: (doc_id, hs = h32(shingle)). */
  def shingles(docs: DataFrame): DataFrame =
    shinglesOf(TextOps.tokenize(docs))

  /** [[shingles]] over an already-tokenized (doc_id, tokens) table — so a
    * caller that needs BOTH the token arrays and the shingles (SNM's sort
    * key + verify) tokenizes once (r15, guide §1.2; the bigramNll
    * lesson). */
  def shinglesOf(toksIn: DataFrame): DataFrame = {
    val toks = toksIn.where(size(col("tokens")) >= 3)
    toks.select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("tokens")) - 3),
          i => concat_ws(" ", element_at(col("tokens"), i + 1),
            element_at(col("tokens"), i + 2), element_at(col("tokens"), i + 3))))
        .as("s"))
      .distinct()
      .select(col("doc_id"), h32(col("s")).as("hs"))
  }

  /** MinHash signatures: mh_i = min((a_i·hs + b_i) mod P), a_i=2i+1,
    * b_i=12345i+7, i < nPerm. One aggregate pass over the shingle table. */
  def minhash(sh: DataFrame, nPerm: Int = 16): DataFrame = {
    val aggs = (0 until nPerm).map { i =>
      min(pmod(col("hs") * (2L * i + 1L) + (12345L * i + 7L), lit(P))).as(s"mh_$i")
    }
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: nPerm/rowsPerBand bands; band signature = ":"-joined
    * minhash values. Returns (doc_id, band, sig). */
  def lshBands(mh: DataFrame, nPerm: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val bands = (0 until nPerm / rowsPerBand).map { b =>
      struct(lit(b).as("band"),
        concat_ws(":", (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}")): _*)
          .as("sig"))
    }
    mh.select(col("doc_id"), explode(array(bands: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Candidate pairs from shared LSH buckets, then exact-Jaccard verified
    * at `threshold`. Returns (a, b, jac) with a < b.
    */
  def minhashDupPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    // eager materialization, not cache(): the shingle set feeds six
    // subtrees of one action (both self-join sides, both jaccard probes,
    // both size lookups), and racing stages of a single job all miss a
    // still-cold cache and recompute the tokenize+explode pipeline
    val sh = shingles(docs).localCheckpoint(true)
    val bands = lshBands(minhash(sh))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    jaccardOf(cand, sh).where(col("jac") >= threshold)
  }

  /** Exact Jaccard for given (a,b) pairs via shingle-set joins. */
  def jaccardOf(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.select(col("doc_id").as("a"), col("hs").as("ha")), Seq("a"))
      .join(sh.select(col("doc_id").as("b"), col("hs").as("hb")), Seq("b"))
      .where(col("ha") === col("hb"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), Seq("b"))
      .select(col("a"), col("b"),
        round(col("inter") / (col("na") + col("nb") - col("inter")), 4).as("jac"))
  }

  /** Direct pairwise n-gram Jaccard (the brute-force oracle path; use on
    * bounded blocks only — LSH is the scale path). */
  def ngramJaccard(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shingles(docs)
    val pairs = sh.select(col("doc_id").as("a")).distinct()
      .join(sh.select(col("doc_id").as("b")).distinct(), col("a") < col("b"))
    jaccardOf(pairs, sh).where(col("jac") >= threshold)
  }

  /** Boilerplate-span detection: 3-gram shingles occurring in ≥ minDocs
    * distinct documents, with their document frequency — the repeated-span
    * analysis a training pipeline runs before span-level dedup. One
    * aggregation over the shingle table. */
  def boilerplateShingles(docs: DataFrame, minDocs: Long): DataFrame =
    shingles(docs)
      .groupBy(col("hs")).agg(count(lit(1)).as("df"))
      .where(col("df") >= minDocs)

  /** Per-document duplicated-n-gram fraction — the exact-substring dedup
    * signal (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better") at shingle granularity: the fraction of a doc's
    * distinct 3-token shingles that occur in ≥ minDocs documents
    * corpus-wide. Downstream policy drops or trims docs above a
    * threshold. Two keyed aggregations plus one equi-join on the shingle
    * hash — the same shuffle shape as boilerplateShingles, so it scales
    * the same way (partial aggregation before the exchange, no
    * corpus-wide state).
    */
  def dupNgramFraction(docs: DataFrame, minDocs: Long = 2L): DataFrame = {
    // two consumers of the shingle set (DF counts + per-doc join):
    // materialize once, as in minhashDupPairs
    val sh = shingles(docs).localCheckpoint(true)
    val dfreq = sh.groupBy(col("hs")).agg(count(lit(1)).as("df"))
    sh.join(dfreq, Seq("hs"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= minDocs, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_shingles"), col("n_dup"),
        (round(col("n_dup").cast("double") / col("n_shingles"), 4) + 0.0)
          .as("dup_frac"))
  }

  /** Embedding-cosine near-duplicate pairs (exact, blocked cross-join) —
    * the embedding-space dedup mode of the training-pipeline surface. The
    * scale path blocks by LSH/IVF cell first (AnnOps/ClusterOps); this
    * exact form is the oracle-checkable baseline. */
  def embeddingNearDups(vectors: DataFrame, threshold: Double): DataFrame = {
    import graft.functions.{ArrayDot, ArrayMath}
    // normalize once per row (O(n·d)), then one fused dot per pair — the
    // O(n²) stage does 64 multiply-adds and nothing else. The threshold
    // goes INTO the join condition, AFTER the cheap `a < b` conjunct:
    // written as a post-join filter it gets pushed into the
    // BroadcastNestedLoopJoin condition ahead of `a < b` and the dot then
    // evaluates for all n² ordered pairs instead of half (seen in the
    // round-3 plan — PlanSpec guards the conjunct order now).
    // materialized once — inline, the O(n) normalize would recompute per
    // PAIR inside the O(n²) join. The pre-pass itself is the fused
    // ArrayUnitNorm projection directly over the parquet scan, which is
    // exactly the columnar kernel's UnitCol shape: on a vectorized scan
    // GraftDotKernelRule replaces this projection with the batch kernel
    // (colkernel.batches > 0 during this query — ColumnarSeamSpec pins it),
    // the production attach point VERDICT r12 item 3 asked for.
    val unit = vectors.select(col("id"),
      graft.functions.ArrayUnitNorm.unit(col("vec")).as("uv"))
      .localCheckpoint(true)
    val a = unit.select(col("id").as("a"), col("uv").as("ua"))
    val b = unit.select(col("id").as("b"), col("uv").as("ub"))
    a.join(b, col("a") < col("b") &&
        ArrayDot.dot(col("ua"), col("ub")) >= threshold)
      .select(col("a"), col("b"),
        round(ArrayDot.dot(col("ua"), col("ub")), 4).as("cos"))
  }

  /** LSH-bucketed embedding near-dup — the 100 TB path for
    * embeddingNearDups: random-hyperplane sign buckets (nTables
    * independent tables) generate candidate pairs as an equi-join on
    * (table, bucket); only candidates pay the exact cosine. Same
    * hyperplane/bucket machinery as AnnOps.lshTopK, same verification
    * metric as the exact baseline — recall is the nTables knob. */
  def embeddingNearDupsLsh(vectors: DataFrame, threshold: Double,
      nPlanes: Int = 4, d: Int = 64, seed: Long = 11, nTables: Int = 4): DataFrame = {
    import graft.functions.{ArrayDot, ArrayMath}
    val tables = array((0 until nTables).map { t =>
      struct(lit(t).as("tbl"),
        AnnOps.lshBucket(col("vec"), nPlanes, d, seed + t * 1000L).as("bucket"))
    }: _*)
    // buckets from the RAW vector (normalization can flip a near-zero
    // hyperplane dot's sign); unit vectors materialized once so the score
    // joins consume plain rows and the ArrayDot filter stays codegen'd
    val unit = vectors.select(col("id"),
        graft.functions.ArrayUnitNorm.unit(col("vec")).as("uv"))
      .localCheckpoint(true)
    val bucketed = vectors.select(col("id"), explode(tables).as("tb"))
      .select(col("id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    // candidate generation carries ONLY ids through the bucket join and
    // the (a,b) dedup — the d-lane unit vectors re-attach afterwards by
    // id-keyed joins (AQE broadcasts the uv side when it is small; at
    // corpus scale it is a hash join keyed by id, and candidates ≪ n²).
    // Carrying uv through the dedup shuffle made this path SLOWER than
    // the exact baseline at bench scale.
    val a = bucketed.select(col("tbl"), col("bucket"), col("id").as("a"))
    val b = bucketed.select(col("tbl"), col("bucket"), col("id").as("b"))
    val cand = a.join(b, Seq("tbl", "bucket")).where(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    cand
      .join(unit.select(col("id").as("a"), col("uv").as("ua")), Seq("a"))
      .join(unit.select(col("id").as("b"), col("uv").as("ub")), Seq("b"))
      .where(ArrayDot.dot(col("ua"), col("ub")) >= threshold)
      .select(col("a"), col("b"),
        round(ArrayDot.dot(col("ua"), col("ub")), 4).as("cos"))
  }

  /** Near-dup cluster collapse — the op a dedup pipeline actually ends
    * with: dup PAIRS (from MinHash-LSH banding) → connected components →
    * one canonical survivor per cluster (min doc_id), emitting
    * (keep, n_members, n_dropped). Pairs are already bucket-bounded
    * (SCALE.md), CC is the pointer-jumping machinery with size dispatch —
    * nothing here scales beyond the dup-graph, which is ≪ corpus. */
  def dedupSurvivors(docs: DataFrame, threshold: Double): DataFrame = {
    // materialize once: connectedComponents symmetrizes its input as
    // edges ∪ swap(edges), which would evaluate the whole LSH pair
    // pipeline twice (the singleLinkage double-eval lesson)
    val pairs = minhashDupPairs(docs, threshold)
      .select(col("a").as("src"), col("b").as("dst"))
      .localCheckpoint(true)
    LabelOps.connectedComponents(pairs)
      .groupBy(col("comp"))
      .agg(min(col("node")).as("keep"), count(lit(1)).as("n_members"))
      .select(col("keep"), col("n_members"),
        (col("n_members") - 1).as("n_dropped"))
  }

  /** 16-bit SimHash over token counts: bit j set iff
    * Σ_tokens tf·(±1 per bit j of h32(token)) > 0. Exact integer sums —
    * order-independent, reproducible anywhere. */
  def simhash(docs: DataFrame): DataFrame = {
    val td = TextOps.termDoc(docs)
      .select(col("doc_id"), col("tf").cast("long").as("tf"), h32(col("term")).as("ht"))
    val bitSums = (0 until 16).map { j =>
      sum(when(shiftright(col("ht"), j) % 2 === 1, col("tf")).otherwise(-col("tf"))).as(s"s_$j")
    }
    td.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 16).map(j => when(col(s"s_$j") > 0, 1L << j).otherwise(0L)).reduce(_ + _).as("sim"))
  }

  /** Eval-set contamination check (the decontamination pass an LLM data
    * pipeline runs before training): training docs (doc_id ≥ evalMax)
    * that share ≥1 token-shingle with the held-out eval set
    * (doc_id < evalMax). One equi-join on the shingle hash — the eval
    * side is small by construction, so it broadcasts; at 100 TB the train
    * side streams through map-side hash probes with no shuffle of the
    * corpus. Emits per contaminated doc the distinct shared shingles and
    * distinct eval docs hit.
    */
  def contamination(docs: DataFrame, evalMax: Int): DataFrame = {
    val sh = shingles(docs)
    val ev = sh.where(col("doc_id") < evalMax)
      .select(col("hs"), col("doc_id").as("eval_id"))
    sh.where(col("doc_id") >= evalMax)
      .join(broadcast(ev), Seq("hs"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("hs")).as("n_shared"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
  }

  /** Sorted-neighborhood dedup (Hernández & Stolfo 1995) — the classic
    * BLOCKING alternative to LSH banding: sort the corpus by a content
    * sort key (here the first 4 tokens of the sorted distinct-token
    * set — near-dups share their token multiset, hence the key), then
    * compare each record only with its `window` successors in sort
    * order, exact-Jaccard confirming at `threshold`. Candidates are
    * n·window instead of n², and the sort is the one range exchange —
    * the method of choice when a natural sort key clusters duplicates
    * (timestamps, normalized titles). Returns (a, b, jac), a < b by
    * sort position. */
  def sortedNeighborhoodPairs(docs: DataFrame, window: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    // NOTE (r15, tried and REVERTED): checkpointing one shared tokenize
    // pass for the sort key + shingle verify measured SLOWER at sf0.1
    // (2.90 → 3.19 s) — serializing the full token arrays costs more
    // than the second regex pass they replace. The two consumers keep
    // independent fused tokenize projections.
    val toks = TextOps.tokenize(docs)
      .select(col("doc_id"), array_join(
        slice(array_sort(array_distinct(col("tokens"))), 1, 4), " ").as("skey"))
    // distributed global rank (TeraSort shape) — a bare ORDER-only
    // window would single-partition the corpus
    val ranked = RankUtils.globalRowNumber(toks,
      Seq(col("skey"), col("doc_id"))).localCheckpoint(true)
    // the successor window is ENUMERABLE (offsets 1..w), so candidates
    // are an EQUI-join on rank — a raw rn-range predicate plans as a
    // BroadcastNestedLoopJoin, which is all-pairs at corpus scale
    // (caught in the Explain audit; PlanSpec guards it now)
    val cand = ranked
      .select(col("doc_id").as("a"), col("rn"),
        explode(sequence(lit(1), lit(window))).as("off"))
      .select(col("a"), (col("rn") + col("off")).as("rn"))
      .join(ranked.select(col("doc_id").as("b"), col("rn")), Seq("rn"))
      .select(col("a"), col("b"))
    val sh = shingles(docs).localCheckpoint(true)
    jaccardOf(cand, sh).where(col("jac") >= threshold)
  }

  /** FUZZY decontamination — the near-dup upgrade of [[contamination]]:
    * exact shingle-sharing misses paraphrased or partially-overlapping
    * benchmark leakage, so candidate (train, eval) pairs come from shared
    * MinHash-LSH band buckets (the [[minhashDupPairs]] machinery joined
    * ACROSS the split instead of within the corpus) and are confirmed by
    * exact Jaccard ≥ `threshold`. The band join is keyed by (band, sig)
    * with only the eval side's buckets relevant — eval is tiny next to
    * train, so at 100 TB this is a broadcast-shaped equi-join, never a
    * train×train pair blowup. Returns (doc_id, eval_id, jac): every
    * train doc caught, with which eval doc and how much overlap. */
  def fuzzyContamination(docs: DataFrame, evalMax: Int,
      threshold: Double = 0.5): DataFrame = {
    val sh = shingles(docs).localCheckpoint(true)
    val bands = lshBands(minhash(sh))
    val ev = bands.where(col("doc_id") < evalMax)
      .select(col("doc_id").as("eval_id"), col("band"), col("sig"))
    val cand = bands.where(col("doc_id") >= evalMax).as("x")
      .join(broadcast(ev), Seq("band", "sig"))
      .select(col("x.doc_id").as("a"), col("eval_id").as("b")).distinct()
    jaccardOf(cand, sh).where(col("jac") >= threshold)
      .select(col("a").as("doc_id"), col("b").as("eval_id"), col("jac"))
  }

  // Bloom filter geometry: m = 2^16 bits packed 32-per-BIGINT-word (2048
  // words — bit 63 stays clear so neither engine's checked shift/sign
  // semantics bite); kHash affine probes p_j(hs) = (hs·(2j+1) + 12345j+7)
  // mod m — the same affine family the MinHash permutations use,
  // reproducible in SQL.
  val BloomBits: Int = 1 << 16
  private def bloomPos(j: Int): Column =
    pmod(col("hs") * (2L * j + 1L) + (12345L * j + 7L), lit(BloomBits.toLong))

  /** Build a Bloom filter over the reference corpus's shingle hashes
    * (doc_id < refMax): one bit_or aggregate keyed by word index →
    * ≤1024 rows. This is the scale-path membership structure for
    * streaming dedup: the built filter is a broadcastable few-KB table
    * no matter how large the reference corpus is. */
  def bloomBits(docs: DataFrame, refMax: Int, kHash: Int = 3): DataFrame =
    bloomBitsFrom(shingles(docs), refMax, kHash)

  private def bloomBitsFrom(sh: DataFrame, refMax: Int, kHash: Int): DataFrame = {
    val ref = sh.where(col("doc_id") < refMax).select(col("hs")).distinct()
    val pos = ref.select(explode(array((0 until kHash).map(bloomPos): _*)).as("p"))
    pos.select((col("p") / 32).cast("long").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").as("m"))
      .groupBy(col("word")).agg(expr("bit_or(m)").as("mask"))
  }

  /** Probe the Bloom filter with the post-refMax docs: a shingle is
    * "seen" iff all kHash probed bits are set; per doc emit shingle
    * count, seen count, and the seen fraction (≈ overlap with the
    * reference corpus; no false negatives, bounded false positives).
    * The filter side is a broadcast join — the probe side never
    * shuffles. */
  def bloomProbe(docs: DataFrame, refMax: Int, kHash: Int = 3): DataFrame = {
    // one tokenize+shingle pass feeds both the filter build (< refMax)
    // and the probe side (>= refMax)
    val sh = shingles(docs).localCheckpoint(true)
    val bits = bloomBitsFrom(sh, refMax, kHash)
    val probes = sh.where(col("doc_id") >= refMax)
      .select(col("doc_id"), col("hs"),
        posexplode(array((0 until kHash).map(bloomPos): _*)).as(Seq("j", "p")))
      .select(col("doc_id"), col("hs"),
        (col("p") / 32).cast("long").as("word"), (col("p") % 32).cast("int").as("bit"))
    // left join: a probe whose word no ref shingle ever touched is simply
    // an unset bit — the shingle must still count in n_shingles
    val hit = probes.join(broadcast(bits), Seq("word"), "left")
      .select(col("doc_id"), col("hs"),
        expr("shiftright(coalesce(mask, CAST(0 AS BIGINT)), bit) & CAST(1 AS BIGINT)").as("b"))
      .groupBy(col("doc_id"), col("hs"))
      .agg((sum(col("b")) === kHash).cast("int").as("seen"))
    hit.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"), sum(col("seen")).as("n_seen"),
        (round(sum(col("seen")).cast("double") / count(lit(1)), 4) + 0.0)
          .as("seen_frac"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC dedup =
    * cluster the embedding space, then remove near-duplicates WITHIN each
    * cluster only. The within-cluster equi-join is the entire scale
    * story: candidate pairs drop from n² to Σ_c |c|² and every cluster
    * block is independent — at 100 TB the pair stage is an equi-join on
    * the cluster key (one shuffle), not an all-pairs product. Takes an
    * already-clustered table (id, vec, cluster) so the clustering is
    * pluggable (k-means here, LSH buckets or IVF cells at larger scale —
    * same seam as [[graft.operators.DistanceOps.dbscanFromPairs]]).
    *
    * Survivor policy — the id-dominance rule: a row is removed iff SOME
    * smaller-id row in its cluster has cosine ≥ threshold with it.
    * Order-independent (no sequential greedy scan), deterministic, and
    * one aggregate over the pair join; differs from per-clique
    * keep-exactly-one when the ≥τ graph is a chain (both ends of an
    * a—b—c chain survive under cliques, only `a` under dominance) —
    * dominance is the parallel-safe choice and is documented as such.
    * Returns every input row flagged: (id, cluster, keep). */
  def semanticDedup(clustered: DataFrame, threshold: Double): DataFrame = {
    import graft.functions.{ArrayDot, ArrayMath}
    // normalize once, checkpoint: the pair stage then dots plain unit
    // rows inside codegen (same shape as embeddingNearDups)
    val unit = clustered.select(col("id"), col("cluster"),
        graft.functions.ArrayUnitNorm.unit(col("vec")).as("uv"))
      .localCheckpoint(true)
    val a = unit.select(col("cluster"), col("id").as("a"), col("uv").as("ua"))
    val b = unit.select(col("cluster"), col("id").as("b"), col("uv").as("ub"))
    val removed = a.join(b, Seq("cluster"))
      .where(col("a") < col("b") &&
        ArrayDot.dot(col("ua"), col("ub")) >= threshold)
      .select(col("cluster"), col("b").as("id")).distinct()
    unit.join(removed.withColumn("rm", lit(1)), Seq("cluster", "id"), "left")
      .select(col("id"), col("cluster"), col("rm").isNull.as("keep"))
  }

  /** SPAN-level dedup: repeated-k-gram coverage per document — the
    * substring counterpart of the doc-level MinHash family (Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better":
    * training corpora repeat SPANS — boilerplate, licenses, templates —
    * that doc-level dedup never sees). A k-gram of tokens occurring in
    * MORE THAN ONE document marks its k token positions in every
    * occurrence; the per-doc report is (n_tokens, dup_tokens, dup_frac)
    * — the removal targets a span-dedup pass would cut.
    *
    * Scale shape: one row per token position (the gram table), a
    * cross-doc frequency aggregate keyed on the gram hash, an equi-join
    * back, and a k× explode of DUPLICATED positions only before the
    * distinct-coverage count — equi-joins and aggregates throughout,
    * no all-pairs stage, map-side partial aggregation everywhere. */
  def spanDedup(docs: DataFrame, k: Int = 8): DataFrame = {
    val toks = graft.operators.TextOps.tokenize(docs)
      .select(col("doc_id"), col("tokens"), size(col("tokens")).as("n_tokens"))
      .localCheckpoint(true)
    // one gram per start position; sequence(0, n-k) only when n >= k
    // (Spark's sequence DESCENDS when the bound is below the start)
    val grams = toks
      .select(col("doc_id"), col("tokens"),
        explode(when(col("n_tokens") >= k,
            sequence(lit(0), col("n_tokens") - k))
          .otherwise(array().cast("array<int>"))).as("pos"))
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ", slice(col("tokens"), col("pos") + 1, lit(k)))).as("g"))
    val dup = grams.groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("nd")).where(col("nd") > 1)
      .select(col("g"))
    val covered = grams.join(dup, Seq("g"))
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (k - 1))).as("cp"))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("dup_tokens"))
    toks.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        when(col("n_tokens") === 0, lit(0.0)).otherwise(
          round(coalesce(col("dup_tokens"), lit(0L)) / col("n_tokens"), 6) + 0.0)
          .as("dup_frac"))
  }
}
