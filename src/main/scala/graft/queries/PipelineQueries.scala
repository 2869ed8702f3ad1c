package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators._

/** Training-data-pipeline queries: dedup, ANN, multimodal plumbing,
  * streaming batch-twins. Oracle parity notes:
  *  - all random projections / signatures derive from the md5-prefix hash;
  *  - dot products and norms use strict left folds on BOTH engines so
  *    ranking comparisons (top-k, sign buckets) are bit-identical.
  */
object PipelineQueries extends QueryGroup {

  // ---- shared DuckDB fragments ----

  private val shCte =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                             t -> t <> '') AS tokens
      |  FROM documents),
      |sh0 AS (
      |  SELECT DISTINCT doc_id, tokens[i+1] || ' ' || tokens[i+2] || ' ' || tokens[i+3] AS s
      |  FROM toks, unnest(range(len(tokens) - 2)) AS t(i)
      |  WHERE len(tokens) >= 3),
      |sh AS (SELECT doc_id, CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) AS hs FROM sh0)""".stripMargin

  /** Strict left-fold dot product of two double lists (matches Spark's
    * `aggregate` lane order exactly). */
  private def foldDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip($a, $b), p -> p[1] * p[2])), (s, x) -> s + x)"
  private def foldSq(a: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform($a, x -> x * x)), (s, x) -> s + x)"
  /** Strict-fold squared L2 between two lists (PQ ADC lane math). */
  private def pqL2sq(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip($a, $b), p -> (p[1] - p[2]) * (p[1] - p[2]))), (s, x) -> s + x)"

  private val vCte =
    """v AS (SELECT vec_id AS id,
      |  list_transform(embedding, f -> CAST(f AS DOUBLE)) AS vec FROM embeddings)""".stripMargin

  private def cosExpr(va: String, vb: String): String =
    s"CASE WHEN sqrt(${foldSq(va)}) * sqrt(${foldSq(vb)}) <> 0.0 THEN " +
      s"${foldDot(va, vb)} / (sqrt(${foldSq(va)}) * sqrt(${foldSq(vb)})) ELSE 0.0 END"

  /** Hyperplane lane j of plane h under table seed (matches
    * AnnOps.hyperplane with seed 11 + 1000·table). */
  private def hpLane(h: Int, seed: Long): String =
    s"((CAST(('0x' || substr(md5(concat_ws(':', $h, j, $seed, 'hp')), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0 - 0.5)"

  private def bucketExpr(seed: Long): String =
    (0 until 4).map { h =>
      s"""(CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |  [vec[j+1] * ${hpLane(h, seed)} FOR j IN range(64)]), (s, x) -> s + x) >= 0.0
         | THEN ${1 << h} ELSE 0 END)""".stripMargin
    }.mkString(" + ")

  private val bucketCte = {
    val cols = (0 until 4).map(t => s"${bucketExpr(11L + t * 1000L)} AS b$t").mkString(", ")
    s"b AS (SELECT id, vec, $cols FROM v)"
  }

  private val anyBucketMatch =
    (0 until 4).map(t => s"q.b$t = c.b$t").mkString(" OR ")

  // ---- queries ----

  val q: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_dedup_exact" -> ((s, d) => DedupOps.exactDedupStats(Tables.documents(s, d))),
    "pipe_minhash_lsh" -> ((s, d) => DedupOps.minhashDupPairs(Tables.documents(s, d), 0.5)),
    "pipe_simhash" -> ((s, d) => DedupOps.simhash(Tables.documents(s, d))),
    "pipe_ngram_jaccard" -> ((s, d) =>
      DedupOps.ngramJaccard(Tables.documents(s, d).where(col("doc_id") < 300), 0.8)),
    "pipe_span_dedup" -> ((s, d) => DedupOps.spanDedup(Tables.documents(s, d), 8)),
    "pipe_ann_brute" -> ((s, d) => AnnOps.bruteForceTopK(Tables.vectors(s, d), 5, 10)),
    "pipe_ann_lsh" -> ((s, d) => AnnOps.lshTopK(Tables.vectors(s, d), 5, 5)),
    "pipe_ann_recall" -> ((s, d) => AnnOps.recallVsExact(Tables.vectors(s, d), 5, 10)),
    // matryoshka eval: top-10 by the 32-lane prefix vs the full 64 lanes
    "pipe_matryoshka_recall" -> ((s, d) =>
      AnnOps.matryoshkaRecall(Tables.vectors(s, d), 5, 10, 32)),
    // greedy farthest-point coreset (Gonzalez 2-approx); oracle unrolls
    // the same rounds with the identical left-fold distances
    "pipe_kcenter_select" -> ((s, d) =>
      ClusterOps.kCenterSelect(Tables.vectors(s, d), 5)),
    // REAL image decode: documents packed as actual 24-bit BMP containers
    // (pixels = doc bytes cycled), then genuinely parsed back — header
    // offsets, stride padding, BGR swap. The oracle replays the
    // CONSTRUCTION arithmetic; the parse must recover it exactly, and
    // pixel_md5 pins the full recovered buffer byte-for-byte.
    "pipe_mm_decode" -> ((s, d) =>
      MultimodalOps.decodeImage(MultimodalOps.packImage(Tables.documents(s, d)))
        .toDF().drop("pixels")),
    // REAL PNG decode: same pixel arithmetic packed into an ImageIO-written
    // zlib-compressed PNG, sniffed + inflated back by the format-dispatching
    // decoder. PNG is lossless so pixel_md5 replays identically to the BMP
    // oracle; the container length is compression-dependent (not SQL-
    // replayable), so n_bytes is dropped here.
    "pipe_mm_png_decode" -> ((s, d) =>
      MultimodalOps.decodeImage(MultimodalOps.packPng(Tables.documents(s, d)))
        .toDF().drop("pixels").drop("n_bytes")),
    // REAL JPEG decode (the dominant crawl format): ImageIO encode →
    // sniff-dispatch → ImageIO decode. JPEG is lossy, so the oracle pins
    // the exactly-replayable structure (dimensions, channels); pixel
    // fidelity is spec-bounded (MediaCodecSpec), not oracle-hashed
    "pipe_mm_jpeg_decode" -> ((s, d) =>
      MultimodalOps.decodeImage(MultimodalOps.packJpeg(Tables.documents(s, d)))
        .toDF().select(col("doc_id"), col("width"), col("height"), col("channels"))),
    // 8-bit PALETTED BMP decode: grayscale-identity palette, index p =
    // doc byte (p mod len) ⇒ recovered RGB = each cycled byte tripled —
    // the palette walk (pixel offset past the color table, 1-byte stride
    // pad) proven against a byte-level SQL replay
    "pipe_mm_bmp8_decode" -> ((s, d) =>
      MultimodalOps.decodeImage(MultimodalOps.packBmp8(Tables.documents(s, d)))
        .toDF().drop("pixels")),
    // REAL audio decode: RIFF/WAVE 16-bit PCM encode → chunk-walk parse;
    // format descriptor + duration + amplitude stats over decoded samples
    "pipe_mm_wav_decode" -> ((s, d) =>
      MultimodalOps.decodeAudio(MultimodalOps.packAudio(Tables.documents(s, d)))
        .toDF().drop("pcm_bytes")
        .withColumn("amp_mean", round(col("amp_mean"), 4) + 0.0)),
    "pipe_mm_frames" -> ((s, d) =>
      MultimodalOps.frameSample(Tables.documents(s, d).where(col("doc_id") < 200))),
    // perceptual-hash near-dup over the multimodal path: stub decode →
    // 64 pHash lanes → median-threshold bits → band-bucketed Hamming join.
    // 25 planted payload copies (re-keyed +1000000) guarantee true pairs
    // at every SF — without them the sf0.01 corpus has zero byte dupes
    // and the check would be vacuous.
    "pipe_mm_phash_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"), col("source"))
      val planted = docs.where(col("doc_id") < 25)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"), col("source"))
      MultimodalOps.phashNearDups(docs.unionByName(planted), 6)
    }),
    // frame-level dedup (video near-dup): frames shared across docs;
    // 25 planted copies guarantee collisions at every SF
    "pipe_mm_frame_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val planted = docs.where(col("doc_id") < 25)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      MultimodalOps.frameDups(docs.unionByName(planted))
    }),
    // audio-lane dedup: HOP-SHIFTED copies planted (100 junk chars
    // prepended = exactly one hop), which contiguous frames cannot catch
    // but overlapping windows must (PipelineSpec pins the contrast)
    "pipe_mm_audio_dup" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val planted = docs.where(col("doc_id") < 25)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("z" * 100), col("text")).as("text"))
      MultimodalOps.audioDups(docs.unionByName(planted))
    }),
    // multimodal packing: text tokens + ViT-patch tokens (from the REAL
    // decoded dims) packed per source shard into 1024-token windows
    "pipe_mm_packing" -> ((s, d) =>
      MultimodalOps.multimodalPacking(Tables.documents(s, d))),
    // audio frame features (energy / mean-crossing / peak) over decoded
    // PCM — integer-exact, so the byte-level SQL replay pins every value
    "pipe_mm_audio_features" -> ((s, d) =>
      MultimodalOps.audioFeatures(Tables.documents(s, d)).toDF()),
    // per-channel pixel stats over the decoded RGB buffer
    "pipe_mm_channel_stats" -> ((s, d) =>
      MultimodalOps.channelStats(Tables.documents(s, d))),
    // CROSS-MODAL consensus dedup: the text lane (MinHash-LSH Jaccard)
    // and the image lane (pHash Hamming over genuinely decoded pixels)
    // full-outer-joined per pair — the multimodal-curation signal join.
    // Planted classes make both agreement shapes non-vacuous: 10 exact
    // copies fire BOTH lanes (jac 1.0, hamming 0); 10 junk-token-appended
    // copies keep shingle Jaccard high but change the byte length, hence
    // the image dims and the whole pixel stream — text lane only.
    "pipe_mm_consensus" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val copies = base.where(col("doc_id") < 10)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      val appended = base.where(col("doc_id") >= 10 && col("doc_id") < 20)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" qz" * 40)).as("text"))
      val docs = base.unionByName(copies).unionByName(appended)
      val txt = DedupOps.minhashDupPairs(docs, 0.5)
        .select(col("a"), col("b"), col("jac"))
      val img = MultimodalOps.phashNearDups(docs)
        .select(col("a"), col("b"), col("hamming"))
      txt.join(img, Seq("a", "b"), "full_outer")
        .select(col("a"), col("b"),
          col("jac").isNotNull.as("text_dup"),
          col("hamming").isNotNull.as("image_dup"),
          coalesce(col("jac"), lit(-1.0)).as("jac"),
          coalesce(col("hamming"), lit(-1L)).as("hamming"))
    }),
    // audio ALIGNMENT: offset estimation over the shared-fingerprint lag
    // histogram (the post-match step of a Shazam-family fingerprinter);
    // the planted one-hop-shifted copies must align at lag = -100 samples
    "pipe_mm_audio_align" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val planted = docs.where(col("doc_id") < 25)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(lit("z" * 100), col("text")).as("text"))
      MultimodalOps.audioAlign(docs.unionByName(planted))
    }),
    // image augmentation over REAL decoded pixels: hflip / rot180 /
    // center-crop as exact buffer permutations, md5-pinned — the oracle
    // replays the index arithmetic byte-for-byte
    "pipe_mm_augment" -> ((s, d) =>
      MultimodalOps.imageAugment(Tables.documents(s, d))),
    // REAL decode → resize → features: BMP parse, then area-pool the
    // decoded 3-channel luma onto a 4×2 grid (bin mean = exact integer
    // sum / count, so the pixel-level SQL replay is bit-identical)
    "pipe_mm_features" -> ((s, d) =>
      MultimodalOps.imageFeatures(MultimodalOps.packImage(Tables.documents(s, d)), 4, 2)
        .toDF()
        .select(col("doc_id"), col("resized_w"), col("resized_h"),
          posexplode(col("feat")).as(Seq("pos", "v")))
        .select(col("doc_id"), col("resized_w"), col("resized_h"), col("pos"),
          (round(col("v"), 6) + 0.0).as("v"))),
    "pipe_stream_tumbling" -> ((s, d) => StreamingOps.tumblingCounts(Tables.events(s, d))),
    "pipe_stream_sliding" -> ((s, d) => StreamingOps.slidingCounts(Tables.events(s, d))),
    // session bounds emitted as epoch-micros BIGINTs: the raw parquet ts is
    // TIMESTAMP(NANOS) which Spark truncates to micros on read while the
    // oracle sees full nanos — integer micros are the shared convention.
    "pipe_stream_session" -> ((s, d) =>
      StreamingOps.sessionize(Tables.events(s, d))
        .withColumn("sess_start", unix_micros(col("sess_start")))
        .withColumn("sess_end", unix_micros(col("sess_end")))),
    "pipe_stream_session_fn" -> ((s, d) =>
      StreamingOps.sessionWindowCounts(Tables.events(s, d))),
    // windowed PSI drift monitor (batch twin of the streaming form):
    // reference shares = the global smoothed distribution, computed in a
    // bounded B-row collect and baked in as literals — exactly how a
    // production monitor ships its offline reference to the stream
    "pipe_stream_psi" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val b = least(lit(9L), greatest(lit(0L),
        floor(col("value") / 50.0).cast("long")))
      val cnt = ev.select(b.as("bin")).groupBy(col("bin")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val n = cnt.values.sum
      val ref = (0 until 10).map(i => (cnt.getOrElse(i.toLong, 0L) + 1.0) / (n + 10))
      StreamingOps.windowedPsi(ev, ref, 0.0, 50.0, "6 hours")
    }),
    // windowed count-min sketch (batch twin of the streaming grid) +
    // point query: per (window, user) the min-over-depth estimate vs the
    // exact count — CMS overestimates, never under
    "pipe_stream_cms" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val grid = StreamingOps.windowedCms(ev, col("user_id"), 4, 256, "6 hours")
      val exact = ev.groupBy(window(col("ts"), "6 hours").as("w"), col("user_id"))
        .agg(count(lit(1)).as("exact"))
        .select(col("w.start").as("wstart"), col("user_id"), col("exact"))
      val est = (0 until 4).foldLeft(exact) { (acc, dd) =>
        val g = grid.where(col("d") === dd)
          .select(col("wstart").as(s"w$dd"), col("b").as(s"b$dd"),
            col("cnt").as(s"c$dd"))
        acc.join(g, col("wstart") === col(s"w$dd") &&
            pmod(graft.operators.TextOps.h32(concat_ws(":", lit(dd),
              col("user_id").cast("string"))), lit(256)) === col(s"b$dd"))
          .drop(s"w$dd", s"b$dd")
      }
      est.select(col("wstart"), col("user_id"), col("exact"),
        least((0 until 4).map(dd => col(s"c$dd")): _*).as("est"))
    }),
    "pipe_embed_neardup" -> ((s, d) =>
      DedupOps.embeddingNearDups(Tables.vectors(s, d), 0.45)),
    "pipe_embed_neardup_lsh" -> ((s, d) =>
      DedupOps.embeddingNearDupsLsh(Tables.vectors(s, d), 0.45)),
    "pipe_boilerplate" -> ((s, d) =>
      DedupOps.boilerplateShingles(Tables.documents(s, d), 3L)),
    "pipe_dedup_survivors" -> ((s, d) =>
      DedupOps.dedupSurvivors(Tables.documents(s, d), 0.5)),
    // sorted-neighborhood blocking: sort by the token-set prefix key,
    // compare each doc with its 3 successors, Jaccard confirm
    "pipe_dedup_snm" -> ((s, d) =>
      DedupOps.sortedNeighborhoodPairs(Tables.documents(s, d), 3, 0.5)),
    // greedy quality-budget selection: best docs (distinct-token score)
    // until 20k whitespace tokens
    "pipe_budget_select" -> ((s, d) =>
      TextOps.budgetSelect(Tables.documents(s, d), 20000L)),
    "pipe_dup_ngram_fraction" -> ((s, d) =>
      DedupOps.dupNgramFraction(Tables.documents(s, d), 2L)),
    "pipe_repetition" -> ((s, d) =>
      TextOps.repetition(Tables.documents(s, d))),
    "pipe_quality_gate" -> ((s, d) =>
      TextOps.qualityGate(Tables.documents(s, d))),
    "pipe_contamination" -> ((s, d) =>
      DedupOps.contamination(Tables.documents(s, d), 50)),
    // near-dup decontamination: MinHash bands joined ACROSS the split,
    // exact-Jaccard confirm — catches paraphrased leakage the exact
    // shingle-share gate understates
    "pipe_contamination_fuzzy" -> ((s, d) =>
      DedupOps.fuzzyContamination(Tables.documents(s, d), 50, 0.5)),
    // batch twin of the STREAM-STATIC decontamination gate (the exact same
    // function runs under readStream in StreamingSpec): docs whose content
    // hash appears in the banned reference slice (doc_id % 17 == 0) are
    // anti-joined away; the static side broadcasts
    "pipe_stream_refgate" -> ((s, d) =>
      StreamingOps.streamingRefGate(
        Tables.documents(s, d),
        Tables.documents(s, d).where(col("doc_id") % 17 === 0))
        .select(col("doc_id"), col("source"), col("n_chars"))),
    "pipe_bloom_dedup" -> ((s, d) =>
      DedupOps.bloomProbe(Tables.documents(s, d), 400)),
    // batch twin of the STREAM-STREAM interval join (same function under
    // two MemoryStreams in StreamingSpec): click->purchase attribution
    // pairs, both sides watermark-bounded when streaming
    "pipe_stream_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      StreamingOps.streamingAttribution(
        ev.where(col("event_type") === "click"),
        ev.where(col("event_type") === "purchase"))
    }),
    // batch twin of the STREAMING quantile sketch (same function runs
    // under MemoryStream in StreamingSpec): HDR bucket counts over
    // event value cents — bounded mergeable state
    "pipe_stream_qsketch" -> ((s, d) => {
      import s.implicits._
      StreamingOps.streamingQuantileSketch(
        Tables.events(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value")).as[StreamingOps.Ev])
    }),
    "pipe_mixture_sample" -> ((s, d) =>
      TextOps.mixtureSample(Tables.documents(s, d))),
    "pipe_seq_packing" -> ((s, d) =>
      TextOps.seqPacking(Tables.documents(s, d))),
    "pipe_unigram_logprob" -> ((s, d) =>
      TextOps.unigramLogprob(Tables.documents(s, d))),
    "pipe_dsir_select" -> ((s, d) =>
      TextOps.dsirSelect(Tables.documents(s, d))),
    "pipe_bigram_nll" -> ((s, d) =>
      TextOps.bigramNll(Tables.documents(s, d))),
    // CCNet perplexity tertiles: rank docs by bigram NLL, split by exact
    // count quantile (rank formula, not a float threshold)
    "pipe_ppl_buckets" -> ((s, d) =>
      TextOps.pplBuckets(Tables.documents(s, d))),
    "pipe_bpe_pairs" -> ((s, d) =>
      TextOps.bpePairStats(Tables.documents(s, d))),
    "pipe_bpe_merges" -> ((s, d) =>
      TextOps.bpeTrainMerges(Tables.documents(s, d), 3)),
    "pipe_bpe_encode" -> ((s, d) =>
      TextOps.bpeEncode(Tables.documents(s, d), 3)),
    "pipe_curation_e2e" -> ((s, d) =>
      TextOps.curationReport(Tables.documents(s, d))),
    "pipe_quantization" -> ((s, d) =>
      AnnOps.quantizationError(Tables.vectors(s, d))),
    // Lloyd's on a well-separated make_blobs fixture: seeds (first k rows)
    // land one per generative blob, so the converged assignment IS the
    // generative label and centroids are per-blob means — inertia and
    // per-cluster counts become closed form in SQL (the blobs draws are
    // md5-hash, replicable by the oracle). Real-data k-means stays in
    // PipelineSpec (determinism + inertia-improves properties).
    "pipe_kmeans" -> ((s, d) => {
      val blobs = RandomOps.makeBlobs(s, 2000, 8, 5, 42).select(col("id"), col("vec")).coalesce(4).localCheckpoint(true)
      val (assigned, centroids) = ClusterOps.kmeans(blobs, 5, 5)
      val inert = ClusterOps.inertia(assigned, centroids)
      assigned.groupBy(col("cluster")).agg(count(lit(1)).as("n"))
        .withColumn("inertia", round(lit(inert), 2))
    }),
    // IVF on the separated blobs fixture: cells = generative blobs, probe
    // ranking and within-candidate cosine top-k are all SQL-expressible →
    // the whole IVF pipeline (kmeans cells → nprobe probe → candidate
    // equi-join → top-k) is hash-checked. Real-data IVF recall stays in
    // PipelineSpec.
    "pipe_ann_ivf" -> ((s, d) => {
      val blobs = RandomOps.makeBlobs(s, 2000, 8, 5, 42).select(col("id"), col("vec")).coalesce(4).localCheckpoint(true)
      ClusterOps.ivfTopK(blobs, 5, 10, nlist = 5, nprobe = 2, iters = 5)
    }),
    // PQ-ADC ANN on the separated blobs fixture: per-subspace k-means
    // codebooks converge to the per-(blob, subspace) generative means
    // (one seed per blob, separation >> noise), so codes, asymmetric
    // distances and the top-k ranking are all SQL-expressible — the whole
    // train -> encode -> ADC-search pipeline is hash-checked. Candidates
    // sharing a code tie on ADC and break by id, deterministically on
    // both engines.
    "pipe_ann_pq" -> ((s, d) => {
      val blobs = RandomOps.makeBlobs(s, 2000, 8, 5, 42).select(col("id"), col("vec")).coalesce(4).localCheckpoint(true)
      ClusterOps.pqTopK(blobs, 5, 10, d = 8, m = 2, ksub = 5, iters = 5)
    }),
    // IVF-PQ composed: nprobe=2 of 5 cells bound the candidates, ADC over
    // m=2 codebooks scores them — cells, codebooks, codes, probe ranks and
    // ADC are all closed-form on the separated fixture, so the full
    // compressed-ANN pipeline is hash-checked end-to-end.
    "pipe_ann_ivfpq" -> ((s, d) => {
      val blobs = RandomOps.makeBlobs(s, 2000, 8, 5, 42).select(col("id"), col("vec")).coalesce(4).localCheckpoint(true)
      ClusterOps.ivfPqTopK(blobs, 5, 10, d = 8, nlist = 5, nprobe = 2,
        m = 2, ksub = 5, iters = 5)
    }),
    // ADC shortlist (top-20 from codes alone) → exact-L2 re-rank to
    // top-10 — the refine step of a compressed-ANN pipeline; raw vectors
    // are only touched for the shortlist
    "pipe_ann_refine" -> ((s, d) => {
      val blobs = RandomOps.makeBlobs(s, 2000, 8, 5, 42).select(col("id"), col("vec")).coalesce(4).localCheckpoint(true)
      ClusterOps.pqRefine(blobs, 5, 10, shortlist = 20, d = 8, m = 2, ksub = 5, iters = 5)
    }),
    // kNN classification on the separated blobs: every query's 5 nearest
    // non-query points are in-blob, so the majority vote IS the
    // generative label with a unanimous 5-0 count — closed form.
    "pipe_knn_classify" -> ((s, d) => {
      val blobs = RandomOps.makeBlobs(s, 500, 8, 5, 42)
        .select(col("id"), col("vec"), col("cluster").as("label"))
        .coalesce(4).localCheckpoint(true)
      AnnOps.knnClassify(blobs, 50, 5)
    }),
    // SemDeDup on the separated blobs: k-means clusters = generative
    // blobs (closed form, as in pipe_kmeans), so the within-cluster
    // near-dup pair join and the id-dominance keep flags are all
    // SQL-replicable — the full cluster -> within-cluster-cosine ->
    // survivor pipeline is hash-checked per row (2000 keep flags).
    // τ=0.999 sits inside the same-blob cosine distribution (kept counts
    // 3–9 of 400 per cluster), so the predicate genuinely discriminates.
    "pipe_semantic_dedup" -> ((s, d) => {
      val blobs = RandomOps.makeBlobs(s, 2000, 8, 5, 42).select(col("id"), col("vec")).coalesce(4).localCheckpoint(true)
      val (assigned, _) = ClusterOps.kmeans(blobs, 5, 5)
      DedupOps.semanticDedup(assigned, 0.999)
    }),
    "pipe_kmeans_pp" -> ((s, d) => {
      // k-means|| seeding + Lloyd's on the same separated fixture: any
      // one-seed-per-blob init converges to the same generative optimum
      // (labels may permute — the (cluster,n,inertia) shape is invariant)
      val blobs = RandomOps.makeBlobs(s, 2000, 8, 5, 42).select(col("id"), col("vec")).coalesce(4).localCheckpoint(true)
      val init = ClusterOps.kmeansParallelInit(blobs, 5)
      val (assigned, centroids) = ClusterOps.kmeans(blobs, 5, 5, Some(init))
      val inert = ClusterOps.inertia(assigned, centroids)
      assigned.groupBy(col("cluster")).agg(count(lit(1)).as("n"))
        .withColumn("inertia", round(lit(inert), 2))
    }),
    "pipe_chunk_overlap" -> ((s, d) =>
      TextOps.chunkOverlap(Tables.documents(s, d).where(col("doc_id") < 1000))),
    "pipe_curriculum_bins" -> ((s, d) =>
      TextOps.curriculumBins(Tables.documents(s, d))),
    "pipe_split_stratified" -> ((s, d) =>
      TextOps.stratifiedSplit(Tables.documents(s, d))),
    // deterministic global shuffle layout: hash shard assignment, no
    // sampling pass — per-shard count/key-range/source-mix evidence
    "pipe_global_shuffle" -> ((s, d) =>
      TextOps.globalShuffle(Tables.documents(s, d))),
  )

  // ---- oracles ----

  /** Closed-form k-means oracle on the separated blobs fixture: converged
    * assignment = generative label, centroid = per-blob mean, so counts and
    * inertia are plain SQL over the md5-replicated draws. Shared by the
    * first-k-rows and k-means|| inits (labels permute; the (cluster, n,
    * inertia) row set is invariant). */
  private val kmeansBlobsOracle: String = {
    val u1 = "((CAST(('0x' || substr(md5(concat_ws(':', id, j, 42, 'b1')), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0)"
    val u2 = "((CAST(('0x' || substr(md5(concat_ws(':', id, j, 42, 'b2')), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0)"
    s"""WITH pts AS (
       |  SELECT id, id % 5 AS cluster, j AS pos,
       |    CAST(((id % 5) * 7 + j) % 5 AS DOUBLE) * 10.0 +
       |    sqrt(-2.0 * ln($u1)) * cos(2.0 * pi() * $u2) AS v
       |  FROM range(2000) t(id), range(8) s(j)),
       |mu AS (SELECT cluster, pos, avg(v) AS m FROM pts GROUP BY 1, 2),
       |e AS (SELECT p.cluster, (p.v - mu.m) * (p.v - mu.m) AS e2
       |      FROM pts p JOIN mu ON p.cluster = mu.cluster AND p.pos = mu.pos),
       |tot AS (SELECT round(sum(e2), 2) AS inertia FROM e),
       |cnt AS (SELECT cluster, count(DISTINCT id) AS n FROM pts GROUP BY 1)
       |SELECT cnt.cluster, cnt.n, tot.inertia FROM cnt, tot""".stripMargin
  }

  private val simhashSums = (0 until 16).map(j =>
    s"sum(CASE WHEN (ht >> $j) & 1 = 1 THEN tf ELSE -tf END) AS s_$j").mkString(", ")
  private val simhashBits = (0 until 16).map(j =>
    s"(CASE WHEN s_$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")

  /** Blobs fixture as DOUBLE lists (same draws as kmeansBlobsOracle). */
  private val blobsVecCte: String = {
    val u1 = "((CAST(('0x' || substr(md5(concat_ws(':', id, j, 42, 'b1')), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0)"
    val u2 = "((CAST(('0x' || substr(md5(concat_ws(':', id, j, 42, 'b2')), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0)"
    s"""bl AS (
       |  SELECT id, id % 5 AS cluster,
       |    [CAST(((id % 5) * 7 + j) % 5 AS DOUBLE) * 10.0 +
       |     sqrt(-2.0 * ln($u1)) * cos(2.0 * pi() * $u2) FOR j IN range(8)] AS vec
       |  FROM range(2000) t(id))""".stripMargin
  }

  /** 3-round BPE-training replay: vocab as (word, cnt, symbol list),
    * each round = pair counts → 1-row argmax → greedy merge rewrite
    * (string-accumulator list_reduce — see the sql-map comment). */
  /** Shared CTE chain for the BPE oracles: word vocab v0, then 3 merge
    * rounds ending in the final vocab v3 (and per-round argmaxes b1..b3). */
  private val bpeRoundsCte: String = {
    def roundCtes(r: Int): String = {
      val prev = s"v${r - 1}"
      s"""p$r AS (SELECT syms[i+1] AS p1, syms[i+2] AS p2,
         |         CAST(sum(cnt) AS BIGINT) AS c
         |       FROM $prev, unnest(range(len(syms) - 1)) t(i)
         |       WHERE len(syms) >= 2 GROUP BY 1, 2),
         |b$r AS (SELECT p1, p2, c FROM p$r ORDER BY c DESC, p1, p2 LIMIT 1),
         |v$r AS (SELECT w, cnt,
         |         string_split(list_reduce(syms, (acc, s) ->
         |           CASE WHEN (acc = b.p1 OR ends_with(acc, chr(31) || b.p1)) AND s = b.p2
         |                THEN substr(acc, 1, length(acc) - length(b.p1)) || b.p1 || b.p2
         |                ELSE acc || chr(31) || s END), chr(31)) AS syms
         |       FROM $prev CROSS JOIN b$r b)""".stripMargin
    }
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                             t -> t <> '') AS tokens
       |  FROM documents),
       |v0 AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt,
       |         [substr(w, i + 1, 1) FOR i IN range(length(w))] AS syms
       |       FROM (SELECT unnest(tokens) AS w FROM toks) GROUP BY w),
       |${(1 to 3).map(roundCtes).mkString(",\n")}""".stripMargin
  }

  private val bpeMergesOracle: String =
    s"""$bpeRoundsCte
       |SELECT 1 AS round, p1, p2, c AS freq FROM b1
       |UNION ALL SELECT 2, p1, p2, c FROM b2
       |UNION ALL SELECT 3, p1, p2, c FROM b3""".stripMargin

  /** Encode oracle: the final vocab v3 IS the trained tokenizer applied to
    * every word type; the corpus piece histogram is one unnest+aggregate. */
  private val bpeEncodeOracle: String =
    s"""$bpeRoundsCte
       |SELECT piece, n_occ, n_words, rnk FROM (
       |  SELECT s AS piece, CAST(sum(cnt) AS BIGINT) AS n_occ,
       |    count(DISTINCT w) AS n_words,
       |    row_number() OVER (ORDER BY sum(cnt) DESC, s) AS rnk
       |  FROM v3, unnest(syms) AS t(s) GROUP BY s)
       |WHERE rnk <= 50""".stripMargin

  val sql: Map[String, String] = Map(
    // PQ on blobs: codebook = per-(blob, subspace) mean; encode = nearest
    // codeword per subspace; ADC = sum over subspaces of ||q_sub - cw||².
    "pipe_ann_pq" ->
      s"""WITH $blobsVecCte,
         |lanes AS (SELECT id, cluster, generate_subscripts(vec, 1) - 1 AS pos,
         |                 unnest(vec) AS x FROM bl),
         |muL AS (SELECT cluster, pos // 4 AS sub, pos, avg(x) AS m
         |        FROM lanes GROUP BY 1, 2, 3),
         |cw AS (SELECT cluster, sub, list(m ORDER BY pos) AS cvec
         |       FROM muL GROUP BY 1, 2),
         |sv AS (SELECT id, pos // 4 AS sub, list(x ORDER BY pos) AS svec
         |       FROM lanes GROUP BY 1, 2),
         |enc AS (
         |  SELECT id, sub, code FROM (
         |    SELECT sv.id, sv.sub, cw.cluster AS code,
         |      row_number() OVER (PARTITION BY sv.id, sv.sub ORDER BY
         |        ${pqL2sq("sv.svec", "cw.cvec")}, cw.cluster) AS rk
         |    FROM sv JOIN cw ON cw.sub = sv.sub)
         |  WHERE rk = 1),
         |qsv AS (SELECT * FROM sv WHERE id < 5),
         |adc AS (
         |  SELECT qsv.id AS qid, enc.id AS nid,
         |         sum(${pqL2sq("qsv.svec", "cw.cvec")}) AS adc
         |  FROM qsv JOIN enc ON enc.sub = qsv.sub AND enc.id <> qsv.id
         |  JOIN cw ON cw.sub = enc.sub AND cw.cluster = enc.code
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT qid, nid, adc,
         |         row_number() OVER (PARTITION BY qid ORDER BY adc, nid) AS rnk
         |  FROM adc)
         |SELECT qid, nid, round(adc, 4) + 0.0 AS adc, rnk
         |FROM ranked WHERE rnk <= 10""".stripMargin,
    // same PQ chain, then refine: ADC top-20 shortlist re-ranked by exact
    // L2 against the raw blob vectors
    "pipe_ann_refine" ->
      s"""WITH $blobsVecCte,
         |lanes AS (SELECT id, cluster, generate_subscripts(vec, 1) - 1 AS pos,
         |                 unnest(vec) AS x FROM bl),
         |muL AS (SELECT cluster, pos // 4 AS sub, pos, avg(x) AS m
         |        FROM lanes GROUP BY 1, 2, 3),
         |cw AS (SELECT cluster, sub, list(m ORDER BY pos) AS cvec
         |       FROM muL GROUP BY 1, 2),
         |sv AS (SELECT id, pos // 4 AS sub, list(x ORDER BY pos) AS svec
         |       FROM lanes GROUP BY 1, 2),
         |enc AS (
         |  SELECT id, sub, code FROM (
         |    SELECT sv.id, sv.sub, cw.cluster AS code,
         |      row_number() OVER (PARTITION BY sv.id, sv.sub ORDER BY
         |        ${pqL2sq("sv.svec", "cw.cvec")}, cw.cluster) AS rk
         |    FROM sv JOIN cw ON cw.sub = sv.sub)
         |  WHERE rk = 1),
         |qsv AS (SELECT * FROM sv WHERE id < 5),
         |adc AS (
         |  SELECT qsv.id AS qid, enc.id AS nid,
         |         sum(${pqL2sq("qsv.svec", "cw.cvec")}) AS adc
         |  FROM qsv JOIN enc ON enc.sub = qsv.sub AND enc.id <> qsv.id
         |  JOIN cw ON cw.sub = enc.sub AND cw.cluster = enc.code
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT qid, nid, adc,
         |         row_number() OVER (PARTITION BY qid ORDER BY adc, nid) AS rnk
         |  FROM adc),
         |short AS (SELECT qid, nid FROM ranked WHERE rnk <= 20),
         |ex AS (
         |  SELECT s.qid, s.nid, ${pqL2sq("qa.vec", "qb.vec")} AS d2
         |  FROM short s JOIN bl qa ON qa.id = s.qid JOIN bl qb ON qb.id = s.nid),
         |rr AS (
         |  SELECT qid, nid, d2,
         |         row_number() OVER (PARTITION BY qid ORDER BY d2, nid) AS rnk
         |  FROM ex)
         |SELECT qid, nid, round(sqrt(d2), 4) + 0.0 AS dist, rnk
         |FROM rr WHERE rnk <= 10""".stripMargin,
    // IVF-PQ: coarse cells = per-blob means (probe rank by -2·q·c + ‖c‖²,
    // ties by cell id, as in pipe_ann_ivf); codebooks/codes/ADC as in
    // pipe_ann_pq; candidates restricted to the 2 probed cells.
    "pipe_ann_ivfpq" ->
      s"""WITH $blobsVecCte,
         |lanes AS (SELECT id, cluster, generate_subscripts(vec, 1) - 1 AS pos,
         |                 unnest(vec) AS x FROM bl),
         |muL AS (SELECT cluster, pos, avg(x) AS m FROM lanes GROUP BY 1, 2),
         |mu AS (SELECT cluster, list(m ORDER BY pos) AS cvec FROM muL GROUP BY 1),
         |cw AS (SELECT cluster, pos // 4 AS sub, list(m ORDER BY pos) AS cvec
         |       FROM muL GROUP BY 1, 2),
         |sv AS (SELECT id, pos // 4 AS sub, list(x ORDER BY pos) AS svec
         |       FROM lanes GROUP BY 1, 2),
         |enc AS (
         |  SELECT id, sub, code FROM (
         |    SELECT sv.id, sv.sub, cw.cluster AS code,
         |      row_number() OVER (PARTITION BY sv.id, sv.sub ORDER BY
         |        ${pqL2sq("sv.svec", "cw.cvec")}, cw.cluster) AS rk
         |    FROM sv JOIN cw ON cw.sub = sv.sub)
         |  WHERE rk = 1),
         |qc AS (
         |  SELECT q.id AS qid, mu.cluster,
         |    row_number() OVER (PARTITION BY q.id ORDER BY
         |      -2.0 * ${foldDot("q.vec", "mu.cvec")} + ${foldSq("mu.cvec")},
         |      mu.cluster) AS prnk
         |  FROM bl q, mu WHERE q.id < 5),
         |qsv AS (SELECT * FROM sv WHERE id < 5),
         |cand AS (
         |  SELECT qc.qid, c.id AS nid
         |  FROM qc JOIN bl c ON c.cluster = qc.cluster AND qc.prnk <= 2
         |  WHERE c.id <> qc.qid),
         |adc AS (
         |  SELECT cand.qid, cand.nid,
         |         sum(${pqL2sq("qsv.svec", "cw.cvec")}) AS adc
         |  FROM cand JOIN qsv ON qsv.id = cand.qid
         |  JOIN enc ON enc.id = cand.nid AND enc.sub = qsv.sub
         |  JOIN cw ON cw.sub = enc.sub AND cw.cluster = enc.code
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT qid, nid, adc,
         |         row_number() OVER (PARTITION BY qid ORDER BY adc, nid) AS rnk
         |  FROM adc)
         |SELECT qid, nid, round(adc, 4) + 0.0 AS adc, rnk
         |FROM ranked WHERE rnk <= 10""".stripMargin,
    "pipe_ann_ivf" ->
      s"""WITH $blobsVecCte,
         |lanes AS (SELECT id, cluster, generate_subscripts(vec, 1) - 1 AS pos,
         |                 unnest(vec) AS x FROM bl),
         |muL AS (SELECT cluster, pos, avg(x) AS m FROM lanes GROUP BY 1, 2),
         |mu AS (SELECT cluster, list(m ORDER BY pos) AS cvec FROM muL GROUP BY 1),
         |qc AS (
         |  SELECT q.id AS qid, mu.cluster,
         |    row_number() OVER (PARTITION BY q.id ORDER BY
         |      -2.0 * ${foldDot("q.vec", "mu.cvec")} + ${foldSq("mu.cvec")},
         |      mu.cluster) AS prnk
         |  FROM bl q, mu WHERE q.id < 5),
         |cand AS (
         |  SELECT qc.qid, c.id AS nid, q.vec AS qv, c.vec AS nv
         |  FROM qc JOIN bl c ON c.cluster = qc.cluster AND qc.prnk <= 2
         |  JOIN bl q ON q.id = qc.qid
         |  WHERE c.id <> qc.qid),
         |ranked AS (
         |  SELECT qid, nid, ${cosExpr("qv", "nv")} AS cos,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY ${cosExpr("qv", "nv")} DESC, nid) AS rnk
         |  FROM cand)
         |SELECT qid, nid, round(cos, 4) AS cos, rnk FROM ranked
         |WHERE rnk <= 10""".stripMargin,
    "pipe_dedup_exact" ->
      "SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique FROM documents",
    "pipe_kmeans" -> kmeansBlobsOracle,
    "pipe_kmeans_pp" -> kmeansBlobsOracle,
    // SemDeDup keep flags: cluster = generative blob, unit vectors and
    // strict-fold cosine exactly as the Spark side computes them,
    // dominance rule = "removed iff some smaller id in the cluster is
    // within τ"
    "pipe_semantic_dedup" ->
      s"""WITH $blobsVecCte,
         |un AS (
         |  SELECT id, cluster, CASE WHEN sqrt(${foldSq("vec")}) <> 0.0
         |    THEN list_transform(vec, x -> x / sqrt(${foldSq("vec")}))
         |    ELSE vec END AS uv
         |  FROM bl),
         |rm AS (
         |  SELECT DISTINCT b.cluster, b.id
         |  FROM un a JOIN un b ON a.cluster = b.cluster AND a.id < b.id
         |  WHERE ${foldDot("a.uv", "b.uv")} >= 0.999)
         |SELECT un.id, un.cluster, rm.id IS NULL AS keep
         |FROM un LEFT JOIN rm ON rm.cluster = un.cluster AND rm.id = un.id""".stripMargin,
    "pipe_knn_classify" ->
      """SELECT id AS qid, id % 5 AS pred, CAST(5 AS BIGINT) AS votes
        |FROM range(50) t(id)""".stripMargin,
    "pipe_dup_ngram_fraction" ->
      s"""$shCte,
         |dfq AS (SELECT hs, count(*) AS df FROM sh GROUP BY 1)
         |SELECT s.doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  round(CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |        / count(*), 4) + 0.0 AS dup_frac
         |FROM sh s JOIN dfq d USING (hs) GROUP BY 1""".stripMargin,
    "pipe_minhash_lsh" ->
      s"""$shCte,
         |mh AS (
         |  SELECT doc_id, i, min((hs * (2*i+1) + (12345*i+7)) % 2147483647) AS mh
         |  FROM sh, unnest(range(16)) AS p(i) GROUP BY 1, 2),
         |bands AS (
         |  SELECT doc_id, i // 4 AS band, string_agg(mh, ':' ORDER BY i) AS sig
         |  FROM mh GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
         |inter AS (
         |  SELECT c.a, c.b, count(*) AS inter FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
         |  WHERE sa.hs = sb.hs GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
         |SELECT i.a, i.b, round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) AS jac
         |FROM inter i JOIN sizes sa ON i.a = sa.doc_id JOIN sizes sb ON i.b = sb.doc_id
         |WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5""".stripMargin,
    // sorted-neighborhood replay: same token-prefix sort key, rank
    // window, w=3 successor candidates, shingle-Jaccard confirm
    "pipe_dedup_snm" ->
      s"""$shCte,
         |sk AS (
         |  SELECT doc_id,
         |    array_to_string(list_sort(list_distinct(tokens))[1:4], ' ') AS skey
         |  FROM toks),
         |rk AS (SELECT doc_id, row_number() OVER (ORDER BY skey, doc_id) AS rn FROM sk),
         |cand AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b
         |  FROM rk x JOIN rk y ON y.rn > x.rn AND y.rn <= x.rn + 3),
         |inter AS (
         |  SELECT c.a, c.b, count(*) AS inter FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
         |  WHERE sa.hs = sb.hs GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
         |SELECT i.a, i.b,
         |  round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) AS jac
         |FROM inter i JOIN sizes sa ON i.a = sa.doc_id JOIN sizes sb ON i.b = sb.doc_id
         |WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5""".stripMargin,
    // budget-selection replay: identical integer score/cost and rank
    "pipe_budget_select" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> t <> '') AS tokens
        |  FROM documents),
        |scored AS (
        |  SELECT t.doc_id, d.source,
        |    CAST(len(list_distinct(t.tokens)) AS BIGINT) AS score,
        |    CAST(len(list_filter(string_split_regex(d.text, '\s+'), x -> x <> ''))
        |      AS BIGINT) AS cost
        |  FROM toks t JOIN documents d ON d.doc_id = t.doc_id),
        |ranked AS (
        |  SELECT source, cost, score,
        |    sum(cost) OVER (ORDER BY score DESC, doc_id
        |                    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM scored)
        |SELECT source, count(*) AS n_docs, CAST(sum(cost) AS BIGINT) AS n_tokens,
        |  min(score) AS min_score
        |FROM ranked WHERE cum <= 20000 GROUP BY 1""".stripMargin,
    // same MinHash banding as pipe_minhash_lsh but joined ACROSS the
    // train/eval split (train >= 50, eval < 50), exact-Jaccard confirmed
    "pipe_contamination_fuzzy" ->
      s"""$shCte,
         |mh AS (
         |  SELECT doc_id, i, min((hs * (2*i+1) + (12345*i+7)) % 2147483647) AS mh
         |  FROM sh, unnest(range(16)) AS p(i) GROUP BY 1, 2),
         |bands AS (
         |  SELECT doc_id, i // 4 AS band, string_agg(mh, ':' ORDER BY i) AS sig
         |  FROM mh GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.sig = y.sig
         |  WHERE x.doc_id >= 50 AND y.doc_id < 50),
         |inter AS (
         |  SELECT c.a, c.b, count(*) AS inter FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
         |  WHERE sa.hs = sb.hs GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
         |SELECT i.a AS doc_id, i.b AS eval_id,
         |  round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) AS jac
         |FROM inter i JOIN sizes sa ON i.a = sa.doc_id JOIN sizes sb ON i.b = sb.doc_id
         |WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5""".stripMargin,
    // same banding CTE as pipe_minhash_lsh, then transitive closure by
    // recursive min-label propagation over the (small) dup-pair graph
    "pipe_dedup_survivors" ->
      s"""${shCte.replace("WITH toks", "WITH RECURSIVE toks")},
         |mh AS (
         |  SELECT doc_id, i, min((hs * (2*i+1) + (12345*i+7)) % 2147483647) AS mh
         |  FROM sh, unnest(range(16)) AS p(i) GROUP BY 1, 2),
         |bands AS (
         |  SELECT doc_id, i // 4 AS band, string_agg(mh, ':' ORDER BY i) AS sig
         |  FROM mh GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
         |inter AS (
         |  SELECT c.a, c.b, count(*) AS inter FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
         |  WHERE sa.hs = sb.hs GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |pairs AS (
         |  SELECT i.a, i.b
         |  FROM inter i JOIN sizes sa ON i.a = sa.doc_id
         |  JOIN sizes sb ON i.b = sb.doc_id
         |  WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5),
         |nodes AS (SELECT a AS n FROM pairs UNION SELECT b FROM pairs),
         |edges AS (SELECT a AS src, b AS dst FROM pairs
         |          UNION SELECT b, a FROM pairs),
         |reach AS (
         |  SELECT n AS node, n AS r FROM nodes
         |  UNION
         |  SELECT e.dst AS node, reach.r AS r
         |  FROM reach JOIN edges e ON e.src = reach.node),
         |comp AS (SELECT node, min(r) AS c FROM reach GROUP BY node)
         |SELECT min(node) AS keep, count(*) AS n_members,
         |       count(*) - 1 AS n_dropped
         |FROM comp GROUP BY c""".stripMargin,
    // inverse-sqrt domain re-balancing: keep rate min(1, 2/sqrt(n)) per
    // (lang, source); kept docs decided by the md5 counter draw
    "pipe_mixture_sample" ->
      """WITH rates AS (
        |  SELECT lang, source, count(*) AS n,
        |         least(1.0, 2.0 / sqrt(CAST(count(*) AS DOUBLE))) AS rate
        |  FROM documents GROUP BY 1, 2),
        |u AS (
        |  SELECT doc_id, lang, source,
        |    (CAST(('0x' || substr(md5(concat_ws(':', doc_id, 19, 'mix')), 1, 8))
        |      AS BIGINT) + 0.5) / 4294967296.0 AS u
        |  FROM documents)
        |SELECT u.lang, u.source, max(r.n) AS n_docs,
        |  round(max(r.rate), 6) + 0.0 AS rate,
        |  CAST(sum(CASE WHEN u.u < r.rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM u JOIN rates r ON r.lang = u.lang AND r.source = u.source
        |GROUP BY 1, 2""".stripMargin,
    // greedy per-source packing into 512-token context windows; bin =
    // window containing the doc's first token (integer-only arithmetic)
    "pipe_seq_packing" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS ws
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, ws,
        |    sum(ws) OVER (PARTITION BY source ORDER BY doc_id
        |                  ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT source, CAST((cum - ws) // 512 AS BIGINT) AS bin, count(*) AS n_docs,
        |  CAST(sum(ws) AS BIGINT) AS n_tokens
        |FROM c GROUP BY 1, 2""".stripMargin,
    // corpus-trained unigram LM NLL per doc (perplexity-proxy quality)
    "pipe_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> t <> '') AS tokens
        |  FROM documents),
        |tdc AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks)
        |  GROUP BY 1, 2),
        |cf AS (SELECT term, sum(tf) AS cf FROM tdc GROUP BY 1),
        |tot AS (SELECT sum(tf) AS tot FROM tdc)
        |SELECT doc_id,
        |  round(-sum(tf * ln(cf.cf / tot.tot)) / sum(tf), 4) + 0.0 AS nll,
        |  CAST(sum(tf) AS BIGINT) AS n_tokens
        |FROM tdc JOIN cf USING (term) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin,
    // interpolated bigram LM NLL (CCNet-style perplexity signal):
    // p(w2|w1) = 0.7 c12/c1 + 0.3 c2/T, trained on the corpus itself
    "pipe_bigram_nll" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> t <> '') AS tokens
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, tokens[i+1] AS w1, tokens[i+2] AS w2,
        |         CAST(count(*) AS DOUBLE) AS tf
        |  FROM toks, unnest(range(len(tokens) - 1)) AS t(i)
        |  WHERE len(tokens) >= 2 GROUP BY 1, 2, 3),
        |c12 AS (SELECT w1, w2, sum(tf) AS c12 FROM bi GROUP BY 1, 2),
        |uni AS (SELECT w, CAST(count(*) AS DOUBLE) AS cw FROM
        |  (SELECT unnest(tokens) AS w FROM toks) GROUP BY 1),
        |tot AS (SELECT sum(cw) AS t FROM uni)
        |SELECT doc_id,
        |  round(-sum(bi.tf * ln(0.7 * c12.c12 / u1.cw + 0.3 * u2.cw / tot.t))
        |        / sum(bi.tf), 4) + 0.0 AS nll,
        |  CAST(sum(bi.tf) AS BIGINT) AS n_bigrams
        |FROM bi JOIN c12 USING (w1, w2)
        |  JOIN uni u1 ON u1.w = bi.w1 JOIN uni u2 ON u2.w = bi.w2
        |  CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin,
    // perplexity tertiles over the same bigram NLL: exact-count rank
    // split ((rn-1)*3 // n), envelope + mean per bucket
    "pipe_ppl_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> t <> '') AS tokens
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, tokens[i+1] AS w1, tokens[i+2] AS w2,
        |         CAST(count(*) AS DOUBLE) AS tf
        |  FROM toks, unnest(range(len(tokens) - 1)) AS t(i)
        |  WHERE len(tokens) >= 2 GROUP BY 1, 2, 3),
        |c12 AS (SELECT w1, w2, sum(tf) AS c12 FROM bi GROUP BY 1, 2),
        |uni AS (SELECT w, CAST(count(*) AS DOUBLE) AS cw FROM
        |  (SELECT unnest(tokens) AS w FROM toks) GROUP BY 1),
        |tot AS (SELECT sum(cw) AS t FROM uni),
        |nll AS (SELECT doc_id,
        |  round(-sum(bi.tf * ln(0.7 * c12.c12 / u1.cw + 0.3 * u2.cw / tot.t))
        |        / sum(bi.tf), 4) + 0.0 AS nll
        |FROM bi JOIN c12 USING (w1, w2)
        |  JOIN uni u1 ON u1.w = bi.w1 JOIN uni u2 ON u2.w = bi.w2
        |  CROSS JOIN tot
        |GROUP BY doc_id),
        |rk AS (SELECT nll,
        |  row_number() OVER (ORDER BY nll, doc_id) AS rn,
        |  (SELECT count(*) FROM nll) AS n FROM nll)
        |SELECT ((rn - 1) * 3) // n AS bucket,
        |  count(*) AS n_docs,
        |  round(avg(nll), 4) + 0.0 AS avg_nll,
        |  min(nll) + 0.0 AS min_nll,
        |  max(nll) + 0.0 AS max_nll
        |FROM rk GROUP BY 1""".stripMargin,
    // DSIR importance selection (Xie et al. 2023): hashed unigram+bigram
    // bag model target-vs-raw, Laplace-smoothed log ratio summed per doc,
    // top-100 kept (ties by doc_id on the ROUNDED score)
    "pipe_dsir_select" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> t <> '') AS tokens
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(tokens) AS g FROM toks
        |  UNION ALL
        |  SELECT doc_id, tokens[i+1] || ' ' || tokens[i+2] AS g
        |  FROM toks, unnest(range(len(tokens) - 1)) AS t(i)
        |  WHERE len(tokens) >= 2),
        |f AS (SELECT doc_id,
        |        CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % 128 AS b,
        |        CAST(count(*) AS DOUBLE) AS tf
        |      FROM g GROUP BY 1, 2),
        |rawc AS (SELECT b, sum(tf) AS cr FROM f GROUP BY 1),
        |tgtc AS (SELECT b, sum(tf) AS ct
        |         FROM f JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY 1),
        |rtot AS (SELECT sum(tf) AS rtot FROM f),
        |ttot AS (SELECT sum(tf) AS ttot
        |         FROM f JOIN documents USING (doc_id) WHERE lang = 'en'),
        |s AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_feats,
        |    round(sum(tf * (ln((coalesce(ct, 0) + 1.0) / (ttot + 128)) -
        |                    ln((cr + 1.0) / (rtot + 128)))), 4) + 0.0 AS logw
        |  FROM f JOIN rawc USING (b) LEFT JOIN tgtc USING (b)
        |       CROSS JOIN rtot CROSS JOIN ttot
        |  GROUP BY doc_id),
        |k AS (SELECT doc_id, row_number() OVER (ORDER BY logw DESC, doc_id) AS r FROM s)
        |SELECT s.doc_id, s.n_feats, s.logw,
        |  CAST(CASE WHEN k.r <= 100 THEN 1 ELSE 0 END AS INT) AS keep
        |FROM s JOIN k USING (doc_id)""".stripMargin,
    // end-to-end curation: gate -> exact-dedup survivors -> token budget
    // + packing, per source — the composed pipeline as one query
    "pipe_curation_e2e" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> t <> '') AS tokens
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, len(tokens) AS n_tokens,
        |    round(CAST(list_sum(list_transform(tokens, t -> length(t))) AS DOUBLE)
        |          / len(tokens), 4) AS mean_tok_len,
        |    round(CAST(len(list_distinct(tokens)) AS DOUBLE) / len(tokens), 4)
        |      AS distinct_ratio
        |  FROM toks),
        |g AS (
        |  SELECT doc_id, len(tokens) - 1 AS total,
        |         tokens[i+1] || ' ' || tokens[i+2] AS g
        |  FROM toks, unnest(range(len(tokens) - 1)) AS t(i)
        |  WHERE len(tokens) >= 2),
        |cg AS (SELECT doc_id, total, g, count(*) AS c FROM g GROUP BY 1, 2, 3),
        |r AS (
        |  SELECT doc_id, round(1.0 - CAST(count(*) AS DOUBLE) / total, 4)
        |    AS dup_2gram_frac
        |  FROM cg GROUP BY doc_id, total),
        |k AS (
        |  SELECT d.doc_id
        |  FROM documents d
        |  JOIN q ON q.doc_id = d.doc_id
        |  JOIN r ON r.doc_id = d.doc_id
        |  WHERE q.n_tokens >= 8 AND q.n_tokens <= 2000
        |    AND q.mean_tok_len >= 2.0 AND q.mean_tok_len <= 12.0
        |    AND q.distinct_ratio >= 0.2 AND r.dup_2gram_frac <= 0.9),
        |kept AS (SELECT d.* FROM documents d JOIN k ON k.doc_id = d.doc_id),
        |surv AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
        |sdocs AS (SELECT kept.* FROM kept JOIN surv USING (doc_id)),
        |raw AS (SELECT source, count(*) AS n_raw FROM documents GROUP BY 1),
        |gated AS (SELECT source, count(*) AS n_gated FROM kept GROUP BY 1),
        |tok2 AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS ws
        |  FROM sdocs),
        |uniqc AS (SELECT source, count(*) AS n_unique,
        |                 CAST(sum(ws) AS BIGINT) AS n_tokens
        |          FROM tok2 GROUP BY 1),
        |c AS (
        |  SELECT doc_id, source, ws,
        |    sum(ws) OVER (PARTITION BY source ORDER BY doc_id
        |                  ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM tok2),
        |bins AS (
        |  SELECT source, count(DISTINCT CAST((cum - ws) // 512 AS BIGINT)) AS n_bins
        |  FROM c GROUP BY 1)
        |SELECT raw.source, raw.n_raw,
        |  coalesce(gated.n_gated, 0) AS n_gated,
        |  coalesce(uniqc.n_unique, 0) AS n_unique,
        |  coalesce(uniqc.n_tokens, 0) AS n_tokens,
        |  coalesce(bins.n_bins, 0) AS n_bins
        |FROM raw
        |LEFT JOIN gated ON gated.source = raw.source
        |LEFT JOIN uniqc ON uniqc.source = raw.source
        |LEFT JOIN bins ON bins.source = raw.source""".stripMargin,
    // first BPE merge round: corpus-wide adjacent character-pair counts
    // within tokens, top-20 with deterministic ties
    "pipe_bpe_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> t <> '') AS tokens
        |  FROM documents),
        |t AS (SELECT unnest(tokens) AS t FROM toks),
        |p AS (
        |  SELECT substr(t, i, 2) AS pair
        |  FROM t, unnest(range(1, length(t))) AS u(i)
        |  WHERE length(t) >= 2),
        |c AS (SELECT pair, count(*) AS cnt FROM p GROUP BY 1)
        |SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair) AS rnk
        |FROM c QUALIFY rnk <= 20""".stripMargin,
    // BPE TRAINING replay (3 unrolled merge rounds): per round, weighted
    // symbol-pair counts over the word vocab -> argmax (ties by pair) ->
    // greedy left-to-right merge. The rewrite is a list_reduce whose
    // accumulator is the merged prefix as a chr(31)-joined string (the
    // separator cannot occur in [a-z0-9] tokens), which is exactly the
    // Spark side's last-token fold: a merge emits p1||p2, which can
    // never equal p1 again, so chained overlaps resolve identically.
    "pipe_bpe_merges" -> bpeMergesOracle,
    // tokenizer APPLICATION: corpus piece histogram from the final vocab
    // state of the same 3-round replay
    "pipe_bpe_encode" -> bpeEncodeOracle,
    // Gopher-style repetition metrics over token 2-grams
    "pipe_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> t <> '') AS tokens
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, len(tokens) - 1 AS total,
        |         tokens[i+1] || ' ' || tokens[i+2] AS g
        |  FROM toks, unnest(range(len(tokens) - 1)) AS t(i)
        |  WHERE len(tokens) >= 2),
        |c AS (SELECT doc_id, total, g, count(*) AS c FROM g GROUP BY 1, 2, 3)
        |SELECT doc_id, total AS n_2grams,
        |  round(1.0 - CAST(count(*) AS DOUBLE) / total, 4) + 0.0 AS dup_2gram_frac,
        |  round(CAST(max(c) AS DOUBLE) / total, 4) + 0.0 AS top_2gram_frac
        |FROM c GROUP BY 1, 2""".stripMargin,
    // composed C4/Gopher keep-drop gate -> per-source keep rates; the
    // rule thresholds compare the same ROUNDED statistics on both engines
    "pipe_quality_gate" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> t <> '') AS tokens
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, len(tokens) AS n_tokens,
        |    round(CAST(list_sum(list_transform(tokens, t -> length(t))) AS DOUBLE)
        |          / len(tokens), 4) AS mean_tok_len,
        |    round(CAST(len(list_distinct(tokens)) AS DOUBLE) / len(tokens), 4)
        |      AS distinct_ratio
        |  FROM toks),
        |g AS (
        |  SELECT doc_id, len(tokens) - 1 AS total,
        |         tokens[i+1] || ' ' || tokens[i+2] AS g
        |  FROM toks, unnest(range(len(tokens) - 1)) AS t(i)
        |  WHERE len(tokens) >= 2),
        |cg AS (SELECT doc_id, total, g, count(*) AS c FROM g GROUP BY 1, 2, 3),
        |r AS (
        |  SELECT doc_id, round(1.0 - CAST(count(*) AS DOUBLE) / total, 4)
        |    AS dup_2gram_frac
        |  FROM cg GROUP BY doc_id, total),
        |k AS (
        |  SELECT d.source,
        |    CASE WHEN q.n_tokens >= 8 AND q.n_tokens <= 2000
        |          AND q.mean_tok_len >= 2.0 AND q.mean_tok_len <= 12.0
        |          AND q.distinct_ratio >= 0.2 AND r.dup_2gram_frac <= 0.9
        |         THEN 1 ELSE 0 END AS keep
        |  FROM documents d
        |  JOIN q ON q.doc_id = d.doc_id
        |  JOIN r ON r.doc_id = d.doc_id)
        |SELECT source, count(*) AS n_docs, CAST(sum(keep) AS BIGINT) AS n_keep,
        |  round(CAST(sum(keep) AS DOUBLE) / count(*), 4) + 0.0 AS keep_rate
        |FROM k GROUP BY source""".stripMargin,
    // decontamination: train docs sharing a 3-token shingle with the
    // held-out eval slice (doc_id < 50)
    "pipe_contamination" ->
      s"""$shCte,
         |ev AS (SELECT DISTINCT hs, doc_id AS eval_id FROM sh WHERE doc_id < 50),
         |tr AS (SELECT doc_id, hs FROM sh WHERE doc_id >= 50)
         |SELECT tr.doc_id, count(DISTINCT tr.hs) AS n_shared,
         |       count(DISTINCT ev.eval_id) AS n_eval_docs
         |FROM tr JOIN ev ON ev.hs = tr.hs
         |GROUP BY tr.doc_id""".stripMargin,
    // stream-static gate batch twin: md5 content-hash anti-join against the
    // banned slice (kills the slice itself plus any text duplicate of it)
    "pipe_stream_refgate" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE md5(text) NOT IN
        |  (SELECT md5(text) FROM documents WHERE doc_id % 17 = 0)""".stripMargin,
    // stream-stream join twin: per-pair attribution rows
    "pipe_stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |  p.user_id
        |FROM events p JOIN events c
        |  ON p.event_type = 'purchase' AND c.event_type = 'click'
        |  AND c.user_id = p.user_id
        |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts""".stripMargin,
    // streaming-sketch batch twin: same HDR bucketing as
    // stat_quantile_sketch, over event value cents
    "pipe_stream_qsketch" ->
      """WITH v AS (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
        |  WHERE CAST(round(value * 100) AS BIGINT) >= 0)
        |SELECT CASE WHEN v < 32 THEN v
        |  ELSE (length(bin(v)) - 5) * 32
        |       + v // CAST(power(2, length(bin(v)) - 6) AS BIGINT) - 32 END AS bucket,
        |  count(*) AS cnt
        |FROM v GROUP BY 1""".stripMargin,
    // Bloom filter (m = 2^16 bits, 32 per BIGINT word, 3 affine probes)
    // built over ref shingles (doc_id < 400), probed by the rest
    "pipe_bloom_dedup" ->
      s"""$shCte,
         |ref AS (SELECT DISTINCT hs FROM sh WHERE doc_id < 400),
         |pos AS (
         |  SELECT p FROM ref, unnest([
         |    (hs + 7) % 65536, (hs * 3 + 12352) % 65536,
         |    (hs * 5 + 24697) % 65536]) AS u(p)),
         |bits AS (
         |  SELECT p // 32 AS word,
         |         bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS mask
         |  FROM pos GROUP BY 1),
         |probes AS (
         |  SELECT doc_id, hs, p // 32 AS word, CAST(p % 32 AS INT) AS bit
         |  FROM (SELECT doc_id, hs, unnest([
         |          (hs + 7) % 65536, (hs * 3 + 12352) % 65536,
         |          (hs * 5 + 24697) % 65536]) AS p
         |        FROM sh WHERE doc_id >= 400)),
         |hit AS (
         |  SELECT doc_id, hs,
         |    CASE WHEN CAST(sum((coalesce(b.mask, 0) >> p.bit) & 1) AS BIGINT) = 3
         |         THEN 1 ELSE 0 END AS seen
         |  FROM probes p LEFT JOIN bits b ON b.word = p.word
         |  GROUP BY doc_id, hs)
         |SELECT doc_id, count(*) AS n_shingles, CAST(sum(seen) AS BIGINT) AS n_seen,
         |  round(CAST(sum(seen) AS DOUBLE) / count(*), 4) + 0.0 AS seen_frac
         |FROM hit GROUP BY doc_id""".stripMargin,
    "pipe_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |                             t -> t <> '') AS tokens
         |  FROM documents),
         |td AS (
         |  SELECT doc_id, t.term, count(*) AS tf,
         |         CAST(('0x' || substr(md5(t.term), 1, 8)) AS BIGINT) AS ht
         |  FROM toks, unnest(toks.tokens) AS t(term)
         |  GROUP BY doc_id, t.term),
         |sums AS (SELECT doc_id, $simhashSums FROM td GROUP BY doc_id)
         |SELECT doc_id, $simhashBits AS sim FROM sums""".stripMargin,
    "pipe_span_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> t <> '') AS tokens
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    md5(array_to_string(tokens[i:i+7], ' ')) AS g
        |  FROM toks, unnest(generate_series(1, len(tokens) - 7)) AS u(i)
        |  WHERE len(tokens) >= 8),
        |dup AS (SELECT g FROM g GROUP BY g HAVING count(DISTINCT doc_id) > 1),
        |cov AS (
        |  SELECT DISTINCT g.doc_id, g.pos + off AS cp
        |  FROM g JOIN dup USING (g), unnest(generate_series(0, 7)) AS o(off)),
        |cnt AS (SELECT doc_id, count(*) AS dup_tokens FROM cov GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.tokens) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        |  CASE WHEN len(t.tokens) = 0 THEN 0.0
        |       ELSE round(CAST(coalesce(c.dup_tokens, 0) AS DOUBLE) / len(t.tokens), 6) + 0.0
        |  END AS dup_frac
        |FROM toks t LEFT JOIN cnt c USING (doc_id)""".stripMargin,
    "pipe_ngram_jaccard" ->
      s"""$shCte,
         |shl AS (SELECT * FROM sh WHERE doc_id < 300),
         |inter AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS inter
         |  FROM shl a JOIN shl b ON a.hs = b.hs AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sizes AS (SELECT doc_id, count(*) AS n FROM shl GROUP BY 1)
         |SELECT i.a, i.b, round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) AS jac
         |FROM inter i JOIN sizes sa ON i.a = sa.doc_id JOIN sizes sb ON i.b = sb.doc_id
         |WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.8""".stripMargin,
    "pipe_ann_brute" ->
      s"""WITH $vCte,
         |scored AS (
         |  SELECT q.id AS qid, c.id AS nid, ${cosExpr("q.vec", "c.vec")} AS cos
         |  FROM v q JOIN v c ON q.id < 5 AND q.id <> c.id),
         |ranked AS (
         |  SELECT qid, nid, cos,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk
         |  FROM scored)
         |SELECT qid, nid, round(cos, 4) AS cos, rnk FROM ranked WHERE rnk <= 10""".stripMargin,
    "pipe_kcenter_select" -> {
      def roundStep(r: Int): String =
        s"""p$r AS MATERIALIZED (SELECT id, vec, d2 FROM m${r - 1}
           |  ORDER BY d2 DESC, id LIMIT 1),
           |m$r AS MATERIALIZED (SELECT m.id, m.vec,
           |  least(m.d2, ${pqL2sq("m.vec", "p.vec")}) AS d2
           |  FROM m${r - 1} m, p$r p)""".stripMargin
      s"""WITH $vCte,
         |c1 AS MATERIALIZED (SELECT id, vec FROM v ORDER BY id LIMIT 1),
         |m1 AS MATERIALIZED (SELECT v.id, v.vec, ${pqL2sq("v.vec", "c.vec")} AS d2
         |  FROM v, c1 c),
         |${(2 to 5).map(roundStep).mkString(",\n")}
         |SELECT 1 AS rnk, id, 0.0 AS dist FROM c1
         |${(2 to 5).map(r =>
             s"UNION ALL SELECT $r, id, round(sqrt(d2), 6) + 0.0 FROM p$r")
           .mkString("\n")}""".stripMargin
    },
    "pipe_matryoshka_recall" ->
      s"""WITH $vCte,
         |p AS (SELECT id, vec[1:32] AS vec FROM v),
         |rf AS (
         |  SELECT qid, nid FROM (
         |    SELECT q.id AS qid, c.id AS nid,
         |           row_number() OVER (PARTITION BY q.id
         |             ORDER BY ${cosExpr("q.vec", "c.vec")} DESC, c.id) AS rnk
         |    FROM v q JOIN v c ON q.id < 5 AND q.id <> c.id)
         |  WHERE rnk <= 10),
         |rp AS (
         |  SELECT qid, nid FROM (
         |    SELECT q.id AS qid, c.id AS nid,
         |           row_number() OVER (PARTITION BY q.id
         |             ORDER BY ${cosExpr("q.vec", "c.vec")} DESC, c.id) AS rnk
         |    FROM p q JOIN p c ON q.id < 5 AND q.id <> c.id)
         |  WHERE rnk <= 10)
         |SELECT 5 AS n_queries, 10 AS k, 32 AS prefix_dim,
         |  count(*) AS hits,
         |  round(count(*) / CAST(50 AS DOUBLE), 4) + 0.0 AS recall
         |FROM rf JOIN rp USING (qid, nid)""".stripMargin,
    "pipe_ann_lsh" ->
      s"""WITH $vCte,
         |$bucketCte,
         |scored AS (
         |  SELECT q.id AS qid, c.id AS nid, ${cosExpr("q.vec", "c.vec")} AS cos
         |  FROM b q JOIN b c ON ($anyBucketMatch) AND q.id < 5 AND q.id <> c.id),
         |ranked AS (
         |  SELECT qid, nid, cos,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk
         |  FROM scored)
         |SELECT qid, nid, round(cos, 4) AS cos, rnk FROM ranked WHERE rnk <= 5""".stripMargin,
    "pipe_ann_recall" ->
      s"""WITH $vCte,
         |$bucketCte,
         |ex AS (
         |  SELECT qid, nid FROM (
         |    SELECT q.id AS qid, c.id AS nid,
         |           row_number() OVER (PARTITION BY q.id
         |             ORDER BY ${cosExpr("q.vec", "c.vec")} DESC, c.id) AS rnk
         |    FROM v q JOIN v c ON q.id < 5 AND q.id <> c.id)
         |  WHERE rnk <= 10),
         |ap AS (
         |  SELECT qid, nid FROM (
         |    SELECT q.id AS qid, c.id AS nid,
         |           row_number() OVER (PARTITION BY q.id
         |             ORDER BY ${cosExpr("q.vec", "c.vec")} DESC, c.id) AS rnk
         |    FROM b q JOIN b c ON ($anyBucketMatch) AND q.id < 5 AND q.id <> c.id)
         |  WHERE rnk <= 10),
         |hits AS (
         |  SELECT ex.qid, count(*) AS hits FROM ex JOIN ap
         |    ON ex.qid = ap.qid AND ex.nid = ap.nid
         |  GROUP BY 1)
         |SELECT round(avg(CAST(hits AS DOUBLE) / 10), 4) AS recall FROM hits""".stripMargin,
    "pipe_boilerplate" ->
      s"""$shCte
         |SELECT hs, count(*) AS df FROM sh GROUP BY hs HAVING count(*) >= 3""".stripMargin,
    "pipe_quantization" ->
      s"""WITH $vCte,
         |lanes AS (
         |  SELECT unnest(vec) AS x, generate_subscripts(vec, 1) AS pos FROM v),
         |sc AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM lanes GROUP BY pos),
         |vl AS (
         |  SELECT v.id, unnest(v.vec) AS x, generate_subscripts(v.vec, 1) AS pos
         |  FROM v),
         |err AS (
         |  SELECT vl.id,
         |    CASE WHEN sc.mx > sc.mn THEN
         |      power(vl.x - (round((vl.x - sc.mn) / (sc.mx - sc.mn) * 255.0, 0)
         |            / 255.0 * (sc.mx - sc.mn) + sc.mn), 2)
         |    ELSE 0.0 END AS e2,
         |    vl.x
         |  FROM vl JOIN sc ON vl.pos = sc.pos)
         |SELECT id, round(sum(e2) / count(*), 10) AS quant_mse
         |FROM err GROUP BY id""".stripMargin,
    "pipe_embed_neardup" ->
      s"""WITH $vCte,
         |un AS (
         |  SELECT id, CASE WHEN sqrt(${foldSq("vec")}) <> 0.0
         |    THEN list_transform(vec, x -> x / sqrt(${foldSq("vec")}))
         |    ELSE vec END AS uv
         |  FROM v)
         |SELECT a.id AS a, b.id AS b, round(${foldDot("a.uv", "b.uv")}, 4) AS cos
         |FROM un a JOIN un b ON a.id < b.id
         |WHERE ${foldDot("a.uv", "b.uv")} >= 0.45""".stripMargin,
    // LSH-bucketed near-dup: candidates share a sign-bucket in ANY of the
    // 4 tables (same bucket machinery as pipe_ann_lsh), exact cosine only
    // on candidates
    "pipe_embed_neardup_lsh" ->
      s"""WITH $vCte,
         |$bucketCte,
         |un AS (
         |  SELECT id, CASE WHEN sqrt(${foldSq("vec")}) <> 0.0
         |    THEN list_transform(vec, x -> x / sqrt(${foldSq("vec")}))
         |    ELSE vec END AS uv
         |  FROM v),
         |cand AS (
         |  SELECT DISTINCT x.id AS a, y.id AS b
         |  FROM b x JOIN b y ON x.id < y.id
         |    AND (x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3))
         |SELECT c.a, c.b, round(${foldDot("ua.uv", "ub.uv")}, 4) AS cos
         |FROM cand c
         |JOIN un ua ON ua.id = c.a JOIN un ub ON ub.id = c.b
         |WHERE ${foldDot("ua.uv", "ub.uv")} >= 0.45""".stripMargin,
    // Real-BMP decode replay: w/h from the pack arithmetic, n_bytes from
    // the BMP layout (54-byte headers + 4-byte-aligned rows), pixel_md5
    // over the cycled document bytes the parse must recover exactly
    "pipe_mm_decode" ->
      """WITH dims AS (
        |  SELECT doc_id, text, length(text) AS len,
        |    8 + length(text) % 57 AS w, 8 + (length(text) * 7) % 41 AS h
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(54 + ((w * 3 + 3) // 4 * 4) * h AS BIGINT) AS n_bytes,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels,
        |  md5(substr(repeat(text, (w * h * 3 + len - 1) // len), 1, w * h * 3)) AS pixel_md5
        |FROM dims""".stripMargin,
    // Real-PNG decode replay: lossless container ⇒ identical pixel-md5
    // arithmetic to the BMP oracle; n_bytes omitted (zlib-dependent)
    "pipe_mm_png_decode" ->
      """WITH dims AS (
        |  SELECT doc_id, text, length(text) AS len,
        |    8 + length(text) % 57 AS w, 8 + (length(text) * 7) % 41 AS h
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels,
        |  md5(substr(repeat(text, (w * h * 3 + len - 1) // len), 1, w * h * 3)) AS pixel_md5
        |FROM dims""".stripMargin,
    // JPEG decode replay: structural metadata only (lossy pixels)
    "pipe_mm_jpeg_decode" ->
      """SELECT doc_id,
        |  CAST(8 + length(text) % 57 AS BIGINT) AS width,
        |  CAST(8 + (length(text) * 7) % 41 AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels
        |FROM documents""".stripMargin,
    // Paletted-BMP decode replay: pixel offset = 54 + 256·4 palette bytes,
    // 1-byte indices padded to 4-byte rows; grayscale identity palette ⇒
    // recovered RGB = each cycled doc byte TRIPLED
    "pipe_mm_bmp8_decode" ->
      """WITH dims AS (
        |  SELECT doc_id, text, length(text) AS len,
        |    8 + length(text) % 57 AS w, 8 + (length(text) * 7) % 41 AS h
        |  FROM documents),
        |px AS (
        |  SELECT d.doc_id,
        |    string_agg(repeat(substr(d.text, (t.i % d.len) + 1, 1), 3), '' ORDER BY t.i) AS buf
        |  FROM dims d, unnest(range(d.w * d.h)) AS t(i)
        |  GROUP BY d.doc_id)
        |SELECT d.doc_id,
        |  CAST(1078 + ((d.w + 3) // 4 * 4) * d.h AS BIGINT) AS n_bytes,
        |  CAST(d.w AS BIGINT) AS width, CAST(d.h AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels,
        |  md5(p.buf) AS pixel_md5
        |FROM dims d JOIN px p USING (doc_id)""".stripMargin,
    // Real-WAV decode replay: 62-byte container overhead (RIFF + fmt +
    // LIST + data headers), sample t = (byte t − 128)·256
    "pipe_mm_wav_decode" ->
      """WITH s AS (
        |  SELECT doc_id, length(text) AS len,
        |    sum((ascii(substr(text, t + 1, 1)) - 128) * 256) AS ssum,
        |    min((ascii(substr(text, t + 1, 1)) - 128) * 256) AS smin,
        |    max((ascii(substr(text, t + 1, 1)) - 128) * 256) AS smax
        |  FROM documents, unnest(range(length(text))) AS r(t)
        |  GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(62 + 2 * len AS BIGINT) AS n_bytes,
        |  CAST(8000 AS BIGINT) AS sample_rate, CAST(1 AS BIGINT) AS channels,
        |  CAST(16 AS BIGINT) AS bit_depth, CAST(len AS BIGINT) AS n_samples,
        |  CAST(len * 1000 // 8000 AS BIGINT) AS duration_ms,
        |  round(CAST(ssum AS DOUBLE) / len, 4) + 0.0 AS amp_mean,
        |  CAST(smin AS BIGINT) AS amp_min, CAST(smax AS BIGINT) AS amp_max
        |FROM s""".stripMargin,
    // Decode → 4×2 area-pool replay at pixel level: gray3 = r+g+b with
    // byte p of the pixel buffer = doc byte (p mod len); bin mean as
    // exact integer sum / count
    "pipe_mm_features" ->
      """WITH dims AS (
        |  SELECT doc_id, text, length(text) AS len,
        |    8 + length(text) % 57 AS w, 8 + (length(text) * 7) % 41 AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h,
        |    ((i % w) * 4) // w AS ox, ((i // w) * 2) // h AS oy,
        |    ascii(substr(text, (3 * i) % len + 1, 1))
        |      + ascii(substr(text, (3 * i + 1) % len + 1, 1))
        |      + ascii(substr(text, (3 * i + 2) % len + 1, 1)) AS g
        |  FROM dims, unnest(range(w * h)) AS t(i))
        |SELECT doc_id, CAST(4 AS BIGINT) AS resized_w, CAST(2 AS BIGINT) AS resized_h,
        |  CAST(oy * 4 + ox AS INT) AS pos,
        |  round(CAST(sum(g) AS DOUBLE) / count(*), 6) + 0.0 AS v
        |FROM px GROUP BY 1, 2, 3, 4""".stripMargin,
    // deterministic shuffle replay: identical md5 key and fixed-range
    // shard arithmetic
    "pipe_global_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substr(md5(concat_ws(':', doc_id, 6, 'gshuf')), 1, 8)) AS BIGINT) AS sk
        |  FROM documents)
        |SELECT sk * 32 >> 32 AS shard, count(*) AS cnt,
        |  min(sk) AS min_sk, max(sk) AS max_sk,
        |  count(DISTINCT source) AS n_sources
        |FROM k GROUP BY 1""".stripMargin,
    // pHash near-dup replay over REAL decoded pixels: lanes = the 8×8
    // area-pooled luma grid (same pixel-level arithmetic as the
    // pipe_mm_features replay), median via the two middle order
    // statistics, 16-bit bands, candidate = shared band, confirm =
    // band-wise popcount of XOR <= 6
    "pipe_mm_phash_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 25),
        |dims AS (
        |  SELECT doc_id, text, length(text) AS len,
        |    8 + length(text) % 57 AS w, 8 + (length(text) * 7) % 41 AS h
        |  FROM corpus),
        |px AS (
        |  SELECT doc_id,
        |    ((i // w) * 8) // h * 8 + ((i % w) * 8) // w AS t,
        |    ascii(substr(text, (3 * i) % len + 1, 1))
        |      + ascii(substr(text, (3 * i + 1) % len + 1, 1))
        |      + ascii(substr(text, (3 * i + 2) % len + 1, 1)) AS g
        |  FROM dims, unnest(range(w * h)) AS r(i)),
        |lanes AS (
        |  SELECT doc_id, t, CAST(sum(g) AS DOUBLE) / count(*) AS v
        |  FROM px GROUP BY 1, 2),
        |med AS (
        |  SELECT doc_id,
        |    (min(CASE WHEN rn = 32 THEN v END) + min(CASE WHEN rn = 33 THEN v END)) / 2.0 AS med
        |  FROM (SELECT doc_id, v,
        |          row_number() OVER (PARTITION BY doc_id ORDER BY v) AS rn
        |        FROM lanes)
        |  GROUP BY 1),
        |bits AS (
        |  SELECT l.doc_id, t // 16 AS band,
        |    CAST(sum(CASE WHEN v > med THEN 1 << (t % 16) ELSE 0 END) AS BIGINT) AS bval
        |  FROM lanes l JOIN med USING (doc_id) GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |         FROM bits x JOIN bits y
        |           ON x.band = y.band AND x.bval = y.bval AND x.doc_id < y.doc_id),
        |w AS (SELECT doc_id,
        |        min(CASE WHEN band = 0 THEN bval END) AS b0,
        |        min(CASE WHEN band = 1 THEN bval END) AS b1,
        |        min(CASE WHEN band = 2 THEN bval END) AS b2,
        |        min(CASE WHEN band = 3 THEN bval END) AS b3
        |      FROM bits GROUP BY 1)
        |SELECT a, b, hamming FROM (
        |  SELECT a, b,
        |    bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1)) +
        |    bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3)) AS hamming
        |  FROM cand JOIN w wa ON wa.doc_id = a JOIN w wb ON wb.doc_id = b)
        |WHERE hamming <= 6""".stripMargin,
    // frame dedup replay over REAL decoded pixel buffers: frames are
    // 200-byte windows of the recovered RGB stream (= doc bytes cycled
    // to w·h·3), identical digests over the planted corpus
    "pipe_mm_frame_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 25),
        |buf AS (
        |  SELECT doc_id,
        |    substr(repeat(text, (w * h * 3 + len - 1) // len), 1, w * h * 3) AS ps,
        |    w * h * 3 AS total
        |  FROM (SELECT doc_id, text, length(text) AS len,
        |          8 + length(text) % 57 AS w, 8 + (length(text) * 7) % 41 AS h
        |        FROM corpus)),
        |fr AS (
        |  SELECT doc_id, md5(substr(ps, i * 200 + 1, 200)) AS frame_md5
        |  FROM buf, unnest(range((total + 199) // 200)) AS t(i))
        |SELECT frame_md5, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
        |FROM fr GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2""".stripMargin,
    "pipe_mm_audio_dup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, repeat('z', 100) || text
        |  FROM documents WHERE doc_id < 25),
        |fp AS (
        |  SELECT doc_id, md5(substr(text, i * 100 + 1, 200)) AS fp
        |  FROM corpus, unnest(range(length(text) // 100 + 1)) AS t(i)
        |  WHERE i * 100 + 200 <= length(text))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       count(DISTINCT a.fp) AS shared
        |FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(DISTINCT a.fp) >= 3""".stripMargin,
    "pipe_mm_frames" ->
      """SELECT doc_id, i AS frame_idx, i * 200 AS offset,
        |  md5(substr(text, i * 200 + 1, 200)) AS frame_md5
        |FROM documents, unnest(range((length(text) + 199) // 200)) AS t(i)
        |WHERE doc_id < 200""".stripMargin,
    // packing replay: ws tokens + ceil-div patch grid over the pack dims
    "pipe_mm_packing" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS ws,
        |    ((8 + length(text) % 57 + 7) // 8)
        |      * ((8 + (length(text) * 7) % 41 + 7) // 8) AS imt
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, ws, imt, ws + imt AS sl,
        |    sum(ws + imt) OVER (PARTITION BY source ORDER BY doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT source, CAST((cum - sl) // 1024 AS BIGINT) AS bin,
        |  count(*) AS n_docs, CAST(sum(ws) AS BIGINT) AS n_text_tokens,
        |  CAST(sum(imt) AS BIGINT) AS n_img_tokens
        |FROM c GROUP BY 1, 2""".stripMargin,
    // integer-exact DSP replay: s_t = (byte_t - 128)*256, energy/peak per
    // window, mean-crossing via the integer comparison 200*s <> sum(s)
    "pipe_mm_audio_features" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |w AS (
        |  SELECT doc_id, text, i AS win_idx, i * 100 AS o
        |  FROM d, unnest(range(len // 100 + 1)) AS t(i)
        |  WHERE i * 100 + 200 <= len),
        |e AS (
        |  SELECT doc_id, win_idx, o, t,
        |    (ascii(substr(text, o + t + 1, 1)) - 128) * 256 AS s
        |  FROM w, unnest(range(200)) AS u(t)),
        |agg AS (
        |  SELECT doc_id, win_idx, o AS offset,
        |    sum(s * s) AS energy, sum(s) AS ssum, max(abs(s)) AS peak
        |  FROM e GROUP BY 1, 2, 3),
        |l AS (
        |  SELECT doc_id, win_idx, t, s,
        |    lag(s) OVER (PARTITION BY doc_id, win_idx ORDER BY t) AS ps
        |  FROM e),
        |mc AS (
        |  SELECT l.doc_id, l.win_idx,
        |    CAST(sum(CASE WHEN l.ps IS NOT NULL
        |      AND ((200 * l.s > a.ssum) <> (200 * l.ps > a.ssum))
        |      THEN 1 ELSE 0 END) AS BIGINT) AS mcr
        |  FROM l JOIN agg a ON a.doc_id = l.doc_id AND a.win_idx = l.win_idx
        |  GROUP BY 1, 2)
        |SELECT a.doc_id, a.win_idx, CAST(a.offset AS BIGINT) AS offset,
        |  CAST(a.energy AS BIGINT) AS energy, mc.mcr, CAST(a.peak AS BIGINT) AS peak
        |FROM agg a JOIN mc ON mc.doc_id = a.doc_id AND mc.win_idx = a.win_idx""".stripMargin,
    // per-channel replay over the cycled-byte pixel construction
    "pipe_mm_channel_stats" ->
      """WITH dims AS (
        |  SELECT doc_id, text, length(text) AS len,
        |    8 + length(text) % 57 AS w, 8 + (length(text) * 7) % 41 AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, c AS channel,
        |    ascii(substr(text, (3 * i + c) % len + 1, 1)) AS v, w * h AS npx
        |  FROM dims, unnest(range(w * h)) AS t(i), unnest(range(3)) AS u(c))
        |SELECT doc_id, channel, CAST(min(v) AS BIGINT) AS px_min,
        |  CAST(max(v) AS BIGINT) AS px_max, CAST(sum(v) AS BIGINT) AS px_sum,
        |  CAST(min(npx) AS BIGINT) AS n_px
        |FROM px GROUP BY 1, 2""".stripMargin,
    // both modality replays over the SAME planted corpus, full-outer
    // joined — the text chain is the minhash_lsh replay, the image chain
    // the phash replay, each with corpus-local FROMs
    "pipe_mm_consensus" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 10
        |  UNION ALL
        |  SELECT doc_id + 2000000, text || repeat(' qz', 40)
        |  FROM documents WHERE doc_id >= 10 AND doc_id < 20),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> t <> '') AS tokens
        |  FROM corpus),
        |sh0 AS (
        |  SELECT DISTINCT doc_id, tokens[i+1] || ' ' || tokens[i+2] || ' ' || tokens[i+3] AS s
        |  FROM toks, unnest(range(len(tokens) - 2)) AS t(i)
        |  WHERE len(tokens) >= 3),
        |sh AS (SELECT doc_id, CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) AS hs FROM sh0),
        |mh AS (
        |  SELECT doc_id, i, min((hs * (2*i+1) + (12345*i+7)) % 2147483647) AS mh
        |  FROM sh, unnest(range(16)) AS p(i) GROUP BY 1, 2),
        |bands AS (
        |  SELECT doc_id, i // 4 AS band, string_agg(mh, ':' ORDER BY i) AS sig
        |  FROM mh GROUP BY 1, 2),
        |candT AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM bands x JOIN bands y
        |    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
        |inter AS (
        |  SELECT c.a, c.b, count(*) AS inter FROM candT c
        |  JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
        |  WHERE sa.hs = sb.hs GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |txt AS (
        |  SELECT i.a, i.b,
        |    round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) AS jac
        |  FROM inter i JOIN sizes sa ON i.a = sa.doc_id JOIN sizes sb ON i.b = sb.doc_id
        |  WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5),
        |dims AS (
        |  SELECT doc_id, text, length(text) AS len,
        |    8 + length(text) % 57 AS w, 8 + (length(text) * 7) % 41 AS h
        |  FROM corpus),
        |px AS (
        |  SELECT doc_id,
        |    ((i // w) * 8) // h * 8 + ((i % w) * 8) // w AS t,
        |    ascii(substr(text, (3 * i) % len + 1, 1))
        |      + ascii(substr(text, (3 * i + 1) % len + 1, 1))
        |      + ascii(substr(text, (3 * i + 2) % len + 1, 1)) AS g
        |  FROM dims, unnest(range(w * h)) AS r(i)),
        |lanes AS (
        |  SELECT doc_id, t, CAST(sum(g) AS DOUBLE) / count(*) AS v
        |  FROM px GROUP BY 1, 2),
        |med AS (
        |  SELECT doc_id,
        |    (min(CASE WHEN rn = 32 THEN v END) + min(CASE WHEN rn = 33 THEN v END)) / 2.0 AS med
        |  FROM (SELECT doc_id, v,
        |          row_number() OVER (PARTITION BY doc_id ORDER BY v) AS rn
        |        FROM lanes)
        |  GROUP BY 1),
        |bits AS (
        |  SELECT l.doc_id, t // 16 AS band,
        |    CAST(sum(CASE WHEN v > med THEN 1 << (t % 16) ELSE 0 END) AS BIGINT) AS bval
        |  FROM lanes l JOIN med USING (doc_id) GROUP BY 1, 2),
        |candI AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |          FROM bits x JOIN bits y
        |            ON x.band = y.band AND x.bval = y.bval AND x.doc_id < y.doc_id),
        |wrd AS (SELECT doc_id,
        |          min(CASE WHEN band = 0 THEN bval END) AS b0,
        |          min(CASE WHEN band = 1 THEN bval END) AS b1,
        |          min(CASE WHEN band = 2 THEN bval END) AS b2,
        |          min(CASE WHEN band = 3 THEN bval END) AS b3
        |        FROM bits GROUP BY 1),
        |img AS (
        |  SELECT a, b, hamming FROM (
        |    SELECT a, b,
        |      bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1)) +
        |      bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3)) AS hamming
        |    FROM candI JOIN wrd wa ON wa.doc_id = a JOIN wrd wb ON wb.doc_id = b)
        |  WHERE hamming <= 6)
        |SELECT coalesce(t.a, i.a) AS a, coalesce(t.b, i.b) AS b,
        |  t.jac IS NOT NULL AS text_dup, i.hamming IS NOT NULL AS image_dup,
        |  coalesce(t.jac, -1.0) AS jac,
        |  CAST(coalesce(i.hamming, -1) AS BIGINT) AS hamming
        |FROM txt t FULL OUTER JOIN img i ON t.a = i.a AND t.b = i.b""".stripMargin,
    // lag-histogram replay: votes per (pair, off_a - off_b), winner by
    // (votes desc, lag asc) — the planted one-hop copies land at lag -100
    "pipe_mm_audio_align" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, repeat('z', 100) || text
        |  FROM documents WHERE doc_id < 25),
        |fp AS (
        |  SELECT doc_id, i * 100 AS off, md5(substr(text, i * 100 + 1, 200)) AS fp
        |  FROM corpus, unnest(range(length(text) // 100 + 1)) AS t(i)
        |  WHERE i * 100 + 200 <= length(text)),
        |votes AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.off - b.off AS lag,
        |    count(*) AS v
        |  FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3),
        |best AS (
        |  SELECT doc_a, doc_b, lag, v,
        |    row_number() OVER (PARTITION BY doc_a, doc_b
        |                       ORDER BY v DESC, lag ASC) AS rn,
        |    CAST(sum(v) OVER (PARTITION BY doc_a, doc_b) AS BIGINT) AS total_votes
        |  FROM votes)
        |SELECT doc_a, doc_b, lag, v AS votes, total_votes
        |FROM best WHERE rn = 1 AND v >= 3""".stripMargin,
    // exact index-arithmetic replay of the three buffer permutations over
    // the cycled-byte pixel construction (md5 via ordered string_agg)
    "pipe_mm_augment" ->
      """WITH base AS (
        |  SELECT doc_id, text, length(text) AS len,
        |    8 + length(text) % 57 AS w, 8 + (length(text) * 7) % 41 AS h,
        |    (8 + length(text) % 57) // 2 AS w2,
        |    (8 + (length(text) * 7) % 41) // 2 AS h2
        |  FROM documents),
        |b2 AS (
        |  SELECT *, (w - w2) // 2 AS x0, (h - h2) // 2 AS y0 FROM base),
        |hf AS (
        |  SELECT doc_id, 'hflip' AS aug,
        |    CAST(w AS BIGINT) AS out_w, CAST(h AS BIGINT) AS out_h,
        |    md5(string_agg(substr(text,
        |      ((y * w + (w - 1 - x)) * 3 + ch) % len + 1, 1), '' ORDER BY p)) AS aug_md5
        |  FROM (SELECT doc_id, text, len, w, h, p,
        |          (p // 3) % w AS x, (p // 3) // w AS y, p % 3 AS ch
        |        FROM b2, unnest(range(w * h * 3)) AS t(p))
        |  GROUP BY 1, 2, 3, 4),
        |rt AS (
        |  SELECT doc_id, 'rot180' AS aug,
        |    CAST(w AS BIGINT) AS out_w, CAST(h AS BIGINT) AS out_h,
        |    md5(string_agg(substr(text,
        |      (((h - 1 - y) * w + (w - 1 - x)) * 3 + ch) % len + 1, 1), '' ORDER BY p)) AS aug_md5
        |  FROM (SELECT doc_id, text, len, w, h, p,
        |          (p // 3) % w AS x, (p // 3) // w AS y, p % 3 AS ch
        |        FROM b2, unnest(range(w * h * 3)) AS t(p))
        |  GROUP BY 1, 2, 3, 4),
        |cr AS (
        |  SELECT doc_id, 'crop' AS aug,
        |    CAST(w2 AS BIGINT) AS out_w, CAST(h2 AS BIGINT) AS out_h,
        |    md5(string_agg(substr(text,
        |      (((y + y0) * w + (x + x0)) * 3 + ch) % len + 1, 1), '' ORDER BY p)) AS aug_md5
        |  FROM (SELECT doc_id, text, len, w, w2, h2, x0, y0, p,
        |          (p // 3) % w2 AS x, (p // 3) // w2 AS y, p % 3 AS ch
        |        FROM b2, unnest(range(w2 * h2 * 3)) AS t(p))
        |  GROUP BY 1, 2, 3, 4)
        |SELECT * FROM hf UNION ALL SELECT * FROM rt UNION ALL SELECT * FROM cr""".stripMargin,
    "pipe_stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
        |  count(*) AS cnt, round(sum(value), 4) AS sval
        |FROM events GROUP BY 1, 2""".stripMargin,
    "pipe_stream_sliding" ->
      """WITH assigned AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS w0, event_type FROM events
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS w0,
        |         event_type FROM events)
        |SELECT w0 AS wstart, event_type, count(*) AS cnt
        |FROM assigned GROUP BY 1, 2""".stripMargin,
    "pipe_stream_cms" ->
      """WITH ev AS (SELECT time_bucket(INTERVAL '6 hours', ts) AS wstart,
        |                   CAST(user_id AS VARCHAR) AS k FROM events),
        |ex AS (SELECT wstart, k, count(*) AS exact FROM ev GROUP BY 1, 2),
        |cells AS (SELECT wstart, t.d AS d,
        |    CAST(('0x' || substr(md5(concat_ws(':', t.d, k)), 1, 8)) AS BIGINT) % 256 AS b,
        |    count(*) AS cnt
        |  FROM ev CROSS JOIN range(4) t(d) GROUP BY 1, 2, 3),
        |est AS (SELECT e.wstart, e.k, e.exact, min(c.cnt) AS est
        |  FROM ex e CROSS JOIN range(4) t(d)
        |  JOIN cells c ON c.wstart = e.wstart AND c.d = t.d
        |    AND c.b = CAST(('0x' || substr(md5(concat_ws(':', t.d, e.k)), 1, 8))
        |                 AS BIGINT) % 256
        |  GROUP BY 1, 2, 3)
        |SELECT wstart, CAST(k AS BIGINT) AS user_id, exact, est FROM est""".stripMargin,
    "pipe_stream_psi" ->
      """WITH bc AS (SELECT least(9, greatest(0, CAST(floor(value / 50.0) AS BIGINT))) AS bin
        |            FROM events),
        |g AS (SELECT bin, count(*) AS c FROM bc GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bc),
        |ref AS (SELECT s.bin, (COALESCE(g.c, 0) + 1) / CAST(t.n + 10 AS DOUBLE) AS p
        |        FROM (SELECT unnest(range(10)) AS bin) s
        |        LEFT JOIN g USING (bin) CROSS JOIN t),
        |wc AS (SELECT time_bucket(INTERVAL '6 hours', ts) AS wstart,
        |              least(9, greatest(0, CAST(floor(value / 50.0) AS BIGINT))) AS bin,
        |              count(*) AS c
        |       FROM events GROUP BY 1, 2),
        |wn AS (SELECT wstart, CAST(sum(c) AS BIGINT) AS n FROM wc GROUP BY 1),
        |f AS (SELECT w.wstart, w.n, r.p, COALESCE(wc.c, 0) AS c
        |      FROM wn w CROSS JOIN ref r
        |      LEFT JOIN wc ON wc.wstart = w.wstart AND wc.bin = r.bin)
        |SELECT wstart, max(n) AS n,
        |  round(sum((p - (c + 1) / CAST(n + 10 AS DOUBLE)) *
        |            ln(p / ((c + 1) / CAST(n + 10 AS DOUBLE)))), 6) + 0.0 AS psi
        |FROM f GROUP BY wstart""".stripMargin,
    "pipe_stream_session_fn" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR date_diff('microsecond', lag(ts) OVER w, ts) >= 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessed AS (
        |  SELECT user_id, ts, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sess_no
        |  FROM flagged)
        |SELECT user_id, min(ts) AS sess_start, count(*) AS n_events,
        |       round(sum(value), 4) AS sum_value
        |FROM sessed GROUP BY user_id, sess_no""".stripMargin,
    "pipe_stream_session" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessed AS (
        |  SELECT user_id, ts, event_id, value,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_no
        |  FROM flagged)
        |SELECT user_id, sess_no,
        |       epoch_us(min(ts)) AS sess_start, epoch_us(max(ts)) AS sess_end,
        |       count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM sessed GROUP BY 1, 2""".stripMargin,
    // sliding-window chunking: same tokenizer, same start grid
    // (0, 48, …, ≤ n−1), same window slice, same h32 content hash
    "pipe_chunk_overlap" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> t <> '') AS tokens
        |  FROM documents WHERE doc_id < 1000),
        |w AS (SELECT doc_id, tokens, len(tokens) AS n FROM toks WHERE len(tokens) > 0),
        |st AS (SELECT doc_id, tokens,
        |         unnest(range(0, n - (n - 1) % 48, 48)) AS start FROM w)
        |SELECT doc_id, start // 48 AS chunk_id,
        |  CAST(len(list_slice(tokens, start + 1, start + 64)) AS BIGINT) AS n_tokens,
        |  CAST(('0x' || substr(md5(array_to_string(
        |    list_slice(tokens, start + 1, start + 64), ' ')), 1, 8)) AS BIGINT) AS chunk_hash
        |FROM st""".stripMargin,
    // per-source quality quartiles: the ROUNDED mean-token-length score
    // orders the ntile on both engines, ties by doc_id
    "pipe_curriculum_bins" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> t <> '') AS tokens
        |  FROM documents),
        |q AS (
        |  SELECT t.doc_id, d.source, len(tokens) AS n_tokens,
        |    round(CAST(list_sum(list_transform(tokens, x -> length(x))) AS DOUBLE)
        |          / len(tokens), 4) AS mean_tok_len
        |  FROM toks t JOIN documents d USING (doc_id)),
        |b AS (
        |  SELECT source, n_tokens, mean_tok_len,
        |    ntile(4) OVER (PARTITION BY source ORDER BY mean_tok_len, doc_id) AS bin
        |  FROM q)
        |SELECT source, bin, count(*) AS n_docs,
        |  round(avg(n_tokens), 4) + 0.0 AS avg_tokens,
        |  round(min(mean_tok_len), 4) AS min_score,
        |  round(max(mean_tok_len), 4) AS max_score
        |FROM b GROUP BY 1, 2""".stripMargin,
    // split assignment is a pure function of (doc_id, source) via the
    // shared md5-prefix hash — both engines derive identical membership
    "pipe_split_stratified" ->
      """SELECT source,
        |  CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 8))
        |            AS BIGINT) % 10 < 2 THEN 'test' ELSE 'train' END AS split,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY 1, 2""".stripMargin,
  )
}
