package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `BINARY` payloads with typed
  * metadata, decoded/feature-extracted per partition in batches — the
  * Spark-side shape an image/audio pipeline needs (schema, partitioning,
  * batch iteration). The actual media decode is a clearly-marked
  * deterministic STUB (no codec libraries in this environment); everything
  * around it — binary column, case-class schema, mapPartitions batch loop,
  * frame explosion — is real and tested.
  */
object MultimodalOps {

  case class BinaryDoc(doc_id: Long, payload: Array[Byte], source: String)
  case class DecodedMeta(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, channels: Long, content_md5: String)

  /** Pack text documents as binary payloads (stand-in for image/audio bytes). */
  def toBinary(docs: DataFrame): Dataset[BinaryDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("source"))
      .as[BinaryDoc]
  }

  /** STUB decoder: a real decoder (JPEG/PNG/audio) would parse `payload`
    * here; this fake derives dimensions deterministically from the byte
    * length so the pipeline is testable end-to-end. Runs as a per-partition
    * batch loop — the same execution shape as an Arrow-batched decode.
    */
  def decodeStub(docs: Dataset[BinaryDoc]): Dataset[DecodedMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // one per batch, like a codec ctx
      it.map { d =>
        md.reset()
        val digest = md.digest(d.payload).map("%02x".format(_)).mkString
        val n = d.payload.length.toLong
        // ??? real decode goes here; deterministic fake below
        DecodedMeta(d.doc_id, n, 64L + n % 577L, 64L + (n * 7L) % 419L, 3L, digest)
      }
    }
  }

  case class Features(doc_id: Long, resized_w: Long, resized_h: Long,
      feat: Array[Double])

  /** STUB feature extraction + resize: a real pipeline would decode, resize
    * to (targetW, targetH) and run a vision/audio encoder here. The fake
    * derives a deterministic d-dim feature vector by hashing fixed-stride
    * byte windows — so the Spark-side contract (binary in, fixed-length
    * ARRAY<DOUBLE> embedding + resize metadata out, per-partition batches)
    * is real and oracle-testable while the math is honestly stubbed.
    */
  def featureStub(docs: Dataset[BinaryDoc], targetW: Int = 224,
      targetH: Int = 224, d: Int = 8): Dataset[Features] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { doc =>
        // ??? real resize + encoder forward pass goes here; fake below:
        // feature t = first-4-bytes of md5(payload-window t) scaled to [0,1)
        val n = doc.payload.length
        val feat = Array.tabulate(d) { t =>
          val from = if (n == 0) 0 else (n.toLong * t / d).toInt
          val until = if (n == 0) 0 else (n.toLong * (t + 1) / d).toInt
          md.reset()
          val h = md.digest(java.util.Arrays.copyOfRange(doc.payload, from, until))
          val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
            ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
          v.toDouble / 4294967296.0
        }
        Features(doc.doc_id, targetW.toLong, targetH.toLong, feat)
      }
    }
  }

  /** Perceptual hash (the pHash rule) over the stubbed decode lanes:
    * 64 "DCT coefficient" stand-ins per payload ([[featureStub]] with
    * d = 64 — a real pipeline feeds the low-frequency DCT of the decoded
    * grayscale image here), bit b = 1 iff lane_b > median(lanes). The
    * hash is kept as FOUR 16-bit band values (b0..b3) rather than one
    * packed 64-bit word — bands are what the near-dup join buckets on,
    * and band-wise popcounts avoid signed-overflow ambiguity at bit 63.
    * Pure column expressions after the per-partition feature batch.
    */
  def phash64(features: DataFrame): DataFrame = {
    val sorted = array_sort(col("feat"))
    val med = (element_at(sorted, 32) + element_at(sorted, 33)) / 2.0
    val bandCols = (0 until 4).map { k =>
      (0 until 16).map { j =>
        when(element_at(col("feat"), k * 16 + j + 1) > col("med"), lit((1L << j)))
          .otherwise(lit(0L))
      }.reduce(_ + _).as(s"b$k")
    }
    features.withColumn("med", med)
      .select(col("doc_id") +: bandCols: _*)
  }

  /** Hamming near-dup pairs over the perceptual hash: docs sharing ANY
    * 16-bit band are candidates (4 equi-join buckets — the LSH structure
    * of pHash dedup: a pair within Hamming distance 6 of 64 bits must
    * match at least one band exactly... pigeonhole gives τ ≤ 3 a
    * GUARANTEE; τ = 6 keeps the same candidate join as a high-recall
    * heuristic), then exact band-wise popcount distance ≤ τ confirms.
    * The candidate join is distributable by (band, value) at 100 TB;
    * random 16-bit band collisions are ~n²/65536 per band — rare and
    * benign. Returns (a, b, hamming), a < b. */
  def phashNearDups(docs: DataFrame, tau: Int = 6): DataFrame = {
    val ph = phash64(featureStub(toBinary(docs), d = 64).toDF()
        .select(col("doc_id"), col("feat")))
      .localCheckpoint(true)
    val bands = ph.select(col("doc_id"), explode(array((0 until 4).map(k =>
        struct(lit(k).as("band"), col(s"b$k").as("bval"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bval").as("bval"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    val ha = ph.select((col("doc_id").as("a") +:
      (0 until 4).map(k => col(s"b$k").as(s"xa$k"))): _*)
    val hb = ph.select((col("doc_id").as("b") +:
      (0 until 4).map(k => col(s"b$k").as(s"xb$k"))): _*)
    cand.join(ha, Seq("a")).join(hb, Seq("b"))
      .withColumn("hamming", (0 until 4).map(k =>
        expr(s"bit_count(xa$k ^ xb$k)").cast("long")).reduce(_ + _))
      .where(col("hamming") <= tau)
      .select(col("a"), col("b"), col("hamming"))
  }

  /** Frame-level dedup — the video near-dup signal: frames (fixed-size
    * payload windows, digested by [[frameSample]]) that appear in MORE
    * THAN ONE document, with how many docs/occurrences share them. Two
    * videos sharing a scene collide on its frames even when the
    * surrounding content differs — the frame digest table is the join
    * key, one keyed aggregate over the exploded frames (same shuffle
    * shape as boilerplate-shingle detection, one modality over).
    */
  def frameDups(docs: DataFrame, frameBytes: Int = 200): DataFrame =
    frameSample(docs, frameBytes)
      .groupBy(col("frame_md5"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .where(col("n_docs") >= 2)

  /** Overlapping-window fingerprints — the AUDIO shape (an STFT hop):
    * a window of `win` bytes every `hop` bytes (hop < win ⇒ overlap),
    * each digested. Unlike the contiguous [[frameSample]] frames, a copy
    * SHIFTED by any multiple of `hop` still collides on every interior
    * window — the alignment robustness an audio fingerprinter
    * (chromaprint family) exists for. The md5 digest is the
    * deterministic stand-in for a band-energy/chroma vector (no codecs
    * in this sandbox — see [[decodeStub]]); pure column expressions,
    * one explode, no shuffle. */
  def audioFingerprint(docs: DataFrame, win: Int = 200, hop: Int = 100): DataFrame =
    docs.select(col("doc_id"), col("text"),
        greatest(lit(0L),
          ((length(col("text")) - win) / hop).cast("long")).as("n_win"))
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_win"))).as("win_idx"), col("text"))
      .where(col("win_idx") * hop + win <= length(col("text")))
      .select(col("doc_id"), col("win_idx"),
        (col("win_idx") * hop).as("offset"),
        md5(col("text").substr((col("win_idx") * hop + 1).cast("int"),
          lit(win))).as("fp"))

  /** Audio-style near-dup pairs: docs sharing ≥ minShared distinct
    * window fingerprints. The fingerprint table is the join key — same
    * keyed-aggregate shuffle shape as [[frameDups]], but the overlap
    * makes it catch hop-shifted copies that contiguous frames miss
    * (spec-pinned). */
  def audioDups(docs: DataFrame, win: Int = 200, hop: Int = 100,
      minShared: Long = 3): DataFrame = {
    val f = audioFingerprint(docs, win, hop)
    val a = f.select(col("doc_id").as("doc_a"), col("fp"))
    val b = f.select(col("doc_id").as("doc_b"), col("fp"))
    a.join(b, Seq("fp")).where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(countDistinct(col("fp")).as("shared"))
      .where(col("shared") >= minShared)
  }

  /** Frame sampling: explode each payload into fixed-size "frames" with a
    * per-frame digest — the video-frame-sample shape (one output row per
    * frame, offset metadata carried along). Pure column expressions.
    */
  def frameSample(docs: DataFrame, frameBytes: Int = 200): DataFrame =
    docs.select(col("doc_id"), col("text"),
        (length(col("text")) / frameBytes).cast("long").as("n_full"))
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_full"))).as("frame_idx"),
        col("text"))
      .where(col("frame_idx") * frameBytes < length(col("text")))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * frameBytes).as("offset"),
        md5(col("text").substr((col("frame_idx") * frameBytes + 1).cast("int"),
          lit(frameBytes))).as("frame_md5"))
}
