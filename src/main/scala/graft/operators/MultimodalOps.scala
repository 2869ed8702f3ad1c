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
