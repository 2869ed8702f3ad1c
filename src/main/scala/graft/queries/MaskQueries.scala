package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{DistanceOps, MaskOps}

/** Bitset / bitmap mask queries (SURVEY §1.3 / §2.15). The documents
  * table's dense doc_id domain is the bit domain; predicates (lang,
  * n_chars) build the member sets. Every query round-trips through the
  * PACKED representation — the oracle rebuilds the identical uint32
  * words with DuckDB's bigint bit ops, so the hash check covers the
  * packing itself, not just the predicate semantics.
  */
object MaskQueries extends QueryGroup {

  private def dom(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id").as("id"))
  private def langEn(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).where(col("lang") === "en").select(col("doc_id").as("id"))
  private def longDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).where(col("n_chars") >= 400).select(col("doc_id").as("id"))

  val q: Map[String, (SparkSession, String) => DataFrame] = Map(
    // packed words of two predicate bitsets + every word-level op
    "mask_bitset_words" -> ((s, d) => {
      val domain = dom(s, d).localCheckpoint(true)
      // checkpoint the packed forms: each feeds 4 word-level ops below,
      // and a pack is a real keyed aggregate at domain scale
      val a = MaskOps.pack(domain, langEn(s, d)).localCheckpoint(true)
      val b = MaskOps.pack(domain, longDocs(s, d)).localCheckpoint(true)
      val valid = MaskOps.validMask(domain)
      a.select(col("word_idx"), col("bits").as("a_bits"))
        .join(b.select(col("word_idx"), col("bits").as("b_bits")), Seq("word_idx"))
        .join(MaskOps.and(a, b).select(col("word_idx"), col("bits").as("and_bits")), Seq("word_idx"))
        .join(MaskOps.or(a, b).select(col("word_idx"), col("bits").as("or_bits")), Seq("word_idx"))
        .join(MaskOps.xor(a, b).select(col("word_idx"), col("bits").as("xor_bits")), Seq("word_idx"))
        .join(MaskOps.flip(a, valid).select(col("word_idx"), col("bits").as("flip_a")), Seq("word_idx"))
    }),
    // count / sparsity / test summary — all computed FROM the packed form
    "mask_bitset_stats" -> ((s, d) => {
      val domain = dom(s, d).localCheckpoint(true)
      val a = MaskOps.pack(domain, langEn(s, d)).localCheckpoint(true)
      val b = MaskOps.pack(domain, longDocs(s, d))
      val n = domain.agg(count(lit(1)).as("n_bits"))
      val aC = MaskOps.count(a).select(col("n_set").as("a_count"))
      val bC = MaskOps.count(b).select(col("n_set").as("b_count"))
      val andC = MaskOps.count(MaskOps.and(a, b)).select(col("n_set").as("and_count"))
      val flipC = MaskOps.count(MaskOps.flip(a, MaskOps.validMask(domain)))
        .select(col("n_set").as("flip_a_count"))
      // test() probes ids 0..49 against the packed A mask
      val probes = domain.where(col("id") < 50)
      val tC = MaskOps.test(probes, a).agg(sum(col("is_set")).cast("long").as("probe_hits"))
      n.crossJoin(aC).crossJoin(bC).crossJoin(andC).crossJoin(flipC).crossJoin(tC)
        .select(col("n_bits"), col("a_count"), col("b_count"), col("and_count"),
          col("flip_a_count"), col("probe_hits"),
          (round(lit(1.0) - col("a_count").cast("double") / col("n_bits").cast("double"), 6) + 0.0).as("a_sparsity"))
    }),
    // 2-D bitmap over a (supplier mod 50) × (part mod 32) grid, packed
    // then exploded back to COO — the bitmap_view::to_csr round trip
    "mask_bitmap_coo" -> ((s, d) => {
      val cols = 32
      val cells = Tables.lineitem(s, d)
        .select(((col("l_suppkey") % 50) * cols + (col("l_partkey") % cols)).as("id"))
        .distinct()
      val bm = MaskOps.pack(cells, cells)
      MaskOps.bitmapToCoo(bm, cols)
    }),
    // brute-force kNN where the candidate set is restricted by a PACKED
    // bitset probe (prefiltered search): the filter is applied by testing
    // the mask words, not by re-evaluating the predicate
    "mask_prefiltered_knn" -> ((s, d) => {
      val vec = Tables.vectors(s, d).localCheckpoint(true)
      val ids = vec.select(col("id"))
      val mask = MaskOps.pack(ids, vec.where(col("label") % 2 === 0).select(col("id")))
      val allowed = MaskOps.test(ids, mask).where(col("is_set") === 1).select(col("id"))
      val cand = allowed.join(vec, Seq("id"))
        .select(col("id").as("dst"), col("vec").as("vb"))
      val qs = vec.where(col("id") < 20).select(col("id").as("src"), col("vec").as("va"))
      val w = Window.partitionBy(col("src")).orderBy(col("d2").asc, col("dst").asc)
      qs.join(cand, col("src") =!= col("dst"))
        .select(col("src"), col("dst"),
          DistanceOps.l2sq(col("va"), col("vb")).as("d2"))
        .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
        .select(col("src"), col("dst"), (round(sqrt(col("d2")), 4) + 0.0).as("dist"), col("rnk"))
    }),
  )

  private val foldL2sq =
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(list_zip(va, vb), p -> (p[1] - p[2]) * (p[1] - p[2]))), (s, x) -> s + x)"

  // DuckDB mirrors: identical uint32 packing with bigint bit arithmetic
  // (doc_id dense 0..n-1 → every word has a domain bit, so the DISTINCT
  // word list is the dense word domain on both engines).
  private val packCte =
    """WITH w AS (SELECT DISTINCT doc_id // 32 AS word_idx FROM documents),
      |a0 AS (SELECT doc_id // 32 AS word_idx,
      |         bit_or(CAST(1 AS BIGINT) << CAST(doc_id % 32 AS INT)) AS bits
      |       FROM documents WHERE lang = 'en' GROUP BY 1),
      |b0 AS (SELECT doc_id // 32 AS word_idx,
      |         bit_or(CAST(1 AS BIGINT) << CAST(doc_id % 32 AS INT)) AS bits
      |       FROM documents WHERE n_chars >= 400 GROUP BY 1),
      |v AS (SELECT doc_id // 32 AS word_idx,
      |         bit_or(CAST(1 AS BIGINT) << CAST(doc_id % 32 AS INT)) AS bits
      |       FROM documents GROUP BY 1),
      |a AS (SELECT w.word_idx, coalesce(a0.bits, 0) AS bits FROM w LEFT JOIN a0 USING (word_idx)),
      |b AS (SELECT w.word_idx, coalesce(b0.bits, 0) AS bits FROM w LEFT JOIN b0 USING (word_idx))
      |""".stripMargin

  val sql: Map[String, String] = Map(
    "mask_bitset_words" -> (packCte +
      """SELECT a.word_idx, a.bits AS a_bits, b.bits AS b_bits,
        |  a.bits & b.bits AS and_bits, a.bits | b.bits AS or_bits,
        |  xor(a.bits, b.bits) AS xor_bits, (~a.bits) & v.bits AS flip_a
        |FROM a JOIN b USING (word_idx) JOIN v USING (word_idx)""".stripMargin),
    "mask_bitset_stats" -> (packCte +
      """SELECT (SELECT count(*) FROM documents) AS n_bits,
        |  (SELECT CAST(sum(bit_count(bits)) AS BIGINT) FROM a) AS a_count,
        |  (SELECT CAST(sum(bit_count(bits)) AS BIGINT) FROM b) AS b_count,
        |  (SELECT CAST(sum(bit_count(a.bits & b.bits)) AS BIGINT) FROM a JOIN b USING (word_idx)) AS and_count,
        |  (SELECT CAST(sum(bit_count((~a.bits) & v.bits)) AS BIGINT) FROM a JOIN v USING (word_idx)) AS flip_a_count,
        |  (SELECT CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |     FROM documents WHERE doc_id < 50) AS probe_hits,
        |  round(1.0 - (SELECT CAST(sum(bit_count(bits)) AS BIGINT) FROM a) /
        |        CAST((SELECT count(*) FROM documents) AS DOUBLE), 6) + 0.0 AS a_sparsity""".stripMargin),
    "mask_bitmap_coo" ->
      """SELECT DISTINCT (l_suppkey % 50) AS r, (l_partkey % 32) AS c
        |FROM lineitem""".stripMargin,
    "mask_prefiltered_knn" ->
      s"""WITH v AS (SELECT vec_id AS id,
         |  list_transform(embedding, f -> CAST(f AS DOUBLE)) AS vec, label FROM embeddings),
         |p AS (
         |  SELECT q.id AS src, c.id AS dst, q.vec AS va, c.vec AS vb
         |  FROM v q JOIN v c ON q.id < 20 AND c.label % 2 = 0 AND c.id <> q.id),
         |r AS (
         |  SELECT src, dst, $foldL2sq AS d2 FROM p),
         |k AS (
         |  SELECT src, dst, d2,
         |    row_number() OVER (PARTITION BY src ORDER BY d2, dst) AS rnk FROM r)
         |SELECT src, dst, round(sqrt(d2), 4) + 0.0 AS dist, rnk
         |FROM k WHERE rnk <= 5""".stripMargin,
  )
}
