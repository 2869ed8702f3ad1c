package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bitset / bitmap masks over a dense id domain — SURVEY §1.3.
  *
  * The reference keeps row/sample masks as packed bit vectors
  * (reference: cpp/include/raft/core/bitset.hpp:76 `test`, :90 `set`,
  * :124 `count`, :174 `sparsity`, :385 `flip`; default word type is
  * uint32_t) plus a 2-D bitmap view over rows×cols
  * (core/bitmap.hpp:34) with CSR explosion (bitset.hpp:260,
  * bitmap.hpp:145 `to_csr`). The Spark realization packs a predicate
  * over a dense id domain `0..n-1` into one row per 32-bit word —
  * `(word_idx BIGINT, bits BIGINT)`, the BIGINT holding an unsigned
  * uint32 pattern so shifts never touch the sign bit on either engine —
  * and every mask op is a word-level relational expression:
  *
  *   - pack: one keyed `bit_or` aggregate (map-side combined),
  *   - flip: `~bits` masked to the domain's valid bits,
  *   - and/or/xor: word-indexed equi-joins,
  *   - count/sparsity: `sum(bit_count(bits))`,
  *   - test: a word-addressed probe join,
  *   - to_coo (bitmap→COO, the to_csr analog): a 32-lane explosion.
  *
  * Word rows are derived from the id domain itself (ids are dense
  * 0..n-1 in the testdata tables), so the packed form is dense,
  * all-zero words included — exactly the reference's owning bitset,
  * and the packed DOMAIN doubles as the valid-bit mask for flip.
  *
  * Scale: an n-bit mask is n/32 rows (~0.4 GB of rows per 10^11 ids —
  * trivially broadcastable for any dimension table, one small shuffle
  * otherwise); a packed mask of a filtered candidate set broadcast-joins
  * against a big probe side, which is the prefiltered-ANN path.
  */
object MaskOps {
  val WordBits = 32

  // exact integer division (the / Column operator is double math, which
  // would silently round word indexes past 2^53 ids)
  private def wordOf: Column = expr(s"id div $WordBits")
  private def bitOf: Column =
    expr(s"shiftleft(CAST(1 AS BIGINT), CAST(id % $WordBits AS INT))")

  /** Pack `members.id` into a dense bitset over `domain.id` (both dense
    * 0..n-1 id frames). One row per word of the domain; words with no
    * member bit are present with bits = 0. */
  def pack(domain: DataFrame, members: DataFrame): DataFrame = {
    val words = domain.select(wordOf.as("word_idx")).distinct()
    val set = members
      .select(wordOf.as("word_idx"), bitOf.as("bit"))
      .groupBy(col("word_idx")).agg(expr("bit_or(bit)").as("mb"))
    words.join(set, Seq("word_idx"), "left")
      .select(col("word_idx"), coalesce(col("mb"), lit(0L)).as("bits"))
  }

  /** Valid-bit mask of a domain = the domain packed over itself
    * (all-ones words, partial tail word). */
  def validMask(domain: DataFrame): DataFrame = pack(domain, domain)

  /** flip (bitset.hpp:385): complement within the domain's valid bits. */
  def flip(bs: DataFrame, valid: DataFrame): DataFrame =
    bs.join(valid.select(col("word_idx"), col("bits").as("vbits")), Seq("word_idx"))
      .select(col("word_idx"), expr("~bits & vbits").as("bits"))

  /** Word-wise binary op between two packed bitsets (same domain). */
  private def zipWords(a: DataFrame, b: DataFrame, f: (Column, Column) => Column): DataFrame =
    a.select(col("word_idx"), col("bits").as("ab"))
      .join(b.select(col("word_idx"), col("bits").as("bb")), Seq("word_idx"))
      .select(col("word_idx"), f(col("ab"), col("bb")).as("bits"))

  def and(a: DataFrame, b: DataFrame): DataFrame = zipWords(a, b, _.bitwiseAND(_))
  def or(a: DataFrame, b: DataFrame): DataFrame  = zipWords(a, b, _.bitwiseOR(_))
  def xor(a: DataFrame, b: DataFrame): DataFrame = zipWords(a, b, _.bitwiseXOR(_))

  /** count (bitset.hpp:124): number of set bits. One-row frame (n_set). */
  def count(bs: DataFrame): DataFrame =
    bs.agg(coalesce(sum(expr("bit_count(bits)")), lit(0L)).as("n_set"))

  /** test (bitset.hpp:76): probe membership of `probes.id` against the
    * packed mask — a word-addressed join, no re-evaluation of the
    * predicate that built the mask. Returns (id, is_set 0/1). */
  def test(probes: DataFrame, bs: DataFrame): DataFrame =
    probes.select(col("id"), wordOf.as("word_idx"))
      .join(bs, Seq("word_idx"))
      .select(col("id"),
        expr(s"CAST((bits & shiftleft(CAST(1 AS BIGINT), CAST(id % $WordBits AS INT))) <> 0 AS INT)").as("is_set"))

  /** repeat (bitset.hpp:160): tile one packed bitset into `times` rows of
    * a bitmap — the shape prefiltered search uses when ONE column mask
    * applies to every query row. Requires the bitset length to be a
    * multiple of 32 (the reference's repeat has the same whole-word
    * contract); the output bitmap's row stride is the bitset's word
    * count. */
  def repeat(bs: DataFrame, times: Long): DataFrame = {
    val spark = bs.sparkSession
    val nWords = bs.count()
    spark.range(times).select(col("id").as("r"))
      .crossJoin(bs)
      .select((col("r") * nWords + col("word_idx")).as("word_idx"), col("bits"))
  }

  /** Bitmap (r,c grid packed over idx = r*cols + c) exploded back to COO
    * coordinates — the to_csr analog (bitmap.hpp:145): each word emits
    * its set lanes. */
  def bitmapToCoo(bm: DataFrame, cols: Int): DataFrame =
    bm.where(col("bits") =!= 0L)
      .select(explode(expr(
        s"filter(transform(sequence(0, ${WordBits - 1}), " +
          s"p -> CASE WHEN (bits & shiftleft(CAST(1 AS BIGINT), p)) <> 0 " +
          s"THEN word_idx * $WordBits + p END), x -> x IS NOT NULL)")).as("idx"))
      .select(expr(s"idx div $cols").as("r"), (col("idx") % cols).as("c"))
}
