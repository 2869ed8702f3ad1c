package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MaskOps

/** Packed-bitset invariants beyond the word-hash oracle: round trips
  * through the packed form, De Morgan across the ops, and the dense-word
  * contract (all-zero words present; flip confined to valid bits). */
class MaskSpec extends AnyFunSuite {
  import TestSpark._

  private def ids(xs: Seq[Long]) = {
    import spark.implicits._
    xs.toDF("id")
  }

  private val n = 70L // 3 words, partial tail (70 % 32 = 6 valid tail bits)
  private def domain = ids(0L until n)

  test("pack -> test round-trips the member set; zero words are present") {
    val members = ids(Seq(0L, 31L, 32L, 63L, 69L))
    val bs = MaskOps.pack(domain, members)
    assert(bs.count() === 3, "dense word rows incl. all-zero words")
    val back = MaskOps.test(domain, bs).where(col("is_set") === 1)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(back === members.collect().map(_.getLong(0)).toSet)
    assert(MaskOps.count(bs).head().getLong(0) === 5L)
  }

  test("flip stays inside valid bits; count(flip) = n - count") {
    val members = ids(Seq(1L, 5L, 64L, 65L))
    val bs = MaskOps.pack(domain, members)
    val valid = MaskOps.validMask(domain)
    val fl = MaskOps.flip(bs, valid)
    assert(MaskOps.count(fl).head().getLong(0) === n - 4)
    // no bit beyond id 69 is set anywhere in the flipped mask
    val stray = MaskOps.bitmapToCoo(
      fl.select(col("word_idx"), col("bits")), 1)
      .where(col("r") >= n).count()
    assert(stray === 0, "flip must not set bits past the domain tail")
  }

  test("De Morgan: ~(a & b) = ~a | ~b within the valid mask") {
    val a = MaskOps.pack(domain, ids(Seq(0L, 2L, 33L, 64L)))
    val b = MaskOps.pack(domain, ids(Seq(2L, 3L, 33L, 69L)))
    val valid = MaskOps.validMask(domain)
    val lhs = MaskOps.flip(MaskOps.and(a, b), valid)
    val rhs = MaskOps.or(MaskOps.flip(a, valid), MaskOps.flip(b, valid))
    assert(lhs.except(rhs).count() === 0 && rhs.except(lhs).count() === 0)
  }

  test("repeat tiles a whole-word bitset into a bitmap row-by-row") {
    val cols = 64 // 2 whole words per row
    val members = ids(Seq(0L, 33L, 63L))
    val bs = MaskOps.pack(ids(0L until cols.toLong), members)
    val bm = MaskOps.repeat(bs, 3)
    assert(bm.count() === 6)
    val coo = MaskOps.bitmapToCoo(bm, cols).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 3L).flatMap(r => Seq((r, 0L), (r, 33L), (r, 63L))).toSet
    assert(coo === want)
  }

  test("bitmapToCoo explodes exactly the packed (r,c) cells") {
    val cols = 32
    val cells = Seq((0L, 0L), (0L, 31L), (3L, 7L), (5L, 5L))
    val idx = ids(cells.map { case (r, c) => r * cols + c })
    val bm = MaskOps.pack(idx, idx)
    val out = MaskOps.bitmapToCoo(bm, cols).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === cells.toSet)
  }
}
