package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Fp16

/** binary16 storage-lane spec (VERDICT r12 item 7). The conversion pair is
  * pinned EXHAUSTIVELY: every one of the 65536 half bit patterns
  * round-trips identically, and every adjacent finite pair's midpoint
  * resolves by round-half-even (the complete RNE contract — Java 17 has no
  * Float.floatToFloat16 to cross-check against, so the spec IS the
  * reference; Java 20+ semantics replicated).
  */
class Fp16Spec extends AnyFunSuite {

  test("half -> float -> half is the identity on all 65536 bit patterns") {
    var b = 0
    while (b < 65536) {
      val h = b.toShort
      val e = (b >> 10) & 0x1f
      val m = b & 0x3ff
      val f = Fp16.halfToFloat(h)
      if (e == 31 && m != 0) {
        assert(java.lang.Float.isNaN(f), s"bits $b must decode to NaN")
        assert((Fp16.floatToHalf(f) & 0x7c00) == 0x7c00 &&
          (Fp16.floatToHalf(f) & 0x3ff) != 0, s"bits $b: NaN must re-encode NaN")
      } else {
        assert((Fp16.floatToHalf(f) & 0xffff) == b,
          s"bits $b ($f) re-encoded to ${Fp16.floatToHalf(f) & 0xffff}")
      }
      b += 1
    }
  }

  test("round-to-nearest-even at every adjacent finite half midpoint, both signs") {
    // positive finite patterns 0x0000..0x7bfe pair with +1; negative
    // 0x8000..0xfbfe likewise (negative patterns order by magnitude)
    for (base <- Seq(0x0000, 0x8000)) {
      var b = base
      while (b < base + 0x7bff) {
        val a = Fp16.halfToFloat(b.toShort)
        val c = Fp16.halfToFloat((b + 1).toShort)
        val mid = (a.toDouble + c.toDouble) / 2.0
        val midF = mid.toFloat
        assert(midF.toDouble == mid, s"midpoint of $b/${b + 1} not float-exact")
        val even = if ((b & 1) == 0) b else b + 1
        assert((Fp16.floatToHalf(midF) & 0xffff) == even,
          s"tie $midF between $b and ${b + 1} must go to even $even")
        // numeric nextUp moves toward +∞: for negative patterns that is
        // the SMALLER-magnitude neighbor (pattern b), for positive the
        // larger (pattern b+1)
        val (above, below) = if (base == 0) (b + 1, b) else (b, b + 1)
        assert((Fp16.floatToHalf(Math.nextUp(midF)) & 0xffff) == above,
          s"just above the $b/${b + 1} midpoint must round to $above")
        assert((Fp16.floatToHalf(Math.nextDown(midF)) & 0xffff) == below,
          s"just below the $b/${b + 1} midpoint must round to $below")
        b += 1
      }
    }
  }

  test("overflow, infinity, NaN, signed zero edges") {
    assert((Fp16.floatToHalf(65520f) & 0xffff) == 0x7c00,
      "65520 ties at the overflow boundary and goes to Inf (even)")
    assert((Fp16.floatToHalf(Math.nextDown(65520f)) & 0xffff) == 0x7bff)
    assert((Fp16.floatToHalf(65504f) & 0xffff) == 0x7bff)
    assert((Fp16.floatToHalf(1e30f) & 0xffff) == 0x7c00)
    assert((Fp16.floatToHalf(-1e30f) & 0xffff) == 0xfc00)
    assert((Fp16.floatToHalf(Float.PositiveInfinity) & 0xffff) == 0x7c00)
    assert((Fp16.floatToHalf(Float.NegativeInfinity) & 0xffff) == 0xfc00)
    val nan = Fp16.floatToHalf(Float.NaN)
    assert((nan & 0x7c00) == 0x7c00 && (nan & 0x3ff) != 0)
    assert((Fp16.floatToHalf(0.0f) & 0xffff) == 0x0000)
    assert((Fp16.floatToHalf(-0.0f) & 0xffff) == 0x8000)
    // underflow: |x| < 2^-25 → ±0; the 2^-25 tie itself is even → 0
    assert((Fp16.floatToHalf(math.pow(2, -25).toFloat) & 0xffff) == 0x0000)
    assert((Fp16.floatToHalf(Math.nextUp(math.pow(2, -25).toFloat)) & 0xffff) == 0x0001)
    assert((Fp16.floatToHalf(-math.pow(2, -25).toFloat) & 0xffff) == 0x8000)
  }

  test("half bits survive a parquet SHORT round trip and decode losslessly") {
    val s = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("fp16rt").toString
    val src = Tables.embeddings(s, TestSpark.sf).where(col("vec_id") < 50)
      .select(col("vec_id").as("id"), posexplode(col("embedding")).as(Seq("pos", "x")))
    src.select(col("id"), col("pos"), Fp16.toHalf(col("x")).as("h"))
      .write.mode("overwrite").parquet(dir)
    val schema = s.read.parquet(dir).schema("h").dataType
    assert(schema == org.apache.spark.sql.types.ShortType,
      s"half bits must store as SHORT, got $schema")
    // decode(read(parquet)) == decode(encode(x)) computed fresh — and the
    // codegen path (DataFrame) agrees with the direct JVM calls
    val back = s.read.parquet(dir)
      .select(col("id"), col("pos"), Fp16.fromHalf(col("h")).as("y"))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getFloat(2))).toMap
    val fresh = src.collect().map(r =>
      ((r.getLong(0), r.getInt(1)),
        Fp16.halfToFloat(Fp16.floatToHalf(r.getFloat(2))))).toMap
    assert(back.size == fresh.size && back.nonEmpty)
    fresh.foreach { case (k, v) =>
      assert(java.lang.Float.floatToRawIntBits(back(k)) ==
        java.lang.Float.floatToRawIntBits(v), s"parquet round-trip differs at $k")
    }
  }
}
