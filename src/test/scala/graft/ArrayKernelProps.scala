package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.{ArrayDot, ArrayL2Sq, ArrayNormSq}

/** Property tests for the fused-kernel Expression family: the interpreted
  * eval must equal the HOF form it replaces — the strict left fold, bit for
  * bit, on equal-length non-null lanes; null on a length mismatch (zip_with
  * null-pads the shorter side, poisoning the fold) and on any null lane —
  * for arbitrary lane data including denormal/large magnitudes. (Codegen-
  * vs-interpreted identity is covered by ExtensionsSpec through a live
  * session; these pin the SEMANTICS with ScalaCheck's coverage instead of
  * fixed examples.)
  */
object ArrayKernelProps extends Properties("ArrayKernels") {

  private def arrLit(a: Array[Double]) =
    Literal(ArrayData.toArrayData(a), ArrayType(DoubleType))

  // array with possibly-null lanes, typed as containsNull = true
  private def raggedLit(a: Array[java.lang.Double]) =
    Literal(ArrayData.toArrayData(a.map(v => if (v == null) null else v.doubleValue(): Any)),
      ArrayType(DoubleType, containsNull = true))

  private val lane = Gen.oneOf(
    Gen.chooseNum(-1e6, 1e6),
    Gen.chooseNum(-1.0, 1.0),
    Gen.oneOf(0.0, -0.0, 1e-300, -1e-300, 1e300))
  private val arr: Gen[Array[Double]] =
    Gen.choose(0, 40).flatMap(n => Gen.containerOfN[Array, Double](n, lane))

  property("dot = strict left fold on equal lengths") = forAll(arr) {
    (a: Array[Double]) =>
      val b = a.map(v => v * 0.5 - 1.0)
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      val got = ArrayDot(arrLit(a), arrLit(b)).eval(null).asInstanceOf[Double]
      Prop(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(s)) :| s"got $got want $s"
  }

  property("dot/l2sq = null on length mismatch (zip_with null-pad semantics)") =
    forAll(arr, arr) { (a: Array[Double], b: Array[Double]) =>
      (a.length != b.length) ==> {
        val d = ArrayDot(arrLit(a), arrLit(b)).eval(null)
        val l = ArrayL2Sq(arrLit(a), arrLit(b)).eval(null)
        Prop(d == null && l == null) :| s"dot=$d l2sq=$l for ${a.length}x${b.length}"
      }
    }

  property("null lane poisons all three kernels") = forAll(arr, Gen.choose(0, 39)) {
    (a: Array[Double], k: Int) =>
      (a.length > 0) ==> {
        val boxed: Array[java.lang.Double] = a.map(java.lang.Double.valueOf)
        boxed(k % a.length) = null
        val r = raggedLit(boxed)
        val clean = arrLit(a)
        Prop(ArrayDot(r, clean).eval(null) == null &&
          ArrayDot(clean, r).eval(null) == null &&
          ArrayL2Sq(r, clean).eval(null) == null &&
          ArrayNormSq(r).eval(null) == null) :| "expected null results"
      }
  }

  property("normsq = strict left fold of squares") = forAll(arr) {
    (a: Array[Double]) =>
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * a(i); i += 1 }
      val got = ArrayNormSq(arrLit(a)).eval(null).asInstanceOf[Double]
      Prop(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(s)) :| s"got $got want $s"
  }

  property("l2sq = strict left fold of squared diffs on equal lengths") =
    forAll(arr) { (a: Array[Double]) =>
      val b = a.map(v => v + 0.25)
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      val got = ArrayL2Sq(arrLit(a), arrLit(b)).eval(null).asInstanceOf[Double]
      Prop(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(s)) :| s"got $got want $s"
    }

  property("l2sq(a, a) is exactly zero") = forAll(arr) { (a: Array[Double]) =>
    ArrayL2Sq(arrLit(a), arrLit(a)).eval(null).asInstanceOf[Double] == 0.0
  }

  property("dot(a, a) = normsq(a)") = forAll(arr) { (a: Array[Double]) =>
    val d = ArrayDot(arrLit(a), arrLit(a)).eval(null).asInstanceOf[Double]
    val n = ArrayNormSq(arrLit(a)).eval(null).asInstanceOf[Double]
    java.lang.Double.doubleToLongBits(d) == java.lang.Double.doubleToLongBits(n)
  }

  // ---- ArrayLaneMetric: each op vs its strict-left-fold reference ----

  import graft.functions.ArrayLaneMetric

  private def refFold(op: String, a: Array[Double], b: Array[Double]): Any = op match {
    case "l1" => a.indices.foldLeft(0.0)((s, i) => s + math.abs(a(i) - b(i)))
    case "linf" =>
      if (a.isEmpty) null
      else a.indices.map(i => math.abs(a(i) - b(i))).reduceLeft(math.max)
    case "canberra" => a.indices.foldLeft(0.0) { (s, i) =>
      val den = math.abs(a(i)) + math.abs(b(i))
      s + (if (den != 0.0) math.abs(a(i) - b(i)) / den else 0.0)
    }
    case "mink3" => a.indices.foldLeft(0.0) { (s, i) =>
      val d = math.abs(a(i) - b(i)); s + d * d * d
    }
    case "hamming" => a.indices.count(i => a(i) != b(i)).toDouble
    case "abssum" => a.indices.foldLeft(0.0)((s, i) => s + math.abs(a(i) + b(i)))
  }

  property("ArrayLaneMetric ops = strict left folds on equal lengths") =
    forAll(arr, Gen.oneOf(ArrayLaneMetric.ops.toSeq)) { (a: Array[Double], op: String) =>
      val b = a.map(v => if (v > 0) v * 0.75 - 2.0 else v)
      val got = ArrayLaneMetric(arrLit(a), arrLit(b), op).eval(null)
      val want = refFold(op, a, b)
      val eq = (got, want) match {
        case (null, null) => true
        case (g: java.lang.Double, w: Double) =>
          java.lang.Double.doubleToLongBits(g) == java.lang.Double.doubleToLongBits(w)
        case _ => false
      }
      Prop(eq) :| s"op=$op got $got want $want"
    }

  property("ArrayLaneMetric: null on length mismatch and on null lanes") =
    forAll(arr, arr, Gen.oneOf(ArrayLaneMetric.ops.toSeq), Gen.choose(0, 39)) {
      (a: Array[Double], b: Array[Double], op: String, k: Int) =>
        val mismatch = if (a.length != b.length)
          ArrayLaneMetric(arrLit(a), arrLit(b), op).eval(null) == null else true
        val poisoned = if (a.nonEmpty) {
          val boxed: Array[java.lang.Double] = a.map(java.lang.Double.valueOf)
          boxed(k % a.length) = null
          ArrayLaneMetric(raggedLit(boxed), arrLit(a), op).eval(null) == null
        } else true
        Prop(mismatch && poisoned) :| s"op=$op mismatch=$mismatch poisoned=$poisoned"
    }

  property("ArrayLaneMetric identities: m(a,a) for the difference metrics") =
    forAll(arr) { (a: Array[Double]) =>
      val zero = Seq("l1", "canberra", "mink3", "hamming").forall(op =>
        ArrayLaneMetric(arrLit(a), arrLit(a), op).eval(null) == 0.0)
      val linfOk =
        if (a.isEmpty) ArrayLaneMetric(arrLit(a), arrLit(a), "linf").eval(null) == null
        else ArrayLaneMetric(arrLit(a), arrLit(a), "linf").eval(null) == 0.0
      Prop(zero && linfOk)
    }

  // the reference bucketing the SQL oracles replay: exact bit-length
  // exponent + floor-divide mantissa, on plain Longs
  private def hdrRef(v: Long): Long =
    if (v < 32L) v
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      // mirror the declarative/oracle form: v div 2^(e-5) via exact
      // double power (e-5 <= 58 so the power is exactly representable)
      (e - 5 + 1).toLong * 32L + (v / math.pow(2.0, e - 5).toLong) - 32L
    }

  private val nonNeg: Gen[Long] = Gen.oneOf(
    Gen.chooseNum(0L, 64L),
    Gen.chooseNum(0L, 1L << 20),
    Gen.chooseNum(0L, Long.MaxValue),
    Gen.oneOf(0L, 31L, 32L, 33L, 63L, 64L, (1L << 62) - 1, 1L << 62, Long.MaxValue))

  property("HdrBucket = the declarative bit-length form on all v >= 0") =
    forAll(nonNeg) { (v: Long) =>
      val got = graft.functions.HdrBucket(Literal(v)).eval(null).asInstanceOf[Long]
      Prop(got == hdrRef(v)) :| s"v=$v got $got want ${hdrRef(v)}"
    }

  property("HdrBucket lower bound brackets v within 1/32 relative width") =
    forAll(nonNeg) { (v: Long) =>
      val b = graft.functions.HdrBucket(Literal(v)).eval(null).asInstanceOf[Long]
      val lo = if (b < 32L) b else (b % 32L + 32L) << (b / 32L - 1).toInt
      val width = if (b < 32L) 1L else 1L << (b / 32L - 1).toInt
      Prop(lo <= v && (v - lo) < width) :| s"v=$v bucket=$b lo=$lo width=$width"
    }

  property("HdrBucket is null on negative input") = forAll(Gen.chooseNum(Long.MinValue, -1L)) {
    (v: Long) => graft.functions.HdrBucket(Literal(v)).eval(null) == null
  }
}
