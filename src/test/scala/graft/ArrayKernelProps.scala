package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.{ArrayDot, ArrayL2Sq, ArrayNormSq}

/** Property tests for the fused-kernel Expression family: the interpreted
  * eval must equal the strict left fold it documents, bit for bit, for
  * arbitrary lane data — including unequal lengths (min-length stop) and
  * denormal/large magnitudes. (Codegen-vs-interpreted identity is covered
  * by ExtensionsSpec through a live session; these pin the SEMANTICS with
  * ScalaCheck's coverage instead of fixed examples.)
  */
object ArrayKernelProps extends Properties("ArrayKernels") {

  private def arrLit(a: Array[Double]) =
    Literal(ArrayData.toArrayData(a), ArrayType(DoubleType))

  private val lane = Gen.oneOf(
    Gen.chooseNum(-1e6, 1e6),
    Gen.chooseNum(-1.0, 1.0),
    Gen.oneOf(0.0, -0.0, 1e-300, -1e-300, 1e300))
  private val arr: Gen[Array[Double]] =
    Gen.choose(0, 40).flatMap(n => Gen.containerOfN[Array, Double](n, lane))

  property("dot = strict left fold over min length") = forAll(arr, arr) {
    (a: Array[Double], b: Array[Double]) =>
      val n = math.min(a.length, b.length)
      var s = 0.0; var i = 0
      while (i < n) { s += a(i) * b(i); i += 1 }
      val got = ArrayDot(arrLit(a), arrLit(b)).eval(null).asInstanceOf[Double]
      Prop(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(s)) :| s"got $got want $s"
  }

  property("normsq = strict left fold of squares") = forAll(arr) {
    (a: Array[Double]) =>
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * a(i); i += 1 }
      val got = ArrayNormSq(arrLit(a)).eval(null).asInstanceOf[Double]
      Prop(java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(s)) :| s"got $got want $s"
  }

  property("l2sq = strict left fold of squared diffs over min length") =
    forAll(arr, arr) { (a: Array[Double], b: Array[Double]) =>
      val n = math.min(a.length, b.length)
      var s = 0.0; var i = 0
      while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
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
}
