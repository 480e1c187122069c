package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.MomentMatrixAgg

/** [[MomentMatrixAgg]] internals: the scale-by-10⁶ rounding must equal
  * Spark's `cast(double as decimal(18,6))` (shortest-repr HALF_UP, null
  * on NaN/Inf/overflow) bit-for-bit — including the fast path's error
  * band — and the 128-bit accumulator must add exactly across sign
  * changes and beyond Long range. The end-to-end distributed equivalence
  * is PcaSpec's naive-evaluator test. */
class MomentMatrixAggSpec extends AnyFunSuite {

  /** Reference: exactly the Cast path ([[org.apache.spark.sql.types.Decimal]]
    * routes double through BigDecimal.valueOf = shortest repr). */
  private def castRef(x: Double): Option[Long] = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return None
    val bd = JBigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP)
    if (bd.abs.compareTo(new JBigDecimal("999999999999.999999")) > 0) None
    else Some(bd.movePointRight(6).longValueExact())
  }

  private def got(x: Double): Option[Long] = {
    val v = MomentMatrixAgg.scale6(x)
    if (v == MomentMatrixAgg.SKIP) None else Some(v)
  }

  test("scale6 equals the decimal(18,6) cast on adversarial and random values") {
    val adversarial = Seq(
      0.0, -0.0, 1.0, -1.0, 0.5e-6, -0.5e-6, 1.5e-6, 2.5e-6,
      0.1234565, -0.1234565, 0.12345649999999999, 0.1234575,
      // exact .5 ulp-neighborhood probes
      0.0000005, 0.0000015, -0.0000025, 123.4567895, -123.4567885,
      // overflow band
      999999999999.999998, 999999999999.9999995, 1e12, -1e12, 1e13,
      // non-finite
      Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      // denormal / tiny
      Double.MinPositiveValue, 4.9e-7, 5.1e-7)
    adversarial.foreach { x =>
      assert(got(x) == castRef(x), s"scale6($x)")
    }
    val rnd = new scala.util.Random(42)
    (1 to 200000).foreach { _ =>
      val x = (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(16) - 7)
      assert(got(x) == castRef(x), s"scale6($x)")
    }
    // products of float pairs — the actual input distribution
    (1 to 100000).foreach { _ =>
      val a = rnd.nextFloat() * 4f - 2f
      val b = rnd.nextFloat() * 4f - 2f
      val x = a.toDouble * b.toDouble
      assert(got(x) == castRef(x), s"scale6($a*$b)")
    }
  }

  test("128-bit accumulator is exact across signs and beyond Long range") {
    val buf = new MomentMatrixAgg.Buffer(0, 0L, null, null)
    buf.alloc(1) // 2 cells
    var ref = BigInt(0)
    val rnd = new scala.util.Random(7)
    (1 to 10000).foreach { _ =>
      val v = rnd.nextLong() / 2 // avoid the SKIP sentinel
      buf.add(0, v)
      ref += v
    }
    // push past Long range deliberately
    (1 to 200).foreach { _ =>
      val v = Long.MaxValue / 2
      buf.add(0, v)
      ref += v
    }
    assert(BigInt(MomentMatrixAgg.toBigInt(buf.hi(0), buf.lo(0))) == ref)

    // merge path (add128): split the same stream across two buffers
    val b1 = new MomentMatrixAgg.Buffer(0, 0L, null, null); b1.alloc(1)
    val b2 = new MomentMatrixAgg.Buffer(0, 0L, null, null); b2.alloc(1)
    var ref2 = BigInt(0)
    (1 to 5000).foreach { i =>
      val v = rnd.nextLong() / 2
      (if (i % 2 == 0) b1 else b2).add(0, v)
      ref2 += v
    }
    b1.add128(0, b2.hi(0), b2.lo(0))
    assert(BigInt(MomentMatrixAgg.toBigInt(b1.hi(0), b1.lo(0))) == ref2)
  }
}
