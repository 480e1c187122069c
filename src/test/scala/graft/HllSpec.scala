package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.GraftFunctions
import graft.functions.TextFunctions

/** The HLL register-vector aggregate: register math vs a naive in-memory
  * build, merge-by-max losslessness, bounded state, and the SQL path. */
class HllSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  /** The naive single-machine register build the distributed aggregate
    * must match bit-for-bit: md5-60-bit hash, top-6 bits pick the
    * register, rho = first-1-bit position in the 54-bit tail. */
  private def naiveRegisters(values: Seq[String], b: Int = 6): Array[Int] = {
    val m = 1 << b
    val wBits = 60 - b
    val regs = new Array[Int](m)
    values.foreach { v =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.take(15), 16)
      val j = (h >>> wBits).toInt
      val w = h & ((1L << wBits) - 1)
      val rho = if (w == 0L) wBits + 1
        else java.lang.Long.numberOfLeadingZeros(w) - (63 - wBits)
      if (rho > regs(j)) regs(j) = rho
    }
    regs
  }

  private def df(n: Int) =
    (1 to n).map(i => s"val$i").toDF("s")
      .select(col("s"), TextFunctions.md5Long(col("s")).as("h"))
      .repartition(7) // multiple partials so merge() runs

  test("register vector equals the naive in-memory build") {
    val got = df(5000).agg(GraftFunctions.hllRegisters($"h", 6)).first()
      .getSeq[Int](0)
    val want = naiveRegisters((1 to 5000).map(i => s"val$i")).toSeq
    assert(got == want)
  }

  test("union of sketches == sketch of union (merge-by-max is lossless)") {
    val d = df(4000).withColumn("half", pmod(length($"s"), lit(2)))
    val halves = d.groupBy("half").agg(GraftFunctions.hllRegisters($"h", 6).as("regs"))
      .collect().map(_.getSeq[Int](1))
    assert(halves.length == 2)
    val merged = halves(0).zip(halves(1)).map { case (a, b) => math.max(a, b) }
    val whole = d.agg(GraftFunctions.hllRegisters($"h", 6)).first().getSeq[Int](0)
    assert(merged == whole)
  }

  test("raw estimate lands within 3 standard errors of the truth") {
    val n = 20000
    val regs = df(n).agg(GraftFunctions.hllRegisters($"h", 6)).first().getSeq[Int](0)
    val hsum = regs.map(r => 1L << (55 - r)).sum
    val est = 0.709 * 4096.0 * 36028797018963968.0 / hsum.toDouble
    val se = 1.04 / math.sqrt(64.0) // ~13% at m=64
    assert(math.abs(est - n) / n < 3 * se, s"estimate $est too far from $n")
  }

  test("SQL registration: graft_hll works through spark.sql") {
    GraftFunctions.register(spark)
    df(1000).createOrReplaceTempView("hll_in")
    val got = spark.sql("SELECT graft_hll(h, 6) AS regs FROM hll_in")
      .first().getSeq[Int](0)
    assert(got == naiveRegisters((1 to 1000).map(i => s"val$i")).toSeq)
  }

  test("precision bounds are enforced") {
    intercept[IllegalArgumentException] {
      graft.expressions.HllRegisters(
        org.apache.spark.sql.catalyst.expressions.Literal(1L), b = 2)
    }
  }
}
