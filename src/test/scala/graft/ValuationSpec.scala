package graft

import graft.ops.Udtf
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck property for the q59 layer valuation: for arbitrary small
  * ledgers, [[Udtf.stockValuationLayers]] equals a SEQUENTIAL periodic
  * layer walk (greedy take over receipts, newest-first for FIFO and
  * oldest-first for LIFO) computed in plain Scala — the window-clamp
  * closed form and the obvious one-cell-at-a-time algorithm are the same
  * function. Arithmetic mirrors the engine exactly: integer quantities,
  * round-to-cents unit costs, cent-rounded layer values. */
class ValuationSpec extends SparkSpec {
  import spark.implicits._

  private def round2(x: Double): Double = math.floor(x * 100.0 + 0.5) / 100.0

  /** (part, wh, qty, price, isReceipt, day) */
  private val genRow = for {
    part <- Gen.chooseNum(1, 3)
    wh <- Gen.chooseNum(1, 2)
    qty <- Gen.chooseNum(1, 20)
    price <- Gen.chooseNum(1, 500)
    flag <- Gen.frequency(3 -> "A", 2 -> "R")
    day <- Gen.chooseNum(1, 5)
  } yield (part, wh, qty, price, flag, day)

  test("stockValuationLayers ≡ sequential periodic layer walk (property)") {
    val gen = Gen.chooseNum(1, 25).flatMap(n => Gen.listOfN(n, genRow))
    // forAllNoShrink: the default shrinker ignores Gen bounds and produces
    // out-of-domain rows (part 0 absent from the part dim, price 0), which
    // fail for reasons the generator can never produce.
    val prop = Prop.forAllNoShrink(gen) { rows =>
      val li = rows.zipWithIndex.map { case ((p, w, q, pr, f, d), i) =>
        Li(l_orderkey = i + 1L, l_partkey = p.toLong, l_suppkey = w.toLong,
          l_quantity = q.toDouble, l_extendedprice = pr.toDouble,
          l_discount = 0, l_tax = 0, l_returnflag = f, l_linestatus = "O",
          l_shipdate = ts(f"2001-01-0$d%d 00:00:00"))
      }
      val dir = fixtureDir(
        "lineitem" -> li.toDF(),
        "part" -> Seq((1L, "p1"), (2L, "p2"), (3L, "p3"))
          .toDF("p_partkey", "p_name"))

      // sequential reference: per cell, greedy take over ordered receipts.
      // Stays in BigDecimal until the very last step — the engine sums
      // DECIMAL(30,6) layer values across cells and casts to double ONCE,
      // so a double-accumulating walk would drift an ulp across cells.
      val cells = li.groupBy(r => (r.l_partkey, r.l_suppkey))
      def walk(rs: Seq[Li], onHand: Double): BigDecimal = {
        var left = onHand
        var value = BigDecimal(0)
        rs.foreach { r =>
          val take = math.min(r.l_quantity, math.max(left, 0.0))
          val cost = round2(r.l_extendedprice / r.l_quantity)
          // shortest-repr string construction mirrors Spark's
          // double→decimal cast (BigDecimal(double) would expand the full
          // binary value and desync the cent sums by an ulp)
          value += BigDecimal(round2(take * cost).toString)
          left -= r.l_quantity
        }
        value
      }
      val perPart = cells.toSeq.map { case ((p, _), rs) =>
        val onHand = rs.map(r =>
          if (r.l_returnflag == "A") r.l_quantity else -r.l_quantity).sum
        val receipts = rs.filter(_.l_returnflag == "A")
        val newestFirst = receipts.sortBy(r =>
          (-r.l_shipdate.getTime, -r.l_orderkey))
        (p, onHand, walk(newestFirst, onHand), walk(newestFirst.reverse, onHand))
      }.groupBy(_._1).map { case (p, cs) =>
        p -> ((cs.map(_._2).sum,
          cs.map(_._3).sum.toDouble, cs.map(_._4).sum.toDouble))
      }.filter(_._2._1 > 0.0)

      val got = Udtf.stockValuationLayers(spark, dir).collect().map { r =>
        r.getAs[Long]("part_id") ->
          ((r.getAs[Double]("total_quantity"),
            r.getAs[Double]("fifo_value"), r.getAs[Double]("lifo_value")))
      }.toMap

      got == perPart
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }
}
