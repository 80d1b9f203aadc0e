package graft

import graft.ops.Generator
import org.apache.spark.sql.functions._

/** Pins the full warehouse-schema generator (P9): determinism, the
  * reference's structural constraints (paired transfer legs summing to
  * zero, order-detail uniqueness, positive detail quantities), and the
  * Poisson-ladder shape — scale-parameterized fixtures, so any test can
  * ask for any volume (the reference's generator validation at
  * `generate_data.py:507-526` checks the same properties by printout). */
class GeneratorSpec extends SparkSpec {
  import spark.implicits._

  test("generator is deterministic across invocations") {
    val a = Generator.movements(spark, 2000).collect().toSeq
    val b = Generator.movements(spark, 2000).collect().toSeq
    assert(a == b)
    val p = Generator.products(spark, 500).collect().toSeq
    assert(p == Generator.products(spark, 500).collect().toSeq)
  }

  test("transfer legs pair exactly and sum to zero per reference (P2 invariant)") {
    val t = Generator.transfers(spark, 5000)
    val perRef = t.groupBy($"reference_id")
      .agg(sum($"quantity").as("net"), count(lit(1)).as("n"),
        countDistinct($"warehouse_id").as("n_wh"))
      .collect()
    assert(perRef.length == 5000)
    assert(perRef.forall(_.getAs[Long]("net") == 0L), "legs must sum to 0")
    assert(perRef.forall(_.getAs[Long]("n") == 2L), "exactly two legs")
    assert(perRef.forall(_.getAs[Long]("n_wh") == 2L), "source != destination")
  }

  test("order details: positive quantities, unique (po_id, product_id), Poisson shape") {
    val d = Generator.orderDetails(spark, 1000)
    assert(d.filter($"quantity" <= 0).count() == 0) // schema.sql:144 CHECK
    val dup = d.groupBy($"po_id", $"product_id").count().filter($"count" > 1)
    assert(dup.count() == 0) // UNIQUE(po_id, product_id), schema.sql:146
    val lines = d.groupBy($"po_id").count()
    val counts = lines.select($"count").collect().map(_.getLong(0))
    assert(counts.forall(c => c >= 1 && c <= 8)) // clipped ladder range
    val mean = counts.sum.toDouble / counts.length
    // Poisson(3) clipped to [1,8] has mean ≈ 3.2; the uniform mix draw
    // should land close.
    assert(mean > 2.7 && mean < 3.7, s"mean lines/order = $mean")
  }

  test("fixture lineitem: (l_orderkey, l_linenumber) is a total order key") {
    // q59's FIFO/LIFO window tie-break sorts on (shipdate, orderkey,
    // linenumber); the allocation is deterministic only if that key is
    // total. Order lines get line_no within their po; transfer legs get
    // 1 (OUT) / 2 (IN) under their offset orderkey — no collisions.
    import org.apache.spark.sql.functions.count
    val dups = Generator.fixtureLineitem(spark, 500)
      .groupBy("l_orderkey", "l_linenumber")
      .agg(count("*").as("n")).filter("n > 1")
    assert(dups.isEmpty, dups.collect().take(5).mkString(", "))
  }

  test("generated ledger replays to a consistent snapshot at any scale (A14)") {
    // the scale-parameterized fixture path: generated transfer legs feed
    // the SAME replay aggregation the ingest API uses, and conservation
    // makes every per-product total zero.
    val perProduct = Generator.transfers(spark, 3000)
      .groupBy($"product_id")
      .agg(sum($"quantity").as("net"))
      .collect()
    assert(perProduct.forall(_.getAs[Long]("net") == 0L))
  }

  test("order status and detail count are independent draws") {
    // regression guard: status (y%100) and n_details once both derived
    // from the y-mix, which forced 8-line orders into COMPLETED/CANCELLED
    // only (y%1000 >= 988 pins y%100 to 88..99). With the independent
    // w-chain, max-line orders must appear across statuses.
    val byStatus = Generator.orders(spark, 5000)
      .filter($"n_details" === 8)
      .groupBy($"status").count().collect()
    assert(byStatus.length >= 3,
      s"8-line orders concentrated in: ${byStatus.mkString(", ")}")
  }

  test("FK closure: every foreign key drawn by facts exists in its master") {
    // the promise Generator's master scaladocs make: id domains of
    // categories/suppliers/warehouses ⊇ every draw in products, orders,
    // order_details, movements and transfers. Anti-joins must all be
    // empty — a modulus drifting from a DEFAULT_* constant breaks this.
    val cats = Generator.categories(spark).select($"category_id")
    val sups = Generator.suppliers(spark).select($"supplier_id")
    val whs = Generator.warehouses(spark).select($"warehouse_id")
    val prods = Generator.products(spark)
    val orphans = Seq(
      "products.category_id" -> prods.select($"category_id")
        .join(cats, Seq("category_id"), "left_anti"),
      "products.supplier_id" -> prods.select($"supplier_id")
        .join(sups, Seq("supplier_id"), "left_anti"),
      "orders.supplier_id" -> Generator.orders(spark).select($"supplier_id")
        .join(sups, Seq("supplier_id"), "left_anti"),
      "orders.warehouse_id" -> Generator.orders(spark).select($"warehouse_id")
        .join(whs, Seq("warehouse_id"), "left_anti"),
      "order_details.product_id" -> Generator.orderDetails(spark)
        .select($"product_id")
        .join(prods.select($"product_id"), Seq("product_id"), "left_anti"),
      "movements.product_id" -> Generator.movements(spark)
        .select($"product_id")
        .join(prods.select($"product_id"), Seq("product_id"), "left_anti"),
      "movements.warehouse_id" -> Generator.movements(spark)
        .select($"warehouse_id")
        .join(whs, Seq("warehouse_id"), "left_anti"),
      "transfers.warehouse_id" -> Generator.transfers(spark)
        .select($"warehouse_id")
        .join(whs, Seq("warehouse_id"), "left_anti"))
    orphans.foreach { case (fk, orphan) =>
      assert(orphan.count() == 0L, s"$fk has orphan rows")
    }
    // masters themselves are key-unique at their declared cardinality
    assert(cats.distinct().count() == Generator.DEFAULT_CATEGORIES)
    assert(sups.distinct().count() == Generator.DEFAULT_SUPPLIERS)
  }

  test("movement distribution matches the declared weights") {
    val n = 20000L
    val byType = Generator.movements(spark, n)
      .groupBy($"movement_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def share(t: String): Double = byType(t).toDouble / n
    assert(math.abs(share("IN") - 0.45) < 0.02)
    assert(math.abs(share("OUT") - 0.35) < 0.02)
    assert(math.abs(share("TRANSFER") - 0.10) < 0.02)
  }

  test("document generator plants true exact-dup fixpoints and near-dups") {
    val docs = Generator.fixtureDocuments(spark, 550)
      .select($"doc_id", $"text", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val byId = docs.map(d => d._1 -> d._2).toMap
    assert(docs.forall { case (_, t, nc) => nc == t.length.toLong },
      "n_chars must equal length(text)")
    // every ≡7 (mod 11) doc's text occurs at least twice (a true copy of
    // a NATURAL doc, not a chain into another re-seeded id)
    val counts = docs.groupBy(_._2).map { case (t, g) => t -> g.size }
    val exactDups = docs.filter(d => d._1 % 11 == 7 && d._1 >= 11)
    assert(exactDups.nonEmpty)
    exactDups.foreach { case (id, t, _) =>
      assert(counts(t) >= 2, s"doc $id is not an exact duplicate")
    }
    // every ≡8 (mod 11) doc is a one-word-appended near-dup of a natural
    val nearDups = docs.filter(d => d._1 % 11 == 8 && d._1 >= 11)
    assert(nearDups.nonEmpty)
    nearDups.foreach { case (id, t, _) =>
      val prefix = t.substring(0, t.lastIndexOf(' '))
      assert(byId.values.exists(_ == prefix),
        s"doc $id's text minus its last word matches no natural doc")
    }
  }

  test("embedding generator: fixture width, label domain, label clustering") {
    val vecs = Generator.fixtureEmbeddings(spark, 300)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    assert(vecs.length == 300)
    assert(vecs.forall(_._2.length == Generator.EMBED_DIM))
    assert(vecs.map(_._3).distinct.sorted.toSeq == (0 until 10))
    // clustering: same-label vectors sit closer to their label mean than
    // to the global mean (the structure IVF training must find)
    val dim = Generator.EMBED_DIM
    def mean(vs: Seq[Seq[Float]]): Seq[Double] =
      (0 until dim).map(j => vs.map(_(j).toDouble).sum / vs.size)
    def d2(a: Seq[Float], m: Seq[Double]): Double =
      (0 until dim).map(j => math.pow(a(j) - m(j), 2)).sum
    val global = mean(vecs.map(_._2).toSeq)
    val byLabel = vecs.groupBy(_._3).view.mapValues(g => mean(g.map(_._2).toSeq))
    val (closer, total) = vecs.foldLeft((0, 0)) { case ((c, t), (_, v, l)) =>
      (c + (if (d2(v, byLabel(l)) < d2(v, global)) 1 else 0), t + 1)
    }
    assert(closer.toDouble / total > 0.9,
      s"label clustering too weak: $closer/$total")
  }

  test("scaled fixtureLineitem keeps order/transfer key spaces disjoint") {
    // n above the legacy 1M base must shift the transfer orderkey base to
    // n — order lines stay strictly below it, legs at or above it, and
    // every leg orderkey still carries exactly its two paired rows
    val n = 1200000L
    val li = Generator.fixtureLineitem(spark, n, 10L)
    val stats = li.agg(
      max(when($"l_orderkey" < n, $"l_orderkey")).as("max_order"),
      min(when($"l_orderkey" >= n, $"l_orderkey")).as("min_leg"),
      count(when($"l_orderkey" >= n, 1)).as("n_leg_rows")).head
    assert(stats.getLong(0) < n)
    assert(stats.getLong(1) == n)
    assert(stats.getLong(2) == 20L, "10 transfers explode into 20 legs")
    val badPairs = li.filter($"l_orderkey" >= n)
      .groupBy("l_orderkey").count().filter($"count" =!= 2).count()
    assert(badPairs == 0, "every transfer orderkey must carry exactly 2 legs")
  }
}
