package graft.ops

import graft.{Dx, Query, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest / ledger API — the reference's transactional write path
  * (`record_stock_movement` + `transfer_stock`,
  * `wsm/database_function/functions.sql:7-135`) re-expressed as batch
  * dataflow (SURVEY §3.2: "this OLTP write path becomes the engine's
  * ingest API"):
  *
  *  - a batch of transfer COMMANDS is validated with the reference's
  *    three rules in first-match order (qty > 0, from ≠ to, sufficient
  *    stock at the source cell), each command answered with the
  *    reference's JSON status payload (C16 `to_json(struct(...))` —
  *    byte-identical to DuckDB's `json_object`);
  *  - valid commands explode into the two ledger legs (U1 union, C11
  *    negated OUT quantity, C15 concatenated notes with COALESCE,
  *    exactly `functions.sql:105-112`);
  *  - the snapshot is the ledger replay A14 over base ∪ new legs — the
  *    UPSERT (`functions.sql:35-41`) becomes a recompute, and the
  *    transfer invariant (legs sum to zero per reference) is pinned by a
  *    ScalaCheck-style unit test.
  *
  * BATCH SEMANTICS (documented divergence): validations read the
  * batch-START snapshot — commands in one batch do not observe each
  * other's effects. The reference's per-call serializable semantics are
  * the streaming path's job (T3, `flatMapGroupsWithState`); batch-start
  * validation is deterministic and embarrassingly parallel, which is
  * what a 100 TB backfill needs.
  *
  * Fixture mapping: commands derive deterministically from the 'R'
  * lineitem rows (reference = orderkey, source = suppkey, destination =
  * an arithmetic rotation, quantity shifted so all three validation
  * rules actually fire).
  */
object Ingest {

  /** Deterministic command batch from the testdata (see class doc). */
  def commands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "lineitem")
      .filter($"l_returnflag" === "R")
      .select(
        $"l_orderkey".as("reference_id"),
        $"l_partkey".as("part_id"),
        $"l_suppkey".as("from_warehouse_id"),
        (($"l_suppkey" * 7 + $"l_partkey") % 97 + 1).as("to_warehouse_id"),
        ($"l_quantity" - 20.0).as("quantity"),
        when($"l_partkey" % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("ref "), $"l_orderkey")).as("notes"))
  }

  private val commandsSql =
    """SELECT l_orderkey AS reference_id, l_partkey AS part_id,
      |       l_suppkey AS from_warehouse_id,
      |       (l_suppkey * 7 + l_partkey) % 97 + 1 AS to_warehouse_id,
      |       l_quantity - 20.0 AS quantity,
      |       CASE WHEN l_partkey % 5 = 0 THEN NULL
      |            ELSE 'ref ' || l_orderkey END AS notes
      |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin

  /** The batch-start snapshot kept as DECIMAL sub-sums: exact and
    * associative, so it doubles as the BASE REPLAY aggregate in
    * [[replaySnapshot]] — sum-of-cell-sums ≡ flat ledger sum, bit-exactly.
    * Shared (identical subtree → one exchange via ReuseExchange) between
    * the validation join and the replay union, which is what cuts q36
    * from three lineitem scans to two (round-6 verdict #1). */
  private def snapshotDec(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // The explicit key isnotnull filter mirrors what
    // InferFiltersFromConstraints adds on the validation-join side; stating
    // it here makes the two snapshot subtrees canonically IDENTICAL so the
    // exchange is planned once and reused. Ledger cell keys are non-null by
    // schema contract (the reference's NOT NULL FKs, schema.sql), so the
    // filter is semantically free.
    Tables(spark, dir, "lineitem")
      .filter($"l_partkey".isNotNull && $"l_suppkey".isNotNull)
      .groupBy($"l_partkey".as("part_id"),
        $"l_suppkey".as("from_warehouse_id"))
      .agg(Dx.decSum(expr("l_quantity")).as("current_stock_dec"))
  }

  /** The batch-start snapshot: ledger replay per (part, warehouse). */
  private def snapshot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    snapshotDec(spark, dir)
      .select($"part_id", $"from_warehouse_id",
        $"current_stock_dec".cast("double").as("current_stock"))
  }

  private val snapshotSql =
    s"""SELECT l_partkey AS part_id, l_suppkey AS from_warehouse_id,
       |       ${Dx.sqlDsum("l_quantity")} AS current_stock
       |FROM lineitem GROUP BY 1, 2""".stripMargin

  /** Commands + first-match validation disposition. The stock lookup is
    * a join against the batch-start snapshot on the SOURCE cell — both
    * sides shuffle on (part, warehouse), co-partitioned at any scale.
    * The `merge` hint makes that literal: both sides are fact-derived, and
    * materialized shuffle stages also stop the downstream presentation
    * sort's range sampling from re-executing the streamed scan (the q16
    * fix; without it q34-q36 read the commands scan 2×). */
  def validated(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    commands(spark, dir)
      .join(snapshot(spark, dir).hint("merge"),
        Seq("part_id", "from_warehouse_id"), "left")
      .withColumn("disposition",
        when($"quantity" <= 0.0, "error_quantity")
          .when($"from_warehouse_id" === $"to_warehouse_id", "error_same_warehouse")
          .when($"current_stock".isNull || $"current_stock" < $"quantity",
            "error_insufficient")
          .otherwise("success"))
  }

  /** P1/P2 validation verdicts with the reference's JSON payloads (C16).
    * One row per command. */
  def transferValidate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    validated(spark, dir)
      .select(
        $"reference_id", $"part_id", $"from_warehouse_id",
        $"to_warehouse_id",
        when($"disposition" === "error_quantity",
          to_json(struct(
            lit("error").as("status"),
            lit("transfer quantity must be greater than 0").as("message"))))
          .when($"disposition" === "error_same_warehouse",
            to_json(struct(
              lit("error").as("status"),
              lit("source and destination warehouse must differ").as("message"))))
          .when($"disposition" === "error_insufficient",
            to_json(struct(
              lit("error").as("status"),
              lit("insufficient stock at source warehouse").as("message"),
              // explicit floor() before the long cast: Spark's cast
              // truncates toward zero, DuckDB's CAST rounds half-to-even —
              // one shared rounding rule keeps the engines identical even
              // for fractional stock (round-3 ADVICE).
              floor(coalesce($"current_stock", lit(0.0))).cast("long")
                .as("current_stock"))))
          .otherwise(
            to_json(struct(
              lit("success").as("status"),
              $"reference_id".as("reference_id"))))
          .as("result"))
      .orderBy($"reference_id", $"part_id", $"from_warehouse_id")
  }

  private val validatedSql =
    s"""WITH cmd AS ($commandsSql
       |), snap AS ($snapshotSql
       |)
       |SELECT cmd.*, snap.current_stock,
       |       CASE WHEN cmd.quantity <= 0.0 THEN 'error_quantity'
       |            WHEN cmd.from_warehouse_id = cmd.to_warehouse_id THEN 'error_same_warehouse'
       |            WHEN snap.current_stock IS NULL OR snap.current_stock < cmd.quantity
       |                 THEN 'error_insufficient'
       |            ELSE 'success' END AS disposition
       |FROM cmd LEFT JOIN snap
       |  ON cmd.part_id = snap.part_id
       | AND cmd.from_warehouse_id = snap.from_warehouse_id""".stripMargin

  private val transferValidateOracle =
    s"""WITH v AS ($validatedSql)
       |SELECT reference_id, part_id, from_warehouse_id, to_warehouse_id,
       |       CASE disposition
       |         WHEN 'error_quantity' THEN CAST(json_object(
       |           'status', 'error',
       |           'message', 'transfer quantity must be greater than 0') AS VARCHAR)
       |         WHEN 'error_same_warehouse' THEN CAST(json_object(
       |           'status', 'error',
       |           'message', 'source and destination warehouse must differ') AS VARCHAR)
       |         WHEN 'error_insufficient' THEN CAST(json_object(
       |           'status', 'error',
       |           'message', 'insufficient stock at source warehouse',
       |           'current_stock', CAST(floor(COALESCE(current_stock, 0.0)) AS BIGINT)) AS VARCHAR)
       |         ELSE CAST(json_object('status', 'success',
       |                               'reference_id', reference_id) AS VARCHAR)
       |       END AS result
       |FROM v ORDER BY reference_id, part_id, from_warehouse_id""".stripMargin

  /** The exploded ledger: two movement rows per VALID command — the OUT
    * leg (negated, C11) and the IN leg with the reference's concatenated
    * notes (C15: `'Transfer OUT ke ' || to || '. ' || COALESCE(notes,
    * '')`). Generated by ONE `explode(array(outLeg, inLeg))` over the
    * validated batch (SURVEY §2.10 P2's mapping), not a two-branch union:
    * a union re-executes the whole validated subtree once per leg (the
    * round-4 scan audit measured the commands scan 2-4× across q35/q36),
    * while the explode is a single pass — U1's row-union semantics with a
    * generator's plan shape. */
  def transferLegs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    validated(spark, dir)
      .filter($"disposition" === "success")
      .select(
        $"reference_id", $"part_id",
        explode(array(
          struct(
            $"from_warehouse_id".as("warehouse_id"),
            (-$"quantity").as("quantity"),
            concat(lit("Transfer OUT ke "), $"to_warehouse_id", lit(". "),
              coalesce($"notes", lit(""))).as("notes")),
          struct(
            $"to_warehouse_id".as("warehouse_id"),
            $"quantity".as("quantity"),
            concat(lit("Transfer IN dari "), $"from_warehouse_id", lit(". "),
              coalesce($"notes", lit(""))).as("notes")))).as("leg"))
      .select(
        $"reference_id", $"part_id",
        $"leg.warehouse_id".as("warehouse_id"),
        lit("TRANSFER").as("movement_type"),
        $"leg.quantity".as("quantity"),
        $"leg.notes".as("notes"))
      .orderBy($"reference_id", $"part_id", $"quantity")
  }

  private val transferLegsOracle =
    s"""WITH v AS ($validatedSql
       |), ok AS (SELECT * FROM v WHERE disposition = 'success')
       |SELECT reference_id, part_id, from_warehouse_id AS warehouse_id,
       |       'TRANSFER' AS movement_type, -quantity AS quantity,
       |       'Transfer OUT ke ' || to_warehouse_id || '. ' || COALESCE(notes, '') AS notes
       |FROM ok
       |UNION ALL
       |SELECT reference_id, part_id, to_warehouse_id AS warehouse_id,
       |       'TRANSFER' AS movement_type, quantity,
       |       'Transfer IN dari ' || from_warehouse_id || '. ' || COALESCE(notes, '') AS notes
       |FROM ok
       |ORDER BY reference_id, part_id, quantity""".stripMargin

  /** A14 replay over base ledger ∪ new legs: the post-batch snapshot.
    * The base is NOT a third scan of the fact — it is the batch-start
    * [[snapshotDec]] aggregate itself (decimal cell sums are exact and
    * associative, so re-summing them with the legs equals a flat ledger
    * replay bit-for-bit). The validation join inside [[transferLegs]]
    * reads the SAME aggregate subtree, so the physical plan reuses one
    * exchange for both and q36 touches lineitem exactly twice (commands +
    * snapshot); IngestSpec pins the scan count on the executed plan. */
  def replaySnapshot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = snapshotDec(spark, dir).select(
      $"part_id",
      $"from_warehouse_id".as("warehouse_id"),
      $"current_stock_dec".as("quantity"))
    val legs = transferLegs(spark, dir)
      .select($"part_id", $"warehouse_id",
        $"quantity".cast(org.apache.spark.sql.types.DecimalType(30, 6))
          .as("quantity"))
    base.unionByName(legs)
      .groupBy($"part_id", $"warehouse_id")
      .agg(sum($"quantity").cast("double").as("quantity_on_hand"))
      .orderBy($"part_id", $"warehouse_id")
  }

  private val replayOracle =
    s"""WITH v AS ($validatedSql
       |), ok AS (SELECT * FROM v WHERE disposition = 'success'),
       |ledger AS (
       |  SELECT l_partkey AS part_id, l_suppkey AS warehouse_id,
       |         l_quantity AS quantity
       |  FROM lineitem
       |  UNION ALL
       |  SELECT part_id, from_warehouse_id, -quantity FROM ok
       |  UNION ALL
       |  SELECT part_id, to_warehouse_id, quantity FROM ok
       |)
       |SELECT part_id, warehouse_id,
       |       ${Dx.sqlDsum("quantity")} AS quantity_on_hand
       |FROM ledger GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val all: Seq[Query] = Seq(
    Query("q34_transfer_validate",
      "per-command validation verdicts with JSON payloads (P1/P2 rules, C16)",
      transferValidate, Some(transferValidateOracle), headline = false),
    Query("q35_transfer_ledger",
      "valid transfers exploded into OUT/IN ledger legs (U1/C11/C15)",
      transferLegs, Some(transferLegsOracle), headline = false),
    Query("q36_ledger_replay",
      "post-batch snapshot: A14 replay over base ledger ∪ new legs",
      replaySnapshot, Some(replayOracle), headline = false))
}
