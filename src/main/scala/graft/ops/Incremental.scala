package graft.ops

import graft.{Dx, Query, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-load + audit/CDC semantics — the reference's second
  * operating mode and its audit trigger:
  *
  *  - T1/S2 ([[incrementalEvents]]): re-read only rows newer than the
  *    checkpoint timestamp (`wsm/etl_pipeline/extract/data_extractor.py:
  *    43-70`, checkpoint in `config/config.yaml:15`), with the
  *    empty-batch short-circuit (`main.py:68-70`) as [[hasNewData]].
  *    The predicate is a plain Catalyst filter → parquet pushdown
  *    (`PushedFilters: [GreaterThan(ts, …)]`), so at 100 TB a
  *    date-partitioned layout prunes untouched partitions entirely —
  *    the batch twin of a streaming offset.
  *  - T4/P5 ([[auditDiff]]): the audit trigger
  *    (`wsm/database_function/triggers.sql:21-63`) becomes a snapshot
  *    DIFF: full-outer join of the old and new snapshots on the cell
  *    key, row ops INSERT/UPDATE/DELETE, unchanged rows dropped via
  *    null-safe equality (C20 `<=>` ⇔ `IS DISTINCT FROM`). Snapshots
  *    carry the reference's nonzero-stock filter (F11), so a cell
  *    netting to zero reads as a DELETE.
  *  - U2 ([[newCells]]): the anti-join difference (cells present now,
  *    absent before).
  *
  * Snapshot-at-time := signed ledger replay of lineitem up to a ship-date
  * cutoff ('R' rows are returns, negated — sign split F7 feeding A14).
  * Both snapshots aggregate on the same (part, supplier) key from the
  * same scan shape, so the full-outer join is co-partitioned.
  */
object Incremental {

  /** The reference checkpoint timestamp for the T1 query. */
  val CHECKPOINT = "2024-01-15 00:00:00"

  /** Audit cutoffs: old snapshot at CUT_OLD, new at CUT_NEW. */
  val CUT_OLD = "1995-06-30"
  val CUT_NEW = "1997-12-31"

  /** T1: rows newer than the checkpoint (masters always refresh — they
    * are plain full reads elsewhere; only the event fact is filtered). */
  def incrementalEvents(
      spark: SparkSession, dir: String,
      checkpoint: String = CHECKPOINT): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "events")
      .filter($"ts" > to_timestamp(lit(checkpoint)))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .orderBy($"event_id")
  }

  /** Empty-batch short-circuit (`main.py:68-70`): cheap existence probe —
    * Catalyst plans a LocalLimit(1), no full scan. */
  def hasNewData(spark: SparkSession, dir: String, checkpoint: String): Boolean =
    !incrementalEvents(spark, dir, checkpoint).isEmpty

  /** T1 over the DATE-PARTITIONED ledger layout
    * ([[graft.sources.Sinks.writeDatePartitioned]]) — the 100 TB shape of
    * the incremental scan made literal instead of aspirational: the
    * checkpoint predicate on `ts` is restated on the `event_date`
    * PARTITION column (derivable: ts > c ⇒ date(ts) ≥ date(c)), so the
    * scan's PartitionFilters eliminate every directory older than the
    * checkpoint date before any file is opened. The exact `ts` filter
    * still applies within the boundary date's partition. SinksSpec
    * asserts the executed scan reads strictly fewer files than the
    * layout holds. */
  def incrementalEventsPartitioned(
      spark: SparkSession, path: String,
      checkpoint: String = CHECKPOINT): DataFrame = {
    import spark.implicits._
    spark.read.parquet(path)
      .filter(
        $"event_date" >= to_date(to_timestamp(lit(checkpoint))) &&
          $"ts" > to_timestamp(lit(checkpoint)))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
  }

  private def incrementalOracle(checkpoint: String): String =
    s"""SELECT event_id, ts, user_id, event_type, value
       |FROM events WHERE ts > TIMESTAMP '$checkpoint'
       |ORDER BY event_id""".stripMargin

  /** Signed-ledger snapshot as of a ship-date cutoff, zero cells dropped
    * (F11) so they can resurface as DELETE ops in the diff. */
  def snapshotAt(spark: SparkSession, dir: String, cutoff: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, "lineitem")
      .filter(to_date($"l_shipdate") <= to_date(lit(cutoff)))
      .groupBy($"l_partkey".as("part_id"), $"l_suppkey".as("supplier_id"))
      .agg(Dx.dsum(
        expr("CASE WHEN l_returnflag = 'R' THEN -l_quantity ELSE l_quantity END"))
        .as("quantity_on_hand"))
      .filter($"quantity_on_hand" =!= 0.0)
  }

  private def snapshotSql(cutoff: String): String =
    s"""SELECT l_partkey AS part_id, l_suppkey AS supplier_id,
       |       ${Dx.sqlDsum("CASE WHEN l_returnflag = 'R' THEN -l_quantity ELSE l_quantity END")} AS quantity_on_hand
       |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '$cutoff'
       |GROUP BY 1, 2
       |HAVING ${Dx.sqlDsum("CASE WHEN l_returnflag = 'R' THEN -l_quantity ELSE l_quantity END")} <> 0.0""".stripMargin

  /** T4: the audit log a stock trigger would have written between the
    * two snapshot times — full-outer join, one row per changed cell. */
  def auditDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val old = snapshotAt(spark, dir, CUT_OLD)
      .withColumnRenamed("quantity_on_hand", "old_quantity")
    val neu = snapshotAt(spark, dir, CUT_NEW)
      .withColumnRenamed("quantity_on_hand", "new_quantity")
    old.join(neu, Seq("part_id", "supplier_id"), "full_outer")
      // C20: keep only rows where quantity IS DISTINCT FROM before —
      // the trigger's `OLD.quantity_on_hand IS DISTINCT FROM NEW…` guard.
      .filter(!($"old_quantity" <=> $"new_quantity"))
      .select(
        $"part_id", $"supplier_id",
        when($"old_quantity".isNull, "INSERT")
          .when($"new_quantity".isNull, "DELETE")
          .otherwise("UPDATE").as("operation_type"),
        $"old_quantity", $"new_quantity")
      .orderBy($"part_id", $"supplier_id")
  }

  private val auditOracle =
    s"""WITH old AS (${snapshotSql(CUT_OLD)}),
       |neu AS (${snapshotSql(CUT_NEW)})
       |SELECT COALESCE(old.part_id, neu.part_id) AS part_id,
       |       COALESCE(old.supplier_id, neu.supplier_id) AS supplier_id,
       |       CASE WHEN old.quantity_on_hand IS NULL THEN 'INSERT'
       |            WHEN neu.quantity_on_hand IS NULL THEN 'DELETE'
       |            ELSE 'UPDATE' END AS operation_type,
       |       old.quantity_on_hand AS old_quantity,
       |       neu.quantity_on_hand AS new_quantity
       |FROM old FULL OUTER JOIN neu
       |  ON old.part_id = neu.part_id AND old.supplier_id = neu.supplier_id
       |WHERE old.quantity_on_hand IS DISTINCT FROM neu.quantity_on_hand
       |ORDER BY part_id, supplier_id""".stripMargin

  /** U2: cells that exist now but not before (left_anti difference). */
  def newCells(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    snapshotAt(spark, dir, CUT_NEW)
      .join(snapshotAt(spark, dir, CUT_OLD), Seq("part_id", "supplier_id"),
        "left_anti")
      .orderBy($"part_id", $"supplier_id")
  }

  private val newCellsOracle =
    s"""WITH old AS (${snapshotSql(CUT_OLD)}),
       |neu AS (${snapshotSql(CUT_NEW)})
       |SELECT neu.* FROM neu
       |WHERE NOT EXISTS (SELECT 1 FROM old
       |  WHERE old.part_id = neu.part_id AND old.supplier_id = neu.supplier_id)
       |ORDER BY part_id, supplier_id""".stripMargin

  val all: Seq[Query] = Seq(
    Query("q37_incremental_load",
      "events newer than the checkpoint (T1/S2: pushed-down predicate scan)",
      (s, d) => incrementalEvents(s, d), Some(incrementalOracle(CHECKPOINT)),
      headline = false),
    Query("q38_audit_diff",
      "snapshot diff as audit log: INSERT/UPDATE/DELETE via full-outer join + null-safe equality (T4/P5/C20)",
      auditDiff, Some(auditOracle), headline = false),
    Query("q39_new_cells",
      "anti-join difference: cells present now, absent before (U2)",
      newCells, Some(newCellsOracle), headline = false))
}
