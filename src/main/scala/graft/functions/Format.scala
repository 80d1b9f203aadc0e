package graft.functions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{Query, ops}

/** C19 — Indonesian-locale number formatting (`1.234.567,89`), the
  * reference's `format_rupiah` / `format_number` Jinja filters
  * (`wsm/etl_pipeline/load/report_generator.py:50-66`: US-grouped
  * `{:,.2f}` then swap `,`↔`.`).
  *
  * Two surfaces:
  *  - [[idr]]/[[rupiah]]: Column expressions (all builtins — `floor`,
  *    `format_number`, `translate`, `lpad` — so the projection stays in
  *    whole-stage codegen; formatting 100 TB of report cells is a pure
  *    map, no shuffle). Cross-engine exact: the value is first scaled to
  *    integer units with `floor(abs(v)·10^p + 0.5)` — pure IEEE ops both
  *    engines evaluate bit-identically (the [[graft.Dx.round2]] argument)
  *    — and only the INTEGER part is locale-grouped, sidestepping both
  *    engines' float-formatting rounding modes entirely. [[sqlIdr]] emits
  *    the equivalent DuckDB fragment, so q63 carries a full hash oracle.
  *  - [[rupiahStr]]/[[numberStr]]: plain-Scala twins for driver-side
  *    presentation (the S9 HTML renderer), matching the reference filter
  *    byte-for-byte on its own outputs (`%,.2f` + swap). Java's `%,.2f`
  *    rounds HALF_UP where Python rounds HALF_EVEN — irrelevant for
  *    values already rounded to the target precision, which is what the
  *    report summaries feed it.
  */
object Format {

  /** `v` formatted with `p` decimal places, Indonesian locale: groups
    * with `.`, decimal separator `,`. Null in → null out. */
  def idr(e: Column, p: Int): Column = {
    require(p >= 0 && p <= 6, s"precision $p outside [0, 6]")
    val scale = math.pow(10, p).toLong
    val units = floor(abs(e) * scale.toDouble + 0.5)
    val intPart = floor(units / scale.toDouble).cast("long")
    val sign = when(e < 0, lit("-")).otherwise(lit(""))
    val grouped = translate(format_number(intPart, 0), ",", ".")
    val body =
      if (p == 0) grouped
      else concat(grouped, lit(","),
        lpad(pmod(units.cast("long"), lit(scale)).cast("string"), p, "0"))
    when(e.isNull, lit(null).cast("string")).otherwise(concat(sign, body))
  }

  /** `format_rupiah`: two decimal places (`report_generator.py:50-57`). */
  def rupiah(e: Column): Column = idr(e, 2)

  /** DuckDB twin of [[idr]] — same integer-units decomposition, so the
    * hash compare is exact (`format('{:,}')` groups BIGINTs only). */
  def sqlIdr(e: String, p: Int): String = {
    require(p >= 0 && p <= 6, s"precision $p outside [0, 6]")
    val scale = math.pow(10, p).toLong
    val units = s"CAST(floor(abs($e) * $scale.0 + 0.5) AS BIGINT)"
    val grouped =
      s"replace(format('{:,}', $units // $scale), ',', '.')"
    val body =
      if (p == 0) grouped
      else s"$grouped || ',' || lpad(CAST($units % $scale AS VARCHAR), $p, '0')"
    s"(CASE WHEN ($e) IS NULL THEN NULL ELSE " +
      s"(CASE WHEN ($e) < 0 THEN '-' ELSE '' END) || $body END)"
  }

  /** Driver-side `format_rupiah` (for the S9 renderer). */
  def rupiahStr(v: Double): String = numberStr(v, 2)

  /** Driver-side `format_number` (default precision 1, as the
    * reference's filter defaults). */
  def numberStr(v: Double, p: Int = 1): String =
    String.format(Locale.US, s"%,.${p}f", Double.box(v)).map {
      case ',' => '.'
      case '.' => ','
      case c => c
    }

  /** q63: the valuation report (q05) with display-formatted value and
    * quantity columns — C19 exercised over a report-sized frame with a
    * full oracle. */
  val all: Seq[Query] = Seq(
    Query("q63_formatted_valuation",
      "stock valuation with Indonesian-locale display columns (C19)",
      (s, d) => ops.Financial.stockValue(s, d).select(
        col("part_id"), col("supplier_id"),
        rupiah(col("stock_value")).as("stock_value_idr"),
        idr(col("quantity_on_hand"), 1).as("qty_display")),
      Some(s"""WITH sv AS (${ops.Financial.stockValueSql})
              |SELECT part_id, supplier_id,
              |       ${sqlIdr("stock_value", 2)} AS stock_value_idr,
              |       ${sqlIdr("quantity_on_hand", 1)} AS qty_display
              |FROM sv ORDER BY part_id, supplier_id""".stripMargin),
      headline = false))
}
