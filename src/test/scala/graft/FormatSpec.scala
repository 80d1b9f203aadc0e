package graft

import org.apache.spark.sql.functions._

import graft.functions.Format

/** C19 — Indonesian-locale formatting: Column expression and the plain-
  * Scala twin agree with the reference filters' documented examples
  * (`report_generator.py:50-66`: "1.234.567,89", "3.590,8"). */
class FormatSpec extends SparkSpec {
  import spark.implicits._

  test("idr column formats Indonesian style (groups '.', decimals ',')") {
    val vals = Seq(
      Some(1234567.89), Some(0.25), Some(-1234.5), Some(0.0),
      Some(999.999), Some(1e9 + 0.07), None)
    val got = vals.toDF("v")
      .select(Format.rupiah($"v").as("r"), Format.idr($"v", 0).as("whole"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))))
    assert(got.toSeq === Seq(
      (Some("1.234.567,89"), Some("1.234.568")),
      (Some("0,25"), Some("0")),
      (Some("-1.234,50"), Some("-1.235")),  // half-up on the magnitude
      (Some("0,00"), Some("0")),
      (Some("1.000,00"), Some("1.000")),
      (Some("1.000.000.000,07"), Some("1.000.000.000")),
      (None, None)))
  }

  test("precision-1 display matches the reference docstring example") {
    val got = Seq(3590.8).toDF("v")
      .select(Format.idr($"v", 1)).first().getString(0)
    assert(got === "3.590,8")
  }

  test("driver-side string twins match the column expression") {
    assert(Format.rupiahStr(1234567.89) === "1.234.567,89")
    assert(Format.numberStr(3590.8) === "3.590,8")
    assert(Format.numberStr(450.0, 0) === "450")
    assert(Format.rupiahStr(-1234.5) === "-1.234,50")
  }
}
