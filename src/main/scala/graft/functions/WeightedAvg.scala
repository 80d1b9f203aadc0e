package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed weighted-average Aggregator — the reference's per-group
  * `np.average(weights=)` UDAF (P7, `wsm/etl_pipeline/transform/
  * financial_metrics.py:60-62`) as a Spark `Aggregator[IN, BUF, OUT]`.
  *
  * The engine's production path stays the builtin-expression ratio
  * (`sum(v*w)/sum(w)` — Financial.weightedAvgCost), which Catalyst
  * codegen-fuses; this Aggregator is the typed-API twin SURVEY §7.3
  * calls for, usable where a `Dataset[T]` pipeline wants a reusable
  * typed aggregation (`ds.groupByKey(...).agg(WeightedAvg.toColumn)`).
  * Zero total weight yields 0.0 (the reference's explicit guard,
  * `functions.sql:204-207`). The buffer is two doubles — partial
  * aggregation (map-side combine) and merge-associativity come from the
  * Aggregator contract, so it scales exactly like the builtin sum pair.
  *
  * Input: (value, weight).
  */
object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {

  override def zero: (Double, Double) = (0.0, 0.0)

  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)

  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) 0.0 else b._1 / b._2

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
