package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{DotProduct, WinnowFingerprint}

/** The library's `SparkSessionExtensions` hook — makes the native
  * Catalyst expressions first-class SQL, so `spark.sql("SELECT
  * dot_product(a, b)")` works the same as the Column API
  * (`DotProduct(colA, colB)`).
  *
  * Two front doors, one builder list:
  *  - session-build time (the standard extension path):
  *    `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  *    harness mains ship with it, proving the config path end to end;
  *  - live session: [[GraftExtensions.register]] injects the same
  *    builders into an existing session's function registry (extensions
  *    configs are only read at session BUILD, so a library must offer
  *    both).
  *
  * Only function injection is needed: the engine deliberately carries no
  * custom LogicalPlan/Strategy — every whole-operator semantic composed
  * out of built-in operators (SURVEY.md §4's preference order), so the
  * extension surface is exactly the two codegen-participating
  * expressions that earned their keep by measurement.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def litInt(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  private def litLong(e: Expression, fn: String, pos: Int): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be a long literal, got $other")
  }

  /** (identifier, info, builder) triples — the one list both doors use. */
  val builders: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(arrayA, arrayB)")
        DotProduct(args(0), args(1))
      }),
    (new FunctionIdentifier("winnow_fingerprint"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName,
        "winnow_fingerprint"),
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "winnow_fingerprint(text, k, w, base, modulus)")
        WinnowFingerprint(args(0),
          litInt(args(1), "winnow_fingerprint", 2),
          litInt(args(2), "winnow_fingerprint", 3),
          litLong(args(3), "winnow_fingerprint", 4),
          litLong(args(4), "winnow_fingerprint", 5))
      }))

  /** Inject into a LIVE session (post-build registration door). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
