package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing document fingerprints
  * (Schleimer/Wilkerson/Aiken — MOSS) as ONE compiled pass over the
  * string: a true O(1)-step polynomial rolling hash over the char codes
  * plus a monotonic-deque sliding-window minimum, returning the DISTINCT
  * selected fingerprints as `array<bigint>`.
  *
  * Why an Expression and not the higher-order-function formulation
  * ([[graft.ops.TextPipeline.winnowSetsPoly]], kept as the declarative
  * twin): HOFs evaluate a lambda per element outside whole-stage codegen
  * and `slice` allocates a fresh array per position — measured 5.7 s at
  * sf0.1 where this loop is a few hundred ms. Same preference order as
  * [[DotProduct]]: builtin > native Expression > UDF.
  *
  * Semantics are EXACTLY the declarative twin's (unit-pinned, and the
  * DuckDB oracle replays them): per k-gram hash
  * `fold((acc, c) -> (acc·B + c) mod M)` over the chars — the O(1) roll
  * `(H − c_out·B^(k−1))·B + c_in mod M` is the same value by modular
  * identity — then `min` over each window of `w` consecutive hashes,
  * then distinct. Char codes are Unicode CODE POINTS (not UTF-16 units):
  * the HOF twin's zero-width-regex split keeps surrogate pairs together
  * (Java regex is code-point-based) and Spark 4's `ascii()` returns
  * `codePointAt(0)`, the DuckDB oracle's `unicode()` likewise hashes code
  * points, and `length(text)` (= the n_kgrams arithmetic) counts code
  * points — so this loop iterates code points too, keeping all three
  * formulations identical on supplementary-plane text, not just BMP.
  * Strings shorter than k+w−1 code points yield an empty array — callers
  * filter them out, as the reference algorithm demands.
  */
case class WinnowFingerprint(
    child: Expression, k: Int, w: Int, b: Long, m: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  /** One pass: rolling hashes into a ring buffer of the last `w` values
    * tracked by a monotonic deque (indices of increasing hash value), the
    * window min emitted once the window fills, dedup via a hash set. */
  def compute(s: UTF8String): ArrayData = {
    // materialize the code-point sequence once (one int[] per document —
    // same order of allocation as the toString itself); indexed access to
    // the outgoing code point makes the O(1) roll possible on top of the
    // variable-width encoding
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    val nH = n - k + 1
    if (nH < w) return new GenericArrayData(Array.empty[Long])
    // B^(k-1) mod M for the outgoing char's contribution
    var pk = 1L
    var j = 0
    while (j < k - 1) { pk = pk * b % m; j += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val seen = new java.util.HashSet[java.lang.Long]()
    // ring buffers over the last w hashes: values + a monotonic deque of
    // positions with strictly increasing hash. The `>=` pop below means
    // ties keep the NEWEST position — which cannot change the emitted
    // set: equal hash values yield the same window minimum VALUE
    // whichever index holds it, and only values (deduped) are emitted,
    // matching array_min over the slice in the declarative twin.
    val ring = new Array[Long](w)
    val deque = new Array[Int](nH) // positions, front..back
    var dFront = 0
    var dBack = -1
    var h = 0L
    var i = 0
    while (i < n) {
      val c = cps(i).toLong
      if (i < k) h = (h * b + c) % m
      else {
        val cOut = cps(i - k).toLong
        // (h − c_out·B^(k−1))·B + c_in, kept in [0, m)
        h = ((h - cOut * pk % m + m) % m * b + c) % m
      }
      if (i >= k - 1) {
        val pos = i - (k - 1) // hash index in 0..nH-1
        ring(pos % w) = h
        while (dBack >= dFront && ring(deque(dBack) % w) >= h) dBack -= 1
        dBack += 1
        deque(dBack) = pos
        if (deque(dFront) <= pos - w) dFront += 1
        if (pos >= w - 1) {
          val mn = ring(deque(dFront) % w)
          if (seen.add(mn)) out += mn
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the loop lives in this compiled class; codegen injects a reference
    // and emits one virtual call — the expression still participates in
    // whole-stage codegen (no interpreted eval path per row)
    val self = ctx.addReferenceObj("winnowExpr", this, classOf[WinnowFingerprint].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {
  /** Column-API entry point. */
  def apply(text: Column, k: Int, w: Int, b: Long, m: Long): Column =
    GraftSqlBridge.columnOf(
      WinnowFingerprint(GraftSqlBridge.expressionOf(text), k, w, b, m))
}
