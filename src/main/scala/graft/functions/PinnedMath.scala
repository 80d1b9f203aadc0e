package graft.functions

/** Cross-engine BIT-DETERMINISTIC math built from pure `+ − × ÷` IEEE-754
  * double ops and exact integer arithmetic — no libm call anywhere.
  *
  * Why this exists (measured on this platform before q145 was registered):
  * transcendental functions are NOT bit-portable across engines, even on
  * one machine. Sweeping 2.1M rationals x/y ∈ (0,1]:
  *
  *  - JVM `Math.log` (the HotSpot intrinsic) vs DuckDB/glibc `ln`:
  *    2,949 bit mismatches (0.14%).
  *  - JVM `Math.exp` vs DuckDB/glibc `exp`: 5,054 mismatches (0.24%).
  *  - `Math.log` vs `StrictMath.log` (what Spark's `log` codegen actually
  *    calls — `UnaryLogExpression` emits `java.lang.StrictMath.log`):
  *    1.3% of a 100k sweep.
  *
  * So ANY libm-backed score in an oracle-compared column is a latent
  * hash mismatch — it passes on lucky corpora (a 10-value probe here
  * matched 10/10) and fails on the next regeneration. IEEE-754 `+ − × ÷`,
  * by contrast, are CORRECTLY ROUNDED by spec: every engine produces the
  * same bits for the same expression tree. These helpers therefore emit a
  * single SQL TEXT evaluated verbatim by BOTH Spark (`expr(...)`) and
  * DuckDB — the operation tree is pinned by the shared parse, so equality
  * is by construction, not by libm luck.
  *
  * The primitives used exist and agree in both dialects (verified):
  * `bin(BIGINT)` (no zero padding), BIGINT `<<` INT, `1e0/…` double
  * literals, CASE, CAST.
  */
object PinnedMath {

  /** ln 2 as a double literal — 0x1.62e42fefa39efp-1, the correctly
    * rounded value (and what both engines' `ln(2)` return). */
  val LN2 = "0.6931471805599453"

  /** Series depth for [[lnRatioSql]]: coefficients 1, 1/3, …, 1/(2K−1).
    * With the argument range-reduced to m ∈ [1,2) the atanh variable
    * z = (m−1)/(m+1) ≤ 1/3, so the truncation tail after K=20 terms is
    * ≤ 2z·z^40/41/(1−z²) ≈ 8e-21 — far below half an ulp of ln m. The
    * result is a PINNED approximation of ln accurate to ~1–2 ulp (Horner
    * rounding), identical in both engines; it is documented as the
    * operator's scoring function, not as libm ln. */
  val LN_TERMS = 20

  /** SQL text for pinned ln(a/b), where `a`, `b` are SQL expressions
    * (ideally simple column references — each is spliced several times)
    * of positive BIGINTs with a ≤ b, i.e. a/b ∈ (0,1].
    *
    * Shape: exact integer range reduction — s = msb(b) − msb(a) via
    * `length(bin(x))`, one CASE step so am = a·2^k satisfies
    * m = am/b ∈ [1,2) (am stays exact: a·2^k < 2b fits BIGINT while
    * b < 2^62) — then ln m by the atanh series
    * 2z·(1 + z²/3 + z⁴/5 + …), z = (m−1)/(m+1) ∈ [0,1/3], evaluated as a
    * [[LN_TERMS]]-deep Horner chain of double literals, and finally
    * ln(a/b) = ln m − k·ln2. m−1 is exact (Sterbenz); every coefficient
    * `1e0/(2j+1)` constant-folds to the same correctly rounded double in
    * both engines; k·LN2 is one correctly rounded product. */
  def lnRatioSql(a: String, b: String): String = {
    val s = s"(length(bin($b)) - length(bin($a)))"
    val k = s"($s + (CASE WHEN ($a << $s) < $b THEN 1 ELSE 0 END))"
    val m = s"(CAST($a << $k AS DOUBLE) / CAST($b AS DOUBLE))"
    val z = s"(($m - 1e0) / ($m + 1e0))"
    // a bare SQL fragment has no LET, so z and z² are spliced inline at
    // every use — engines may or may not CSE; determinism is unaffected
    val zz = s"($z * $z)"
    // Horner over z²: 1 + z²(1/3 + z²(1/5 + … ))
    val horner = (LN_TERMS - 2 to 0 by -1)
      .foldLeft(s"(1e0/${2 * LN_TERMS - 1})") { (acc, j) =>
        val c = if (j == 0) "1e0" else s"(1e0/${2 * j + 1})"
        s"($c + ($zz * $acc))"
      }
    val lnm = s"((2e0 * $z) * $horner)"
    s"($lnm - (CAST($k AS DOUBLE) * $LN2))"
  }
}
