package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic float discipline for oracle-hashed
  * statistics queries.
  *
  * The driver hash-compares Spark output against DuckDB bit-for-bit,
  * so every float-derived output column must be the SAME value in both
  * engines on any machine. Three operations are NOT portable and are
  * banned from hashed outputs:
  *
  *   1. The engines' own double→DECIMAL casts (Spark rounds the
  *      shortest decimal repr of the double HALF_UP; DuckDB rounds the
  *      binary value — ties land differently).
  *   2. DECIMAL→DOUBLE casts of values whose scaled integer exceeds
  *      2^53 (DuckDB computes double(scaled_int)/double(10^scale) —
  *      double-rounded; Java converts once, correctly rounded;
  *      verified empirically: ~25% of >2^53 conversions diverge).
  *   3. ln()/log() (libm differs across implementations; Java and
  *      DuckDB disagree in the last ulp).
  *
  * What IS portable, and what this helper builds on:
  *   - BIGINT→DOUBLE is correctly rounded in both engines (Java l2d
  *     and DuckDB, verified empirically; DuckDB's HUGEINT→DOUBLE is
  *     NOT — negatives mis-round — so conversions route via BIGINT).
  *   - +, −, ×, /, sqrt on doubles are IEEE-754 correctly rounded in
  *     both → identical inputs give bit-identical results.
  *   - Truncation toward zero: Spark's decimal→BIGINT cast and
  *     DuckDB's decimal rescale both truncate toward zero (verified
  *     on ±2.5/±2.6), so "truncate to integer" is the one
  *     cross-engine-deterministic decimal rounding.
  *   - DECIMAL × DECIMAL is exact integer arithmetic in both.
  */
object Exact {

  private def pow10L(s: Int): Long = { var r = 1L; var i = 0; while (i < s) { r *= 10; i += 1 }; r }

  /** Deterministic DECIMAL→DOUBLE: truncate d·10^shift toward zero to
    * a BIGINT (exact while |d|·10^shift < 2^63 — the caller picks
    * `shift` so the needed fractional digits survive and the scaled
    * magnitude still fits), convert BIGINT→DOUBLE (correctly rounded
    * in both engines), then ONE IEEE divide/multiply by the exact
    * double 10^|shift|. Bit-identical cross-engine by construction.
    *
    * Negative shift (−6..−1) handles sums whose INTEGER part already
    * passes 2^63: d is first multiplied by the exact decimal
    * 10^shift — decimal×decimal is exact integer math in both
    * engines, with d pre-rescaled to DECIMAL(37+shift,6) so the
    * product precision stays ≤ 38 and NEITHER engine rounds (DuckDB falls
    * back to DOUBLE past width 38; Spark HALF_UP-rounds the scale
    * down — both would reopen the divergence this helper closes). */
  def detDouble(d: Column, shift: Int): Column =
    if (shift == 0) d.cast("bigint").cast("double")
    else if (shift > 0)
      (d * lit(pow10L(shift))).cast("bigint").cast("double") / lit(pow10L(shift).toDouble)
    else {
      val m = java.math.BigDecimal.ONE.movePointLeft(-shift)
      (d.cast(s"decimal(${37 + shift},6)") * lit(m)).cast("bigint").cast("double") *
        lit(pow10L(-shift).toDouble)
    }

  /** SQL mirror of [[detDouble]] (DuckDB: decimal rescale to scale 0
    * truncates toward zero, matching Spark's decimal→BIGINT cast). */
  def detDoubleSql(e: String, shift: Int): String =
    if (shift == 0) s"CAST(CAST(CAST(($e) AS DECIMAL(38,0)) AS BIGINT) AS DOUBLE)"
    else if (shift > 0)
      s"(CAST(CAST(CAST(($e) * ${pow10L(shift)} AS DECIMAL(38,0)) AS BIGINT) AS DOUBLE) / ${pow10L(shift)}.0)"
    else {
      val m = java.math.BigDecimal.ONE.movePointLeft(-shift).toPlainString
      s"(CAST(CAST(CAST(CAST(($e) AS DECIMAL(${37 + shift},6)) * CAST($m AS DECIMAL(${1 - shift},${-shift})) " +
        s"AS DECIMAL(38,0)) AS BIGINT) AS DOUBLE) * ${pow10L(-shift)}.0)"
    }

  /** Deterministic double→DECIMAL(p,s) render: k = floor(x·10^s + 0.5)
    * computed in IEEE double ops (bit-identical given bit-identical x;
    * ties round toward +∞ — OUR formula on BOTH sides, not either
    * engine's cast), then the exact decimal k·10^-s via DECIMAL
    * multiplication. NULL propagates. */
  def render(x: Column, p: Int, s: Int): Column =
    (floor(x * lit(pow10L(s).toDouble) + lit(0.5)).cast("decimal(20,0)") *
      lit(java.math.BigDecimal.ONE.movePointLeft(s))).cast(s"decimal($p,$s)")

  /** SQL mirror of [[render]]. */
  def renderSql(e: String, p: Int, s: Int): String =
    s"CAST(CAST(floor(($e) * ${pow10L(s)}.0 + 0.5) AS DECIMAL(20,0)) * " +
      s"CAST(${java.math.BigDecimal.ONE.movePointLeft(s).toPlainString} AS DECIMAL(${s + 1},$s)) AS DECIMAL($p,$s))"

  /** Exact positive-rational render: round(num/den, s) as DECIMAL(p,s)
    * via pure integer arithmetic — k = (2·num·10^s + den) div (2·den),
    * half-up for non-negative operands (Spark's `div` truncates toward
    * zero, DuckDB's `//` floors: identical on non-negatives). Replaces
    * ln()-based scores with the monotone-equivalent exact ratio.
    * Spark side: num/den must be DECIMAL or BIGINT columns; quotient
    * must fit a BIGINT. */
  def ratioDecimal(num: Column, den: Column, p: Int, s: Int): Column = {
    val n38 = num.cast("decimal(38,0)")
    val d38 = den.cast("decimal(38,0)")
    val k = call_function("div", n38 * lit(2L * pow10L(s)) + d38, d38 * lit(2L))
    (k.cast("decimal(20,0)") *
      lit(java.math.BigDecimal.ONE.movePointLeft(s))).cast(s"decimal($p,$s)")
  }

  /** SQL mirror of [[ratioDecimal]] — operands cast to HUGEINT so the
    * scaled numerator never overflows BIGINT. */
  def ratioDecimalSql(num: String, den: String, p: Int, s: Int): String =
    s"CAST(CAST((2 * CAST(($num) AS HUGEINT) * ${pow10L(s)} + ($den)) // (2 * CAST(($den) AS HUGEINT)) AS DECIMAL(20,0)) * " +
      s"CAST(${java.math.BigDecimal.ONE.movePointLeft(s).toPlainString} AS DECIMAL(${s + 1},$s)) AS DECIMAL($p,$s))"
}
