package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-stable numeric helpers.
  *
  * Spark's `round(double, n)` rounds the SHORTEST DECIMAL STRING of the
  * double (BigDecimal HALF_UP on `toString`), while DuckDB rounds the
  * binary value — e.g. round(8285.425, 2) is 8285.43 in Spark but 8285.42
  * in DuckDB, because the double is really 8285.42499999999927.
  *
  * `roundN` sidesteps the divergence: floor(x·10ⁿ + 0.5)/10ⁿ is pure IEEE
  * arithmetic, bit-identical on JVM and C++, so the oracle can replicate it
  * exactly with `floor(x * 10^n + 0.5) / 10^n`. (Negative values round
  * half-toward-+∞ — same formula, same result, both engines.)
  */
object NumericFunctions {
  def roundN(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** Order-independent sum over a double column, returned as DOUBLE.
    *
    * A plain `sum(double)` accumulates in whatever order the engine's
    * parallelism dictates, so Spark and the oracle (and even two runs of
    * the same DuckDB with different thread counts) can disagree in the
    * last bits — enough to flip a `roundN` floor edge (round-1 driver
    * failures `events_sessions` / `text_token_stats`). Accumulating in
    * DECIMAL is exact and therefore order-independent; the single final
    * decimal→double conversion is deterministic in both engines. The
    * per-row double→DECIMAL(28,6) cast is unambiguous here because every
    * double in the fixtures is an exact 2-dp value (verified against
    * /root/testdata: `x = floor(x*100+0.5)/100` holds for all of
    * events.value and lineitem prices).
    *
    * Oracle mirror: `CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE)`.
    */
  def decSum(c: Column): Column =
    sum(c.cast(DecimalType(28, 6))).cast(DoubleType)

  /** Exact-numerator average: [[decSum]] / non-null count. The division is
    * a single IEEE op over bit-identical operands, so the quotient is
    * bit-identical across engines. Oracle mirror:
    * `(CAST(sum(CAST(x AS DECIMAL(28,6))) AS DOUBLE) / count(x))`.
    */
  def decAvg(c: Column): Column = decSum(c) / count(c)
}
