package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
}
