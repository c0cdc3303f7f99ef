package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine determinism helpers.
  *
  * The correctness gate hash-compares our results against DuckDB running
  * ANSI SQL on the same parquet. Floating-point SUMs are order-dependent, so
  * every money aggregation goes through an exact decimal cast (the test data
  * is 2-decimal-place money stored as DOUBLE): decimal sums are exact and
  * order-independent, and the final cast back to DOUBLE rounds identically
  * in both engines. This also mirrors what a production pipeline should do
  * at 100 TB — non-deterministic aggregates break retries and audits.
  */
object Compat {
  /** Exact 2-dp decimal view of a money column (values ≤ 10^10). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact 2-dp decimal view of a small rate column (discount/tax in [0,1]). */
  def rate(c: Column): Column = c.cast(DecimalType(3, 2))

  val oneRate: Column = lit(1).cast(DecimalType(3, 2))

  /** l_extendedprice * (1 - l_discount), exactly. */
  def discPrice(price: Column, discount: Column): Column =
    money(price) * (oneRate - rate(discount))

  /** l_extendedprice * (1 - l_discount) * (1 + l_tax), exactly. */
  def charge(price: Column, discount: Column, tax: Column): Column =
    discPrice(price, discount) * (oneRate + rate(tax))

  /** SQL fragment mirroring [[money]]. */
  def moneySql(col: String): String = s"CAST($col AS DECIMAL(12,2))"

  /** SQL fragment mirroring [[discPrice]]. */
  def discPriceSql(price: String, discount: String): String =
    s"CAST($price AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST($discount AS DECIMAL(3,2)))"

  /** SQL fragment mirroring [[charge]]. */
  def chargeSql(price: String, discount: String, tax: String): String =
    s"${discPriceSql(price, discount)} * (CAST(1 AS DECIMAL(3,2)) + CAST($tax AS DECIMAL(3,2)))"

  /** Correctly-rounded decimal-sum → double for the ORACLE side.
    *
    * DuckDB's direct `CAST(DECIMAL AS DOUBLE)` converts the int128
    * unscaled value to double FIRST and divides by 10^scale second — two
    * roundings, off by 1 ulp once the unscaled value exceeds 2^53
    * (observed: q01's scale-6 charge sum at the 10× gate, engine
    * 0x...501 vs oracle 0x...500). Spark's `Decimal.toDouble`
    * (BigDecimal) is correctly rounded, so the ENGINE value is the right
    * one; the oracle gets the same correct rounding by bouncing through
    * VARCHAR (DuckDB's string→double parse rounds once). Byte-identical
    * to the direct cast whenever the unscaled sum fits 2^53, so small-sf
    * gates are unaffected.
    */
  def sumDoubleSql(inner: String): String =
    s"CAST(CAST(sum($inner) AS VARCHAR) AS DOUBLE)"
}
