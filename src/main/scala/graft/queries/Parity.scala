package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine determinism helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * oracle SQL on the same inputs. Floating-point aggregation order differs
  * between engines, so every money/measure aggregate goes through exact
  * DECIMAL arithmetic and is only cast back to DOUBLE at the very end —
  * an exact decimal has a single nearest double, so both engines emit the
  * identical bits. Counts are BIGINT everywhere.
  */
object Parity {

  /** Exact 2-dp decimal view of a double money column. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** SUM over exact decimals, surfaced as a deterministic double. */
  def sumMoney(c: Column): Column = sum(dec(c)).cast("double")

  /** AVG as exact-decimal SUM divided by COUNT in double — IEEE division is
    * deterministic given identical operands, unlike native double SUM/AVG. */
  def avgMoney(c: Column): Column =
    sum(dec(c)).cast("double") / count(c).cast("double")

  /** Timestamps are compared as epoch microseconds (BIGINT) to sidestep
    * parquet ns/us/ms physical-type differences between engines. */
  def tsMicros(c: Column): Column = unix_micros(c)
}
