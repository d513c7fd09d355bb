package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One graded query: a DataFrame builder over a scale-factor directory plus
  * (when SQL-expressible) the equivalent ANSI SQL the driver runs in DuckDB.
  *
  * Determinism rules applied everywhere (SURVEY.md §2 R1/R2):
  *  - every query ends with a total-order ORDER BY;
  *  - no raw `sum(double)`: doubles are cast to DECIMAL before summation
  *    (exact, order-independent), then the final value is cast back to
  *    DOUBLE so both engines emit the identical bit pattern;
  *  - output column names match the oracle SQL aliases exactly.
  */
final case class Q(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(oracle: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(build, Some(oracle))
  def noOracle(build: (SparkSession, String) => DataFrame): Q =
    Q(build, None)
}

trait QueryModule {
  /** Insertion-ordered (name -> query). Names are stable driver-contract keys. */
  def queries: Seq[(String, Q)]
}

/** Shared determinism helpers (R2: exact, order-independent aggregation). */
object Dsl {
  /** Exact sum of a double column: decimal-accumulate, emit double. */
  def dsum(c: Column): Column = sum(c.cast("decimal(28,4)")).cast("double")

  /** Exact mean of a double column: decimal sum / count, emitted as double. */
  def davg(c: Column): Column =
    (sum(c.cast("decimal(28,4)")).cast("double") / count(lit(1)))

  /** Oracle-side (DuckDB) spellings of the same. */
  def sqlDsum(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(28,4))) AS DOUBLE)"
  def sqlDavg(e: String): String =
    s"(CAST(SUM(CAST(($e) AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*))"
}
