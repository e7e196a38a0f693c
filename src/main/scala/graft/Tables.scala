package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Loaders for the driver-provided parquet star schema (TESTDATA.md) plus
  * shared column helpers used to keep results bit-identical with the
  * DuckDB oracle.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame   = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

/** Column helpers shared by the query inventory.
  *
  * Floating-point SUMs are order-dependent, and Spark's shuffle-merge order
  * is nondeterministic run-to-run, so any `sum(double)` can differ from the
  * DuckDB oracle (and from itself) in the last ulps. All summed doubles are
  * therefore routed through an exact DECIMAL(28,6) cast: the per-row cast is
  * a deterministic function of the double, decimal addition is associative,
  * and the final cast back to double is exact — giving bit-identical results
  * in both engines regardless of aggregation order.
  */
object Cols {
  private val Dec = DecimalType(28, 6)

  /** Exact, order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Exact average of a double column (decimal sum / count, double division). */
  def davg(c: Column): Column =
    sum(c.cast(Dec)).cast("double") / count(lit(1)).cast("double")

  /** Oracle-SQL spelling of [[dsum]]. */
  def dsumSql(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(28,6))) AS DOUBLE)"

  /** Oracle-SQL spelling of [[davg]]. */
  def davgSql(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(28,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)"
}
