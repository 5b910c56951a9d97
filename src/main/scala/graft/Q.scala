package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark plan plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names and rounding MUST match between the two — the
  * driver's compare sorts columns by name and hashes values.
  *
  * Queries end with a total ORDER BY and round any reassociation-sensitive
  * double aggregate to a fixed scale, so Spark's partial-aggregation order
  * vs DuckDB's scan order cannot flip a bit (SURVEY §7.4.2).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    expectsEmpty: Boolean = false)

object Q {
  def apply(name: String, sql: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(sql))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
  /** A query whose CORRECT sf0.01 answer is the empty relation (e.g. an
    * invariant-violation detector that must find nothing). Everything
    * else failing to produce rows is treated as a vacuous pass — a bug —
    * by Verify and EntrySpec. */
  def emptyOk(name: String, sql: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(sql), expectsEmpty = true)
}
