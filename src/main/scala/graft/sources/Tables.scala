package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's parquet tables (see /root/repo/TESTDATA.md).
  *
  * Each table is one parquet file under `\$dir/<name>.parquet`. Loading goes
  * through `spark.read.parquet` so Catalyst's vectorized reader, predicate
  * pushdown, and column pruning apply to every downstream query — at 100 TB
  * these same loaders would point at a partitioned parquet/iceberg layout and
  * nothing downstream changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark) // idempotent
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped in several parquet physical types across
    * testdata generations — TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects; `nanosAsLong` surfaces it as a raw LONG),
    * TIMESTAMP_MICROS without UTC adjustment (Spark reads TIMESTAMP_NTZ),
    * and UTC-adjusted TIMESTAMP_MICROS (plain TimestampType). Branch on the
    * dtype the reader actually produced and normalize every form to a
    * microsecond TimestampType column, matching what DuckDB sees for the
    * same file under a UTC session:
    *  - LongType (nanos-as-long): integer-divide to micros — the same
    *    truncation DuckDB applies reading TIMESTAMP_NS.
    *  - TimestampNTZType: cast to timestamp — bit-identical under the UTC
    *    session timezone to DuckDB's naive read.
    *  - TimestampType: already the normal form.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet-decoded type $other (expected LONG nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }
  /** documents/embeddings arrive as one small parquet file = ONE input
    * partition, which would serialize the md5/shingle/vector compute that
    * dominates the dedup and similarity pipelines. Spread rows across the
    * executor threads up front — at real scale the source is already
    * many-way partitioned and this is a no-op choice. */
  def documents(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents").repartition(s.sparkContext.defaultParallelism)
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings").repartition(s.sparkContext.defaultParallelism)

  /** Register every table as a temp view so `spark.sql` text queries work.
    * Goes through the specialized loaders (events needs its ts-type
    * normalization; documents/embeddings get their parallelism spread). */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
      "events" -> events, "documents" -> documents, "embeddings" -> embeddings)
    names.foreach { n =>
      loaders.getOrElse(n, (s: SparkSession, d: String) => load(s, d, n))(spark, dir)
        .createOrReplaceTempView(n)
    }
  }
}
