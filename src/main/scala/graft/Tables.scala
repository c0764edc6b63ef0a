package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the synthetic star schema + corpus tables
  * (see TESTDATA.md). Reading straight from parquet per-query keeps the
  * scan inside Catalyst so filter pushdown / column pruning reach the
  * file source — at 100 TB the scan cost dominates and a pruned scan is
  * the single biggest lever.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet's `ts` encoding has varied across fixture generations:
    * parquet TIMESTAMP(NANOS) (no native Spark type — read nanos as long via
    * the legacy conf and truncate with integer `div`, matching how DuckDB
    * reads TIMESTAMP_NS), or parquet timestamp[us] (read as TIMESTAMP_NTZ or
    * TIMESTAMP depending on isAdjustedToUTC). Dispatch on the loaded type and
    * normalize every variant to session-tz TimestampType — the session runs
    * UTC, so NTZ→TZ is value-preserving and downstream unix_micros / window /
    * comparison semantics are identical across fixtures.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $other in $d")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
