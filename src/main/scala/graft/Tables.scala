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
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * has no native type for. Read nanos as long (legacy conf) and convert
    * with integer division — `div`, not `/`, since ~1.7e18 ns overflows a
    * double's 53-bit mantissa. Truncation to micros matches how DuckDB
    * (the oracle) reads TIMESTAMP_NS.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
