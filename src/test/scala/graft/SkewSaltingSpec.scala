package graft

import graft.queries.Relational
import org.apache.spark.sql.functions._

/** Planted-skew proof for the salting paths (r8 verdict task 4): a
  * Zipf-keyed variant where one key owns ~50% of all rows — the shape
  * a single-template crawl or one dominant language produces. The spec
  * pins (a) the salted results are ROW-IDENTICAL to the plain ones,
  * and (b) the salt actually decomposes the hot key: the biggest
  * (key, salt) partial is a fraction of the hot key's total, so no
  * single reducer sees the whole hot group at any scale.
  */
class SkewSaltingSpec extends SparkSpec {
  import spark.implicits._

  private val Salts = 8

  /** 10k rows, key k owns ~2^-(k+1) of them (key 0 ≈ half). */
  private def zipfFrame = {
    val df = spark.range(10000)
      .select(col("id").as("row_id"),
        (lit(9) - floor(log(2.0, pmod(col("id") * 2654435761L, lit(1023)) + 1)))
          .cast("int").as("key"),
        (col("id") % 97).cast("double").as("value"))
    df
  }

  test("planted Zipf: saltedSum is row-identical to the plain aggregate") {
    val df = zipfFrame.cache()
    val hot = df.groupBy("key").count().orderBy(desc("count")).head()
    assert(hot.getLong(1) > df.count() / 3,
      s"fixture must be skewed; hottest key has ${hot.getLong(1)} rows")
    val salted = Dist.saltedSum(df, "key", "value", Salts)
      .select(col("key"), round(col("sum_value"), 2).as("s"), col("n_rows"))
      .collect().toSet
    val plain = df.groupBy("key")
      .agg(round(sum("value"), 2).as("s"), count(lit(1)).as("n_rows"))
      .collect().toSet
    assert(salted == plain)
    df.unpersist()
  }

  test("planted Zipf: the salt decomposes the hot key across reducers") {
    val df = zipfFrame
    // phase-1 group sizes: with S salts, the hot key's largest partial
    // must be well under its total — the whole point of the two-phase
    // plan (a plain groupBy puts the full hot group on ONE reducer)
    val partials = df.withColumn("__salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(Salts)))
      .groupBy("key", "__salt").count()
      .groupBy("key").agg(max("count").as("max_partial"),
        sum("count").as("total"), countDistinct("__salt").as("n_salts"))
      .orderBy(desc("total")).head()
    assert(partials.getLong(3) == Salts,
      s"hot key must spread over all $Salts salts, got ${partials.getLong(3)}")
    assert(partials.getLong(1) <= partials.getLong(2) / 2,
      s"hot key max partial ${partials.getLong(1)} vs total ${partials.getLong(2)}")
  }

  test("planted Zipf: saltedJoin is row-identical to the plain join") {
    val probe = zipfFrame.select(col("key"), col("value"))
    val build = (0 to 9).map(k => (k, s"dim_$k")).toDF("key", "label")
    val plain = probe.join(build, "key").collect().toSet
    val salted = Dist.saltedJoin(probe, build, "key", Salts).collect().toSet
    assert(plain.nonEmpty && salted == plain)
  }

  test("sk2 registry query equals its sk3 plain twin on the real fixture") {
    val a = Relational.sk2SkewSaltedAgg(spark, sf).collect().toSet
    val b = Relational.sk3SkewPlainAgg(spark, sf)
      .select("skew_key", "sum_cents", "n_rows").collect().toSet
    assert(a.nonEmpty && a == b)
    // the ladder plants real skew on the fixture too: key 0 ≈ half
    val n = Relational.sk3SkewPlainAgg(spark, sf)
      .agg(sum("n_rows")).head.getLong(0)
    val hot = Relational.sk3SkewPlainAgg(spark, sf)
      .filter(col("skew_key") === 0).head.getLong(2)
    assert(hot > n / 3 && hot < 2 * n / 3, s"hot share $hot of $n")
  }
}
