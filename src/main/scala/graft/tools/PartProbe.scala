package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: does a repartition(col).localCheckpoint() preserve
  * HashPartitioning through LogicalRDD so a later equi-join on that
  * key skips the Exchange on the checkpointed side? (guide §2.4 —
  * decides whether the iterative-graph loops can pre-partition their
  * loop-invariant edge tables once.) */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val e = spark.range(0, 100000)
      .select((col("id") % 5000).as("src"), (col("id") % 777).as("dst"))
    val small = spark.range(0, 5000)
      .select(col("id").as("src"), (col("id") * 2).as("pr"))

    println("=== A: plain localCheckpoint, join on src ===")
    val a = e.localCheckpoint()
    a.join(small, "src").groupBy("dst").agg(sum("pr")).explain("formatted")

    println("=== B: repartition(src) + localCheckpoint, join on src ===")
    val b = e.repartition(col("src")).localCheckpoint()
    b.join(small, "src").groupBy("dst").agg(sum("pr")).explain("formatted")

    println("=== C: same but AQE off for the consumer ===")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val c = e.repartition(col("src")).localCheckpoint()
    c.join(small, "src").groupBy("dst").agg(sum("pr")).explain("formatted")

    println("=== D: checkpoint under AQE-off, consume under AQE-on ===")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val d = e.repartition(col("src")).localCheckpoint()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    d.join(small, "src").groupBy("dst").agg(sum("pr")).explain("formatted")

    println("=== E: pageRank round shape, sym+deg pre-partitioned ===")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val sym = e.repartition(col("src")).localCheckpoint()
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    var pr = deg.select(col("src").as("id"), lit(100L).as("pr")).localCheckpoint()
    val round = sym
      .join(pr.withColumnRenamed("id", "src"), "src")
      .join(deg, "src")
      .select(col("dst"), expr("pr DIV deg").as("c"))
      .groupBy("dst").agg(sum("c").as("s"))
    round.explain("formatted")

    spark.stop()
  }
}
