package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection (SURVEY §2.5 cf1) — the
  * decontamination step every LLM training pipeline runs: find corpus
  * documents sharing enough word n-grams with a held-out benchmark
  * set that they'd leak evaluation data into training.
  *
  * Shape at 100 TB: both sides reduce to (doc, shingle-hash) rows; the
  * overlap is an inverted-index equi-join on the 8-byte hash — shuffle
  * on the hash only, never document-pair all-pairs. The benchmark side
  * is orders of magnitude smaller than the corpus (eval sets are
  * thousands of docs), so Spark broadcasts it and the corpus never
  * shuffles at all.
  */
object Contamination {

  /** Corpus docs sharing ≥ minShared distinct n-gram shingles with a
    * benchmark doc: (doc_id, benchmark_id, n_shared).
    *
    * Shingles present in more than `dfCap` BENCHMARK docs are dropped
    * before the join — the same stop-shingle guard as the Dedup
    * family: a common 3-gram shared by most benchmark docs multiplies
    * every matching corpus row by the benchmark df (join blow-up) and
    * its matches carry no contamination signal anyway. The benchmark
    * side is the multiplier, so the cap is computed there (one window
    * pass over the small side). */
  def check(corpus: DataFrame, benchmark: DataFrame, n: Int,
            minShared: Int, dfCap: Int = Dedup.DefaultDfCap): DataFrame = {
    val c = Dedup.shingleHashRows(corpus, n)
    val wb = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val b = Dedup.shingleHashRows(benchmark, n)
      .withColumn("__df", count(lit(1)).over(wb))
      .filter(col("__df") <= dfCap).drop("__df")
      .select(col("doc_id").as("benchmark_id"), col("h"))
    c.join(broadcast(b), Seq("h"))
      .groupBy("doc_id", "benchmark_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
