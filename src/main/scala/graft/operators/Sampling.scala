package graft.operators

import graft.operators.Embed.tokenHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data sampling & shuffling operators (SURVEY §2.5).
  * Deterministic by construction (portable-hash order, not RNG) so
  * every run — and the DuckDB oracle — selects identical rows.
  */
object Sampling {

  /** Polyhash + multiplicative mixing. The bare polyhash of a short
    * decimal string is ORDER-PRESERVING (hash("8") < hash("9")), which
    * would make the "shuffle" an identity permutation; multiplying by a
    * large odd constant mod p scatters consecutive keys. Fits in a
    * 63-bit product (h < 2^30, constant < 2^32), so the DuckDB oracle
    * computes the identical value in BIGINT.
    */
  def mixedHash(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (tokenHash(c.cast("string")) * lit(2654435761L)) % lit(Embed.HashMod)

  val mixedHashSqlConst = 2654435761L

  /** Stratified sample: the first ceil(frac·n) rows per stratum in
    * mixed-hash order of the key (a uniform, reproducible draw).
    * One shuffle on the stratum key.
    */
  def stratified(df: DataFrame, stratumCol: String, keyCol: String,
                 frac: Double): DataFrame = {
    val w = Window.partitionBy(stratumCol)
      .orderBy(mixedHash(col(keyCol)).asc, col(keyCol).asc)
    val counts = Window.partitionBy(stratumCol)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(counts))
      .filter(col("__rn") <= ceil(col("__n") * frac))
      .drop("__rn", "__n")
  }

  /** Deterministic global shuffle: stable pseudo-random order from the
    * mixed hash of the key — the reproducible train-data shuffle (same
    * order on every engine and every run).
    *
    * Global positions come from Dist.globalRank — range-partition on
    * the (hash, key) total order, rank per partition in parallel,
    * shift by driver-prefix-summed offsets — NOT a partitionless
    * window (which would drag the whole dataset through one task) and
    * NOT an rdd.zipWithIndex round trip (which drops out of Catalyst:
    * every row through a Row RDD, no codegen, no columnar scan). The
    * sort order is total, so positions are engine-independent
    * regardless of where the range boundaries fall.
    */
  def deterministicShuffle(df: DataFrame, keyCol: String): DataFrame =
    graft.Dist.globalRank(
      df.withColumn("__hk", mixedHash(col(keyCol))),
      Seq(col("__hk").asc, col(keyCol).asc), "shuffle_pos")
      .drop("__hk")

  /** Per-group frequency cap (domain/source capping in crawl
    * pipelines): keep at most `cap` rows per group, chosen in
    * mixed-hash order of the key — a deterministic uniform draw, not
    * "first crawled wins" — ties to the key. Runs on the custom
    * TopKPerKey operator: per-partition bounded heaps mean a hot
    * domain with 10⁸ pages ships `cap` candidates per partition to
    * the reducer, not all 10⁸ rows into one sort. */
  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                  cap: Int): DataFrame =
    graft.plans.TopK.perKey(
      df.withColumn("__hk", mixedHash(col(keyCol))),
      Seq(groupCol), Seq(col("__hk").asc, col(keyCol).asc), cap,
      rankName = "keep_rank")
      .drop("__hk")

  /** Deterministic train/val/test split (s3): bucket = mixed hash of
    * the key mod 100; train < `trainPct`, val < trainPct+`valPct`,
    * else test. Pure per-row arithmetic — no shuffle, no RNG, stable
    * under reruns and re-partitioning, and every engine (and future
    * run) assigns each row to the same split. */
  def split(df: DataFrame, keyCol: String,
            trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"split percentages must be >= 0 with train+val <= 100, " +
        s"got train=$trainPct val=$valPct")
    val bucket = mixedHash(col(keyCol)) % 100
    df.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Weighted source-mixture sampling (s4): keep a row iff its
    * mixed-hash draw (uniform in [0, 1000)) falls under its group's
    * weight×1000 threshold — the dataset-mixture step of training-data
    * assembly (e.g. up-weight books, down-weight web). `weights` rides
    * in as a broadcast-joined table rather than a when()-chain so a
    * production weight table (thousands of sources) needs no plan
    * rebuild. Rows whose group has no weight are dropped (weight 0).
    *
    * Weights must be in [0, 1]: this operator only DOWN-samples (rows
    * are never duplicated), so an up-weight > 1 is rejected rather than
    * silently behaving as keep-all. Thresholds use round(), not a
    * truncating cast — weight 0.0625 means 62.5 ≈ 63/1000, not 62.
    */
  def mixtureSample(df: DataFrame, groupCol: String, keyCol: String,
                    weights: Map[String, Double]): DataFrame = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      s"mixtureSample weights must be in [0, 1] (no row replication): $weights")
    val spark = df.sparkSession
    import spark.implicits._
    val wt = broadcast(
      weights.toSeq.toDF(groupCol, "__w")
        .select(col(groupCol), round(col("__w") * 1000).cast("long").as("__thresh")))
    df.join(wt, groupCol)
      .filter(mixedHash(col(keyCol)) % 1000 < col("__thresh"))
      .drop("__thresh")
  }

  /** Vocabulary builder: global token frequencies, rank-ordered — the
    * seed step of tokenizer/BPE training. Explode → one shuffle with
    * map-side combine → top-N by the custom TopK operator.
    */
  def vocabulary(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    val freq = graft.Dist.spread(docs)
      .select(explode(Embed.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
    graft.plans.TopK.perKey(freq, Seq(),
      Seq(col("freq").desc, col("token").asc), topN, "rank")
  }
}
