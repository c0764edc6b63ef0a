package graft.operators

import graft.operators.Embed.{tokenHash, tokens, HashMod}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY §2.4).
  *
  * All hash arithmetic is the portable polynomial scheme from Embed so
  * the DuckDB oracle replicates signatures bit-for-bit. Pair generation
  * never materializes the full cross product at scale: candidates come
  * from equi-joins on shingle / band keys, which shuffle on those keys
  * only.
  */
object Dedup {

  /** Distinct word n-gram shingles of a text column; empty array for
    * texts shorter than n tokens (sequence(1, k) with k<1 would count
    * DOWN in Spark and fabricate garbage shingles). */
  def shingles(textCol: Column, n: Int): Column = {
    val tk = tokens(textCol)
    when(size(tk) >= n,
      array_distinct(
        transform(sequence(lit(1), size(tk) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(o => element_at(tk, i + o)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Portable hashes of the distinct shingles. */
  def shingleHashes(textCol: Column, n: Int): Column =
    transform(shingles(textCol, n), s => tokenHash(s))

  /** Exact dedup: group by full text, keep the smallest id.
    * Input (id, text); output one row per distinct text. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy("text")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")

  /** Candidate near-dup pairs by word n-gram Jaccard ≥ minJaccard.
    * Shuffle is on the shingle key (inverted-index join), then on the
    * (id_a, id_b) pair for the intersection count — never all-pairs.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, minJaccard: Double): DataFrame = {
    val sh = docs
      .select(col("doc_id"), shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), size(col("sh")).as("nsh"), explode(col("sh")).as("s"))
    val a = sh.select(col("doc_id").as("id_a"), col("nsh").as("na"), col("s"))
    val b = sh.select(col("doc_id").as("id_b"), col("nsh").as("nb"), col("s"))
    a.join(b, Seq("s")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"), first("na").as("na"), first("nb").as("nb"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  val NumPerms = 16
  val NumBands = 4
  val RowsPerBand: Int = NumPerms / NumBands

  /** MinHash signature from a shingle-hash array column: sig_j = min
    * over hashes h of ((2j+3)·h + (1234567j+89)) mod p, j = 0..15. */
  def minhashSignature(hashesCol: Column): Column =
    transform(sequence(lit(0), lit(NumPerms - 1)), j =>
      array_min(transform(hashesCol, h =>
        ((j * 2 + 3).cast("bigint") * h + (j * 1234567 + 89).cast("bigint")) % lit(HashMod))))

  /** Band keys: the signature split into NumBands runs of RowsPerBand,
    * each serialized to a string key. */
  def bandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(NumBands - 1)), b =>
      array_join(transform(slice(sig, b * RowsPerBand + 1, lit(RowsPerBand)),
        x => x.cast("string")), "_"))

  /** LSH candidate pairs: docs sharing ≥1 identical band. The join is an
    * equi-join on (band_idx, band_key) — the classic MinHash-LSH
    * bucket-join, linear in bucket populations. */
  def minhashCandidates(docs: DataFrame, n: Int): DataFrame = {
    val banded = docs
      .select(col("doc_id"), shingleHashes(col("text"), n).as("hs"))
      .filter(size(col("hs")) > 0)
      .select(col("doc_id"), minhashSignature(col("hs")).as("sig"))
      .select(col("doc_id"), posexplode(bandKeys(col("sig"))).as(Seq("band_idx", "band_key")))
    val a = banded.select(col("doc_id").as("id_a"), col("band_idx"), col("band_key"))
    val b = banded.select(col("doc_id").as("id_b"), col("band_idx"), col("band_key"))
    a.join(b, Seq("band_idx", "band_key")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(countDistinct("band_idx").as("n_shared_bands"))
  }

  val SimhashBits = 30

  /** Per-document SimHash fingerprint: bit i set iff the majority of
    * token hashes have bit i set (tokens weighted by occurrence). 30
    * bits so the value stays inside the portable mod-p hash range. */
  def simhash(textCol: Column): Column = {
    val hs = transform(tokens(textCol), t => tokenHash(t))
    // bit extraction as floor(h / 2^i) % 2: h < 2^30 and 2^i are exact in
    // double, so this matches the oracle's integer `h // (1<<i)` — the
    // lambda variable i rules out shiftright(Column, Int) here.
    aggregate(
      transform(sequence(lit(0), lit(SimhashBits - 1)), i =>
        when(size(filter(hs,
            h => floor(h.cast("double") / pow(lit(2.0), i)) % 2 === 1)) * 2 >= size(hs),
          pow(lit(2.0), i).cast("bigint")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }
}
