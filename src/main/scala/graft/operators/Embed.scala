package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text→vector embedder (SURVEY §2.2 v0_embed).
  *
  * Stands in for the reference's SentenceTransformer MiniLM model
  * (/root/reference/src/db.py:127-129) — model weights can't ship here,
  * so this is a hashing-TF projection: token → polynomial-rolling-hash →
  * bucket in [0, dim), bucket counts L2-normalized. Entirely Catalyst
  * higher-order functions (no UDF), and the hash arithmetic is portable
  * integer math so the DuckDB oracle reproduces it bit-for-bit.
  */
object Embed {

  val HashMod = 1000000007L

  /** Polynomial rolling hash of a token: fold h = (h*31 + codepoint)
    * mod p — the native codegen'd expression (graft.functions.PolyHash). */
  def tokenHash(t: Column): Column = graft.functions.PolyHash(t)

  /** The original HOF formulation, kept as the reference semantics for
    * PolyHash (spec-checked equal). */
  def tokenHashHof(t: Column): Column =
    aggregate(
      sequence(lit(1), length(t)),
      lit(0L),
      (h, i) => (h * lit(31L) + ascii(t.substr(i, lit(1)))) % lit(HashMod))

  /** Whitespace tokens, empties dropped. */
  def tokens(textCol: Column): Column =
    filter(split(textCol, " "), t => length(t) > lit(0))

  /** L2-normalized hashing-TF embedding as array<double>, elements
    * rounded to 6 dp (rounding AFTER normalization, both engines).
    * Computed the scale-right way: explode tokens, hash each ONCE,
    * count per (doc, bucket) with map-side combine, then assemble the
    * dense vector from a per-doc bucket→count map (64 map lookups; a
    * naive per-bucket lambda re-folds every token hash 64× once
    * CollapseProject inlines it).
    */
  private def withNorm(docs: org.apache.spark.sql.DataFrame, textCol: String,
                       dim: Int): org.apache.spark.sql.DataFrame = {
    val buckets = graft.Dist.spread(docs)
      .select(col("doc_id"), explode(tokens(col(textCol))).as("t"))
      .select(col("doc_id"), (tokenHash(col("t")) % dim).cast("int").as("bucket"))
    val maps = buckets.groupBy("doc_id", "bucket").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("c")))).as("m"))
    val counts = transform(sequence(lit(0), lit(dim - 1)),
      b => coalesce(element_at(col("m"), b), lit(0L)).cast("double"))
    maps.withColumn("counts", counts)
      .withColumn("nrm", sqrt(aggregate(col("counts"), lit(0.0), (acc, x) => acc + x * x)))
  }

  private def embeddingExpr: Column =
    transform(col("counts"), x => round(x / col("nrm"), 6))

  def embedDocs(docs: org.apache.spark.sql.DataFrame, textCol: String,
                dim: Int): org.apache.spark.sql.DataFrame =
    withNorm(docs, textCol, dim)
      .select(col("doc_id"), embeddingExpr.as("embedding"))

  /** Corpus embeddings persisted per dataset (fit-or-load, the
    * v8-centroids pattern): the reference embeds documents at INGEST
    * time (/root/reference/src/db.py:127-129) — the embedding table is
    * an offline artifact, and serving-path queries (hybrid search,
    * rank agreement) read it rather than re-embedding the corpus. */
  def embedDocsCached(docs: org.apache.spark.sql.DataFrame, textCol: String,
                      dim: Int, datasetTag: String): org.apache.spark.sql.DataFrame =
    FitOrLoad.parquet(docs.sparkSession, "demb", datasetTag,
      s"col=$textCol;dim=$dim", docs.count())(embedDocs(docs, textCol, dim))

  /** Exploded (doc_id, dim_idx, value) form. posexplode wraps the
    * embedding expression IN the constructing select: exploding a
    * previously-projected interpreted-HOF column re-evaluates the
    * whole chain per OUTPUT row (dim× per doc — see the
    * Dedup.shingleHashRows scaladoc for the measured effect). */
  def embedDocsExploded(docs: org.apache.spark.sql.DataFrame, textCol: String,
                        dim: Int): org.apache.spark.sql.DataFrame =
    withNorm(docs, textCol, dim)
      .select(col("doc_id"), posexplode(embeddingExpr))
      .select(col("doc_id"), col("pos").as("dim_idx"), col("col").as("value"))
}
