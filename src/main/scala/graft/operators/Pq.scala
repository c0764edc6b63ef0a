package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization ANN (SURVEY §2.3 vq2) — the memory-bound scale
  * path beyond int8 (vq1): a D-dim float vector compresses to
  * `NumSubspaces` one-byte codes (64 dims × 8 bytes → 8 bytes, 64×),
  * and query scoring becomes `NumSubspaces` table lookups instead of a
  * D-element dot product (ADC — asymmetric distance computation). At
  * 100 TB this is what lets a candidate set live in executor memory:
  * the full-precision vectors are only touched to rescore the final
  * top candidates.
  *
  * Codebooks here are `Codes` deterministically hash-sampled corpus
  * vectors per subspace (seeds); production would Lloyd-refine them
  * exactly like IvfIndex sample-fits its centroids — the operator
  * shape (tiny broadcast codebook, one imperative encode pass, LUT
  * scoring) is identical either way. Encoding runs as a per-partition
  * imperative kernel (argmin over 16 centroids × 8 subspaces — the
  * same batched-inference shape as TextInference/MultiModal, with the
  * codebook as the "model"): a 16-way argmin in interpreted Catalyst
  * HOFs would re-evaluate the distance fold per comparison.
  */
object Pq {

  val NumSubspaces = 8
  val Codes = 16

  /** Deterministic seed codebook: the `Codes` corpus vectors with the
    * smallest mixed-hash of vec_id, sliced per subspace.
    * codebook(s)(c) = seed c's subvector in subspace s. */
  def codebook(corpus: DataFrame): Array[Array[Array[Double]]] = {
    val seeds = corpus
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
      .orderBy(Sampling.mixedHash(col("vec_id")).asc, col("vec_id").asc)
      .limit(Codes)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(seeds.length == Codes, s"corpus smaller than $Codes vectors")
    val dim = seeds.head.length
    require(dim % NumSubspaces == 0, s"dim $dim not divisible by $NumSubspaces")
    val sub = dim / NumSubspaces
    Array.tabulate(NumSubspaces, Codes) { (s, c) =>
      seeds(c).slice(s * sub, (s + 1) * sub)
    }
  }

  /** Lloyd-refine a codebook per subspace: `iters` rounds of
    * assign-to-nearest (the encode kernel) + per-(subspace, code)
    * subvector mean. Each round is one encode pass plus ONE map-side-
    * combined aggregation over (subspace, code, dim) — at 100 TB the
    * aggregation output is NumSubspaces×Codes×subDim rows regardless of
    * corpus size, so the collect is index-metadata-sized. Empty cells
    * keep their previous centroid. Deterministic given the (hash-
    * sampled) seed init — no RNG.
    *
    * The driver-checked vq2/v11 entries use the raw seed codebook (the
    * oracle replicates seed selection in SQL; k-means is not
    * SQL-expressible — same policy as v8). This is the production
    * quality path, spec-bounded like v8's recall.
    */
  def refine(corpus: DataFrame, cb0: Array[Array[Array[Double]]],
             iters: Int): Array[Array[Array[Double]]] = {
    val sub = cb0(0)(0).length
    var cb = cb0
    for (_ <- 0 until iters) {
      val vecs = corpus.select(col("vec_id"),
        col("v").cast("array<double>").as("v"))
      val means = vecs.join(encode(vecs, cb), "vec_id")
        .select(col("v"), posexplode(col("codes")).as(Seq("s", "code")))
        .select(col("s"), col("code"),
          posexplode(expr(s"slice(v, s * $sub + 1, $sub)")).as(Seq("j", "x")))
        .groupBy("s", "code", "j").agg(avg("x").as("m"))
        .collect()
      val next = Array.tabulate(NumSubspaces, Codes)((s, c) => cb(s)(c).clone())
      means.foreach(r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3))
      cb = next
    }
    cb
  }

  /** Encode every corpus vector to its per-subspace nearest-seed codes:
    * (vec_id, codes array<int>). One imperative pass per partition with
    * the broadcast codebook; ties on the lower code id. */
  def encode(corpus: DataFrame, cb: Array[Array[Array[Double]]]): DataFrame = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(cb)
    val sub = cb(0)(0).length
    val outSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("codes", ArrayType(IntegerType, containsNull = false),
        nullable = false)))
    val dim = NumSubspaces * sub
    val encoded = corpus
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
      .rdd.mapPartitions { it =>
      val book = bc.value
      it.map { r =>
        val id = r.getLong(0)
        val v = r.getSeq[Double](1)
        require(v.length == dim,
          s"Pq.encode: vector $id has dim ${v.length}, codebook expects $dim")
        val codes = Array.tabulate(NumSubspaces) { s =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < Codes) {
            var d = 0.0; var j = 0
            while (j < sub) {
              val diff = v(s * sub + j) - book(s)(c)(j); d += diff * diff; j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          best
        }
        Row(id, codes.toSeq)
      }
    }
    spark.createDataFrame(encoded, outSchema)
  }

  /** encode() variant that also emits the winning squared distance per
    * subspace, quantized ONCE to floor(err·1e6) (the pq3 distortion
    * input): the distance fold is the exact sequential order the
    * oracle's list_reduce runs, so the doubles — and therefore the
    * floors — are bit-identical across engines; aggregating the
    * quantized longs is then order-independent. One row per
    * (vector, subspace). */
  def encodeWithError(corpus: DataFrame,
                      cb: Array[Array[Array[Double]]]): DataFrame = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(cb)
    val sub = cb(0)(0).length
    val outSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("subspace", IntegerType, nullable = false),
      StructField("code", IntegerType, nullable = false),
      StructField("errq", LongType, nullable = false)))
    val dim = NumSubspaces * sub
    val rows = corpus
      .select(col("vec_id"), col("v").cast("array<double>").as("v"))
      .rdd.mapPartitions { it =>
      val book = bc.value
      it.flatMap { r =>
        val id = r.getLong(0)
        val v = r.getSeq[Double](1)
        require(v.length == dim,
          s"Pq.encodeWithError: vector $id has dim ${v.length}, expects $dim")
        (0 until NumSubspaces).map { s =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < Codes) {
            var d = 0.0; var j = 0
            while (j < sub) {
              val diff = v(s * sub + j) - book(s)(c)(j); d += diff * diff; j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          Row(id, s, best, math.floor(bestD * 1e6).toLong)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** ADC top-k dot-product search over PQ codes: per query, the lookup
    * table lut(s)(c) = dot(query subvector s, codebook(s)(c)) is
    * computed once (driver-free — it's a literal-free expression over
    * the broadcast query row), then every corpus score is
    * Σ_s lut(s)(codes(s)) — `NumSubspaces` array lookups, no float
    * vector ever read. Exact-rescore of the returned candidates with
    * the full vectors is the standard follow-up (see vq1's kNN spec).
    */
  /** Per-query dot-product lookup tables:
    * lut(s)(c) = dot(query subvector s, codebook(s)(c)). */
  private def lutFor(queries: DataFrame,
                     cb: Array[Array[Array[Double]]]): DataFrame = {
    val spark = queries.sparkSession
    val bc = spark.sparkContext.broadcast(cb)
    val sub = cb(0)(0).length
    val lutSchema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("lut", ArrayType(ArrayType(DoubleType, containsNull = false),
        containsNull = false), nullable = false)))
    spark.createDataFrame(
      queries.select(col("query_id"), col("qv").cast("array<double>").as("qv"))
        .rdd.mapPartitions { it =>
        val book = bc.value
        it.map { r =>
          val q = r.getSeq[Double](1)
          val lut = Array.tabulate(NumSubspaces, Codes) { (s, c) =>
            var d = 0.0; var j = 0
            while (j < sub) { d += q(s * sub + j) * book(s)(c)(j); j += 1 }
            d
          }
          Row(r.getLong(0), lut.map(_.toSeq).toSeq)
        }
      }, lutSchema)
  }

  /** score = fold over the 8 codes — a small bounded HOF over
    * materialized arrays (not a per-pair vector fold). */
  private def adcScore: Column =
    aggregate(zip_with(col("codes"), col("lut"),
        (code, tbl) => element_at(tbl, code + 1)),
      lit(0.0), (acc, x) => acc + x)

  def searchDot(queries: DataFrame, codes: DataFrame,
                cb: Array[Array[Array[Double]]], k: Int): DataFrame = {
    val scored = graft.Dist.spread(codes).crossJoin(broadcast(lutFor(queries, cb)))
      .withColumn("score", adcScore)
      .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
    graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(col("score").desc, col("vec_id").asc), k)
  }

  /** ADC rerank restricted to an existing candidate PAIR table (the
    * mid-tier of a retrieval cascade): only the shortlisted
    * (query, vec) pairs are scored — Σ 8 table lookups each — so the
    * stage's cost is shortlist-sized, independent of the corpus. */
  def rerankDot(pairs: DataFrame, codes: DataFrame, queries: DataFrame,
                cb: Array[Array[Array[Double]]], k: Int): DataFrame = {
    val scored = pairs.join(codes, "vec_id")
      .join(broadcast(lutFor(queries, cb)), "query_id")
      .withColumn("score", adcScore)
      .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
    graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(col("score").desc, col("vec_id").asc), k)
  }

  /** IVF + PQ — the billion-scale ANN composition (FAISS IVFADC): the
    * query probes its `nprobe` nearest IVF cells, and ONLY vectors
    * assigned to those cells are ADC-scored. Per-query work =
    * (corpus/cells)·nprobe table lookups instead of a full scan of
    * even the compressed codes; the float vectors are never read at
    * all. `codesWithCell` carries (vec_id, cell_id, codes) — the
    * persisted form of the index is exactly this table partitioned by
    * cell_id (IndexStore's layout), so the probe join prunes to the
    * probed partitions.
    */
  def searchDotIvf(queries: DataFrame, codesWithCell: DataFrame,
                   centroids: DataFrame, cb: Array[Array[Array[Double]]],
                   k: Int, nprobe: Int): DataFrame = {
    val probed = VectorSearch.probeCells(queries, centroids, nprobe)
      .select("query_id", "cell_id")
    val scored = graft.Dist.spread(codesWithCell)
      .join(broadcast(probed), "cell_id")
      .join(broadcast(lutFor(queries, cb)), "query_id")
      .withColumn("score", adcScore)
      .select(col("query_id"), col("vec_id"), round(col("score"), 6).as("score"))
    graft.plans.TopK.perKey(scored, Seq("query_id"),
      Seq(col("score").desc, col("vec_id").asc), k)
  }
}
