package graft

import graft.operators.Pq
import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private lazy val corpus = Tables.embeddings(spark, sf)
    .filter(col("vec_id") >= 8)
    .select(col("vec_id"), col("embedding").as("v"))
  private lazy val queries = Tables.embeddings(spark, sf)
    .filter(col("vec_id") < 8)
    .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  test("codebook has 8 subspaces x 16 codes of dim/8 each, deterministic") {
    val cb = Pq.codebook(corpus)
    assert(cb.length == Pq.NumSubspaces)
    assert(cb.forall(_.length == Pq.Codes))
    assert(cb.forall(_.forall(_.length == 64 / Pq.NumSubspaces)))
    val cb2 = Pq.codebook(corpus)
    assert(cb.flatten.flatten.toSeq == cb2.flatten.flatten.toSeq)
  }

  test("codes are valid and one row per corpus vector") {
    val cb = Pq.codebook(corpus)
    val enc = Pq.encode(corpus, cb).cache()
    assert(enc.count() == corpus.count())
    val bad = enc.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= Pq.Codes).count()
    assert(bad == 0L)
    assert(enc.select(size(col("codes"))).distinct().head().getInt(0)
      == Pq.NumSubspaces)
  }

  test("a codebook seed encodes to itself (distance 0 in every subspace)") {
    val cb = Pq.codebook(corpus)
    // the seed with the smallest mixed hash IS codebook entry 0
    val seed0 = corpus
      .orderBy(graft.operators.Sampling.mixedHash(col("vec_id")).asc,
        col("vec_id").asc)
      .limit(1)
    val codes = Pq.encode(seed0, cb).head().getSeq[Int](1)
    assert(codes.forall(_ == 0))
  }

  private def adcOverlap(cb: Array[Array[Array[Double]]]): Double = {
    val adc = Pq.searchDot(queries, Pq.encode(corpus, cb), cb, 10)
      .select("query_id", "vec_id")
    val exact = graft.operators.VectorSearch.knnDot(queries, corpus, 10)
      .select("query_id", "vec_id")
    adc.intersect(exact).count() / (10.0 * queries.count())
  }

  test("ADC top-k overlaps exact top-k; Lloyd refinement improves it") {
    // This fixture is ~92 near-random 64-d vectors — PQ's worst case
    // (no cluster structure to exploit; distances concentrate), so the
    // floors are modest. Measured: seed 0.1875, 5-iter refined 0.2625
    // top-10 overlap; random baseline is 10/92 ~ 0.11.
    val seed = Pq.codebook(corpus)
    val seedOverlap = adcOverlap(seed)
    assert(seedOverlap >= 0.15, s"seed-codebook overlap $seedOverlap < 0.15")
    val refined = Pq.refine(corpus, seed, 5)
    val refinedOverlap = adcOverlap(refined)
    assert(refinedOverlap >= seedOverlap,
      s"refined $refinedOverlap < seed $seedOverlap")
    assert(refinedOverlap >= 0.2,
      s"refined-codebook overlap $refinedOverlap < 0.2")
    // the production shape is ADC candidate gen + exact rescore: ADC
    // top-30 must recover most of the exact top-10 (measured 0.475)
    val cand = Pq.searchDot(queries, Pq.encode(corpus, refined), refined, 30)
      .select("query_id", "vec_id")
    val exact = graft.operators.VectorSearch.knnDot(queries, corpus, 10)
      .select("query_id", "vec_id")
    val candRecall = cand.intersect(exact).count() / (10.0 * queries.count())
    assert(candRecall >= 0.4, s"ADC-30 recall of exact-10 $candRecall < 0.4")
  }

  test("v14 IVF+PQ equals a driver-side ADC replay over the probed cells only") {
    import graft.operators.VectorSearch
    val ivfCorpus = VectorQueries.ivfCorpus(spark, sf)
    val cents = VectorQueries.centroids(spark, sf)
    val qs = VectorQueries.queryVecs(spark, sf)
    val cb = Pq.codebook(ivfCorpus)
    val sub = cb(0)(0).length
    val codes = Pq.encode(ivfCorpus, cb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val cellOf = VectorSearch.assignCells(ivfCorpus, cents)
      .select("vec_id", "cell_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probedOf = VectorSearch.probeCells(qs, cents, VectorQueries.NProbe)
      .select("query_id", "cell_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val qvs = qs.select(col("query_id"), col("qv").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // independent single-threaded replay: ADC-score every vector whose
    // cell the query probes, take top-K by (score desc, vec_id asc)
    val expect = qvs.flatMap { case (qid, qv) =>
      val scored = codes.toSeq
        .filter { case (vid, _) => probedOf(qid).contains(cellOf(vid)) }
        .map { case (vid, cs) =>
          val s = (0 until Pq.NumSubspaces).map { sp =>
            (0 until sub).map(j => qv(sp * sub + j) * cb(sp)(cs(sp))(j)).sum
          }.sum
          (vid, math.floor(s * 1e6 + (if (s >= 0) 0.5 else -0.5)) / 1e6)
        }
      scored.sortBy { case (vid, s) => (-s, vid) }.take(VectorQueries.K)
        .zipWithIndex.map { case ((vid, s), i) => (qid, vid, s, i + 1) }
    }.toSet
    val got = VectorQueries.v14IvfPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == expect, s"\ngot:    $got\nexpect: $expect")
    // and every returned candidate really lives in a probed cell
    assert(got.forall { case (qid, vid, _, _) =>
      probedOf(qid).contains(cellOf(vid)) })
  }

  test("v15 rescore: scores are the true dot products and candidates come from the ADC pass") {
    val got = VectorQueries.v15IvfPqRescore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    got.foreach { case (qid, vid, score) =>
      val s = vecs(qid).zip(vecs(vid)).map { case (a, b) => a * b }.sum
      val exact = math.floor(s * 1e6 + (if (s >= 0) 0.5 else -0.5)) / 1e6
      assert(score == exact, s"($qid,$vid): rescored $score != exact dot $exact")
    }
    // every rescored hit must be one of the ADC pass's top-m candidates
    val corpus = VectorQueries.ivfCorpus(spark, sf)
    val cents = VectorQueries.centroids(spark, sf)
    val cb = Pq.codebook(corpus)
    val withCell = graft.operators.VectorSearch.assignCells(corpus, cents)
      .select("vec_id", "cell_id").join(Pq.encode(corpus, cb), "vec_id")
    val cand = Pq.searchDotIvf(VectorQueries.queryVecs(spark, sf), withCell,
        cents, cb, VectorQueries.RescoreM, VectorQueries.NProbe)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall { case (qid, vid, _) => cand.contains((qid, vid)) })
  }

  test("driver entries: codes are exhaustive and ADC output is ranked") {
    val codes = VectorQueries.vq2PqCodes(spark, sf)
    assert(codes.count() == corpus.count() * Pq.NumSubspaces)
    val adc = VectorQueries.v11PqAdc(spark, sf)
    val perQ = adc.groupBy("query_id").agg(count(lit(1)).as("n"),
      max("rnk").as("mx")).collect()
    assert(perQ.forall(r => r.getLong(1) == 5L && r.getInt(2) == 5))
  }
}
