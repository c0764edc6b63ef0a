package graft

import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

/** hg1/hg2/hg3 — the batch-built HNSW-style layered graph index. */
class HnswSpec extends SparkSpec {

  test("hg1 layers thin geometrically and respect the degree cap M") {
    val edges = VectorQueries.hg1HnswBuild(spark, sf).cache()
    val perLayer = edges.groupBy("layer")
      .agg(countDistinct("src").as("nodes"), max("rnk").as("max_rnk"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(perLayer.map(_._1).toSeq == Seq(0, 1, 2, 3), "all four layers present")
    // hash-geometric levels: each layer's vertex set thins ~4× —
    // monotone decrease is the invariant worth pinning on a small fixture
    assert(perLayer.sliding(2).forall { case Array(a, b) => b._2 < a._2 },
      s"layer populations must shrink: ${perLayer.mkString(", ")}")
    assert(perLayer.forall(_._3 <= VectorQueries.HnswM), "degree cap M")
    assert(edges.filter(col("src") === col("dst")).count() == 0, "no self-loops")
    edges.unpersist()
  }

  test("hg1 upper-layer membership is nested (level l edges only between level>=l nodes)") {
    val edges = VectorQueries.hg1HnswBuild(spark, sf)
    val l3 = edges.filter(col("layer") === 3).select(col("src").as("vec_id")).distinct()
    val lvl = graft.operators.HnswIndex.withLevels(
      Tables.embeddings(spark, sf).filter(col("vec_id") >= 8)
        .select(col("vec_id"), col("embedding").as("v")),
      VectorQueries.HnswMaxLevel)
    val bad = l3.join(lvl, "vec_id").filter(col("lvl") < 3).count()
    assert(bad == 0, "layer-3 sources must have level >= 3")
  }

  test("hg2 search is deterministic and returns k results per query") {
    val a = VectorQueries.hg2HnswSearch(spark, sf).orderBy("query_id", "rnk").collect()
    val b = VectorQueries.hg2HnswSearch(spark, sf).orderBy("query_id", "rnk").collect()
    assert(a.sameElements(b), "seeded walk must be deterministic")
    assert(a.length == 8 * VectorQueries.K)
    assert(a.forall(_.getInt(3) <= VectorQueries.K))
  }

  test("hg4 upsert emits fresh edges only for batch nodes, degree-capped") {
    val delta = VectorQueries.hg4HnswUpsert(spark, sf).cache()
    val badSrc = delta.filter(col("src") % 10 =!= 0).count()
    assert(badSrc == 0, "delta edges must originate at batch nodes only")
    assert(delta.filter(col("src") === col("dst")).count() == 0)
    assert(delta.agg(max("rnk")).head.getInt(0) <= VectorQueries.HnswM)
    // the updated vectors are NEGATED, so their old top neighbors
    // (cos ~ +s) become ~ -s: fresh edges must not simply replay the
    // pre-upsert layer-0 lists
    val before = VectorQueries.hg1HnswBuild(spark, sf)
      .filter(col("layer") === 0 && col("src") % 10 === 0)
      .select("src", "dst")
    val after = delta.filter(col("layer") === 0).select("src", "dst")
    assert(after.intersect(before).count() < before.count(),
      "negated vectors must re-link, not replay their old edges")
    delta.unpersist()
  }

  test("hg5 compaction: degrees re-capped, scores current, searches serve (parity)") {
    import graft.operators.HnswIndex
    import graft.functions.Vec
    val compacted = VectorQueries.hg5HnswCompact(spark, sf).cache()
    // degree cap re-enforced after folding delta + reverse edges
    assert(compacted.agg(max("rnk")).head.getInt(0) <= VectorQueries.HnswM)
    assert(compacted.filter(col("src") === col("dst")).count() == 0)
    // no stale scores: every edge score equals the cosine of the
    // CURRENT (merged) vectors — recompute independently and compare
    val corpus = Tables.embeddings(spark, sf).filter(col("vec_id") >= 8)
      .select(col("vec_id"), col("embedding").as("v"))
    val batch = corpus.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), transform(col("v"), x => -x).as("v"))
    val merged = corpus.filter(col("vec_id") % 10 =!= 0).unionByName(batch)
    val stale = compacted
      .join(merged.select(col("vec_id").as("src"), col("v").as("xs")), "src")
      .join(merged.select(col("vec_id").as("dst"), col("v").as("xd")), "dst")
      .filter(col("score") =!= round(Vec.cosine(col("xs"), col("xd")), 6))
      .count()
    assert(stale == 0, s"$stale stale edge scores survived compaction")
    // parity: the walk over the compacted table still serves k results
    // per query, deterministically
    val queries = Tables.embeddings(spark, sf).filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val vis = HnswIndex.visitedStates(queries, compacted, merged,
      VectorQueries.HnswMaxLevel, VectorQueries.HnswHopsUpper,
      VectorQueries.HnswHopsZero, VectorQueries.HnswBeam)
    val res = HnswIndex.resultsFromVisited(vis, compacted, merged,
      VectorQueries.K).cache()
    assert(res.count() == 8 * VectorQueries.K,
      "compacted graph must serve k results per query")
    assert(res.agg(max("rnk")).head.getInt(0) <= VectorQueries.K)
    res.unpersist(); compacted.unpersist()
  }

  test("hg3 recall curve is monotone in hops and serving-grade (>= 0.8)") {
    val rows = VectorQueries.hg3HnswRecall(spark, sf)
      .orderBy("hops").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.length == VectorQueries.HnswHopsZero + 1)
    assert(rows.sliding(2).forall { case Array(x, y) => y._2 >= x._2 },
      s"recall must not decrease with hops: ${rows.mkString(", ")}")
    // round-9 floor: 2 NN-descent rounds + multi-probe seeds measure
    // 0.95 at sf0.01 and 0.925 at sf0.1 (was 0.525 with 1 round +
    // single-probe seeds) — 0.8 is the serving-grade bar from the
    // round-8 verdict, with headroom for fixture drift
    assert(rows.last._2 >= 0.8,
      s"seeded graph search recall below serving grade: ${rows.last._2}")
  }

  test("hg6 planted-cluster walk: recall non-decreasing in hops, " +
      "serving-grade on geometry with a gradient (r17 verdict task 2)") {
    val rows = VectorQueries.hg6HnswPlanted(spark, sf)
      .orderBy("hops").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.length == VectorQueries.PlantedHopsZero + 1)
    // the planted arm runs WEAK seeds (probes=0) on purpose — any
    // walk regression (broken edge join, wrong rounding in the step
    // comparator, dead beam) that silently flattens hg3's already-
    // flat noise-fixture curve shows up here as a recall DROP vs the
    // curve the fixture supports
    assert(rows.sliding(2).forall { case Array(x, y) => y._2 >= x._2 },
      s"planted recall must not decrease with hops: ${rows.mkString(", ")}")
    assert(rows.last._2 >= 0.8,
      s"planted-cluster recall below serving grade: ${rows.last._2}")
    // the measured hop VALUE lives at sf1 (0.65 hop-0 -> 0.725 hop-3,
    // PlantedTune); at spec scale the curve may already start high —
    // assert only that the walk never loses ground the seeds gained
  }

  test("hg6_planted_s3: the sliced planted twin keeps the full arm's " +
      "contract (hop schedule, monotone recall, serving-grade tail)") {
    val rows = VectorQueries.hg6PlantedS3(spark, sf)
      .orderBy("hops").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.length == VectorQueries.PlantedHopsZero + 1)
    assert(rows.sliding(2).forall { case Array(x, y) => y._2 >= x._2 },
      s"sliced planted recall must not decrease with hops: ${rows.mkString(", ")}")
    assert(rows.last._2 >= 0.8,
      s"sliced planted recall below serving grade: ${rows.last._2}")
  }
}
