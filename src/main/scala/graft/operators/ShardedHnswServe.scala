package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

/** The sharding seam closed on the GRAPH-STRUCTURED case — the third
  * and hardest member of the serving trilogy (ShardedIvfServer: per
  * cell, embarrassing; ShardedHybridServer: composed scoring, router
  * re-sum; here: the walk itself crosses shard boundaries every hop).
  *
  * Layout (node-sharded, the standard distributed-HNSW placement): N
  * single-JVM HnswLocalServer shards, shard i owning
  * `hash(vec_id) % N` of the corpus — each node's vector, its
  * outgoing adjacency rows (`hash(src) % N`, the same Murmur3 on the
  * same id, so a node's vector and edge list co-locate), and its
  * bucket-directory entries (each shard buckets its OWN vectors with
  * the replicated hyperplanes, so the fleet-wide union IS the
  * single-node directory). Metadata-sized state (the plane schedule,
  * the hop/beam schedule, the global entry point) replicates.
  *
  * The router drives the unchanged walk SCHEDULE; shards answer the
  * two per-hop lookups a walk is made of:
  *  - adjacency: every cursor's out-neighbors come from the one shard
  *    owning that node (others return nothing) — per hop that ships
  *    O(beam · M) ids, KBs on a wire;
  *  - scoring: each candidate's cosine comes from the one shard
  *    owning its vector, computed with the identical sequential dot
  *    fold — so scores are placement-independent and the router's
  *    merge order cannot change them.
  * Per layer-0 hop that is two fan-outs (neighbors, then scores of
  * the deduped frontier) — the real RPC shape of a distributed graph
  * walk; upper-layer descent is width-1 so those hops ship single
  * ids. The router applies round6 exactly where the single node does
  * (steps and final ranking, not LSH seeds) and breaks ties with the
  * same (score desc, vec_id asc) order, so results are bit-identical
  * to the single-node serve — ShardedHnswServeSpec pins parity with
  * HnswLocalServer (itself pinned bit-exact to the distributed hg2
  * walk) plus the over-ceiling unlock.
  *
  * Entry point: each shard reports its best (level, vec_id) candidate
  * under the global (level desc, vec_id asc) order; the router takes
  * the fleet-wide best — the same total order the single node scans,
  * so the same node wins.
  */
final class ShardedHnswServer(
    shards: IndexedSeq[HnswLocalServer],
    w: Array[Array[Array[Double]]],
    entry: Long,
    maxLevel: Int, probes: Int, beam: Int,
    hopsUpper: Int, hopsZero: Int, k: Int) extends Serializable {

  def nShards: Int = shards.length

  private val probeMasks: Array[Long] =
    VectorSearch.probeMasks(w(0).length, probes).toArray

  /** Sequential double fold, the exact order Vec.dot/DotProduct uses
    * (only for the QUERY side here — corpus-vector math runs on the
    * owning shard). */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def dotW(a: Array[Float], plane: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * plane(i); i += 1 }
    s
  }
  private def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  private def round6(x: Double): Double = LocalServe.round6(x)

  private def bucketOf(qv: Array[Float], table: Array[Array[Double]]): Long = {
    var b = 0L; var i = 0
    while (i < table.length) {
      if (dotW(qv, table(i)) >= 0.0) b |= (1L << i); i += 1
    }
    b
  }

  private def top(cands: Iterable[(Long, Double)], n: Int): Array[Long] =
    cands.toArray.sortBy { case (id, sc) => (-sc, id) }.take(n).map(_._1)

  /** Fan a deduped id set to the fleet; each id is scored by the one
    * shard owning its vector. */
  private def scores(qv: Array[Float], qn: Double,
                     ids: Array[Long]): Array[(Long, Double)] =
    shards.iterator.flatMap(_.scoreOwned(qv, qn, ids)).toArray

  /** One walk step across the fleet: neighbors from adjacency owners,
    * scores from vector owners, round6 + (score desc, id asc) top as
    * the single-node HnswLocalServer.step. */
  private def step(cur: Array[Long], layer: Int, qv: Array[Float],
                   qn: Double, width: Int): Array[Long] = {
    val cand = (cur ++ shards.iterator
      .flatMap(_.neighborsOwned(cur, layer))).distinct
    top(scores(qv, qn, cand).map { case (id, sc) => id -> round6(sc) }, width)
  }

  /** LSH-seeded beam entry points: probed-bucket members unioned
    * across each shard's own-vector directory, top-beam on the
    * UNROUNDED score — knnLshRpMultiProbeFrom's semantics, identical
    * to the single node's seeds(). */
  private def seeds(qv: Array[Float], qn: Double): Array[Long] = {
    val cand = scala.collection.mutable.LongMap.empty[Boolean]
    var t = 0
    while (t < w.length) {
      val b0 = bucketOf(qv, w(t))
      probeMasks.foreach { m =>
        shards.foreach(_.bucketMembersOwned(t, b0 ^ m)
          .foreach(id => cand.update(id, true)))
      }
      t += 1
    }
    top(scores(qv, qn, cand.keys.toArray), beam)
  }

  /** Serve one request: top-k (vec_id, score, rnk) — the exact rows
    * the single-node server (and the distributed hg2 walk) produces. */
  def search(qv: Array[Float]): Array[(Long, Double, Int)] = {
    val qn = norm(qv)
    var cur = Array(entry)
    var l = maxLevel
    while (l >= 1) {
      var h = 0
      while (h < hopsUpper) { cur = step(cur, l, qv, qn, 1); h += 1 }
      l -= 1
    }
    val visited = scala.collection.mutable.LongMap.empty[Boolean]
    cur = (cur ++ seeds(qv, qn)).distinct
    cur.foreach(visited.update(_, true))
    var h = 0
    while (h < hopsZero) {
      cur = step(cur, 0, qv, qn, beam)
      cur.foreach(visited.update(_, true))
      h += 1
    }
    val vis = visited.keys.toArray
    val cand = (vis ++ shards.iterator
      .flatMap(_.neighborsOwned(vis, 0))).distinct
    scores(qv, qn, cand)
      .map { case (id, sc) => (id, round6(sc)) }
      .sortBy { case (id, sc) => (-sc, id) }
      .take(k)
      .zipWithIndex
      .map { case ((id, sc), i) => (id, sc, i + 1) }
  }
}

object ShardedHnswServer {

  /** Build the N-shard fleet from the same persisted artifacts the
    * single-node loader reads: shard i holds the corpus rows with
    * `hash(vec_id) % N == i` and the edge rows with
    * `hash(src) % N == i` (Spark's deterministic Murmur3 on the same
    * long, so vector + adjacency co-locate — physical placement only,
    * results are placement-independent). Every shard load goes
    * through the UNCHANGED single-node path, so the per-JVM admission
    * guard binds per shard on BOTH the vector map and the edge
    * table. */
  def fromArtifacts(edges: DataFrame, corpus: DataFrame,
                    w: Array[Array[Array[Double]]],
                    maxLevel: Int, probes: Int, beam: Int,
                    hopsUpper: Int, hopsZero: Int, k: Int, nShards: Int,
                    maxRowsPerShard: Long = LocalServe.MaxRowsPerJvm)
      : ShardedHnswServer = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val shards = (0 until nShards).map { i =>
      HnswLocalServer.fromArtifacts(
        edges.filter(pmod(hash(col("src")), lit(nShards)) === lit(i)),
        corpus.filter(pmod(hash(col("vec_id")), lit(nShards)) === lit(i)),
        w, maxLevel, probes, beam, hopsUpper, hopsZero, k,
        maxRows = maxRowsPerShard)
    }
    val entry = shards.flatMap(_.entryPoint)
      .sortBy { case (lvl, id) => (-lvl, id) }
    require(entry.nonEmpty, "sharded HNSW fleet: empty corpus")
    new ShardedHnswServer(shards, w, entry.head._2,
      maxLevel, probes, beam, hopsUpper, hopsZero, k)
  }
}
