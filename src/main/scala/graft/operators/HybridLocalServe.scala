package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{avg, col, count, lit, max}

/** Driver-side per-request HYBRID serving runtime (r13 verdict task 6)
  * — the composition of the serving runtimes the way v19_hybrid_ann
  * composes the batch operators: BM25 over the persisted tf artifact +
  * the multi-probe sign-LSH dense arm over the persisted bucket
  * directory (the v19 `vixcb` index artifact) + rank-only RRF fusion.
  * One query string in, fused top-k (doc_id, rrf_score, rnk) out, zero
  * Spark jobs — the reference's actual per-query loop
  * (/root/reference/src/chroma.py:96-106: query → collection.query →
  * fused hits with latency_ms stamped).
  *
  * Parity is bit-exact with the distributed v19HybridAnn, pinned by
  * HybridLocalServeSpec over every fixture query:
  *  - tokens: split on ' ', empties dropped (Embed.tokens);
  *  - term hash: the same (h·31 + codepoint) mod 1e9+7 polyhash,
  *    bucket = hash mod dim (Embed.tokenHash);
  *  - query embedding: bucket counts, L2 norm on RAW counts, each
  *    element HALF_UP-rounded to 6 dp (Embed.withNorm order);
  *  - BM25: Lucene +1 idf floor, the exact expression shape of
  *    Bm25.searchFromTf with scores HALF_UP-rounded to 4 dp and terms
  *    accumulated in ascending term order (the ≤3-term query sums are
  *    order-insensitive at 4 dp on this corpus — the same robustness
  *    the cross-engine gate already relies on);
  *  - dense arm: per-table sign buckets from the shared ±1 planes,
  *    probes = own bucket + every hamming-1 flip, candidates deduped,
  *    cosine as the same sequential double fold, rank by (score desc,
  *    vec_id asc) — VectorSearch.knnLshRpMultiProbeFrom semantics;
  *  - RRF: 1/(60+rnk) per arm, sum rounded to 6 dp, top-k by
  *    (rrf_score desc, doc_id asc) — Hybrid.rrfFuse.
  *
  * Scale honesty (same contract as IvfLocalServer): the posting lists
  * and the bucket directory are in-heap here — the sf-rung deployment
  * of partition-pruned reads against the SAME persisted artifacts
  * (tf/vixcb parquet keyed by term / (tbl, bucket)); a request touches
  * only its query's posting lists and probed cells, so the access
  * pattern is pruned by construction at any corpus size.
  */
final class HybridLocalServer(
    // term -> IMPACT-PRUNED postings (doc, tf, dl): the serve-side
    // copy of Bm25.prunedTf, so per-request lexical work is bounded
    // by |query terms| * PostingCap at any corpus size — the pruning
    // that caps the batch arm also caps the P99 postingMass here
    postings: java.util.HashMap[String, Array[(Long, Long, Long)]],
    // term -> FULL document frequency (idf is computed from the
    // unpruned corpus; pruning truncates lists, it does not re-weight)
    dfByTerm: java.util.HashMap[String, Long],
    nDocs: Long, avgdl: Double,
    buckets: java.util.HashMap[Long, Array[(Long, Array[Double], Double)]], // (tbl<<48)|bucket -> (vec, v, vn)
    w: Array[Array[Array[Double]]], bits: Int,
    armK: Int, fuseK: Int,
    // Per-request dense-candidate budget (r15 verdict task 5): the P99
    // tail IS dense-arm candidate volume (LATENCY_sf1 rho(ms,
    // dense_cands)=0.97, ~9.5k candidates at P99), so a bounded
    // deployment stops ADMITTING new candidates once the budget is hit.
    // Probe order is fixed (table 0..T-1; own bucket, then bit-0..bits-1
    // flips), so the budget keeps the highest-yield probes — each
    // table's exact-match cell — and sheds the hamming-1 expansion
    // tail. Deterministic, and Int.MaxValue (the default) is exactly
    // the uncapped server, preserving HybridLocalServeSpec's bit-exact
    // parity with the distributed v19HybridAnn.
    denseCap: Int = Int.MaxValue) extends Serializable {

  private val K1 = Bm25.K1
  private val B = Bm25.B
  private val dim = w(0)(0).length

  private def round(x: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Embed.tokenHash's polyhash — delegated to the one shared
    * implementation so supplementary (non-BMP) code points advance by
    * Character.charCount exactly as the distributed path does. */
  private def polyHash(t: String): Long =
    graft.functions.PolyHash.hash(t, graft.functions.PolyHash.Base, Embed.HashMod)

  private def tokens(q: String): Array[String] =
    q.split(" ", -1).filter(_.nonEmpty)

  /** Embed.withNorm driver-side: counts → L2 on raw counts → 6 dp. */
  private def embed(toks: Array[String]): Array[Double] = {
    val counts = new Array[Double](dim)
    toks.foreach(t => counts((polyHash(t) % dim).toInt) += 1.0)
    var nsq = 0.0; var i = 0
    while (i < dim) { nsq += counts(i) * counts(i); i += 1 }
    val nrm = math.sqrt(nsq)
    val out = new Array[Double](dim)
    i = 0
    while (i < dim) { out(i) = round(counts(i) / nrm, 6); i += 1 }
    out
  }

  /** Sequential double fold — the exact Vec.dot / DotProduct order. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** (id, score) top-k by (score desc, id asc). */
  private def topK(m: java.util.HashMap[Long, Double], k: Int): Array[(Long, Double)] = {
    val arr = new Array[(Long, Double)](m.size)
    val it = m.entrySet().iterator(); var i = 0
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = arr.sortBy { case (id, sc) => (-sc, id) }
    sorted.take(k)
  }

  /** One request: fused top-fuseK (doc_id, rrf_score, rnk). */
  def search(query: String): Array[(Long, Double, Int)] =
    searchWithStats(query)._1

  /** Shard-facing lexical partials (ShardedHybridServer): for each
    * query term THIS node's posting shard owns, the term's scored
    * postings (doc_id, unrounded BM25 part). Shipping per-term parts
    * — ≤ PostingCap rows/term, the same volume the single node scans —
    * lets the router re-sum in ascending GLOBAL term order, so the
    * sharded sum is bit-identical to the single-node sum (each term is
    * owned by exactly one shard; no cross-shard add-order ambiguity). */
  private[operators] def lexTermParts(
      toks: Array[String]): Array[(String, Array[(Long, Double)])] =
    toks.distinct.sorted.flatMap { term =>
      val plist = postings.get(term)
      if (plist == null) None
      else {
        val df = dfByTerm.get(term).toDouble
        val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
        Some(term -> plist.map { case (docId, tf, dl) =>
          (docId, idf * (tf * (K1 + 1.0)) /
            (tf + K1 * ((1.0 - B) + B * dl / avgdl)))
        })
      }
    }

  /** Shard-facing dense candidates (ShardedHybridServer): every
    * distinct vector in THIS node's share of the probed cells, with
    * its cosine. UNCAPPED by design — a vector's score is the same
    * whichever table's bucket admitted it, so router-side dedup
    * reproduces the single-node candidate set exactly; the denseCap
    * operating point is admission-ORDER-dependent and stays a
    * single-node knob. */
  private[operators] def denseCandidates(
      toks: Array[String]): Array[(Long, Double)] = {
    if (toks.isEmpty) return Array.empty
    val qv = embed(toks)
    val qn = math.sqrt(dot(qv, qv))
    val m = new java.util.HashMap[Long, Double]()
    var t = 0
    while (t < w.length) {
      var b0 = 0L
      var b = 0
      while (b < bits) {
        if (dot(qv, w(t)(b)) >= 0.0) b0 |= (1L << b)
        b += 1
      }
      var p = -1
      while (p < bits) {
        val probed = if (p < 0) b0 else b0 ^ (1L << p)
        val cell = buckets.get((t.toLong << 48) | probed)
        if (cell != null) cell.foreach { case (vecId, v, vn) =>
          if (!m.containsKey(vecId)) m.put(vecId, dot(qv, v) / (qn * vn))
        }
        p += 1
      }
      t += 1
    }
    val out = new Array[(Long, Double)](m.size)
    val it = m.entrySet().iterator(); var i = 0
    while (it.hasNext) { val e = it.next(); out(i) = (e.getKey, e.getValue); i += 1 }
    out
  }

  private[operators] def tokensOf(q: String): Array[String] = tokens(q)

  /** search + the request's exact work profile, for tail-latency
    * attribution: `postingMass` = Σ posting-list lengths over the
    * query's distinct matched terms (every BM25 partial the lexical
    * arm scores), `denseCands` = distinct vectors scored by the probed
    * LSH cells. Zipf term frequencies make postingMass heavy-tailed —
    * a query containing a near-stopword term scores a large fraction
    * of the corpus — which is the P99 driver LatencyReport measures. */
  def searchWithStats(query: String): (Array[(Long, Double, Int)], Long, Long) = {
    val toks = tokens(query)
    var postingMass = 0L

    // ---- lexical arm: BM25 over the posting lists ----
    val lexScores = new java.util.HashMap[Long, Double]()
    toks.distinct.sorted.foreach { term =>
      val plist = postings.get(term)
      if (plist != null) {
        postingMass += plist.length
        val df = dfByTerm.get(term).toDouble
        val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
        plist.foreach { case (docId, tf, dl) =>
          val part = idf * (tf * (K1 + 1.0)) /
            (tf + K1 * ((1.0 - B) + B * dl / avgdl))
          lexScores.merge(docId, part, (a, b) => a + b)
        }
      }
    }
    // round AFTER the sum (Bm25.searchFromTf's round(sum, 4))
    val lexTop = {
      val r = new java.util.HashMap[Long, Double]()
      lexScores.forEach((id, sc) => r.put(id, round(sc, 4)))
      topK(r, armK)
    }

    // ---- dense arm: multi-probe sign-LSH over the bucket directory ----
    // A zero-token query has no embedding: the distributed path's
    // explode of an empty token array drops it from the dense arm, so
    // the serving path contributes no dense candidates either (an
    // unguarded embed() would divide by a zero norm and NaN-sort).
    val vecScores = new java.util.HashMap[Long, Double]()
    val qv = if (toks.isEmpty) new Array[Double](dim) else embed(toks)
    val qn = math.sqrt(dot(qv, qv))
    var t = 0
    while (toks.nonEmpty && t < w.length) {
      var b0 = 0L
      var b = 0
      while (b < bits) {
        if (dot(qv, w(t)(b)) >= 0.0) b0 |= (1L << b)
        b += 1
      }
      var p = -1
      while (p < bits) {
        val probed = if (p < 0) b0 else b0 ^ (1L << p)
        val cell = buckets.get((t.toLong << 48) | probed)
        if (cell != null) cell.foreach { case (vecId, v, vn) =>
          if (!vecScores.containsKey(vecId) && vecScores.size < denseCap)
            vecScores.put(vecId, dot(qv, v) / (qn * vn))
        }
        p += 1
      }
      t += 1
    }
    val vecTop = topK(vecScores, armK)

    // ---- RRF fusion (Hybrid.rrfFuse): 1/(60+rnk), sum, 6 dp ----
    val rrf = new java.util.HashMap[Long, Double]()
    lexTop.zipWithIndex.foreach { case ((id, _), i) =>
      rrf.merge(id, 1.0 / (Hybrid.RrfK + (i + 1)), (a, b) => a + b) }
    vecTop.zipWithIndex.foreach { case ((id, _), i) =>
      rrf.merge(id, 1.0 / (Hybrid.RrfK + (i + 1)), (a, b) => a + b) }
    val fusedAll = {
      val r = new java.util.HashMap[Long, Double]()
      rrf.forEach((id, sc) => r.put(id, round(sc, 6)))
      topK(r, fuseK)
    }
    (fusedAll.zipWithIndex.map { case ((id, sc), i) => (id, sc, i + 1) },
      postingMass, vecScores.size.toLong)
  }
}

object HybridLocalServer {

  /** The measured tail-bounded dense-candidate budget (r17 verdict
    * task 6, LATENCY_sf1): the hybrid tail is entirely dense-candidate
    * bound — rho(ms, dense_cands) = 0.97, slowest requests admit
    * ~9-13k candidates from the hamming-1 probe expansion. Capping at
    * 2048 keeps every exact-match cell's candidates while shedding
    * that expansion tail: P99 9.0 → 2.3 ms at fused_agreement 0.886
    * vs the uncapped batch-parity ranking. */
  val TailBoundedDenseCap = 2048

  /** The tail-bounded OPERATING POINT: same artifacts, same scoring,
    * dense admission capped at [[TailBoundedDenseCap]]. The default
    * `fromArtifacts` stays uncapped (bit-exact batch parity,
    * HybridLocalServeSpec); deployments that need a latency SLO pick
    * this point and accept the measured ~0.886 fusion agreement. */
  def tailBounded(tf: DataFrame, ptf: DataFrame, cb: DataFrame,
                  w: Array[Array[Array[Double]]],
                  armK: Int, fuseK: Int,
                  maxRows: Long = LocalServe.MaxRowsPerJvm): HybridLocalServer =
    fromArtifacts(tf, ptf, cb, w, armK, fuseK,
      denseCap = TailBoundedDenseCap, maxRows = maxRows)

  /** Build from the SAME persisted artifacts the batch v19 serves
    * from: the Bm25 PRUNED posting table (bm25ptf — bounded lists are
    * the point of serving from a pruned index), the full tf table
    * (read only through vocab-sized/scalar AGGREGATES: per-term df and
    * the corpus n_docs/avgdl — never collected row-wise), and the v19
    * bucket directory (vixcb) plus the shared plane schedule. Collects
    * are one-time index loads (the fit-or-load artifacts are
    * metadata-bounded at the sf rungs; see the class scaladoc for the
    * 100 TB layout). */
  def fromArtifacts(tf: DataFrame, ptf: DataFrame, cb: DataFrame,
                    w: Array[Array[Array[Double]]],
                    armK: Int, fuseK: Int,
                    denseCap: Int = Int.MaxValue,
                    maxRows: Long = LocalServe.MaxRowsPerJvm): HybridLocalServer = {
    // single-JVM admission guard (r16 verdict task 6) on both in-heap
    // structures: the pruned postings and the bucket directory. A
    // bigger corpus splits the same term-/(tbl,bucket)-keyed artifacts
    // across serving nodes (LocalServe scaladoc's sharding seam).
    LocalServe.guard(cb.count(), "hybrid dense bucket directory", maxRows)
    LocalServe.guard(ptf.count(), "hybrid pruned posting table", maxRows)
    val bits = w(0).length
    val postRows = ptf.select(col("term"), col("doc_id").cast("long"),
      col("tf").cast("long"), col("dl").cast("long")).collect()
    val postings = new java.util.HashMap[String, Array[(Long, Long, Long)]]()
    postRows.groupBy(_.getString(0)).foreach { case (term, rows) =>
      postings.put(term,
        rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
          .sortBy(_._1))
    }
    // full-corpus df per term (vocab-sized) and the corpus constants,
    // via the SAME aggregates Bm25.searchPruned plans — the serve tier
    // scores with the exact doubles the distributed arm scores with
    val dfByTerm = new java.util.HashMap[String, Long]()
    tf.groupBy("term").agg(count(lit(1)).as("df")).collect()
      .foreach(r => dfByTerm.put(r.getString(0), r.getLong(1)))
    val st = tf.groupBy("doc_id").agg(max("dl").as("dl"))
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")).head()
    val nDocs = st.getLong(0)
    val avgdl = st.getDouble(1)

    val dirRows = cb.select(col("tbl"), col("bucket"), col("vec_id"),
      col("v"), col("vn")).collect()
    val dir = new java.util.HashMap[Long, Array[(Long, Array[Double], Double)]]()
    dirRows.groupBy(r => (r.getInt(0).toLong << 48) | r.getLong(1))
      .foreach { case (key, rows) =>
        dir.put(key, rows.map(r => (r.getLong(2),
          r.getSeq[Double](3).toArray, r.getDouble(4))).sortBy(_._1))
      }
    new HybridLocalServer(postings, dfByTerm, nDocs, avgdl, dir, w, bits, armK, fuseK,
      denseCap)
  }
}
