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

  /** Shingles rebuilt from an ALREADY-MATERIALIZED token array column —
    * empty array for texts shorter than n tokens (sequence(1, k) with
    * k<1 would count DOWN in Spark and fabricate garbage shingles);
    * element_at on a real row field is O(1); the same formula applied to
    * `tokens(text)` re-splits the text on every element_at (interpreted
    * HOFs have no subexpression elimination → minutes per query). */
  def shinglesFromTokens(tk: Column, n: Int): Column =
    when(size(tk) >= n,
      array_distinct(
        transform(sequence(lit(1), size(tk) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(o => element_at(tk, i + o)): _*))))
      .otherwise(array().cast("array<string>"))

  /** One row per (doc, distinct shingle hash).
    * Pipeline: tokenize → Exchange (materializes the token array AND
    * spreads the single-file scan across the cluster) → explode the
    * shingle expression IN THE SAME select that builds it → hash once
    * per shingle. Two interpreted-HOF lessons are load-bearing here:
    * (1) hashes are computed on exploded rows, never inside nested
    * lambdas — CollapseProject would inline the char fold into every
    * consumer (16× recompute in the minhash permutations, 300 s/query
    * at sf0.1); (2) `explode(expr)` must wrap the array construction
    * DIRECTLY — projecting the array first and exploding the column in
    * a separate select re-evaluates the interpreted HOF chain per
    * OUTPUT row (measured 14.5 s vs 0.5 s at sf0.1; an Exchange
    * between the selects does not stop the inlining).
    */
  def shingleHashRows(docs: DataFrame, n: Int): DataFrame =
    graft.Dist.spread(docs.select(col("doc_id"), tokens(col("text")).as("tk")))
      .select(col("doc_id"), explode(shinglesFromTokens(col("tk"), n)).as("s"))
      .select(col("doc_id"), tokenHash(col("s")).as("h"))

  /** Exact dedup: group by (length, FOUR independent content hashes),
    * keep the smallest id. Grouping on the ~36-byte digest instead of
    * the full text keeps the shuffle narrow at scale — a 400-char key
    * would move the whole corpus through the exchange. ONE ~30-bit
    * polyhash is past its birthday bound at 100 TB doc counts (false
    * merges guaranteed), so the digest is four independent (base, mod)
    * polyhashes — ~120 bits, collision-free even at 10¹² docs (see
    * PolyHash scaladoc). The oracle groups on the identical portable
    * digest, so even a residual collision agrees across engines.
    */
  /** The d1 digest columns (length + four independent polyhashes). */
  private def digestExprs: Seq[org.apache.spark.sql.Column] = Seq(
    length(col("text")).as("__len"),
    tokenHash(col("text")).as("__h"),
    graft.functions.PolyHash.second(col("text")).as("__h2"),
    graft.functions.PolyHash.third(col("text")).as("__h3"),
    graft.functions.PolyHash.fourth(col("text")).as("__h4"))

  private val digestKeys = Seq("__len", "__h", "__h2", "__h3", "__h4")

  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(digestExprs: _*)
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")

  /** The persisted form of a deduped corpus for INCREMENTAL dedup: one
    * ~36-byte digest row per distinct text. At 100 TB this table is
    * what tomorrow's batch joins against — never the corpus itself. */
  def digests(docs: DataFrame): DataFrame =
    docs.select(digestExprs: _*).distinct()

  /** d12: incremental exact dedup — drop batch rows whose digest the
    * base corpus already holds (left_anti on the digest: a narrow-key
    * shuffle join, broadcastable while the base digest table is small
    * relative to executors), then collapse within-batch copies to the
    * min doc_id. ONLY the batch is read and hashed; the base
    * contributes its digest table — an incremental pipeline never
    * re-reads yesterday's corpus to dedup today's crawl. */
  def incrementalExact(baseDigests: DataFrame, batch: DataFrame): DataFrame =
    batch.select(col("doc_id") +: digestExprs: _*)
      .join(baseDigests, digestKeys, "left_anti")
      .groupBy(digestKeys.map(col): _*)
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")

  /** Posting lists / buckets hotter than this many documents leave the
    * PLAIN self-join: a key shared by f docs contributes f² candidate
    * pairs, and before round 7 everything above this cap was dropped
    * outright. Now buckets in (DefaultDfCap, DropDfCap] are SALTED
    * (Dist.saltedJoin) instead — their pairs are still generated, just
    * spread over HotSalts reducers — and only buckets beyond DropDfCap
    * are dropped (declared semantics, mirrored in the oracles): a
    * shingle in >10⁴ docs is stop-phrase boilerplate with no near-dup
    * signal (standard IR practice), and its pair count is quadratic in
    * a number nothing downstream wants. */
  val DefaultDfCap = 500

  /** Hard drop fallback: buckets with df beyond this are removed before
    * any join (the pre-round-7 cap semantics, one order of magnitude
    * up). This constant is interpolated into every pair oracle. */
  val DropDfCap: Int = DefaultDfCap * 20

  /** Salt fan-out for hot buckets — a (dfCap, DropDfCap] bucket's
    * quadratic pair aggregation spreads over this many reducers. */
  val HotSalts = 8

  /** Shingle hashes whose document frequency exceeds the cap — exposed
    * so pipelines can AUDIT what the cap dropped (no silent caps:
    * `hotShingleHashes(docs, 3, cap).count()` is the dropped-key count,
    * and the cap itself is part of the operator's declared semantics,
    * mirrored in the DuckDB oracle). */
  def hotShingleHashes(docs: DataFrame, n: Int, dfCap: Int): DataFrame =
    shingleHashRows(docs, n).groupBy("h")
      .agg(count(lit(1)).as("df")).filter(col("df") > dfCap)

  /** Candidate near-dup pairs by word n-gram Jaccard ≥ minJaccard.
    * Shuffle is on the shingle key (inverted-index join), then on the
    * (id_a, id_b) pair for the intersection count — never all-pairs.
    * Shingles with document frequency > dfCap are dropped from the
    * shingle SETS (stop-shingle removal) before the join, so both the
    * intersection and the per-doc set sizes see the pruned sets.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, minJaccard: Double,
                        dfCap: Int = DefaultDfCap,
                        dropCap: Int = DropDfCap): DataFrame =
    ngramJaccardPairsFromRows(shingleHashRowsMaterialized(docs, n),
      minJaccard, dfCap, dropCap)

  /** ngramJaccardPairs over already-materialized shingle rows — the
    * share point for d16, which feeds the same scan to both the exact
    * (d2) and the banded (d3) arm. */
  private[graft] def ngramJaccardPairsFromRows(raw: DataFrame,
                                               minJaccard: Double,
                                               dfCap: Int = DefaultDfCap,
                                               dropCap: Int = DropDfCap): DataFrame = {
    // the inverted-index join is on the 8-byte shingle HASH, not the
    // shingle string — same pairs on both engines (the oracle joins on
    // the same portable hash), far narrower shuffle rows. The shingle
    // pipeline is cached so the df-cap aggregation and the self-join
    // don't tokenize+hash the corpus twice, and the join rows carry
    // only (doc_id, h): per-doc shingle counts (recomputed post-prune)
    // rejoin AFTER pair aggregation (docs ≪ pairs).
    // the df cap is a window count over h — ONE pass in the same
    // shuffle key as the self-join, streaming/spill-safe even on a
    // million-doc bucket (collect_list would OOM; a separate
    // aggregate+anti-join branch raced the other cache consumers into
    // materializing this pipeline twice)
    pairIntersectionsFromRows(raw, dfCap, dropCap)
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Shared exact pair-intersection core of d2/d13: df-capped shingle
    * inverted index → self-join on the hash → (id_a, id_b, inter, na,
    * nb) with id_a < id_b. Buckets with df in (dfCap, dropCap] run
    * through the SALTED self-join (candidates generated, work spread);
    * only df > dropCap is dropped. */
  /** Shingle-row budget per shuffle partition for the pair self-join
    * and the pair aggregation. The r18 sf100 event-log profile (g1's
    * cold d2pairs build, 5 M docs): 260 M shingle rows fan out to
    * 1.29 B candidate-pair rows, and at the session's 32 partitions
    * BOTH the join+partial-agg stage and the final pair aggregate
    * crossed execution memory — 116 GB + 112 GB of sorter spill, the
    * two tallest stages of the build. Deriving the width from the
    * materialized shingle count (the cache makes it a free job) keeps
    * per-task state bounded at any N; gates stay at the session value. */
  val ShingleRowsPerPartition = 1000000L

  /** The tokenize→shingle→hash scan materialized ONCE (localCheckpoint)
    * so every consumer inside one query — the sizing count, the df-cap
    * window build, the signature aggregation — reads the 16-byte rows
    * instead of re-running the interpreted tokenize pipeline. Before
    * this the scan ran twice per pairIntersections call (count + cache
    * build) and d14 ran it four times end to end; at 100 TB each
    * avoided re-scan is a full corpus pass. */
  def shingleHashRowsMaterialized(docs: DataFrame, n: Int): DataFrame =
    shingleHashRows(docs, n).localCheckpoint()

  private def pairIntersections(docs: DataFrame, n: Int, dfCap: Int,
                                dropCap: Int): DataFrame =
    pairIntersectionsFromRows(shingleHashRowsMaterialized(docs, n),
      dfCap, dropCap)

  /** pairIntersections over ALREADY-MATERIALIZED (doc_id, h) shingle
    * rows — the share point for queries that need both the exact pair
    * intersections and another view of the same shingle scan (d14,
    * d16). `raw` must be materialized (checkpointed/cached): it is
    * consumed by the sizing count and the join build below. */
  /** The drop-capped inverted index: (doc_id, h, __df) hash-partitioned
    * on h at a width derived from the shingle count, df-counted in the
    * same exchange, dropCap-pruned, CACHED. The share point for both
    * the full pair self-join (d2/d13) and the candidate-bounded
    * intersection (d14). `raw` must be materialized. */
  private[graft] def prunedShingleRows(raw: DataFrame,
                                       dropCap: Int): DataFrame = {
    val wh = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val sessionParts =
      raw.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // the sizing count reads the checkpointed rows — no re-scan
    val parts = math.max(sessionParts,
      (raw.count() / ShingleRowsPerPartition + 1).toInt)
    // one explicit HashPartitioning(h) at the derived width, placed
    // BELOW the df-count window: the window's ClusteredDistribution(h)
    // is satisfied (no second exchange), it runs at `parts` tasks, and
    // the cached result hands the same partitioning to both self-join
    // sides (zero join exchange)
    raw.repartition(parts, col("h"))
      .withColumn("__df", count(lit(1)).over(wh))
      .filter(col("__df") <= dropCap)
      .cache()
  }

  private[graft] def pairIntersectionsFromRows(raw: DataFrame, dfCap: Int,
                                               dropCap: Int): DataFrame = {
    val sh = prunedShingleRows(raw, dropCap)
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    // cold buckets (the overwhelming majority) self-join plainly;
    // HOT buckets — df in (dfCap, dropCap] — go through Dist.saltedJoin
    // so one stop-phrase key's quadratic pair aggregation spreads over
    // HotSalts reducers instead of melting one (j2's static skew
    // split). The generated pairs are identical either way — only the
    // physical plan differs — so the oracle needs no salt awareness.
    // A/B-tested alternatives for the cold path (broadcast join,
    // posting-list combination enumeration) never beat the plain
    // shuffled self-join with map-side pair combining.
    val cold = sh.filter(col("__df") <= dfCap)
    val hot = sh.filter(col("__df") > dfCap)
    val coldPairs = cold.select(col("doc_id").as("id_a"), col("h"))
      .join(cold.select(col("doc_id").as("id_b"), col("h")), Seq("h"))
      .select("id_a", "id_b")
    val hotPairs = graft.Dist.saltedJoin(
        hot.select(col("doc_id").as("id_a"), col("h")),
        hot.select(col("doc_id").as("id_b"), col("h")), "h", HotSalts)
      .select("id_a", "id_b")
    coldPairs.unionAll(hotPairs)
      .filter(col("id_a") < col("id_b"))
      // pair agg stays at the session width: an explicit pair-key
      // repartition at the derived width was A/B-profiled at sf100 and
      // LOST (final-agg stage 2505 → 5090 s CPU — stacking partial+
      // final above the user exchange re-probes all 1.3 B rows in one
      // stage); with the join already widened, the map-side partial
      // agg no longer thrashes and the narrow final agg is acceptable
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(counts.select(col("doc_id").as("id_a"), col("nsh").as("na"))), "id_a")
      .join(broadcast(counts.select(col("doc_id").as("id_b"), col("nsh").as("nb"))), "id_b")
  }

  /** d13: asymmetric CONTAINMENT near-dup — containment(a in b) =
    * |Sa∩Sb| / |Sa|. Jaccard misses subset duplication (a doc fully
    * embedded in a much larger one scores |Sa|/|Sb| ≈ 0); containment
    * is the Broder resemblance companion that catches it — the signal
    * for boilerplate wrappers, quote-expansions, and prefix-truncated
    * crawls. Same inverted-index core as d2 (one extra projection per
    * direction, no new shuffle); emits DIRECTED pairs
    * (id_in, id_out, containment ≥ min). */
  def containmentPairs(docs: DataFrame, n: Int, minContainment: Double,
                       dfCap: Int = DefaultDfCap,
                       dropCap: Int = DropDfCap): DataFrame = {
    val p = pairIntersections(docs, n, dfCap, dropCap)
    // both directions come out of ONE pass over the pair table: the
    // previous unionAll of two projections re-executed the whole
    // inverted-index self-join + pair aggregation per direction (the
    // union's branches share no physical plan), doubling the query's
    // dominant stage. explode of a 2-struct array is the same multiset.
    p.select(explode(array(
        struct(col("id_a").as("id_in"), col("id_b").as("id_out"),
          (col("inter").cast("double") / col("na")).as("containment")),
        struct(col("id_b").as("id_in"), col("id_a").as("id_out"),
          (col("inter").cast("double") / col("nb")).as("containment"))))
        .as("e"))
      .select(col("e.id_in").as("id_in"), col("e.id_out").as("id_out"),
        col("e.containment").as("containment"))
      .filter(col("containment") >= minContainment)
      .select(col("id_in"), col("id_out"),
        round(col("containment"), 6).as("containment"))
  }

  val NumPerms = 16
  val NumBands = 4
  val RowsPerBand: Int = NumPerms / NumBands

  /** MinHash signatures as one aggregation over shingle-hash rows:
    * sig_j = min over hashes h of ((2j+3)·h + (1234567j+89)) mod p,
    * j = 0..15. Sixteen min() aggregates in a single map-side-combined
    * groupBy — each hash is read 16 times but COMPUTED once.
    */
  def minhashSignatures(hashRows: DataFrame): DataFrame = {
    val perms = (0 until NumPerms).map { j =>
      min((lit((j * 2 + 3).toLong) * col("h") + lit((j * 1234567 + 89).toLong)) % lit(HashMod))
        .as(s"s$j")
    }
    hashRows.groupBy("doc_id")
      .agg(perms.head, perms.tail: _*)
      .select(col("doc_id"), array((0 until NumPerms).map(j => col(s"s$j")): _*).as("sig"))
  }

  /** Band keys: the signature split into NumBands runs of RowsPerBand,
    * each serialized to a string key. */
  def bandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(NumBands - 1)), b =>
      array_join(transform(slice(sig, b * RowsPerBand + 1, lit(RowsPerBand)),
        x => x.cast("string")), "_"))

  /** LSH candidate pairs: docs sharing ≥1 identical band. The join is an
    * equi-join on (band_idx, band_key) — the classic MinHash-LSH
    * bucket-join, linear in bucket populations. Buckets with more than
    * dfCap docs run through the SALTED self-join (their candidates are
    * still generated, spread over HotSalts reducers); only buckets
    * beyond dropCap are removed (a bucket that common is a degenerate
    * band — e.g. the all-identical-signature of boilerplate docs — and
    * its members are found by exact/canonical dedup). */
  def minhashCandidates(docs: DataFrame, n: Int,
                        dfCap: Int = DefaultDfCap,
                        dropCap: Int = DropDfCap): DataFrame =
    minhashBandPairs(minhashSignatures(shingleHashRows(docs, n)),
      dfCap, dropCap)
      .groupBy("id_a", "id_b")
      .agg(countDistinct("band_idx").as("n_shared_bands"))

  /** The banded LSH self-join from PRECOMPUTED signatures: (id_a, id_b,
    * band_idx) with id_a < id_b, one row per shared band — the share
    * point for d14/d16, which reuse one signature table across several
    * consumers instead of re-running the scan + 16-perm aggregation. */
  private[graft] def minhashBandPairs(sigs: DataFrame, dfCap: Int,
                                      dropCap: Int): DataFrame = {
    // bucket-size cap as a window count over the band key — one pass,
    // same shuffle key as the self-join (see ngramJaccardPairs); the
    // result is cached so the banded self-join doesn't run the
    // signature pipeline twice
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy("band_idx", "band_key")
    val banded = sigs
      .select(col("doc_id"), posexplode(bandKeys(col("sig"))).as(Seq("band_idx", "band_key")))
      .withColumn("__df", count(lit(1)).over(wb))
      .filter(col("__df") <= dropCap)
      // one composite key so the salted path has a single join column
      .withColumn("__bkey", concat_ws("#", col("band_idx"), col("band_key")))
      .cache()
    val cold = banded.filter(col("__df") <= dfCap)
    val hot = banded.filter(col("__df") > dfCap)
    val coldPairs = cold
      .select(col("doc_id").as("id_a"), col("band_idx"), col("band_key"))
      .join(cold.select(col("doc_id").as("id_b"), col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"))
      .select("id_a", "id_b", "band_idx")
    val hotPairs = graft.Dist.saltedJoin(
        hot.select(col("doc_id").as("id_a"), col("band_idx"), col("__bkey")),
        hot.select(col("doc_id").as("id_b"), col("__bkey")), "__bkey", HotSalts)
      .select("id_a", "id_b", "band_idx")
    coldPairs.unionAll(hotPairs)
      .filter(col("id_a") < col("id_b"))
  }

  /** d14: MinHash Jaccard ESTIMATION — the other half of the MinHash
    * contract (d3 only buckets): for every LSH candidate pair, the
    * unbiased estimate (matching signature components / NumPerms)
    * beside the exact df-capped shingle jaccard. At 100 TB the
    * estimate is what a pipeline actually thresholds on — comparing
    * two 16-long signatures instead of re-intersecting shingle sets —
    * and this operator is also the calibration report showing what
    * 16 permutations buy (σ ≈ √(j(1−j)/16)). Signatures join back to
    * candidates by doc id; the exact side left-joins (a band collision
    * between disjoint shingle sets scores exact 0). */
  def minhashEstimates(docs: DataFrame, n: Int,
                       dfCap: Int = DefaultDfCap,
                       dropCap: Int = DropDfCap): DataFrame = {
    // ONE materialized shingle scan feeds everything: before this the
    // query ran the tokenize→shingle→hash pipeline four times (the
    // standalone signature build, minhashCandidates' internal rebuild,
    // pairIntersections' sizing count and its cache build) and the
    // 16-permutation signature aggregation twice. sigs is checkpointed
    // because it has three consumers (the band pipeline + both sig_a /
    // sig_b join sides).
    val raw = shingleHashRowsMaterialized(docs, n)
    val sigs = minhashSignatures(raw).localCheckpoint()
    val cand = minhashBandPairs(sigs, dfCap, dropCap)
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
      .localCheckpoint() // feeds the exact semi-join + both sig joins
    // exact jaccard ONLY for the candidate pairs (guide §3.2 shape):
    // the full pair self-join materializes the intersection of EVERY
    // co-shingle pair — the d2-sized candidate-pair explosion, 1.3 B
    // rows at sf100 — and the old LEFT JOIN then kept the LSH
    // candidates (a vanishing fraction; that selectivity is the whole
    // point of banding). Routing the pruned inverted index through the
    // candidate pair list instead bounds the work at
    // |shingle rows| × candidates-per-doc. Same values: a candidate
    // pair sharing no shingle has no intersection row and its exact
    // jaccard coalesces to 0 exactly as before.
    val sh = prunedShingleRows(raw, dropCap).select("doc_id", "h")
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val exact = sh.select(col("doc_id").as("id_a"), col("h"))
      .join(cand, "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("h")), Seq("id_b", "h"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(broadcast(counts.select(col("doc_id").as("id_a"),
        col("nsh").as("na"))), "id_a")
      .join(broadcast(counts.select(col("doc_id").as("id_b"),
        col("nsh").as("nb"))), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("xj"))
    cand
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("n_eq", aggregate(zip_with(col("sig_a"), col("sig_b"),
        (x, y) => (x === y).cast("int")), lit(0), _ + _))
      .join(exact, Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"),
        round(col("n_eq").cast("double") / NumPerms, 6).as("est_jaccard"),
        round(coalesce(col("xj"), lit(0.0)), 6).as("exact_jaccard"))
  }

  // 60-bit fingerprints (r12 verdict task 2: production SimHash is
  // 64-bit; 30 bits saturate as N approaches 2^30 ≈ 1e9 docs — random
  // hamming-≤2 collisions then drown true near-dups and melt the
  // rescore). 60 = two independent 30-bit portable polyhash halves
  // (tokenHash / PolyHash.second), keeping every per-token hash inside
  // the mod-p range both engines share; random collision mass at
  // hamming ≤ 2 is now ~C(60,2)·N²/2^60 — nil until ~10^8 docs, and the
  // 48-bit agreement keys below keep the JOIN collision-free far past
  // that.
  val SimhashBits = 60
  val SimhashBlocks = 10
  val SimhashBlockBits = 6 // block b covers bits [6b, 6b+6) of the fingerprint

  /** The (blocks − maxHamming)-block agreement keys: one XOR-mask per
    * way of choosing which `maxHamming` blocks are ALLOWED to differ;
    * the key is the fingerprint with those blocks zeroed. C(10,2) = 45
    * combos of 48-bit agreement keys for the hamming-≤2 contract. */
  def simhashComboMasks(maxHamming: Int): Seq[Long] = {
    val blockMask = (1L << SimhashBlockBits) - 1
    val full = (1L << (SimhashBlocks * SimhashBlockBits)) - 1
    (0 until SimhashBlocks).combinations(maxHamming).map { blocks =>
      blocks.foldLeft(full)((m, b) => m & ~(blockMask << (b * SimhashBlockBits)))
    }.toSeq
  }

  /** Near-duplicate pairs under a Hamming-distance bound on SimHash
    * fingerprints — an EXACT algorithm with a bucket-bounded join: by
    * pigeonhole, the ≤ maxHamming differing bits of a qualifying pair
    * touch ≤ maxHamming of the 6 disjoint 5-bit blocks, so the pair
    * agrees exactly on the other (6 − maxHamming) blocks — i.e. it
    * collides on the combo key that masks out exactly the touched
    * blocks. Candidates are the per-combo equi-join on the MASKED
    * fingerprint and the bit_count(xor) rescore filters exactly.
    *
    * Scale shape (the r11 sf10 lesson): the previous 3×10-bit band
    * split keyed on ONE agreeing band — a 2^10 key space whose
    * within-bucket pair volume grows ~N²/2^10 (6.3 B scored pairs at
    * 500 k docs). The (6−2)-block agreement key spans 20 bits, so
    * random-collision volume is C(6,2)·N²/2^20 — 2^10× finer for one
    * extra explode row per doc (15 vs 3), with the SAME exact output
    * (both are complete for hamming ≤ 2; the banding is pure execution
    * strategy). Saturation — any fixed-width fingerprint degrading as
    * N approaches 2^bits — was the r12 ceiling at 30 bits; at 60 bits
    * it sits past 10^8 docs (and the fix is the same two-knob widen).
    * Rows through the join are (combo, key, id, simhash) — no payload
    * problem. */
  /** Keyed-row budget per shuffle partition for the combo self-join.
    * The r18 sf100 event-log profile found d7's only superlinear term:
    * at the session-fixed 32 shuffle partitions, 225 M keyed rows put
    * ~7 M rows of join state in each partition — past the execution-
    * memory threshold, 20.9 GB of sorter spill; re-running the join at
    * 128 partitions cut the stage's CPU 31%. On a real cluster the
    * partition count scales with the data; this derives it instead of
    * inheriting the session constant: ~2 M keyed rows/partition keeps
    * per-task join state in memory at any N while small inputs stay at
    * defaultParallelism (identical plans at gate scale). */
  val SimhashKeyedRowsPerPartition = 2000000L

  def simhashPairs(sims: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming < SimhashBlocks,
      s"pigeonhole guarantee needs maxHamming < $SimhashBlocks blocks")
    val masks = simhashComboMasks(maxHamming)
    // localCheckpoint: the signature table is N×16B (tiny at any rung)
    // and it feeds three consumers — the sizing count plus both join
    // sides — so the upstream 60-aggregate fingerprint job runs once.
    val sigs = sims.select(col("doc_id"), col("simhash")).localCheckpoint()
    // never BELOW the session's shuffle-partition setting (rung runs
    // size that knob deliberately); the derived count only raises it
    // when the keyed volume outgrows the session default
    val sessionParts =
      sims.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val parts = math.max(sessionParts,
      (sigs.count() * masks.length / SimhashKeyedRowsPerPartition + 1).toInt)
    val keyed = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array(masks.map(m =>
        col("simhash").bitwiseAND(lit(m))): _*))
        .as(Seq("combo", "key")))
      // explicit HashPartitioning(combo, key) at the DERIVED count:
      // both self-join sides inherit it (one ReusedExchange), so the
      // join itself adds no exchange and its state is bounded per task
      .repartition(parts, col("combo"), col("key"))
    val a = keyed.select(col("combo"), col("key"),
      col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val b = keyed.select(col("combo"), col("key"),
      col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("combo", "key")).filter(col("id_a") < col("id_b"))
      // filter BEFORE the pair-dedup groupBy: only matching pairs
      // shuffle; cross-combo duplicates of the same pair collapse after
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .groupBy("id_a", "id_b")
      .agg(min("hamming").as("hamming"))
  }

  /** Per-document SimHash fingerprints: bit i set iff the majority of
    * token hashes have bit i set (tokens weighted by occurrence). Bits
    * 0-29 come from the primary polyhash, bits 30-59 from the
    * independent second polyhash — each half stays inside its portable
    * mod-p hash range, and both engines share the two hash literals.
    *
    * Computed as 60 bit-count aggregates over exploded token-hash rows
    * (one shuffle, map-side combined) — the nested-lambda formulation
    * made CollapseProject re-run every token's char fold per bit.
    */
  def simhashes(docs: DataFrame, textCol: String): DataFrame = {
    val half = SimhashBits / 2
    val th = graft.Dist.spread(docs)
      .select(col("doc_id"), explode(tokens(col(textCol))).as("t"))
      .select(col("doc_id"), tokenHash(col("t")).as("h1"),
        graft.functions.PolyHash.second(col("t")).as("h2"))
    val bitCounts = (0 until SimhashBits).map { i =>
      val (src, sh) = if (i < half) ("h1", i) else ("h2", i - half)
      sum(shiftright(col(src), sh) % 2).as(s"b$i")
    }
    val aggs = bitCounts :+ count(lit(1)).as("n")
    th.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        (0 until SimhashBits).map(i =>
          when(col(s"b$i") * 2 >= col("n"), lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Exact-substring duplication detection (d11) — the signal behind
    * Lee et al.'s "Deduplicating Training Data Makes Language Models
    * Better": long token spans repeated ANYWHERE in the corpus (other
    * docs or the same doc) are memorization fuel, invisible to
    * whole-doc dedup (d1) and soft for shingle-Jaccard (d2). Per doc:
    * every length-`w` token window (stride 1, so duplicated spans are
    * caught at ANY alignment), hashed; a window is duplicated iff its
    * hash occurs more than once corpus-wide. Emits
    * (doc_id, n_windows, n_dup_windows, dup_ratio).
    *
    * Scale shape: explode windows (the hash wraps the array
    * construction DIRECTLY — see shingleHashRows on why), one
    * map-side-combined count per window hash, one equi-join back on the
    * hash, one per-doc aggregate — every shuffle key is an 8-byte hash.
    * The window rows feed both the global count and the join, so they
    * are eagerly localCheckpointed (a lazy cache double-materializes
    * under the join's broadcast race, §5). The ~30-bit hash has the
    * same birthday caveat as d1: at 100 TB widen to the 4-polyhash
    * digest; here the oracle replicates the identical hash so residual
    * collisions agree across engines. The full suffix-array machinery
    * of the paper finds MAXIMAL duplicated spans; fixed-w windows are
    * the standard distributed approximation (any duplicated span ≥ w
    * is caught by its first window).
    */
  def dupSpans(docs: DataFrame, textCol: String, w: Int): DataFrame = {
    val tk = col("tk")
    // sequence(1, size-w+1) would DESCEND for short docs (sequence
    // infers step -1 when start > stop) — gate on size >= w instead
    val spanHashes = when(size(tk) >= w,
      transform(sequence(lit(1), size(tk) - (w - 1)),
        j => tokenHash(array_join(slice(tk, j, lit(w)), " "))))
      .otherwise(array().cast("array<bigint>"))
    val windows = graft.Dist.spread(
        docs.select(col("doc_id"), tokens(col(textCol)).as("tk")))
      .select(col("doc_id"), explode(spanHashes).as("h"))
      .localCheckpoint()
    val counts = windows.groupBy("h").agg(count(lit(1)).as("c"))
    val perDoc = windows.join(counts, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum((col("c") > 1).cast("long")).as("n_dup_windows"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .withColumn("dup_ratio", when(col("n_windows") > 0,
        round(col("n_dup_windows").cast("double") / col("n_windows"), 4))
        .otherwise(lit(0.0)))
  }
}
