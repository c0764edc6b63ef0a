package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators for dedup pipelines (SURVEY §2.4 d8).
  *
  * Near-dup detection emits PAIRS; acting on them (keep one doc per
  * duplicate group) needs the transitive closure — connected
  * components. The reference never gets this far (it stops at per-query
  * results), but every production dedup pipeline runs exactly this step
  * between pair generation and survivor selection.
  */
object GraphOps {

  /** Connected components by min-label propagation WITH pointer-jump
    * shortcutting (Shiloach-Vishkin style): each round every node takes
    * the minimum label among itself and its neighbors (one equi-join +
    * one map-side-combined min aggregation), then jumps through its
    * label's own label (labels are node ids, so one more equi-join).
    * Neighbor-min alone converges in `diameter` rounds — fine for
    * quasi-clique near-dup graphs (diameter ≲ 3) but unbounded for
    * chain-shaped clusters; the shortcut halves remaining path lengths
    * every round, guaranteeing O(log |V|) rounds on ANY graph. All
    * shuffles are on node ids; nothing larger than |V| + |E| ever
    * materializes. Lineage is cut with localCheckpoint each round (an
    * iterative plan otherwise grows exponentially); a real cluster
    * deployment with preemptible executors would use reliable
    * checkpoint(dir) instead.
    *
    * edges: undirected pairs (idA, idB). Returns (id, component) for
    * every endpoint, component = smallest reachable id.
    */
  def connectedComponents(edges: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col(idA).as("src"), col(idB).as("dst"))
      .unionAll(edges.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym.join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min("comp").as("ncomp"))
      val merged = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("pcomp"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
      // shortcut: comp is a node id, so follow it one hop — comp' =
      // min(comp, comp[comp]); labels only ever decrease
      val hop = labels.select(col("id").as("__hid"), col("comp").as("__hcomp"))
      val next = merged.join(hop, merged("comp") === hop("__hid"), "left")
        .select(merged("id"),
          least(col("comp"), coalesce(col("__hcomp"), col("comp"))).as("comp"),
          (least(col("comp"), coalesce(col("__hcomp"), col("comp")))
            < col("pcomp")).cast("long").as("__chg"))
        .localCheckpoint()
      changed = next.agg(coalesce(sum("__chg"), lit(0L))).head().getLong(0)
      labels = next.select("id", "comp")
      iter += 1
    }
    require(changed == 0,
      s"connectedComponents: not converged after $maxIter rounds " +
        "(pointer-jump label propagation needs O(log V) rounds — " +
        "raise maxIter only for astronomically large graphs)")
    labels
  }

  /** Dedup-group view: component id + member count per doc — the
    * survivor-selection input (keep id == component, drop the rest).
    * Group size is a window count over the component key: one shuffle,
    * no component-count table to broadcast (components can number in
    * the millions at corpus scale). */
  def dedupGroups(edges: DataFrame): DataFrame = {
    val wc = org.apache.spark.sql.expressions.Window.partitionBy("comp")
    connectedComponents(edges)
      .withColumn("group_size", count(lit(1)).over(wc))
      .select(col("id").as("doc_id"), col("comp").as("component"),
        col("group_size"))
  }

  /** Survivor selection: per duplicate component, keep the member that
    * maximizes `priorityCol` (quality heuristic — e.g. longest text,
    * preferred source), ties broken by smallest doc_id. One max_by-style
    * window over the component key — the same shuffle dedupGroups
    * already pays, no extra pass over the corpus (docs join the
    * component table on doc_id; docs in no component are untouched
    * upstream).
    *
    * docs must carry (doc_id, priorityCol). Emits one row per
    * component: (component, survivor_id, n_members, n_dropped).
    */
  def survivors(edges: DataFrame, docs: DataFrame,
                priorityCol: String): DataFrame =
    survivorsFromGroups(dedupGroups(edges), docs, priorityCol)

  /** Survivor selection over a PREBUILT component table (doc_id,
    * component, group_size) — the dedup pipeline materializes its
    * components once (d8's row) and every report reads them. */
  def survivorsFromGroups(groups: DataFrame, docs: DataFrame,
                          priorityCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
      .orderBy(col("__prio").desc, col("doc_id").asc)
    groups
      .join(docs.select(col("doc_id"), col(priorityCol),
        lit(1).as("__present")), Seq("doc_id"), "left")
      // Left join + execution-time assert: an inner join would silently
      // drop graph members missing from `docs` (skewing group counts,
      // and vanishing whole components). Presence is detected by a
      // dedicated marker column — NOT by priorityCol IS NULL, which
      // would misfire on a present doc whose priority is legitimately
      // NULL. raise_error lives inside the ordering column itself so
      // column pruning can't elide the check.
      .withColumn("__prio", when(col("__present").isNotNull, col(priorityCol))
        .otherwise(raise_error(concat(
          lit("survivors: doc_id "), col("doc_id"),
          lit(" appears in the dedup graph but is missing from docs")))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("component"), col("doc_id").as("survivor_id"),
        col("group_size").as("n_members"),
        (col("group_size") - 1).as("n_dropped"))
  }

  /** Fixed-point integer PageRank over an undirected pair graph (g1) —
    * importance ranking of nodes in the dedup/link graph. Mass is held
    * in integer units of 1/`scale` and EVERY operation is integer
    * arithmetic (`DIV` for the per-degree split and the damping
    * factor): floating-point addition-order sensitivity — the classic
    * reason iterative numeric jobs can't be compared across engines —
    * is designed out, so the result is bit-identical to the oracle's
    * unrolled integer CTEs by construction. The tiny mass lost to
    * floor division per step is deterministic and identical in both
    * engines.
    *
    * Scale shape per iteration: one equi-join of edges to ranks on src
    * + one map-side-combined sum by dst — the same shuffle pattern as
    * connectedComponents, nothing larger than |V| + |E| materializes,
    * lineage cut per round. Node count is a one-scalar driver
    * aggregate (index-metadata-sized).
    *
    * edges: undirected pairs (id_a, id_b). Returns (doc_id, pr) with
    * pr summing to ~ `scale` across nodes.
    */
  def pageRank(edges: DataFrame, iters: Int,
               scale: Long = 1000000000000L): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    val n = deg.count()
    require(n > 0, "pageRank: empty graph")
    val teleport = (scale * 15L / 100L) / n
    var pr = deg.select(col("src").as("id"), lit(scale / n).as("pr"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      pr = sym
        .join(pr.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst"), expr("pr DIV deg").as("c"))
        .groupBy("dst")
        .agg(sum("c").as("s"))
        .select(col("dst").as("id"),
          (lit(teleport) + expr("(85 * s) DIV 100")).as("pr"))
        .localCheckpoint()
    }
    pr.select(col("id").as("doc_id"), col("pr"))
  }

  /** Fixed-round k-core peeling over an undirected edge list: each
    * round drops every node with degree < k and all its edges, a
    * bounded number of times — the density filter separating template
    * CLIQUES (every member keeps degree ≥ k through every peel) from
    * stars and chains (which dissolve: removing leaves strips the hub).
    * Full k-core needs peeling to a fixpoint (unbounded rounds); the
    * FIXED round count is the declared, oracle-replicable semantics
    * (g1's unrolled-iterations pattern) and in practice 3 rounds
    * separates the regimes. Per round: one degree aggregation + two
    * semi-joins, all keyed on node ids; lineage cut per round.
    * Returns every node with the number of peels it survived and the
    * final membership flag.
    */
  def kcorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    var cur = sym
    var surv = sym.select(col("src").as("id")).distinct()
      .select(col("id"), lit(0L).as("rounds_survived"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val alive = cur.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("id"))
        .localCheckpoint()
      cur = cur.join(alive.select(col("id").as("src")), "src")
        .join(alive.select(col("id").as("dst")), "dst")
        .select("src", "dst").localCheckpoint()
      surv = surv.join(alive.withColumn("__a", lit(1L)), Seq("id"), "left")
        .select(col("id"), (col("rounds_survived")
          + coalesce(col("__a"), lit(0L))).as("rounds_survived"))
        .localCheckpoint()
    }
    surv.select(col("id").as("doc_id"), col("rounds_survived"))
      .withColumn("in_core",
        (col("rounds_survived") === rounds).cast("int"))
  }

  /** BFS hop distances from a set of seed nodes over an undirected
    * edge list: classic frontier expansion — each round the current
    * frontier's neighbors that have no distance yet join at dist+1
    * (one equi-join + one anti-join per round, shuffles on node ids,
    * lineage cut per round). Rounds = eccentricity of the seed set,
    * bounded by `maxIter`; unreachable nodes are absent from the
    * output, exactly like the recursive-CTE oracle. */
  def bfsHops(edges: DataFrame, seeds: DataFrame,
              maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint()
    var visited = seeds.select(col("doc_id").as("id"))
      .distinct().withColumn("hops", lit(0L)).localCheckpoint()
    var frontier = visited
    var round = 0
    var grew = true
    while (grew && round < maxIter) {
      round += 1
      val next = sym.join(frontier.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"))
        .distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .withColumn("hops", lit(round.toLong))
        .localCheckpoint()
      grew = next.limit(1).count() > 0
      if (grew) {
        visited = visited.unionAll(next).localCheckpoint()
        frontier = next
      }
    }
    visited
  }

  /** Exact per-node triangle counts over a canonical (id_a < id_b)
    * undirected edge list. A wedge join (e1.id_b = e2.id_a yields
    * ordered a<b<c paths) closed by an equi-join back onto the (a, c)
    * edge — two shuffle equi-joins, each triangle enumerated exactly
    * once thanks to the ordered orientation (the standard trick that
    * also bounds wedge fan-out by forward-degree at scale). The tiny
    * triangle list is checkpointed once, then exploded into its three
    * corners for the per-node rollup.
    */
  def triangles(edges: DataFrame): DataFrame = {
    // materialize the edge list BEFORE the 3-way self-join (the
    // pageRank/kcore pattern): without the cut, the upstream pair
    // GENERATION lineage (d2's shingle self-join at corpus scale)
    // executes once per join arm and the three full-size shuffle
    // trees coexist — 3x shuffle disk blew the sf100 node where the
    // checkpointed form fits easily (pairs are near-dup-sized)
    val e = edges.select(col("id_a"), col("id_b")).localCheckpoint()
    val wedges = e.select(col("id_a").as("a"), col("id_b").as("b"))
      .join(e.select(col("id_a").as("b"), col("id_b").as("c")), "b")
    val tri = wedges
      .join(e.select(col("id_a").as("a"), col("id_b").as("c")), Seq("a", "c"))
      .localCheckpoint()
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
  }
}
