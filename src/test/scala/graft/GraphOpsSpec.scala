package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("id_a", "id_b")
  }

  test("connected components: two chains and an isolated pair") {
    // 1-2-3-4 (path), 10-11, 20-21-22 (triangle edge set)
    val cc = GraphOps.connectedComponents(
      edges(1L -> 2L, 2L -> 3L, 3L -> 4L, 10L -> 11L,
        20L -> 21L, 21L -> 22L, 20L -> 22L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("long path converges (diameter rounds, not 2)") {
    val path = (1L until 20L).map(i => i -> (i + 1))
    val cc = GraphOps.connectedComponents(edges(path: _*))
    assert(cc.select(countDistinct("comp")).head().getLong(0) == 1L)
    assert(cc.agg(min("comp")).head().getLong(0) == 1L)
    assert(cc.count() == 20L)
  }

  test("dedupGroups: survivor = min id, group_size counts members") {
    val g = GraphOps.dedupGroups(edges(5L -> 6L, 6L -> 7L, 30L -> 31L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(g.toSet == Set((5L, 5L, 3L), (6L, 5L, 3L), (7L, 5L, 3L),
      (30L, 30L, 2L), (31L, 30L, 2L)))
  }

  test("empty edge set yields empty components") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(GraphOps.connectedComponents(empty).count() == 0L)
  }

  test("survivors keep the highest-priority member, ties to smallest id") {
    import spark.implicits._
    val docs = Seq((5L, 100), (6L, 300), (7L, 300), (30L, 10), (31L, 10))
      .toDF("doc_id", "n_chars")
    val res = GraphOps.survivors(
      edges(5L -> 6L, 6L -> 7L, 30L -> 31L), docs, "n_chars")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // component 5: docs 6 and 7 tie at n_chars=300 -> smaller id 6 wins
    assert(res == Map(5L -> (6L, 3L, 2L), 30L -> (30L, 2L, 1L)))
  }

  test("survivors fail loudly when a graph member is missing from docs") {
    import spark.implicits._
    // doc 7 is in the pair graph but absent from the docs table: an
    // inner join would silently elect among {5, 6} with group_size
    // still 3 — the operator must raise instead
    val docs = Seq((5L, 100), (6L, 300)).toDF("doc_id", "n_chars")
    val ex = intercept[Exception] {
      GraphOps.survivors(edges(5L -> 6L, 6L -> 7L), docs, "n_chars").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("missing from docs")))
  }

  test("triangles: K4 has four, each node in three; a path has none") {
    import spark.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("id_a", "id_b")
    val got = GraphOps.triangles(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    assert(GraphOps.triangles(path).count() == 0L)
    // one triangle hanging off a pendant edge: pendant node counts zero
    val tadpole = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 9L)).toDF("id_a", "id_b")
    val t = GraphOps.triangles(tadpole).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("bfsHops: exact layer distances on a path + unreachable component absent") {
    import spark.implicits._
    // path 1-2-3-4, separate pair 8-9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (8L, 9L)).toDF("id_a", "id_b")
    val seeds = Seq(1L).toDF("doc_id")
    val hops = GraphOps.bfsHops(edges, seeds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hops == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // multi-seed: nearest seed wins
    val two = GraphOps.bfsHops(edges, Seq(1L, 4L).toDF("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == Map(1L -> 0L, 4L -> 0L, 2L -> 1L, 3L -> 1L))
  }
}
