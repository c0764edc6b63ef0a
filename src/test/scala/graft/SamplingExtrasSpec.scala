package graft

import graft.operators.{Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

class SamplingExtrasSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("split: partitions are exhaustive, disjoint, and deterministic") {
    val s1 = Sampling.split(docs.select("doc_id"), "doc_id").cache()
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum == docs.count())
    assert(counts("train") > counts.getOrElse("val", 0L))
    // re-run assigns identically
    val s2 = Sampling.split(docs.select("doc_id"), "doc_id")
    assert(s1.exceptAll(s2).count() == 0L)
  }

  test("split honors custom percentages") {
    val all = Sampling.split(docs.select("doc_id"), "doc_id",
      trainPct = 100, valPct = 0)
    assert(all.filter(col("split") =!= "train").count() == 0L)
  }

  test("mixtureSample: weight 1 keeps all, weight 0 drops all, missing drops") {
    val src = docs.select("doc_id", "source")
    val srcs = src.select("source").distinct().collect().map(_.getString(0))
    val keepAll = Map(srcs.head -> 1.0)
    val kept = Sampling.mixtureSample(src, "source", "doc_id", keepAll)
    assert(kept.count() == src.filter(col("source") === srcs.head).count())
    val none = Sampling.mixtureSample(src, "source", "doc_id",
      Map(srcs.head -> 0.0))
    assert(none.count() == 0L)
  }

  test("mixtureSample: fraction kept tracks the weight") {
    val src = docs.select("doc_id", "source")
    val weights = src.select("source").distinct().collect()
      .map(_.getString(0) -> 0.5).toMap
    val kept = Sampling.mixtureSample(src, "source", "doc_id", weights).count()
    val n = src.count().toDouble
    assert(kept > n * 0.35 && kept < n * 0.65,
      s"kept $kept of $n at weight 0.5")
  }

  test("mixtureSample rejects up-weights > 1 (no row replication)") {
    val src = docs.select("doc_id", "source")
    intercept[IllegalArgumentException] {
      Sampling.mixtureSample(src, "source", "doc_id", Map("src0" -> 2.0))
    }
  }

  test("repetition: tiny docs are never flagged; stuffed docs are") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "hello world"),                                  // 2 tokens, 1 bigram
      (2L, ("spam ham " * 20).trim),                        // 40 tokens, stuffed
      (3L, "the quick brown fox jumps over a lazy dog " +
        "while the calm river flows past green hills today") // varied, 18 tokens
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(fixture, "text").collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(!r(1L).getBoolean(4), "2-token doc must not be repetitive")
    assert(r(1L).getDouble(3) == 1.0) // its one bigram is 100% of bigrams
    assert(r(2L).getBoolean(4), "keyword-stuffed doc must be repetitive")
    assert(!r(3L).getBoolean(4), "varied prose must not be repetitive")
  }

  test("dc1 source cap keeps exactly min(cap, group size) per source, deterministically") {
    val cap = graft.queries.CorpusQueries.SourceCap
    val groupSizes = Tables.documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = graft.queries.CorpusQueries.dc1SourceCap(spark, sf).collect()
    val keptBySource = kept.groupBy(_.getString(1))
    assert(keptBySource.keySet == groupSizes.keySet)
    keptBySource.foreach { case (src, rows) =>
      assert(rows.length == math.min(cap.toLong, groupSizes(src)),
        s"cap violated for $src")
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to rows.length),
        s"keep_rank not contiguous for $src")
    }
    // deterministic: a second run selects the identical survivor set
    val again = graft.queries.CorpusQueries.dc1SourceCap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(again == kept.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet)
  }

  test("wc1 co-occurrence pairs and lift agree with hand math") {
    import spark.implicits._
    val docs = Seq("x y z", "x y").toDF("text")
    val rows = TextAnalysis.cooccurrence(docs, "text", 2, 100).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // window 2 over "x y z": (x,y) (y,z) (x,z); over "x y": (x,y)
    // unigrams: x:2 y:2 z:1, N=5
    assert(rows.keySet == Set(("x", "y"), ("y", "z"), ("x", "z")))
    assert(rows(("x", "y"))._1 == 2L)
    assert(rows(("y", "z"))._1 == 1L && rows(("x", "z"))._1 == 1L)
    // lift(x,y) = 2*5/(2*2) = 2.5; lift(y,z) = 1*5/(2*1) = 2.5
    assert(rows(("x", "y"))._2 == 2.5 && rows(("y", "z"))._2 == 2.5)
    // rank 1 is the most frequent pair with (w1, w2) tiebreak
    val top = TextAnalysis.cooccurrence(docs, "text", 2, 1).collect()
    assert(top.length == 1 && top.head.getString(0) == "x" && top.head.getString(1) == "y")
  }

  test("sp1 Spearman rho matches a driver-side recomputation and sits in [-1,1]") {
    val row = graft.queries.CorpusQueries.sp1RankCorr(spark, sf).head
    val (n, sumD2, rho) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    assert(n > 0 && rho >= -1.0 && rho <= 1.0)
    val a = graft.queries.CorpusQueries.t2Quality(spark, sf)
      .select("doc_id", "mean_token_len").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val b = graft.queries.CorpusQueries.ppl1UnigramNll(spark, sf)
      .select("doc_id", "avg_nll").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rankA = a.sortBy { case (id, v) => (v, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val rankB = b.toSeq.sortBy { case (id, v) => (v, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val common = rankA.keySet intersect rankB.keySet
    val sd2 = common.toSeq.map { id =>
      val d = rankA(id) - rankB(id); d * d }.sum
    assert(n == common.size.toLong && sumD2 == sd2)
    val expect = 1.0 - 6.0 * sd2 / (n.toDouble * (n.toDouble * n - 1))
    assert(math.abs(rho - expect) < 1e-5)
  }

  test("ka1 kappa matches the textbook formula and degenerate raters hit the guard") {
    val row = graft.queries.CorpusQueries.ka1FilterKappa(spark, sf).head
    val (n, a1, b1, agree, kappa) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getDouble(4))
    assert(n > 0 && agree <= n && a1 <= n && b1 <= n)
    val po = agree.toDouble / n
    val pe = (a1.toDouble * b1 + (n - a1).toDouble * (n - b1)) / (n.toDouble * n)
    val expect = (po - pe) / (1.0 - pe)
    assert(math.abs(kappa - expect) < 1e-5)
    assert(kappa >= -1.0 && kappa <= 1.0)
  }

  test("b3 phrase counting is boundary-exact and counts every occurrence") {
    import spark.implicits._
    val docs = Seq(
      (1L, "key agg key agg row"),   // two occurrences
      (2L, "monkey agg value"),       // 'monkey' must NOT match 'key'
      (3L, "key value agg"),          // tokens present but not adjacent
      (4L, "key agg")                 // exactly the phrase
    ).toDF("doc_id", "text")
    val got = TextAnalysis.phraseCount(docs, "text", Seq("key", "agg"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 4L -> 1L))
    // corpus query returns the docs the substring probe finds
    val res = graft.queries.CorpusQueries.b3PhraseCount(spark, sf).collect()
    assert(res.nonEmpty && res.forall(_.getLong(1) >= 1))
  }

  test("tn1 normalization canonicalizes case/punct/whitespace, flags changes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello, World!  extra   spaces"),
      (2L, "already clean text"),
      (3L, "MiXeD")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.normalize(docs, "text").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    def polyhash(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % graft.operators.Embed.HashMod)
    assert(got(1L) == ((
      "hello world extra spaces".length, 1, polyhash("hello world extra spaces"))))
    assert(got(2L) == (("already clean text".length, 0, polyhash("already clean text"))))
    assert(got(3L)._2 == 1 && got(3L)._3 == polyhash("mixed"))
  }

  test("fs1 chi2 ranks the token planted into one source far above background") {
    import spark.implicits._
    // 3 sources x 4 docs of shared vocabulary; srcA additionally says
    // 'zebra' constantly — chi2 must surface it for srcA only
    val docs = (0 until 12).map { i =>
      val src = s"src${i % 3}"
      val base = "alpha beta gamma delta epsilon"
      val text = if (i % 3 == 0) s"$base zebra zebra zebra" else base
      (i.toLong, text, src)
    }.toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("fs1spec").toString
    docs.withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val top = graft.queries.CorpusQueries.fs1Chi2Keywords(spark, dir).collect()
    val bySource = top.groupBy(_.getString(0))
    assert(bySource("src0").minBy(_.getInt(4)).getString(1) == "zebra",
      "planted token must top its source")
    assert(!bySource("src1").exists(_.getString(1) == "zebra")
      || bySource("src1").find(_.getString(1) == "zebra").get.getInt(4) > 1)
    top.foreach(r => assert(r.getDouble(3) >= 0.0))
  }
}
