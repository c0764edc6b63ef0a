package graft

import graft.queries.{CorpusQueries, MetricQueries}
import org.apache.spark.sql.functions._

class DedupTextSpec extends SparkSpec {

  test("d1 exact dedup finds exactly the planted duplicates") {
    val df = CorpusQueries.d1ExactDedup(spark, sf).cache()
    val nDocs = Tables.documents(spark, sf).count()
    assert(df.count() == nDocs) // testdata texts are distinct
    assert(df.filter(col("n_copies") === 2).count() == 50) // planted
    assert(df.filter(col("n_copies") > 2).count() == 0)
  }

  test("d2 jaccard pairs are ordered, thresholded, and in (0,1]") {
    val rows = CorpusQueries.d2NgramJaccard(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall { r =>
      val j = r.getDouble(2); j >= CorpusQueries.JaccardMin && j <= 1.0 })
  }

  test("d3 minhash candidates include the strongest jaccard pairs") {
    val strong = CorpusQueries.d2NgramJaccard(spark, sf)
      .filter(col("jaccard") > 0.8).select("id_a", "id_b")
    val cand = CorpusQueries.d3Minhash(spark, sf).select("id_a", "id_b")
    assert(strong.count() > 0)
    assert(strong.join(cand, Seq("id_a", "id_b"), "left_anti").count() == 0,
      "a >0.8-jaccard pair escaped every LSH band")
  }

  test("d2/d3 document-frequency cap drops giant posting lists") {
    import spark.implicits._
    // 1000 docs all sharing ONE hot shingle ("the quick fox") plus
    // unique-per-doc shingles: uncapped, the hot posting list alone
    // yields 1000·999/2 = 499,500 candidate pairs in one reducer
    val docs = (0 until 1000)
      .map(i => (i.toLong, s"the quick fox u${i}a u${i}b u${i}c"))
      .toDF("doc_id", "text")
    val hot = graft.operators.Dedup.hotShingleHashes(docs, 3, 50)
    assert(hot.count() == 1, "exactly the planted stop-shingle is hot")
    // with the DROP cap at 50 (the pre-salting semantics), the hot
    // shingle leaves every doc's set; remaining shingles are unique
    // per doc -> zero candidate pairs. Since round 7 a bucket above
    // dfCap but under dropCap is SALTED instead — DedupSaltingSpec
    // proves those pairs survive.
    assert(graft.operators.Dedup.ngramJaccardPairs(docs, 3, 0.05,
      dfCap = 50, dropCap = 50).count() == 0)
    // minhash band buckets dominated by the hot shingle are dropped too
    assert(graft.operators.Dedup.minhashCandidates(docs, 3,
      dfCap = 50, dropCap = 50).count() < 50000)
  }

  test("d4 simhash stays in 60 bits and near-identical docs collide closely") {
    val df = CorpusQueries.d4Simhash(spark, sf).cache()
    val mx = df.agg(max("simhash")).head.getLong(0)
    assert(mx < (1L << graft.operators.Dedup.SimhashBits) && mx >= 0)
    // a healthy 60-bit fingerprint uses its upper (second-polyhash)
    // half: some doc must set a bit above 30
    assert(mx >= (1L << 30))
    // hamming distance between the planted near-dup pair is small
    val pair = CorpusQueries.d2NgramJaccard(spark, sf)
      .orderBy(col("jaccard").desc).select("id_a", "id_b").head
    val h = df.filter(col("doc_id").isin(pair.getLong(0), pair.getLong(1)))
      .select("simhash").collect().map(_.getLong(0))
    assert(java.lang.Long.bitCount(h(0) ^ h(1)) <= 12)
  }

  test("t1 token counts are positive and bpe >= ws") {
    val df = CorpusQueries.t1Tokens(spark, sf)
    assert(df.filter(col("n_ws_tokens") <= 0 || col("n_bpe_tokens") < col("n_ws_tokens"))
      .count() == 0)
  }

  test("t2 quality scores are in [0,1] with components present") {
    val df = CorpusQueries.t2Quality(spark, sf)
    assert(df.filter(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
    assert(df.filter(col("punct_ratio") < 0 || col("stopword_ratio") < 0).count() == 0)
  }

  test("t3 langid predicts a known language deterministically") {
    val langs = graft.operators.TextAnalysis.LangMarkers.map(_._1).toSet
    val df = CorpusQueries.t3LangId(spark, sf).cache()
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.select("predicted_lang").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(langs))
  }

  test("t4 fingerprints are deterministic and within the hash modulus") {
    val a = CorpusQueries.t4Fingerprint(spark, sf).orderBy("doc_id").collect()
    val b = CorpusQueries.t4Fingerprint(spark, sf).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(a.forall(r => r.getLong(1) < graft.operators.Embed.HashMod
      && r.getLong(2) < graft.operators.Embed.HashMod))
  }

  test("q0 querygen emits a 3-token query per sampled doc") {
    val df = CorpusQueries.q0QueryGen(spark, sf).cache()
    assert(df.count() == Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0).count())
    assert(df.filter(size(split(col("query"), " ")) =!= 3).count() == 0)
  }

  test("s1 stratified sample takes ceil(frac*n) docs from every language") {
    val docs = Tables.documents(spark, sf)
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = CorpusQueries.s1Stratified(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled.keySet == perLang.keySet)
    sampled.foreach { case (lang, n) =>
      assert(n == math.ceil(perLang(lang) * CorpusQueries.SampleFrac).toLong) }
  }

  test("s2 deterministic shuffle is a stable permutation") {
    val a = CorpusQueries.s2DetShuffle(spark, sf).orderBy("shuffle_pos").collect()
    val b = CorpusQueries.s2DetShuffle(spark, sf).orderBy("shuffle_pos").collect()
    assert(a.sameElements(b))
    assert(a.map(_.getLong(1)).toSeq == (1L to a.length.toLong))
    // the permutation actually shuffles (not identity order)
    assert(a.take(20).map(_.getLong(0)).toSeq != a.take(20).map(_.getLong(0)).sorted.toSeq)
  }

  test("t5 vocabulary is frequency-ranked and covers the corpus head") {
    val v = CorpusQueries.t5Vocab(spark, sf).orderBy("rank").collect()
    assert(v.nonEmpty)
    val freqs = v.map(_.getLong(1))
    assert(freqs.sameElements(freqs.sorted(Ordering[Long].reverse)))
  }

  test("d7 simhash pairs: planted exact dups appear at hamming 0; bound respected") {
    val pairs = CorpusQueries.d7SimhashPairs(spark, sf).cache()
    assert(pairs.filter(col("hamming") > CorpusQueries.SimhashMaxHamming).count() == 0)
    // the 50 planted exact duplicates (doc_id -> doc_id+1000000) must
    // all surface with hamming 0 — the algorithm is exact by pigeonhole
    val planted = pairs.filter(col("id_b") === col("id_a") + 1000000)
      .filter(col("id_a") < 50)
    assert(planted.count() == 50)
    assert(planted.filter(col("hamming") =!= 0).count() == 0)
  }

  test("ch1 chunking: windows cover every token with the declared overlap") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val chunks = CorpusQueries.ch1Chunk(spark, sf).cache()
    assert(chunks.select("doc_id").distinct().count() == docs.count())
    // chunk_idx is dense from 0 per doc; no chunk exceeds the window
    val perDoc = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("chunk_idx").as("mx"), min("chunk_idx").as("mn"))
    assert(perDoc.filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1).count() == 0)
    assert(chunks.filter(col("n_chunk_tokens") > CorpusQueries.ChunkTokens).count() == 0)
    // exact reconstruction: step-prefix of every chunk except the last,
    // plus the whole last chunk, re-joins to the doc's full token stream
    val step = CorpusQueries.ChunkTokens - CorpusQueries.ChunkOverlap
    val rebuilt = chunks.join(perDoc.select("doc_id", "mx"), "doc_id")
      .withColumn("piece",
        when(col("chunk_idx") < col("mx"),
          expr(s"array_join(slice(split(chunk_text, ' '), 1, $step), ' ')"))
          .otherwise(col("chunk_text")))
      .groupBy("doc_id")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(chunk_idx, piece))), x -> x.piece), ' ')")
        .as("rebuilt"))
    val full = docs.select(col("doc_id"),
      expr("array_join(filter(split(text, ' '), t -> length(t) > 0), ' ')").as("full"))
    assert(rebuilt.join(full, "doc_id")
      .filter(col("rebuilt") =!= col("full")).count() == 0)
  }

  test("t7 redaction masks planted emails and long digit runs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact me at alice@example.com or call 1234567 now"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.co c@d.org and 999999999")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.redact(docs, "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("redacted") == "contact me at <EMAIL> or call <NUM> now")
    assert(out(0).getAs[Int]("n_emails") == 1 && out(0).getAs[Int]("n_long_nums") == 1)
    assert(out(1).getAs[String]("redacted") == "no pii here at all")
    assert(out(2).getAs[Int]("n_emails") == 2 && out(2).getAs[Int]("n_long_nums") == 1)
  }

  test("cf1 contamination flags a planted benchmark copy, nothing self-paired") {
    import spark.implicits._
    val clean = (0 until 200)
      .map(i => (i.toLong, s"unique${i}a text unique${i}b body unique${i}c tail unique${i}d"))
    // doc 97 is "benchmark" (97 % 97 == 0); doc 150 copies its text
    val leaked = clean.map { case (id, t) =>
      if (id == 150) (id, clean(97)._2) else (id, t)
    }
    val docs = leaked.toDF("doc_id", "text")
    val hits = graft.operators.Contamination.check(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0),
      3, CorpusQueries.ContaminationMinShared).collect()
    assert(hits.length == 1)
    assert(hits.head.getLong(0) == 150 && hits.head.getLong(1) == 97)
  }

  test("t6 bigram stats: boilerplate-heavy docs show higher avg df") {
    val df = CorpusQueries.t6BigramStats(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("rare_ratio") < 0 || col("rare_ratio") > 1).count() == 0)
    assert(df.filter(col("avg_bigram_df") < 1.0).count() == 0) // df >= 1 by def
  }

  test("q12 approx distinct tracks exact multi-distinct within 5%") {
    val approx = graft.queries.Relational.q12ApproxRaw(spark, sf)
    val exact = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("eo"), countDistinct("l_partkey").as("ep"))
    val joined = approx.join(exact, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(math.abs(r.getAs[Long]("approx_orders") - r.getAs[Long]("eo")).toDouble
        <= 0.05 * r.getAs[Long]("eo"))
      assert(math.abs(r.getAs[Long]("approx_parts") - r.getAs[Long]("ep")).toDouble
        <= 0.05 * r.getAs[Long]("ep"))
    }
  }

  test("u1 upsert keeps one row per key, newest version wins") {
    val df = CorpusQueries.u1Upsert(spark, sf).cache()
    val orders = Tables.orders(spark, sf)
    assert(df.count() == orders.count())
    assert(df.groupBy("o_orderkey").count().filter(col("count") > 1).count() == 0)
    val updated = df.filter(col("version") === 1)
    assert(updated.count() == orders.filter(col("o_orderkey") % 10 === 0).count())
    // updated price = base + 1000
    assert(updated.join(orders.withColumnRenamed("o_totalprice", "base"), "o_orderkey")
      .filter(abs(col("o_totalprice") - col("base") - 1000.0) > 1e-9).count() == 0)
  }

  test("d11 dup spans: planted shared span detected at any alignment; short docs zero") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"tok$i").mkString(" ") // 10-token span
    val docs = Seq(
      (1L, s"alpha beta $shared gamma"),           // span at offset 2
      (2L, s"$shared delta epsilon zeta"),         // span at offset 0
      (3L, "unique words only here nothing repeats at all in this one"),
      (4L, "tiny doc")                             // < 8 tokens -> no windows
    ).toDF("doc_id", "text")
    val res = graft.operators.Dedup.dupSpans(docs, "text", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // a 10-token shared span yields 3 duplicated 8-token windows in each
    assert(res(1L)._2 == 3 && res(2L)._2 == 3)
    assert(res(1L)._1 == 6)  // 13 tokens -> 6 windows
    assert(res(3L) == (4L, 0L, 0.0))
    assert(res(4L) == (0L, 0L, 0.0))
  }

  test("d11 oracle window cap: no document approaches the 4096-token bound") {
    // CorpusQueries.d11Sql enumerates window offsets via
    // unnest(range(1, 4096)) (DuckDB range() takes no lateral column
    // arg) while the Spark side is unbounded. Guard: a doc with >= 4096
    // tokens would silently lose windows in the oracle only. TESTDATA
    // docs are ~100 tokens; this trips long before the cap could bite.
    val mx = graft.Tables.documents(spark, sf)
      .selectExpr("max(size(split(text, ' +'))) AS n").head().getInt(0)
    assert(mx < 2048, s"doc with $mx tokens nears the d11Sql 4096 cap")
  }

  test("d11 dup spans: within-doc repetition counts as duplication") {
    import spark.implicits._
    val span = (1 to 8).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, s"$span filler1 filler2 $span")).toDF("doc_id", "text")
    val res = graft.operators.Dedup.dupSpans(docs, "text", 8).head()
    assert(res.getLong(2) >= 2) // the repeated 8-gram occurs twice
  }

  test("ppl1 unigram NLL: rare-token docs score strictly higher") {
    import spark.implicits._
    // 'zzz' appears once in the corpus; 'the' dominates
    val docs = Seq(
      (1L, "the the the the the the the the the"),
      (2L, "the the the the the the the the zzz")
    ).toDF("doc_id", "text")
    val res = graft.operators.TextAnalysis.unigramNll(docs, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(res(2L) > res(1L))
    // doc 1 is all-common: NLL = -ln(17/18) per token
    assert(math.abs(res(1L) - (-math.log(17.0 / 18.0))) < 1e-3)
  }

  test("ppl1 bands partition the corpus by the declared cuts") {
    val res = CorpusQueries.ppl1UnigramNll(spark, sf).cache()
    import graft.operators.TextAnalysis.{NllMidCut, NllHighCut}
    assert(res.filter(col("ppl_band") === "head")
      .filter(col("avg_nll") >= NllMidCut).count() == 0)
    assert(res.filter(col("ppl_band") === "middle")
      .filter(col("avg_nll") < NllMidCut || col("avg_nll") >= NllHighCut).count() == 0)
    assert(res.filter(col("ppl_band") === "tail")
      .filter(col("avg_nll") < NllHighCut).count() == 0)
    assert(res.select("ppl_band").distinct().count() >= 2)
  }

  test("d15 canonical dedup folds every case/punct variant onto its base doc") {
    val rows = CorpusQueries.d15CanonicalDedup(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    // copies conserve: every doc + 30 planted variants lands somewhere
    assert(rows.map(_.getLong(1)).sum == nDocs + 30)
    // no planted variant id survives (base ids are always smaller)
    val maxId = Tables.documents(spark, sf).agg(max(col("doc_id"))).head.getLong(0)
    assert(rows.forall(_.getLong(0) <= maxId))
    // at least the 30 planted groups have 2+ members
    assert(rows.count(_.getLong(1) >= 2) >= 30)
    // byte-exact dedup (d1's digest on raw text) would NOT fold these:
    // the variants differ in case and punctuation by construction
  }
}
