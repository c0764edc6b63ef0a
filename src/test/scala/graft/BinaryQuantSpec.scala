package graft

import graft.queries.VectorQueries

/** vq3 binary quantization + v16 Hamming kNN (SURVEY §2.2-2.3). */
class BinaryQuantSpec extends SparkSpec {

  private def packedCodes: Map[Long, (Long, Long, Long)] = {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    vecs.map { case (id, v) =>
      def pack(off: Int): Long =
        (0 until 32).foldLeft(0L)((acc, i) =>
          if (v(off + i) > 0f) acc | (1L << i) else acc)
      id -> ((pack(0), pack(32), v.count(_ > 0f).toLong))
    }.toMap
  }

  test("vq3 codes equal a driver-side recomputation for every vector") {
    val rows = VectorQueries.vq3BinaryQuant(spark, sf).collect()
    val expect = packedCodes
    assert(rows.nonEmpty && rows.length == expect.size)
    rows.foreach { r =>
      val (lo, hi, npos) = expect(r.getLong(0))
      assert(r.getLong(1) == lo, s"code_lo vec ${r.getLong(0)}")
      assert(r.getLong(2) == hi, s"code_hi vec ${r.getLong(0)}")
      assert(r.getLong(3) == npos, s"n_pos vec ${r.getLong(0)}")
      assert(r.getLong(1) >= 0L && r.getLong(2) >= 0L, "codes stay positive")
    }
  }

  test("v16 hamming distances are exact, ranked, and 8 queries x k rows") {
    val res = VectorQueries.v16KnnHamming(spark, sf).collect()
    assert(res.length == 8 * VectorQueries.K)
    val codes = packedCodes
    val byQuery = res.groupBy(_.getLong(0))
    byQuery.foreach { case (q, rows) =>
      val (ql, qh, _) = codes(q)
      val sorted = rows.sortBy(_.getInt(3))
      var prev = -1L
      sorted.foreach { r =>
        val (cl, ch, _) = codes(r.getLong(1))
        val ham = java.lang.Long.bitCount(ql ^ cl) + java.lang.Long.bitCount(qh ^ ch)
        assert(r.getLong(2) == ham.toLong, s"hamming q=$q c=${r.getLong(1)}")
        assert(r.getLong(2) >= prev, "ranked ascending by distance")
        prev = r.getLong(2)
      }
    }
  }

  test("v16 top-k overlaps the exact cosine top-k") {
    val exact = VectorQueries.v1KnnCos(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val ham = VectorQueries.v16KnnHamming(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val overlaps = exact.keys.toSeq.map { q =>
      (exact(q) intersect ham(q)).size.toDouble / VectorQueries.K
    }
    val mean = overlaps.sum / overlaps.size
    info(s"mean hamming-vs-exact top-${VectorQueries.K} overlap: $mean")
    // measured 0.175 on the sf0.001 fixture — far above the ~0.008
    // random-chance overlap; 64 sign bits are the coarse first tier
    // (rescore survivors exactly when precision matters)
    assert(mean >= 0.1, s"sign-bit hamming should keep some exact neighbors, got $mean")
  }

  test("v17 rescored scores are true cosines and candidates come from the shortlist") {
    val vecs = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val codes = packedCodes
    val res = VectorQueries.v17HammingRescore(spark, sf).collect()
    assert(res.length == 8 * VectorQueries.K)
    res.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      // driver-side shortlist: top-m by hamming, ties vec_id
      val (ql, qh, _) = codes(q)
      val short = codes.keys.filter(_ >= 8).toSeq
        .map { c =>
          val (cl, ch, _) = codes(c)
          (c, java.lang.Long.bitCount(ql ^ cl) + java.lang.Long.bitCount(qh ^ ch))
        }.sortBy { case (c, h) => (h, c) }
        .take(VectorQueries.HammingShortlist).map(_._1).toSet
      rows.foreach { r =>
        assert(short.contains(r.getLong(1)), s"candidate outside shortlist q=$q")
        val expect = cos(vecs(q), vecs(r.getLong(1)))
        assert(math.abs(r.getDouble(2) - expect) < 1e-6, s"score q=$q c=${r.getLong(1)}")
      }
      // and the winners are exactly the best cosines inside the shortlist
      val best = short.toSeq.map(c => (c, cos(vecs(q), vecs(c))))
        .sortBy { case (c, s) => (-s, c) }.take(VectorQueries.K).map(_._1)
      assert(rows.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq == best)
    }
  }
}
