package graft

import graft.operators.MultiModal
import graft.queries.IngestQueries
import org.apache.spark.sql.functions._

class MultiModalSpec extends SparkSpec {

  test("media table keeps payload bytes faithful to the source text") {
    val m = MultiModal.mediaTable(Tables.documents(spark, sf))
    val row = m.select(col("media").cast("string").as("t"), col("id"))
      .join(Tables.documents(spark, sf).select(col("doc_id").as("id"), col("text")), "id")
      .filter(col("t") =!= col("text"))
    assert(row.count() == 0)
  }

  test("batched feature extraction is deterministic and distributed") {
    val session = spark
    import session.implicits._
    val media = MultiModal.mediaTable(Tables.documents(spark, sf))
      .select("id", "media", "mime").as[MultiModal.MediaRow]
      .repartition(4) // force multiple partitions through mapPartitions
    val f1 = MultiModal.extractFeatures(media).orderBy("id").collect()
    val f2 = MultiModal.extractFeatures(media).orderBy("id").collect()
    assert(f1.sameElements(f2))
    assert(f1.forall(f => f.n_bytes > 0 && f.feat_mean > 0))
    // checksum matches the portable polyhash of the ascii payload
    val doc = Tables.documents(spark, sf).filter(col("doc_id") === f1.head.id)
      .select("text").head.getString(0)
    val expect = doc.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % graft.operators.Embed.HashMod)
    assert(f1.head.checksum == expect)
  }

  test("frame sampling covers every byte stride") {
    val df = IngestQueries.mm2FrameSample(spark, sf)
    assert(df.filter(col("n_frames") =!= floor((col("n_bytes") - 1) / 64) + 1).count() == 0)
    assert(df.filter(length(col("first_frame")) > 16).count() == 0)
  }

  test("ing_csv round-trip preserves row count and schema") {
    val df = IngestQueries.ingCsv(spark, sf)
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.schema.fieldNames.toSeq == Seq("doc_id", "lang", "source", "n_chars"))
  }

  test("ing_jsonl round-trip aggregates equal the direct parquet aggregate") {
    val viaJson = IngestQueries.ingJsonl(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = Tables.documents(spark, sf).groupBy("lang")
      .agg(count(lit(1)), sum("n_chars"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaJson == direct)
  }

  test("mm4 audio frames: offsets, counts, and hashes replay driver-side framing") {
    val rows = IngestQueries.mm4AudioFrames(spark, sf).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def polyhash(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % graft.operators.Embed.HashMod)
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (id, fs) =>
      val t = texts(id)
      val expectFrames = if (t.length < 32) 0 else (t.length - 32) / 16 + 1
      assert(fs.length == expectFrames, s"frame count for doc $id")
      fs.foreach { f =>
        val idx = f.getLong(1)
        assert(f.getLong(2) == idx * 16)
        val frame = t.substring((idx * 16).toInt,
          math.min((idx * 16).toInt + 32, t.length))
        assert(f.getLong(3) == polyhash(frame), s"frame hash doc $id idx $idx")
      }
    }
    // docs shorter than one frame emit nothing
    texts.filter(_._2.length < 32).keys.foreach(id => assert(!byDoc.contains(id)))
  }
}
