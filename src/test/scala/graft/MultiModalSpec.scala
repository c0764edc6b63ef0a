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
}
