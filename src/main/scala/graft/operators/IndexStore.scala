package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF index with incremental maintenance (SURVEY §2.3
  * v9/u3) — the reference's core workflow is a PERSISTENT collection
  * you upsert into and query later (`chromadb.PersistentClient`,
  * /root/reference/src/chroma.py:70-78; `collection.upsert`,
  * /root/reference/src/db.py:82). The Spark-native equivalent is two
  * parquet tables:
  *
  *   path/centroids/    (cell_id, cv)
  *   path/assignments/  (vec_id, v, version, cell_id)  partitioned by cell_id
  *
  * Maintenance is MERGE-ON-READ: `upsert` assigns cells for the NEW
  * batch only (one broadcast pass over the delta — never re-touching
  * the existing corpus) and appends it with a higher version;
  * `currentAssignments` resolves last-write-wins per vec_id at read
  * (one shuffle on vec_id); `compact` folds the deltas back into a
  * single epoch when they accumulate. This is the standard LSM-ish
  * shape for a 100 TB index: writes are O(batch), never O(corpus).
  *
  * The assignment table is partitioned by cell_id; after compaction,
  * a literal probe set prunes every other cell at the parquet scan
  * (queryCompacted). While deltas exist, serving reads all cells —
  * see query() for why that is a correctness requirement, not a
  * missed optimization.
  */
object IndexStore {

  private def centroidsPath(path: String) = s"$path/centroids"
  private def assignmentsPath(path: String) = s"$path/assignments"

  /** Build the index: persist centroids and the cell-assigned corpus
    * (version 0). corpus: (vec_id, v); centroids: (cell_id, cv). */
  def build(corpus: DataFrame, centroids: DataFrame, path: String): Unit = {
    centroids.write.mode(SaveMode.Overwrite).parquet(centroidsPath(path))
    VectorSearch.assignCells(corpus.withColumn("version", lit(0)), centroids)
      .write.mode(SaveMode.Overwrite).partitionBy("cell_id")
      .parquet(assignmentsPath(path))
  }

  def loadCentroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(centroidsPath(path))

  /** Raw assignment deltas (all versions, merge NOT applied). */
  def loadAssignments(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(assignmentsPath(path))

  /** Incremental upsert: assign cells for `batch` (vec_id, v, version)
    * against the PERSISTED centroids — one broadcast pass over the
    * delta only — and append. Existing rows for the same vec_id are
    * superseded at read time (merge-on-read), not rewritten here.
    * The batch itself is deduped to its newest version per vec_id
    * first: a micro-batch can legitimately carry two versions of one
    * vector (e.g. via maintainFromStream), and assignCells collapses
    * to one row per vec_id — without the dedup, which version survived
    * would depend on centroid distance, not recency. */
  def upsert(spark: SparkSession, path: String, batch: DataFrame): Unit =
    VectorSearch.assignCells(
      Upsert.lastWriteWins(batch, "vec_id", "version"),
      loadCentroids(spark, path))
      .write.mode(SaveMode.Append).partitionBy("cell_id")
      .parquet(assignmentsPath(path))

  /** The live view: last write (highest version) wins per vec_id. */
  def currentAssignments(spark: SparkSession, path: String): DataFrame =
    Upsert.lastWriteWins(loadAssignments(spark, path), "vec_id", "version")

  private def tombstonesPath(path: String) = s"$path/tombstones"

  /** Tombstone deletion: record (vec_id, del_version) — metadata-sized,
    * appended, never rewriting the assignment data (the same
    * merge-on-read contract as upsert). A row is dead iff its version
    * ≤ the newest tombstone for its id, so a LATER re-upsert (higher
    * version) legitimately resurrects the vector. compact() folds the
    * live view and purges the then-inert tombstones. */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
             version: Int): Unit =
    ids.select(col("vec_id"), lit(version).as("del_version"))
      .write.mode(SaveMode.Append).parquet(tombstonesPath(path))

  /** currentAssignments minus tombstoned rows (merge-on-read view a
    * serving query uses). The tombstone table is broadcast — it holds
    * ids, not vectors. */
  def liveAssignments(spark: SparkSession, path: String): DataFrame = {
    val cur = currentAssignments(spark, path)
    val tp = new org.apache.hadoop.fs.Path(tombstonesPath(path))
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tp)) cur
    else {
      val ts = spark.read.parquet(tombstonesPath(path))
        .groupBy("vec_id").agg(max("del_version").as("__del_v"))
      cur.join(broadcast(ts), Seq("vec_id"), "left")
        .filter(col("__del_v").isNull || col("version") > col("__del_v"))
        .drop("__del_v")
    }
  }

  /** Fold accumulated deltas AND tombstones into a single epoch:
    * rewrite the merged LIVE view (tombstoned rows are physically
    * dropped), then purge the tombstone table — after the fold every
    * tombstone is inert, and liveAssignments broadcasts the whole
    * tombstone table on every read, so leaving them would grow that
    * broadcast without bound under a sustained delete workload.
    * Post-purge, ANY later re-upsert of a deleted id resurrects it
    * (before compaction only a version above the tombstone's did) —
    * the standard epoch-fold contract: versions are monotone, so a
    * writer never legitimately re-appends a pre-compaction version.
    *
    * Writes to a scratch dir first (Spark cannot overwrite a
    * path it is reading), then swaps: the OLD table is renamed aside
    * before the new one moves in, every rename result is checked, and
    * the old data is deleted only after the new table is live — a
    * crash mid-swap leaves either the old or the new table findable
    * (assignments_old), never neither. True atomicity needs a table
    * format with a commit log (Delta/Iceberg); this is the best a raw
    * parquet directory can do. */
  def compact(spark: SparkSession, path: String): Unit = {
    val hp = (s: String) => new org.apache.hadoop.fs.Path(s)
    val tmp = s"$path/assignments_compacting"
    val old = s"$path/assignments_old"
    liveAssignments(spark, path)
      .write.mode(SaveMode.Overwrite).partitionBy("cell_id").parquet(tmp)
    // bind to the filesystem OF THE PATH, not the cluster defaultFS —
    // FileSystem.get(conf) would target the wrong FS for an index on
    // file:// when defaultFS is hdfs:// (or vice versa)
    val live = hp(assignmentsPath(path))
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(hp(old), true)
    if (!fs.rename(live, hp(old)))
      throw new java.io.IOException(s"compact: cannot move $live aside")
    if (!fs.rename(hp(tmp), live)) {
      fs.rename(hp(old), live) // roll back
      throw new java.io.IOException(s"compact: cannot promote $tmp")
    }
    fs.delete(hp(old), true)
    // the new epoch already excludes every tombstoned row — purge the
    // (now inert) tombstones so the serving-path broadcast stays
    // genuinely metadata-sized. Runs only after the swap succeeded: a
    // crash before this line leaves extra-but-correct tombstones.
    fs.delete(hp(tombstonesPath(path)), true)
  }

  /** Maintain the persisted index from a STREAM of vector batches
    * (vec_id, v, version): every micro-batch runs the same delta-only
    * upsert via foreachBatch — the canonical sink for side-effecting
    * writes. Pass `checkpointLocation` in production: with it, a
    * restart resumes from the checkpoint and re-appends only
    * unprocessed micro-batches; without it (tests/ephemeral use) Spark
    * uses a temp checkpoint and a restart REPLAYS retained input,
    * appending duplicate (vec_id, version) rows. */
  def maintainFromStream(spark: SparkSession, path: String,
                         batches: DataFrame,
                         checkpointLocation: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = batches.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        upsert(spark, path, batch.toDF())
      }
    checkpointLocation.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  /** Serve top-k cosine kNN from the persisted index.
    *
    * NOTE on pruning: this path reads ALL cells whenever deltas exist,
    * by design — an upsert can move a vector to a different cell, so a
    * probed-cell-only read before the merge could let a stale row in a
    * probed cell shadow its newer version sitting in an UNPROBED cell.
    * The last-write-wins window therefore runs over the full table
    * (and blocks partition-filter pushdown). For scan pruning, compact
    * first and use queryCompacted. */
  def query(spark: SparkSession, path: String, queries: DataFrame,
            k: Int, nprobe: Int): DataFrame =
    VectorSearch.knnIvfAssigned(queries, liveAssignments(spark, path),
      loadCentroids(spark, path), k, nprobe)

  /** Serve from a COMPACTED index with the probe cells as literals:
    * the isin filter reaches the parquet scan as a PartitionFilter, so
    * only probed cell directories are read — the interactive-query
    * fast path. The caller supplies the literal cell set (e.g. from
    * probing the broadcast-small centroid table); correctness requires
    * all deltas compacted (see query()). */
  def queryCompacted(spark: SparkSession, path: String, queries: DataFrame,
                     k: Int, nprobe: Int, cells: Seq[Long]): DataFrame =
    VectorSearch.knnIvfAssigned(queries,
      loadAssignments(spark, path).filter(col("cell_id").isin(cells: _*)),
      loadCentroids(spark, path), k, nprobe)
}
