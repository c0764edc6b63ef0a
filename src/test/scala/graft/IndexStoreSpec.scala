package graft

import graft.operators.IndexStore
import graft.queries.VectorQueries
import org.apache.spark.sql.functions._

/** Persistent-index invariants (SURVEY §2.3 v9/u3): serving from the
  * persisted tables equals the in-memory IVF path, upserts supersede
  * without rewriting the corpus, compaction preserves the live view,
  * and the cell_id layout prunes unprobed cells at the scan.
  */
class IndexStoreSpec extends SparkSpec {

  private val path = "/tmp/graft_index_spec"

  private def build(): Unit = IndexStore.build(
    VectorQueries.ivfCorpus(spark, sf), VectorQueries.centroids(spark, sf), path)

  test("persisted index serves exactly the in-memory IVF result") {
    build()
    val persisted = IndexStore.query(spark, path,
      VectorQueries.queryVecs(spark, sf), VectorQueries.K, VectorQueries.NProbe)
      .orderBy("query_id", "rnk").collect()
    val direct = VectorQueries.v6KnnIvf(spark, sf)
      .orderBy("query_id", "rnk").collect()
    assert(persisted.sameElements(direct))
  }

  test("upsert supersedes by version and only appends the delta") {
    build()
    val before = IndexStore.loadAssignments(spark, path).count()
    val batch = VectorQueries.ivfCorpus(spark, sf)
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), transform(col("v"), x => -x).as("v"),
        lit(1).as("version"))
    val nBatch = batch.count()
    IndexStore.upsert(spark, path, batch)
    // merge-on-read: the file set grew by the delta only
    assert(IndexStore.loadAssignments(spark, path).count() == before + nBatch)
    val live = IndexStore.currentAssignments(spark, path).cache()
    assert(live.count() == before) // one live row per vec_id
    assert(live.filter(col("version") === 1).count() == nBatch)
    // updated vectors are re-assigned against the PERSISTED centroids:
    // same answer as assigning the negated batch directly
    val expected = graft.operators.VectorSearch.assignCells(
        batch, VectorQueries.centroids(spark, sf))
      .select(col("vec_id"), col("cell_id").as("exp_cell"))
    assert(live.filter(col("version") === 1)
      .join(expected, "vec_id")
      .filter(col("cell_id") =!= col("exp_cell")).count() == 0)
  }

  test("compact folds deltas and preserves the live view") {
    build()
    val batch = VectorQueries.ivfCorpus(spark, sf)
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), transform(col("v"), x => -x).as("v"),
        lit(1).as("version"))
    IndexStore.upsert(spark, path, batch)
    val liveBefore = IndexStore.currentAssignments(spark, path)
      .select("vec_id", "cell_id", "version").orderBy("vec_id").collect()
    IndexStore.compact(spark, path)
    val after = IndexStore.loadAssignments(spark, path)
    assert(after.count() == liveBefore.length) // deltas folded away
    assert(after.select("vec_id", "cell_id", "version").orderBy("vec_id")
      .collect().sameElements(liveBefore))
  }

  test("streaming upserts maintain the index; latest version wins") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    build()
    val target = VectorQueries.ivfCorpus(spark, sf)
      .filter(col("vec_id") % 25 === 0)
      .select("vec_id", "v").as[(Long, Array[Float])].collect().toSeq
    val ms = MemoryStream[(Long, Array[Float], Int)](spark)
    val q = IndexStore.maintainFromStream(spark, path,
      ms.toDF().toDF("vec_id", "v", "version"))
    try {
      ms.addData(target.map { case (id, v) => (id, v.map(x => -x), 1) })
      q.processAllAvailable()
      ms.addData(target.map { case (id, v) => (id, v, 2) }) // revert at v2
      q.processAllAvailable()
    } finally q.stop()
    val live = IndexStore.currentAssignments(spark, path).cache()
    assert(live.filter(col("version") === 2).count() == target.size)
    assert(live.filter(col("version") === 1).count() == 0)
    // v2 restored the original vectors, so serving equals the fresh index
    val served = IndexStore.query(spark, path,
      VectorQueries.queryVecs(spark, sf), VectorQueries.K, VectorQueries.NProbe)
      .orderBy("query_id", "rnk").collect()
    val direct = VectorQueries.v6KnnIvf(spark, sf)
      .orderBy("query_id", "rnk").collect()
    assert(served.sameElements(direct))
  }

  test("queryCompacted prunes unprobed cells and matches the full-read serve") {
    build()
    IndexStore.compact(spark, path)
    // probed cells for this fixture's queries: derive once via the probe
    val cells = graft.operators.VectorSearch.probeCells(
        VectorQueries.queryVecs(spark, sf),
        IndexStore.loadCentroids(spark, path), VectorQueries.NProbe)
      .select("cell_id").distinct().collect().map(_.getLong(0)).toSeq
    val pruned = IndexStore.queryCompacted(spark, path,
      VectorQueries.queryVecs(spark, sf), VectorQueries.K, VectorQueries.NProbe, cells)
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters: ["))
      .mkString("\n")
    assert(pf.contains("cell_id") && pf.contains("INSET"),
      s"no cell_id partition pruning; PartitionFilters lines:\n$pf")
    val full = IndexStore.query(spark, path,
      VectorQueries.queryVecs(spark, sf), VectorQueries.K, VectorQueries.NProbe)
    assert(pruned.orderBy("query_id", "rnk").collect()
      .sameElements(full.orderBy("query_id", "rnk").collect()))
  }

  test("cell_id partitioning prunes unprobed cells at the scan") {
    build()
    val probe = IndexStore.loadAssignments(spark, path)
      .filter(col("cell_id") === 3)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell_id"),
      s"no partition filter in scan:\n$plan")
  }

  test("tombstone delete hides rows, re-upsert resurrects, compact purges") {
    val dpath = java.nio.file.Files.createTempDirectory("graft_del_spec").toString
    val session = spark
    import session.implicits._
    IndexStore.build(
      VectorQueries.ivfCorpus(spark, sf), VectorQueries.centroids(spark, sf), dpath)
    val all = IndexStore.liveAssignments(spark, dpath)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val victims = all.toSeq.sorted.take(10)
    IndexStore.delete(spark, dpath, victims.toDF("vec_id"), version = 1)
    val afterDel = IndexStore.liveAssignments(spark, dpath)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(afterDel == all -- victims, "deleted ids must disappear")
    // resurrection: re-upsert two victims at a higher version
    val back = VectorQueries.ivfCorpus(spark, sf)
      .filter(col("vec_id").isin(victims.take(2): _*))
      .select(col("vec_id"), col("v"), lit(2).as("version"))
    IndexStore.upsert(spark, dpath, back)
    val afterUp = IndexStore.liveAssignments(spark, dpath)
      .select("vec_id", "version").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(victims.take(2).forall(v => afterUp.get(v).contains(2)),
      "higher-version upsert resurrects")
    assert(victims.drop(2).forall(v => !afterUp.contains(v)))
    // compact folds the live view AND purges the now-inert tombstones
    // (the serving-path broadcast must stay metadata-sized under a
    // sustained delete workload)
    IndexStore.compact(spark, dpath)
    val afterCompact = IndexStore.liveAssignments(spark, dpath)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(afterCompact == afterUp.keySet)
    val tsPath = new org.apache.hadoop.fs.Path(s"$dpath/tombstones")
    val fs = tsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(tsPath), "compact must purge the tombstone table")
    // and the physical epoch itself no longer holds the deleted rows
    val physical = IndexStore.loadAssignments(spark, dpath)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((physical intersect victims.drop(2).toSet).isEmpty,
      "tombstoned rows must be physically dropped by the fold")
    // query() serves from the live view: no deleted id can be returned
    val served = IndexStore.query(spark, dpath,
      VectorQueries.queryVecs(spark, sf), VectorQueries.K, VectorQueries.NProbe)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((served intersect victims.drop(2).toSet).isEmpty)
  }
}
