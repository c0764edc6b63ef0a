package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib-built IVF index (SURVEY §2.3 scale path; the BASELINE
  * north-star: "MLlib for batch indexing + DataFrame joins").
  *
  * Batch index construction = distributed k-means over the corpus
  * (seeded, fixed iterations → deterministic for a fixed input);
  * serving = the same cell-probe join as VectorSearch.knnIvf. At 100 TB
  * the KMeans fit runs on a sample and the assignment is one broadcast
  * pass — exactly the shape below.
  */
object IvfIndex {

  /** Learn `k` centroids from (vec_id, v: array<float>) with MLlib
    * KMeans; returns (cell_id, cv: array<double>) ready for
    * VectorSearch.knnIvf / assignCells.
    *
    * The fit runs on a DETERMINISTIC hash sample of ~fitSampleRows
    * vectors (xxhash64(vec_id) threshold — stable across runs and
    * partitionings), never the full corpus: k-means centroid quality
    * converges long before 10⁹ points, and at 100 TB a full-corpus fit
    * would iterate maxIter times over the whole table. Sizing the
    * threshold costs one count() pass — cheap next to the maxIter
    * full-table iterations it avoids (swap in countApprox if even that
    * pass matters). The full corpus is then assigned in the single
    * broadcast pass of assignCells.
    */
  def kmeansCentroids(corpus: DataFrame, k: Int, seed: Long = 42L,
                      maxIter: Int = 10, fitSampleRows: Long = 65536): DataFrame = {
    val spark = corpus.sparkSession
    val target = math.max(fitSampleRows, 20L * k)
    val n = corpus.count()
    val sample =
      if (n <= target) corpus
      else {
        val mod = 1000000L
        val thresh = math.max(1L, mod * target / n)
        corpus.filter(pmod(xxhash64(col("vec_id")), lit(mod)) < thresh)
      }
    val feats = sample.select(array_to_vector(col("v")).as("features"))
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter)
      .fit(feats)
    val rows = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray)
    }
    import spark.implicits._
    rows.toSeq.toDF("cell_id", "cv")
  }

  /** Fit-or-load: the amortized centroid path for a SERVING query.
    * An index build belongs in the offline/build path — chroma builds
    * its index once at collection load and every query reuses it
    * (/root/reference/src/chroma.py:76-106); fitting k-means inside
    * each kNN call charges the build to every serve. Here the learned
    * centroids persist as a k-row parquet keyed by the caller's path
    * (the caller keys it by dataset dir): the first call pays one
    * sample-fit and writes; every later call is a k-row parquet read.
    * The FitOrLoad manifest pins every fit parameter plus the corpus
    * row count, so a changed knob or swapped fixture refits. */
  def fitOrLoadCentroids(corpus: DataFrame, k: Int, path: String,
                         seed: Long = 42L, maxIter: Int = 10,
                         fitSampleRows: Long = 65536): DataFrame =
    FitOrLoad.parquetAt(corpus.sparkSession, path,
      s"k=$k;seed=$seed;iter=$maxIter;sample=$fitSampleRows;" +
        s"n=${corpus.count()};sig=${FitOrLoad.contentSig(corpus)}")(
      kmeansCentroids(corpus, k, seed, maxIter, fitSampleRows))
}
