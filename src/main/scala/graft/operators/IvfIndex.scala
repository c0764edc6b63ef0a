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
    * VectorSearch.knnIvf / assignCells. */
  def kmeansCentroids(corpus: DataFrame, k: Int, seed: Long = 42L,
                      maxIter: Int = 10): DataFrame = {
    val spark = corpus.sparkSession
    val feats = corpus.select(array_to_vector(col("v")).as("features"))
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter)
      .fit(feats)
    val rows = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray)
    }
    import spark.implicits._
    rows.toSeq.toDF("cell_id", "cv")
  }
}
