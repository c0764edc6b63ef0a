package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Shared fit-or-load parquet cache for OFFLINE artifacts (learned
  * centroids, inverted-index tf tables, remapped corpora, HNSW edge
  * lists, dedup component tables). The reference does this work at
  * ingest/collection-build time and serves queries from the stored
  * result (/root/reference/src/db.py:16-52, chroma.py:76-106); the
  * cache is the same cost attribution — first call builds and
  * persists, later calls are one parquet scan.
  *
  * Staleness safety (two layers, so a changed build knob or an
  * in-place fixture swap can never serve a stale artifact):
  *  - the cache DIRECTORY name folds the parameter fingerprint
  *    (bits/M/vocab/dim/...), so a parameter change misses the old
  *    directory outright;
  *  - a sidecar manifest (underscore-prefixed — parquet readers skip
  *    it, like _SUCCESS) records the fingerprint AND the input row
  *    count at build time; a load is valid only if the manifest
  *    matches the CURRENT fingerprint + input count. The manifest is
  *    written only after a successful parquet write, so it doubles as
  *    a completion marker against partially-written caches.
  */
object FitOrLoad {

  private val ManifestName = "_graft_manifest"

  /** Cache at an explicit parquet path. `fingerprint` must capture
    * every build parameter and the input row count. */
  def parquetAt(spark: SparkSession, path: String, fingerprint: String)
               (build: => DataFrame): DataFrame = {
    val mf = new java.io.File(path, ManifestName)
    val cached =
      try {
        if (mf.isFile && new String(
            java.nio.file.Files.readAllBytes(mf.toPath), "UTF-8") == fingerprint)
          Some(spark.read.parquet(path))
        else None
      } catch { case _: Exception => None }
    cached.getOrElse {
      build.write.mode(SaveMode.Overwrite).parquet(path)
      java.nio.file.Files.write(mf.toPath, fingerprint.getBytes("UTF-8"))
      spark.read.parquet(path)
    }
  }

  /** Cache under the JVM tmpdir, keyed by artifact prefix + dataset
    * tag + parameter fingerprint; `inputCount` is evaluated once per
    * call (a parquet-metadata count for table-backed inputs) and
    * compared against the manifest to catch in-place fixture swaps. */
  def parquet(spark: SparkSession, prefix: String, tag: String,
              params: String, inputCount: => Long)
             (build: => DataFrame): DataFrame = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_${prefix}_" +
      graft.Dist.pathTag(tag + "|" + params)
    parquetAt(spark, path, s"$params|n=$inputCount")(build)
  }
}
