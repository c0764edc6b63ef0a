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

  /** Wall-clock seconds spent BUILDING cache artifacts in this JVM
    * (cache misses only; warm loads add nothing). Bench snapshots this
    * around each query so one-time artifact construction lands in an
    * explicit build_sec field instead of silently inflating whichever
    * consumer happens to run first (the r10 rk1/b2 attribution gap). */
  private val buildNanosAcc = new java.util.concurrent.atomic.AtomicLong(0L)
  def buildSeconds: Double = buildNanosAcc.get() / 1e9

  /** Cache-event counters (r12 verdict task 7): Bench emits these so
    * every BENCH artifact self-describes whether it ran against warm
    * or cold fit-or-load artifacts — a warm 299 s run and a cold 333 s
    * run stop needing cross-round adjudication. */
  private val buildCountAcc = new java.util.concurrent.atomic.AtomicLong(0L)
  private val loadCountAcc = new java.util.concurrent.atomic.AtomicLong(0L)
  def buildCount: Long = buildCountAcc.get()
  def loadCount: Long = loadCountAcc.get()

  /** In-JVM memo of resolved artifacts, keyed by (session, cache
    * path), holding the input contentSig it was validated against.
    * The r17 qe1_prf regression was revalidation cost made per-call:
    * every `parquet()` call re-ran the input COUNT JOB + the parquet
    * schema read just to revalidate an artifact this JVM had already
    * validated (artifact_loads 44→53 once the BM25 family shared the
    * pruned posting table). A memo hit re-checks only the contentSig
    * — a metadata stat walk, no Spark jobs — so the r9 staleness
    * contract survives intact: an in-place input rewrite moves the
    * sig and falls through to the full manifest validation
    * (FitOrLoadSpec pins both the warm path and the refit). Non-path
    * tags (sig "none") never memo-hit: for those the row count is
    * the only staleness signal, so it must keep running. */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), (String, DataFrame)]()
  private val memoHitAcc = new java.util.concurrent.atomic.AtomicLong(0L)
  def memoHits: Long = memoHitAcc.get()

  /** Cheap input-CONTENT signal for the manifest: fold (relative path,
    * size, mtime) of every file under `p` into one hash. Row count alone
    * is not enough — the r9 fixture regeneration kept counts identical
    * while changing values/encoding, which a warm cache would have
    * silently survived. Stat-only (no data read), so it stays metadata
    * cost even when the input is a multi-file 100 TB table; an in-place
    * rewrite always moves mtime (and usually size), forcing a refit.
    * Non-path tags (unit-test strings) hash to a constant, preserving
    * the old row-count-only behavior for non-file-backed inputs. */
  def contentSig(root: String): String = {
    val base = new java.io.File(root)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        // null-safe: listFiles() returns null on an unreadable dir
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .toSeq.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    if (!base.exists()) "none"
    else {
      val basePath = base.toPath.toAbsolutePath
      val h = java.security.MessageDigest.getInstance("MD5")
      walk(base).foreach { f =>
        // hash the path RELATIVE TO root (not just the leaf name), so
        // moving or swapping same-named files between subdirs changes
        // the signature
        val rel = basePath.relativize(f.toPath.toAbsolutePath)
        h.update(s"$rel|${f.length()}|${f.lastModified()};".getBytes("UTF-8"))
      }
      h.digest().map("%02x".format(_)).mkString.take(16)
    }
  }

  /** Content signal from a DataFrame's resolved input files (for callers
    * holding a derived DataFrame rather than a fixture dir). */
  def contentSig(df: DataFrame): String =
    contentSigPaths(df.inputFiles.toSeq)

  private def contentSigPaths(paths: Seq[String]): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
    paths.sorted.foreach { p =>
      val f = new java.io.File(p.stripPrefix("file:"))
      h.update(s"${f.getName}|${f.length()}|${f.lastModified()};".getBytes("UTF-8"))
    }
    h.digest().map("%02x".format(_)).mkString.take(16)
  }

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
    cached match {
      case Some(df) =>
        loadCountAcc.incrementAndGet()
        df
      case None =>
        val t0 = System.nanoTime()
        // builds can NEST (the d8comp component build reads the
        // d2pairs edge artifact, triggering ITS build when cold): the
        // inner build's wall time already lies inside the outer's
        // window, so only the OUTERMOST frame accumulates — otherwise
        // build_sec double-counts and Bench's query_sec = sec −
        // build_sec goes negative (the r18 d8-at-sf1 artifact bug)
        val depth = buildDepth.get()
        buildDepth.set(depth + 1)
        try {
          build.write.mode(SaveMode.Overwrite).parquet(path)
          java.nio.file.Files.write(mf.toPath, fingerprint.getBytes("UTF-8"))
        } finally buildDepth.set(depth)
        if (depth == 0) buildNanosAcc.addAndGet(System.nanoTime() - t0)
        buildCountAcc.incrementAndGet()
        spark.read.parquet(path)
    }
  }

  private val buildDepth = new ThreadLocal[Int] {
    override def initialValue(): Int = 0
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
    val key = (System.identityHashCode(spark), path)
    val sig = contentSig(tag)
    val hit = memo.get(key)
    if (hit != null && sig != "none" && hit._1 == sig) {
      memoHitAcc.incrementAndGet(); hit._2
    } else {
      // full validation path (first call, non-path tag, or the input
      // changed under us): the count job + manifest check run here
      val df = parquetAt(spark, path, s"$params|n=$inputCount|sig=$sig")(build)
      memo.put(key, (sig, df))
      df
    }
  }
}
