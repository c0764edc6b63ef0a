package graft

import graft.operators.FitOrLoad
import org.apache.spark.sql.functions._

/** The staleness contract of the fit-or-load cache (SURVEY §5; r9
  * verdict task 4): a cached offline artifact must be rebuilt when the
  * INPUT CONTENT changes, even if the row count is identical — the r9
  * fixture regeneration swapped values/encoding in place with unchanged
  * counts, the exact scenario a count-only manifest silently survives.
  */
class FitOrLoadSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(name: String): java.io.File = {
    val d = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_spec_$name")
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del)
      f.delete()
    }
    del(d); d.mkdirs(); d
  }

  test("in-place input rewrite with identical row count forces a refit") {
    val in = freshDir("folin"); val path = in.getAbsolutePath
    Seq(1, 2, 3).toDF("x").coalesce(1)
      .write.mode("overwrite").parquet(path)
    var builds = 0
    def cached() = FitOrLoad.parquet(spark, "folspec", path, "p=1",
      spark.read.parquet(path).count()) {
      builds += 1
      spark.read.parquet(path).agg(sum("x").as("s"))
    }
    assert(cached().as[Long].head() == 6L && builds == 1)
    // warm hit: same content, same count — served from cache
    assert(cached().as[Long].head() == 6L && builds == 1)
    // the r9 scenario: rewrite in place, SAME row count, different values
    Seq(10, 20, 30).toDF("x").coalesce(1)
      .write.mode("overwrite").parquet(path)
    assert(cached().as[Long].head() == 60L,
      "stale cache served after in-place input swap")
    assert(builds == 2, s"expected a refit, got builds=$builds")
  }

  test("parameter change refits; unchanged params stay warm") {
    val in = freshDir("folpar"); val path = in.getAbsolutePath
    Seq(4, 5).toDF("x").write.mode("overwrite").parquet(path)
    var builds = 0
    def cached(p: String) = FitOrLoad.parquet(spark, "folspec2", path, p,
      spark.read.parquet(path).count()) {
      builds += 1
      spark.read.parquet(path).agg(sum("x").as("s"))
    }
    cached("k=1").collect(); cached("k=1").collect()
    assert(builds == 1)
    cached("k=2").collect()
    assert(builds == 2)
  }

  test("nested cold builds accumulate buildSeconds once, not per frame") {
    // the d8comp-reads-d2pairs shape: the OUTER artifact's build
    // triggers the inner artifact's build inside its own timing
    // window. Before the depth guard, both frames accumulated and
    // build_sec could exceed the query's wall clock (negative
    // query_sec in the r18 sf1 splice).
    val in = freshDir("folnest"); val path = in.getAbsolutePath
    Seq(7, 8, 9).toDF("x").write.mode("overwrite").parquet(path)
    def inner() = FitOrLoad.parquet(spark, "folnesti", path, "k=1",
      spark.read.parquet(path).count()) {
      spark.read.parquet(path).agg(sum("x").as("s"))
    }
    val before = FitOrLoad.buildSeconds
    val t0 = System.nanoTime()
    FitOrLoad.parquet(spark, "folnesto", path, "k=1",
      spark.read.parquet(path).count()) {
      inner().select((col("s") + 1).as("s"))
    }.collect()
    val wall = (System.nanoTime() - t0) / 1e9
    val delta = FitOrLoad.buildSeconds - before
    assert(delta > 0.0, "outer cold build must accumulate")
    assert(delta <= wall + 0.05,
      f"nested builds double-counted: build_sec delta $delta%.2f s " +
        f"exceeds the call's own wall clock $wall%.2f s")
  }

  test("contentSig: stable on unchanged dir, moves on rewrite, constant for non-paths") {
    val in = freshDir("folsig"); val path = in.getAbsolutePath
    Seq(1).toDF("x").write.mode("overwrite").parquet(path)
    val s1 = FitOrLoad.contentSig(path)
    assert(s1 == FitOrLoad.contentSig(path))
    Thread.sleep(5) // mtime granularity
    Seq(2).toDF("x").write.mode("overwrite").parquet(path)
    assert(s1 != FitOrLoad.contentSig(path))
    assert(FitOrLoad.contentSig("not/a/real/path") == "none")
  }
}
