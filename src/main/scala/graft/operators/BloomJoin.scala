package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered semi-join (SURVEY §2.7 f1) — the
  * runtime-filter / sideways-information-passing pattern every
  * warehouse engine applies when a selective dimension predicate
  * should prune a huge fact scan BEFORE the join shuffle: build a
  * Bloom filter over the build-side keys, broadcast it, drop probe
  * rows that cannot match at the scan, then run the exact join on the
  * survivors.
  *
  * Scale shape: the filter is a fixed-size bitmap (128 KiB for 2^20
  * bits) regardless of fact size — index-metadata-sized, exactly what
  * rides a broadcast variable on a real cluster (here it travels as a
  * plan literal; same thing single-JVM). The probe-side test is pure
  * codegen'd arithmetic (two xxhash64 calls per row, k derived probes,
  * an element_at + bit test), so it runs inside the scan's
  * WholeStageCodegen span with zero shuffle. Only rows that pass reach
  * the exact semi-join — with a selective build side that's a ~10-100×
  * cut in shuffled bytes. False positives are harmless (the exact join
  * removes them); false negatives are impossible (every true key sets
  * its bits). Spark's own `spark.sql.optimizer.runtimeFilter.*` does
  * this opportunistically; the explicit operator makes the plan
  * deterministic and tunable (m, k).
  */
object BloomJoin {

  /** Default sizing: 2^20 bits / 3 probes ≈ 0.1% false-positive rate
    * at ~10^5 build keys (fill ≈ 25%). Scale m with the build-side
    * cardinality (m ≈ 10·n bits keeps fp under ~1%). */
  val DefaultBits = 20
  val DefaultProbes = 3

  /** The k probe positions for a key column: double hashing
    * h_i = h1 + i·h2 (Kirsch-Mitzenmacher), each pmod 2^bits. Both
    * hashes are Spark's codegen'd xxhash64 with distinct seeds. */
  private def probes(key: Column, bits: Int, k: Int): Seq[Column] = {
    val m = 1L << bits
    // reduce each hash into [0, m) BEFORE combining: ANSI mode makes
    // the raw h1 + i·h2 overflow a long (xxhash64 spans the full range)
    val h1 = pmod(xxhash64(key), lit(m))
    // step in [1, m-1] so the k probes never collapse onto one bit
    val h2 = pmod(xxhash64(key, lit(0x9e3779b9L)), lit(m - 1)) + lit(1L)
    (0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, lit(m)))
  }

  /** Build the bitmap as packed longs: one exploded row per probe,
    * bit_or-aggregated per 64-bit word (map-side combined — at most
    * m/64 rows ever shuffle), collected to the driver. The result is
    * broadcast-variable-sized by construction. */
  def buildBitmap(keys: DataFrame, keyCol: String, bits: Int = DefaultBits,
                  k: Int = DefaultProbes): Array[Long] = {
    val words = keys
      .select(explode(array(probes(col(keyCol), bits, k): _*)).as("pos"))
      .select((col("pos") / 64).cast("long").as("w"),
        call_function("shiftleft", lit(1L),
          pmod(col("pos"), lit(64L)).cast("int")).as("b"))
      .groupBy("w").agg(bit_or(col("b")).as("word"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    Array.tabulate(1 << (bits - 6))(i => words.getOrElse(i, 0L))
  }

  /** Membership test against a built bitmap — all k bits must be set.
    * Pure per-row arithmetic; no join, no shuffle. */
  def mightContain(bitmap: Array[Long], key: Column, bits: Int = DefaultBits,
                   k: Int = DefaultProbes): Column = {
    val words = lit(bitmap)
    probes(key, bits, k).map { p =>
      val word = element_at(words, (p / 64).cast("int") + 1)
      word.bitwiseAND(call_function("shiftleft", lit(1L),
        pmod(p, lit(64L)).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /** Bloom-prefiltered left-semi join: probe rows failing the bitmap
    * never reach the exchange; the exact semi-join on the survivors
    * removes Bloom false positives, so the result EQUALS the plain
    * semi-join (the oracle). */
  def semiJoin(probe: DataFrame, probeKey: String, build: DataFrame,
               buildKey: String, bits: Int = DefaultBits,
               k: Int = DefaultProbes): DataFrame = {
    val bitmap = buildBitmap(build.select(buildKey).distinct(), buildKey, bits, k)
    probe.filter(mightContain(bitmap, col(probeKey), bits, k))
      .join(build.select(col(buildKey).as(probeKey)).distinct(),
        Seq(probeKey), "left_semi")
  }
}
