package graft

import org.apache.spark.sql.DataFrame

/** Distribution helpers.
  *
  * `spread` repartitions to the session default parallelism. Two jobs:
  *  - a small single-file parquet scan yields ONE partition, serializing
  *    all downstream map work onto one task (at 100 TB the scan has
  *    thousands of splits; locally we must simulate that);
  *  - the Exchange is a materialization barrier: columns computed before
  *    it (e.g. a tokenized array) become real row fields, so later
  *    expressions referencing them do O(1) attribute reads instead of
  *    re-evaluating the producing expression. Interpreted higher-order
  *    functions get no common-subexpression elimination — an
  *    `element_at(split(text), i)` inside a 350-iteration lambda
  *    re-splits the text 350 times without this barrier.
  */
object Dist {
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
