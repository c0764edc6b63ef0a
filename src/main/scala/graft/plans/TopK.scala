package graft.plans

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Expression, SortOrder}

/** User-facing API for the custom top-k-per-key operator. */
object TopK {

  /** Top `k` rows per `keyCols` group under `orderCols` (include a
    * tiebreaker for determinism), with a 1-based `rankName` column —
    * drop-in for the row_number window pattern, but executed by the
    * partial+merge TopKPerKey physical operator.
    *
    * `distinct = true` additionally drops rows that compare EQUAL to
    * an already kept row under the (total) sort order — bounded-state
    * dedup for candidate streams whose duplicates are bit-identical
    * (multi-table LSH emits each agreeing (query, vec) pair once per
    * table with the same score). Equivalent to groupBy(all order
    * columns).max-then-top-k, without the unbounded aggregation map.
    */
  def perKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
             k: Int, rankName: String = "rnk",
             distinct: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }
    val plan = df.queryExecution.analyzed
    val attrs = plan.output
    def resolve(e: Expression): Expression = e.transformUp {
      case u: UnresolvedAttribute =>
        attrs.find(_.name.equalsIgnoreCase(u.name)).getOrElse(
          throw new IllegalArgumentException(
            s"column ${u.name} not in ${attrs.map(_.name).mkString(", ")}"))
    }
    val keys = keyCols.map(n => resolve(UnresolvedAttribute(n)))
    val order = orderCols.map(c => GraftBridge.eagerExpression(c) match {
      case s: SortOrder => s.copy(child = resolve(s.child))
      case e => SortOrder(resolve(e), Ascending)
    })
    GraftBridge.ofRows(spark,
      TopKPerKeyNode(keys, order, k, TopKPerKeyNode.rankAttribute(rankName),
        plan, distinct))
  }
}

/** `spark.sql.extensions`-style registration for deployments that
  * prefer config wiring over the programmatic path in TopK.perKey. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => TopKStrategy)
}
