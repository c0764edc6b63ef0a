package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan for each registered query (or the
  * names passed as args) so scan pruning (`PushedFilters`, `ReadSchema`),
  * broadcast joins, and WholeStageCodegen spans can be audited — the
  * SURVEY §5 checklist. Usage: runMain graft.PlanAudit [query ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
