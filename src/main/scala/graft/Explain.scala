package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for the named queries (or all) so
  * physical plans can be audited — broadcast vs shuffle join choice, pushed
  * filters, pruned read schemas, WholeStageCodegen spans.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val selected =
      if (names.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else SparkEntry.queries.filter(kv => names.contains(kv._1)).toSeq.sortBy(_._1)
    selected.foreach { case (name, fn) =>
      println(s"\n===== $name =====")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
