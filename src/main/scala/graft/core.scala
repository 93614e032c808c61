package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loader for the driver's parquet testdata (TESTDATA.md).
  *
  * Every analytic query starts here: `spark.read.parquet` gives Catalyst a
  * relation with full pushdown support — filters and column pruning reach the
  * parquet reader (`PushedFilters`/`ReadSchema` in explain), which is what
  * keeps these plans viable at 100 TB: only the referenced columns and
  * row-groups passing the predicate are ever read.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects outright
    * (PARQUET_TYPE_ILLEGAL) unless `spark.sql.legacy.parquet.nanosAsLong`
    * is set at session build. Supplying an explicit read schema with `ts`
    * as LongType sidesteps the footer-schema conversion entirely, so this
    * loader works in ANY session — no conf requirement, and no session-conf
    * mutation at query-build time (which races under concurrent query
    * construction). The raw nanos are truncated to micros — the same
    * truncation DuckDB's µs TIMESTAMP applies, so oracle comparisons see
    * identical values. Pushdown is unaffected: filters and pruning still
    * reach the parquet scan with a user-specified schema.
    */
  private val eventsReadSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))

  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(eventsReadSchema).parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
}

/** A bundle of named queries plus their DuckDB oracle SQL.
  *
  * `SparkEntry` concatenates the modules; the driver's Verify harness runs
  * each query at sf0.01 and hash-compares against the oracle SQL. Queries
  * without an oracle entry (non-SQL-expressible ops) get a rows-only check.
  */
trait QueryModule {
  type QueryFn = (SparkSession, String) => DataFrame
  def queries: Map[String, QueryFn]
  def oracleSql: Map[String, String]
}
