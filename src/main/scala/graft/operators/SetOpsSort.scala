package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sort / limit / top-k and the three set operations (SURVEY.md §2.5).
  *
  * Scale notes: global top-k compiles to Spark's `TakeOrderedAndProject` —
  * each task keeps a k-sized heap, the driver merges k×partitions rows; no
  * global sort at any scale. `intersect`/`except` are distinct-based
  * hash-aggregate + shuffle on the full key, same cost class as a groupBy
  * on the key — fine here because the keys are already compact ids.
  */
object SetOpsSort extends QueryModule {

  /** Global top-10 orders by price — `orderBy().limit(k)` = TakeOrdered. */
  def topkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("totalprice"),
        col("o_orderstatus"))
      .orderBy(col("totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** union all / intersect / except, each reduced to a labeled count. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val custKeys = Tables(spark, dir, "customer").select(col("c_custkey").as("k"))
    val orderCust = Tables(spark, dir, "orders").select(col("o_custkey").as("k"))
    val buildingCust = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
    def labeled(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("op"), col("n"))
    labeled("except", custKeys.except(orderCust))
      .unionAll(labeled("intersect", orderCust.intersect(buildingCust)))
      .unionAll(labeled("union_all", custKeys.unionAll(orderCust)))
      .orderBy(col("op"))
  }

  /** `Dataset.unpivot` (melt): wide measure columns → long (measure, val)
    * rows — the inverse of q19's pivot. Unpivot is a zero-shuffle Expand
    * (each input row emits one row per measure in-place), so the only
    * exchange is the following aggregate's. */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").as("quantity"),
        col("l_extendedprice").as("price"),
        col("l_discount").as("discount"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("quantity"), col("price"), col("discount")),
        "measure", "val")
      .groupBy(col("l_returnflag").as("returnflag"), col("measure"))
      .agg(count(lit(1)).as("n"), round(sum(col("val")), 2).as("total"))
      .orderBy(col("returnflag"), col("measure"))

  val queries: Map[String, QueryFn] = Map(
    "q28_sort_topk" -> topkOrders _,
    "q29_set_ops" -> setOps _,
    "q87_unpivot" -> unpivotMeasures _
  )

  val oracleSql: Map[String, String] = Map(
    "q28_sort_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS totalprice, o_orderstatus
        |FROM orders ORDER BY totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q29_set_ops" ->
      """SELECT 'except' AS op, count(*) AS n FROM
        |  (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'intersect', count(*) FROM
        |  (SELECT o_custkey FROM orders INTERSECT
        |   SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |UNION ALL
        |SELECT 'union_all', count(*) FROM
        |  (SELECT c_custkey FROM customer UNION ALL SELECT o_custkey FROM orders)
        |ORDER BY op""".stripMargin,
    "q87_unpivot" ->
      """WITH m AS (
        |  SELECT l_returnflag, 'quantity' AS measure, l_quantity AS val FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'price', l_extendedprice FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'discount', l_discount FROM lineitem)
        |SELECT l_returnflag AS returnflag, measure,
        |       CAST(count(*) AS BIGINT) AS n, round(sum(val), 2) AS total
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
