package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function batteries (SURVEY.md §2.5): string, date, math, array,
  * map/JSON — every function a codegen'd Catalyst built-in, zero UDFs, so
  * each query stays inside one WholeStageCodegen span over the scan.
  *
  * Scale notes: all queries are narrow scan→project→(small) agg pipelines;
  * the only shuffles carry combined partials of low-cardinality groups.
  * Column pruning reaches the parquet reader in every case (the select list
  * is the read schema).
  */
object ScalarFns extends QueryModule {

  /** substr / upper / like / split / regexp over part. */
  def stringFns(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "part")
      .filter(col("p_name").like("%gear%") || col("p_name").like("small%"))
      .select(
        col("p_partkey"),
        substring(col("p_name"), 1, 6).as("name_pfx"),
        upper(col("p_brand")).as("brand_uc"),
        size(split(col("p_name"), " ")).as("n_words"),
        regexp_extract(col("p_brand"), "#(\\d+)$", 1).cast("int").as("brand_num"),
        concat_ws("|", col("p_type"), col("p_name")).as("tagged"))
      .orderBy(col("p_partkey"))

  /** date_trunc / extract / datediff over orders ⋈ lineitem. */
  def dateFns(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val l = Tables(spark, dir, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("ship_lag_days"))
      .groupBy(col("order_year"), col("order_month"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("ship_lag_days")), 4).as("avg_ship_lag"),
        max(col("ship_lag_days")).as("max_ship_lag"))
      .orderBy(col("order_year"), col("order_month"))
  }

  /** round / abs / ln / sqrt / power over lineitem, folded per returnflag. */
  def mathFns(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(sum(log(col("l_extendedprice"))), 2).as("sum_ln_price"),
        round(avg(sqrt(col("l_quantity"))), 4).as("avg_sqrt_qty"),
        round(max(pow(col("l_discount"), 2)), 6).as("max_disc_sq"),
        round(min(abs(col("l_tax") - 0.05)), 6).as("min_tax_dev"))
      .orderBy(col("l_returnflag"))

  /** size / slice / aggregate / filter higher-order fns over embeddings.
    * Elements are cast to double before summing so both engines fold the
    * same float→double-exact values in the same order. */
  def arrayFns(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .filter(col("vec_id") < 100)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(aggregate(slice(col("embedding"), 1, 4), lit(0.0),
          (acc, x) => acc + x.cast("double")), 4).as("head4_sum"),
        size(filter(col("embedding"), x => x > 0)).as("n_positive"))
      .orderBy(col("vec_id"))

  /** from_json → map, map_keys / element_at over events.props — the
    * analytic mirror of the relay's label-map lookups (SURVEY.md §2.2). */
  def mapJsonFns(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.IntegerType)).as("m"))
      .select(col("event_type"),
        element_at(map_keys(col("m")), 1).as("prop_key"),
        element_at(col("m"), "k").as("k"))
      .groupBy(col("event_type"), col("prop_key"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("k")), 4).as("avg_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"), col("prop_key"))

  /** Generator / UDTF-shaped operator: posexplode tokens into rows. */
  def posExplode(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .orderBy(col("doc_id"), col("pos"))

  val queries: Map[String, QueryFn] = Map(
    "q03_posexplode" -> posExplode _,
    "q35_string_fns" -> stringFns _,
    "q36_date_fns" -> dateFns _,
    "q37_math_fns" -> mathFns _,
    "q38_array_fns" -> arrayFns _,
    "q39_map_json_fns" -> mapJsonFns _
  )

  val oracleSql: Map[String, String] = Map(
    "q03_posexplode" ->
      """SELECT doc_id,
        |       CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos,
        |       unnest(string_split(text, ' ')) AS tok
        |FROM documents WHERE doc_id < 20 ORDER BY doc_id, pos""".stripMargin,
    "q35_string_fns" ->
      """SELECT p_partkey, substr(p_name, 1, 6) AS name_pfx,
        |       upper(p_brand) AS brand_uc,
        |       CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
        |       CAST(regexp_extract(p_brand, '#(\d+)$', 1) AS INT) AS brand_num,
        |       concat_ws('|', p_type, p_name) AS tagged
        |FROM part
        |WHERE p_name LIKE '%gear%' OR p_name LIKE 'small%'
        |ORDER BY p_partkey""".stripMargin,
    "q36_date_fns" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS order_year,
        |       CAST(month(o_orderdate) AS INT) AS order_month,
        |       count(*) AS n,
        |       round(avg(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_ship_lag,
        |       CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS INT) AS max_ship_lag
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q37_math_fns" ->
      """SELECT l_returnflag,
        |       round(sum(ln(l_extendedprice)), 2) AS sum_ln_price,
        |       round(avg(sqrt(l_quantity)), 4) AS avg_sqrt_qty,
        |       round(max(pow(l_discount, 2)), 6) AS max_disc_sq,
        |       round(min(abs(l_tax - 0.05)), 6) AS min_tax_dev
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q38_array_fns" ->
      """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
        |       round(list_sum(list_transform(embedding[1:4],
        |                                     x -> CAST(x AS DOUBLE))), 4) AS head4_sum,
        |       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive
        |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin,
    "q39_map_json_fns" ->
      """SELECT event_type, json_keys(CAST(props AS JSON))[1] AS prop_key,
        |       count(*) AS n,
        |       round(avg(CAST(props->>'k' AS INT)), 4) AS avg_k,
        |       min(CAST(props->>'k' AS INT)) AS min_k,
        |       max(CAST(props->>'k' AS INT)) AS max_k
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
