package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Alias, BloomFilterMightContain, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.graftbridge.{ColumnBridge, PlanBridge}

/** Explicit runtime bloom-filter pruning — the semi-join reduction Spark's
  * `InjectRuntimeFilter` rule applies conditionally, exposed as an operator
  * so a pipeline can rely on it unconditionally.
  *
  * Shape: ONE scalar-subquery aggregate folds the (already filtered)
  * dimension keys into a bloom filter (`BloomFilterAggregate` — partial
  * aggregation merges per-partition blooms, so the dimension is read once
  * with no shuffle of its rows), and the fact side filters on
  * `might_contain(bloom, xxhash64(key))` — a codegen'd scan-side predicate.
  * Why it matters at 100 TB: a broadcast join ships the whole dimension to
  * every executor and a plain shuffle join moves every fact row; the bloom
  * ships a few KB-MB and drops non-matching fact rows BEFORE the join
  * shuffle. False positives (~1% at default sizing) pass the prune and are
  * eliminated by the exact join that must follow — results stay exact.
  */
object BloomPrune {

  /** Filter `fact` to rows whose `factKey` might be in `dimKeys` (a
    * single-column DataFrame, pre-filtered to the keys of interest).
    * `expectedItems` sizes the bloom (Spark defaults give ~1% fpp). */
  def bloomPrune(fact: DataFrame, factKey: Column, dimKeys: DataFrame,
                 expectedItems: Long): DataFrame = {
    val dimPlan = PlanBridge.logicalPlan(dimKeys)
    require(dimPlan.output.size == 1,
      s"bloomPrune: dimKeys must have exactly one column, got ${dimPlan.output.map(_.name)}")
    val bloom = new BloomFilterAggregate(
      new XxHash64(Seq(dimPlan.output.head)), expectedItems).toAggregateExpression()
    val bloomPlan = Aggregate(Nil, Seq(Alias(bloom, "bloom")()), dimPlan)
    fact.filter(ColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomPlan),
      new XxHash64(Seq(ColumnBridge.expression(factKey))))))
  }
}
