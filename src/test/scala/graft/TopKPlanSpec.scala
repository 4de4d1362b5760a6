package graft

import org.apache.spark.sql.functions._
import graft.plans.{TopK, TopKPerGroupExec}

class TopKPlanSpec extends SparkSpecBase {

  private def base = {
    val o = Tables.orders(spark, sfDir)
    o.select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("p"))
  }

  test("TopKPerGroup matches the window row_number formulation") {
    val o = base
    val custom = TopK.perGroup(o, Seq("o_custkey"), Seq(o("p").desc, o("o_orderkey")), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("p").desc, col("o_orderkey"))
    val viaWindow = base.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom == viaWindow && custom.nonEmpty)
  }

  test("TopKPerGroup plans with the custom exec and WITHOUT a sort") {
    val o = base
    val df = TopK.perGroup(o, Seq("o_custkey"), Seq(o("p").desc), 2)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(!plan.contains("Sort "), s"bounded-heap top-k must not sort:\n$plan")
  }

  test("k larger than group size returns whole groups") {
    val o = base.filter(col("o_custkey") < 5)
    val custom = TopK.perGroup(o, Seq("o_custkey"), Seq(o("p").desc), 1000).count()
    assert(custom == o.count())
  }
}
