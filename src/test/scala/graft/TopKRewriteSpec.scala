package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The optimizer rule: row_number-over-window + rn<=k filter auto-rewrites
  * to the bounded-heap ranked top-k exec (rank preserved) — and produces
  * results identical to the un-rewritten plan. */
class TopKRewriteSpec extends SparkSpecBase {

  private def ranked = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w))
  }

  test("Filter(rn<=k, Window(row_number)) plans as TopKRanked, no sort") {
    val df = ranked.filter(col("rn") <= 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKRanked"), plan)
    assert(!plan.contains("Sort "), s"rewritten top-k must not sort:\n$plan")
  }

  test("rewrite preserves results + rank values exactly") {
    val withRule = ranked.filter(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // disable the rule → vanilla Window path
    val prev = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    try {
      spark.conf.set("spark.sql.optimizer.excludedRules",
        "graft.plans.RowNumberTopKRewrite")
      val vanilla = ranked.filter(col("rn") <= 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      assert(withRule == vanilla && vanilla.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
      case None => spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("windowTopKPerGroup (the driver-path query) itself plans as TopKRanked") {
    val df = graft.ops.AggOps.windowTopKPerGroup(Tables.orders(spark, sfDir))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKRanked"), s"driver query must hit the heap exec:\n$plan")
  }

  test("cast-then-filter shape (Project(Cast(rn)) between Filter and Window) also rewrites") {
    val df = ranked.withColumn("rn", col("rn").cast("long")).filter(col("rn") <= 3)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKRanked"), s"cast idiom must still hit the heap exec:\n$plan")
    assert(rows.nonEmpty && rows.forall(_.getLong(3) <= 3L))
  }

  test("guards: huge and non-positive literal bounds never reach the heap exec") {
    // k = Int.MaxValue is a no-op filter: must stay on the spilling window
    // plan (the heap exec would allocate a k+1 PriorityQueue → overflow)
    val huge = ranked.withColumn("rn", col("rn").cast("long"))
      .filter(col("rn") <= 2147483647L)
    assert(!huge.queryExecution.optimizedPlan.toString.contains("TopKRanked"))
    assert(huge.count() == ranked.count())
    // below-range literal must not wrap around to a positive k
    val none = ranked.withColumn("rn", col("rn").cast("long"))
      .filter(col("rn") < Int.MinValue.toLong)
    assert(!none.queryExecution.optimizedPlan.toString.contains("TopKRanked"))
    assert(none.count() == 0)
    // the public API rejects degenerate k on the driver
    intercept[IllegalArgumentException] {
      graft.plans.TopK.perGroup(ranked, Seq("o_custkey"), Seq(col("o_totalprice")), 0)
    }
  }

  test("guard: nondeterministic projections above the window are NOT rewritten") {
    // rewriting would evaluate rand() for only the k kept rows instead of
    // every window row — values would differ from the un-rewritten plan
    val df = ranked.withColumn("rn", col("rn").cast("long"))
      .withColumn("noise", rand(7))
      .filter(col("rn") <= 3)
    assert(!df.queryExecution.optimizedPlan.toString.contains("TopKRanked"),
      "nondeterministic projection must block the rewrite")
  }

  test("guards: extra predicates or non-row_number windows are NOT rewritten") {
    val filtered = ranked.filter(col("rn") <= 3 && col("o_totalprice") > 0)
    assert(!filtered.queryExecution.optimizedPlan.toString.contains("TopKRanked"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
    val rk = Tables.orders(spark, sfDir).withColumn("r", rank().over(w))
      .filter(col("r") <= 2)
    assert(!rk.queryExecution.optimizedPlan.toString.contains("TopKRanked"))
  }
}
