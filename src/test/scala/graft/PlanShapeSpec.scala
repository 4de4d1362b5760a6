package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Plan contracts — the claims NOTES_PERF makes about plan quality, pinned
  * as assertions so a refactor that silently loses pushdown, broadcast, a
  * partial aggregate, or the custom exec fails CI instead of only showing
  * up in the bench. */
class PlanShapeSpec extends SparkSpecBase {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q6: every predicate reaches the parquet scan; schema pruned to needed columns") {
    val plan = formatted(SparkEntry.queries("q6_forecast_revenue")(spark, sfDir))
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate") &&
      plan.contains("GreaterThanOrEqual") && plan.contains("LessThan"),
      s"q6 predicates must push into the scan:\n$plan")
    assert(!plan.contains("l_returnflag") && !plan.contains("l_partkey"),
      "q6 must not read columns it does not use")
  }

  test("q1: aggregation is partial before the exchange (map-side combine)") {
    val plan = formatted(SparkEntry.queries("q1_pricing_summary")(spark, sfDir))
    assert(plan.contains("partial_sum") || plan.contains("Functions [partial"),
      s"q1 must partial-aggregate before shuffling:\n$plan")
  }

  test("mapside_join: dimension broadcast, fact side never shuffled for the join") {
    val plan = formatted(SparkEntry.queries("mapside_join")(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), s"dim must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact must not sort-merge for a tiny dim:\n$plan")
  }

  test("text analysis ops are pure map-side: no exchange anywhere in the plan") {
    Seq("lang_id", "quality_score", "token_count", "doc_fingerprint", "pii_scrub")
      .foreach { name =>
        val plan = formatted(SparkEntry.queries(name)(spark, sfDir))
        assert(!plan.contains("Exchange"), s"$name must not shuffle:\n$plan")
      }
  }

  test("window top-k queries plan as the custom bounded-heap exec") {
    Seq("window_topk_per_group", "tfidf_top_terms").foreach { name =>
      val plan = formatted(SparkEntry.queries(name)(spark, sfDir))
      assert(plan.contains("TopKRanked"), s"$name must hit TopKRankedExec:\n$plan")
    }
  }

  test("embedding near-dup and LSH ANN never plan a nested-loop join") {
    Seq("embedding_neardup", "ann_lsh_topk").foreach { name =>
      val plan = formatted(SparkEntry.queries(name)(spark, sfDir))
      assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
        s"$name must stay equi-join bucketed:\n$plan")
    }
  }

  test("semanticDedupAnn candidate stage is an equi-join on bucket — never " +
    "a nested loop (the pair graph feeding CC is checkpointed, so the plan " +
    "to audit is the OPERATOR's candidate/verify stage, pre-CC)") {
    val emb = Tables.embeddings(spark, sfDir)
    val buckets = graft.ops.SimilarityOps.lshIndexRelation(spark, emb,
      bits = graft.ops.SimilarityOps.selfJoinBits(emb.count()))
    val pairs = graft.ops.SimilarityOps.semAnnCandidatePairs(
      spark, emb, buckets, tau = 0.4, maxBucket = 0)
    val plan = formatted(pairs)
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"operator candidate/verify stage must stay equi-join bucketed:\n$plan")
  }

  test("q19: per-side bounds of the OR-of-ANDs predicate push into BOTH scans") {
    val plan = formatted(SparkEntry.queries("q19_discounted_revenue")(spark, sfDir))
    assert(plan.contains("l_quantity") && plan.contains("p_brand"),
      s"q19 disjunction bounds must reach the scans:\n$plan")
    assert("PushedFilters: \\[[^\\]]*Or".r.findFirstIn(plan).isDefined,
      s"q19 must push an Or filter:\n$plan")
  }
}
