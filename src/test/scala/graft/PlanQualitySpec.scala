package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.index.{FlatIndex, IvfIndex}
import graft.queries.VectorQueries

/** Physical-plan assertions: the scale properties claimed in the
  * scaladocs must be visible in the executed plans.
  */
class PlanQualitySpec extends AnyFunSuite {

  lazy val spark = TestSession.spark

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("flat kNN is a broadcast join — the corpus side never shuffles before distances") {
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val plan = planOf(FlatIndex.knn(corpus, queries, 10, Metric.L2))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast join in:\n$plan")
    // the only Exchange should come after the distance projection (top-k),
    // i.e. the scan side feeds the join directly
    val beforeJoin = plan.substring(plan.indexOf("BroadcastNestedLoopJoin"))
    assert(beforeJoin.contains("Scan"), "corpus scan should feed the join directly")
  }

  test("IVF search broadcasts the probe set (no shuffle of the index table)") {
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val model = IvfIndex.trainDeterministic(corpus, 8, Metric.L2)
    val assigned = IvfIndex.assign(corpus, model)
    val plan = planOf(IvfIndex.search(assigned, model, queries, 10, 4))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected probe broadcast in:\n$plan")
  }

  test("parquet scan prunes columns: 2-column projection reads 2 columns") {
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select("doc_id", "lang")
    val plan = planOf(docs)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"expected pruned ReadSchema in:\n$plan")
  }

  test("native distance expressions appear in the plan (not interpreted HOFs)") {
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val plan = planOf(FlatIndex.distanceJoin(corpus, queries, Metric.L2))
    assert(plan.contains("graft_l2sq"), s"expected graft_l2sq in:\n$plan")
  }
}
