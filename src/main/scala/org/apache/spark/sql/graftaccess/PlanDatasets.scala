package org.apache.spark.sql.graftaccess

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Compile-time access shim for `Dataset.ofRows` (private[sql]): wraps an
  * ALREADY-ANALYZED logical plan in a fresh Dataset/QueryExecution. Used
  * by graft's analyzed-plan memo — the new QueryExecution re-runs
  * optimization, physical planning, codegen and execution from scratch
  * (so nothing computed is ever reused), while the memoized logical plan
  * skips only the repeated driver-side construction+analysis of a
  * byte-identical statement.
  */
object PlanDatasets {
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
