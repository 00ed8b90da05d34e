package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}

/** Bridge into the one private[sql] constructor a custom-LogicalPlan
  * operator needs: wrapping a plan back into a DataFrame. Lives in the
  * org.apache.spark.sql namespace for access, contains no Spark internals
  * beyond this single call. */
object GraftSql {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
