package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge.
  *
  * Spark 4 made the classic converters `private[sql]`, so this one
  * object lives inside Spark's package namespace to re-export them to
  * graft (the standard extension-library idiom for custom Catalyst
  * expressions).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** RDD ids a checkpointed Dataset actually holds (its plan's
    * LogicalRDD leaves). Iterative operators release the SUPERSEDED
    * generation's blocks with exactly these ids — deriving them from
    * the Dataset itself instead of diffing the SparkContext-global
    * getPersistentRDDs keyset around the checkpoint call, which could
    * capture (and later unpersist) an unrelated RDD persisted by a
    * concurrent job in a shared session (advisor round 12).
    * LogicalRDD is private[sql]; this bridge lives inside Spark's
    * namespace for the same reason the expression converters do. */
  def checkpointRddIds(ds: org.apache.spark.sql.Dataset[_]): Set[Int] =
    ds.queryExecution.logical.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
    }.toSet
}

