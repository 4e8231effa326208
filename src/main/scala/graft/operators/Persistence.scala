package graft.operators

import org.apache.spark.sql.SparkSession

/** Storage hygiene for write-and-return maintenance jobs.
  *
  * Index writers (writeBandIndex, writeIvfPqIndex, …) cache or
  * localCheckpoint intermediate frames so multi-output writes don't
  * recompute the build pipeline per sink — but a writer returns Unit,
  * so nothing downstream ever unpersists those frames and each
  * invocation pins executor storage for the session lifetime (the
  * ing10 cache-leak class, advisor round-9). `cache()`d frames can
  * release themselves, `localCheckpoint()` frames cannot: the
  * checkpointed RDD is persisted OUTSIDE the Dataset cache manager, so
  * `Dataset.unpersist` never reaches it. The only public handle is the
  * SparkContext persistent-RDD registry — snapshot it before the body,
  * release whatever the body added after its writes complete.
  *
  * Correct ONLY for bodies whose outputs are fully materialized (files
  * on disk) before the body returns — a body handing back a lazy frame
  * would lose its backing storage. Every index writer qualifies; query
  * paths must not use this.
  */
private[graft] object persist {

  def releasingNewRdds[T](spark: SparkSession)(body: => T): T = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    try body
    finally {
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!before.contains(id)) rdd.unpersist(blocking = false)
      }
    }
  }
}
