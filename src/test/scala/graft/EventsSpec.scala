package graft

import graft.catalog.Lake
import graft.operators.Events
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventsSpec extends AnyFunSuite {
  import TestSpark._
  private lazy val lake = Lake(spark, sfDir)

  test("asof join: match is the latest view at or before each purchase") {
    val out = Events.evt07AsofJoin(lake)
    // Causality: no match may postdate its purchase.
    assert(out.filter(col("matched_view_ts") > col("purchase_ts")).count() == 0)
    assert(out.filter(col("gap_us") < 0).count() == 0)
    // Exactness: no STRICTLY LATER view by the same user may exist at
    // or before the purchase (i.e., the match really is the latest).
    val views = lake.events
      .filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"))
    val later = out
      .filter(col("matched_view_ts").isNotNull)
      .join(views, "user_id")
      .filter(col("v_ts") > col("matched_view_ts") && col("v_ts") <= col("purchase_ts"))
    assert(later.count() == 0, "found a view later than the chosen match")
    // Completeness: a purchase is unmatched ONLY when the user truly
    // has no view at or before it.
    val unmatchedWithView = out
      .filter(col("matched_view_id").isNull)
      .join(views, "user_id")
      .filter(col("v_ts") <= col("purchase_ts"))
    assert(unmatchedWithView.count() == 0)
  }
}
