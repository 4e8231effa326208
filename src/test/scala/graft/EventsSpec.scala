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

  test("interval join: bin-bucketed pairs equal the naive range join") {
    import org.apache.spark.sql.functions.unix_timestamp
    val out = Events.evt09IntervalJoin(lake, windowSec = 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the naive formulation (BNLJ-planned — fine at spec scale) is the
    // semantic definition the bucketing must reproduce exactly
    val ev = lake.events.select(
      col("event_id"), col("user_id"),
      unix_timestamp(col("ts")).as("sec"), col("event_type"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("sec").as("vs"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("sec").as("ps"))
    val naive = p.join(v, Seq("user_id"))
      .filter(col("vs") >= col("ps") - 1800L && col("vs") < col("ps"))
      .select("purchase_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == naive)
    assert(out.nonEmpty)
    // boundary semantics: window is [p-w, p) half-open — with w=1 the
    // only representable gap is exactly 1 s (0 would be AT the
    // purchase instant, excluded)
    val window1 = Events.evt09IntervalJoin(lake, windowSec = 1L)
      .collect().map(r => r.getLong(2))
    window1.foreach(s => assert(s == 1L))
  }

  test("lateness profile: sharded prefix max equals one global window; delays create real inversions") {
    def rows(shardUs: Long) =
      Events.evt10LatenessProfile(lake, shardUs).collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    // a shard wider than the table's time span is the naive
    // single-window form — the distributed re-keying must be
    // value-identical at ANY bucket width
    val base = rows(Long.MaxValue)
    Seq(600000000L /* 10 min */, 21600000000L /* 6 h */)
      .foreach(s => assert(rows(s) == base, s"shardUs=$s diverged"))
    // totals partition the table; thresholds are monotone; the 0..2h
    // delay model must actually produce late arrivals (non-degenerate)
    assert(base.map(_._2).sum == lake.events.count())
    assert(base.map(_._3).sum > 0, "delay model produced zero inversions")
    base.foreach { case (_, n, late, m1, h1, mx) =>
      assert(late <= n && m1 <= late && h1 <= m1)
      assert((late == 0) == (mx == 0.0))
      assert(mx <= 7200.0, s"lateness $mx exceeds the 2h delay bound")
    }
  }

  test("watermark curve: monotone, anchored to the lateness profile at both ends") {
    val curve = Events.evt11WatermarkCurve(lake).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(curve.map(_._1).toSeq == Seq(0L, 30L, 60L, 300L, 1800L, 3600L, 7200L))
    // a longer delay can only drop fewer events
    curve.sliding(2).foreach {
      case Array(a, b) => assert(b._2 <= a._2, s"non-monotone: $a -> $b")
      case _           => ()
    }
    curve.foreach { case (_, dropped, frac, compl) =>
      assert(math.abs(compl - (1.0 - frac)) <= 1e-3)
      assert(frac >= 0.0 && frac <= 1.0)
    }
    // delay 0 drops exactly the profile's late events; the 2h bound
    // of the arrival model means a 2h watermark drops nothing
    val profile = Events.evt10LatenessProfile(lake).collect()
    assert(curve.head._2 == profile.map(_.getLong(2)).sum)
    assert(curve.last._2 == 0L, s"2h delay still drops ${curve.last._2}")
    assert(curve.head._2 > 0, "degenerate: no late events to trade against")
  }
}
