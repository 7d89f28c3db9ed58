package graft

import graft.operators.Funnel

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def counts(rows: Seq[(Long, Long, String)],
      stages: Seq[String]): Map[Long, Long] =
    Funnel.funnelCounts(rows.toDF("user_id", "ets", "event_type"),
        "user_id", "ets", "event_type", stages)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("strictly-after semantics: a tie does NOT advance the funnel") {
    // user 1: click AT the same instant as the first view -> no stage 2;
    // user 2: click strictly after -> stage 2
    val rows = Seq(
      (1L, 100L, "view"), (1L, 100L, "click"),
      (2L, 100L, "view"), (2L, 101L, "click"))
    assert(counts(rows, Seq("view", "click")) == Map(1L -> 2L, 2L -> 1L))
  }

  test("existential semantics: any strictly-earlier stage-1 event advances") {
    // the click precedes a LATER view but follows the first view —
    // the chain view@100 -> click@150 exists, so stage 2 counts
    val rows = Seq(
      (1L, 100L, "view"), (1L, 200L, "view"), (1L, 150L, "click"))
    assert(counts(rows, Seq("view", "click")) == Map(1L -> 1L, 2L -> 1L))
  }

  test("windowed funnel re-anchors on later previous-stage events") {
    // greedy earliest-anchor would pin the view at t=0 and drop the
    // click@5050 (outside 0+100); the converting chain hangs off the
    // SECOND view — existential semantics must count it
    val rows = Seq(
      (1L, 0L, "view"), (1L, 5000L, "view"), (1L, 5050L, "click"))
    val out = Funnel.funnelCounts(
        rows.toDF("user_id", "ets", "event_type"),
        "user_id", "ets", "event_type", Seq("view", "click"),
        maxSpanUs = Some(100L))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L), s"got $out")
    // and deeper: the purchase@150 is only reachable through the
    // click@90 (click@10 + 100 < 150) — per-event feasibility, not
    // per-stage minima
    val rows3 = Seq(
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 90L, "click"),
      (1L, 150L, "purchase"))
    val out3 = Funnel.funnelCounts(
        rows3.toDF("user_id", "ets", "event_type"),
        "user_id", "ets", "event_type", Seq("view", "click", "purchase"),
        maxSpanUs = Some(100L))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out3 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"got $out3")
  }

  test("conversion window bounds each stage advance") {
    val rows = Seq(
      // user 1: click 50 after view -> inside a 100-window
      (1L, 100L, "view"), (1L, 150L, "click"),
      // user 2: click 500 after view -> outside
      (2L, 100L, "view"), (2L, 600L, "click"))
    val out = graft.operators.Funnel.funnelCounts(
        rows.toDF("user_id", "ets", "event_type"),
        "user_id", "ets", "event_type", Seq("view", "click"),
        maxSpanUs = Some(100L))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L), s"got $out")
    // boundary: exactly AT the window edge still converts (<=)
    val edge = Seq((1L, 0L, "view"), (1L, 100L, "click"))
    val out2 = graft.operators.Funnel.funnelCounts(
        edge.toDF("user_id", "ets", "event_type"),
        "user_id", "ets", "event_type", Seq("view", "click"),
        maxSpanUs = Some(100L))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out2 == Map(1L -> 1L, 2L -> 1L), s"got $out2")
  }

  test("sessionPaths renders gap-bounded ordered sequences") {
    val gap = 100L
    val rows = Seq(
      // user 1: one session view>click, then (gap) a lone view
      (1L, 0L, "view"), (1L, 50L, "click"), (1L, 500L, "view"),
      // user 2: view>click again (same path as user 1's first)
      (2L, 0L, "view"), (2L, 10L, "click"),
      // user 3: tie at t=0 orders by event type -> click>view
      (3L, 0L, "view"), (3L, 0L, "click"))
    val out = Funnel.sessionPaths(
        rows.toDF("user_id", "ets", "event_type"),
        "user_id", "ets", "event_type", gapUs = gap, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("view>click" -> 2L, "view" -> 1L, "click>view" -> 1L),
      s"got $out")
  }

  test("decayedEngagement weights 2^(h-age) and drops beyond-horizon events") {
    val day = 86400000000L
    val rows = Seq(
      // max ts anchors age 0; user 1: ages 0 and 1 -> 2^30 + 2^29
      (1L, 31L * day, "view"), (1L, 30L * day, "view"),
      // user 2: age 31 -> beyond the 30-day horizon, excluded entirely
      (2L, 0L, "view"))
    val out = Funnel.decayedEngagement(
        rows.toDF("user_id", "ets", "event_type"), "user_id", "ets",
        horizonDays = 30)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(1L -> (((1L << 30) + (1L << 29), 2L))), s"got $out")
  }

  test("retention cohorts count each user once per (cohort, offset)") {
    val day = 86400000000L
    val rows = Seq(
      // user 1 signs up day 0; active day 0 (twice), day 2
      (1L, 10L, "signup"), (1L, 20L, "view"), (1L, 2 * day + 5L, "click"),
      // user 2 signs up day 1; active day 1 only (the signup itself)
      (2L, day + 7L, "signup"),
      // user 3 never signs up: in no cohort
      (3L, 42L, "view"))
    val out = graft.operators.Funnel.retentionCohorts(
        rows.toDF("user_id", "ets", "event_type"),
        "user_id", "ets", "event_type", "signup", maxOffset = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((0L, 0L) -> 1L, (0L, 2L) -> 1L, (1L, 0L) -> 1L),
      s"got $out")
  }

  test("three stages drop out monotonically") {
    val rows = Seq(
      // completes all three
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      // purchase BEFORE click: stops at stage 2
      (2L, 1L, "view"), (2L, 5L, "click"), (2L, 4L, "purchase"),
      // view only
      (3L, 1L, "view"),
      // never viewed: not in the funnel at all
      (4L, 1L, "click"), (4L, 2L, "purchase"))
    assert(counts(rows, Seq("view", "click", "purchase")) ==
      Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }
}
