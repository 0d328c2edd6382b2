package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  private val H = 3600000000L

  private def ev(rows: (String, Long, Double)*) = {
    import spark.implicits._
    rows.toDF("event_type", "ts", "value")
  }

  private def series(rows: (String, Long, Double)*): Map[(String, Long), (Double, Boolean)] =
    TimeSeries.interpolate(ev(rows: _*)).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getAs[Double]("value_f"), r.getAs[Boolean]("observed"))).toMap

  test("interior gaps interpolate linearly between observed hours") {
    // hours 0 and 3 observed (10, 40): hours 1, 2 → 20, 30
    val out = series(("a", 0L, 10.0), ("a", 3 * H, 40.0))
    assert(out.size == 4)
    assert(out(("a", 0L)) == (10.0, true))
    assert(out(("a", H)) == (20.0, false))
    assert(out(("a", 2 * H)) == (30.0, false))
    assert(out(("a", 3 * H)) == (40.0, true))
  }

  test("observed hours average their events exactly and stay untouched") {
    val out = series(("a", 10L, 1.0), ("a", 20L, 2.0), ("a", H, 7.0))
    assert(out(("a", 0L)) == (1.5, true))
    assert(out(("a", H)) == (7.0, true))
  }

  test("grid and neighbors are per-type; spans differ per type") {
    val out = series(
      ("a", 0L, 1.0), ("a", 2 * H, 3.0),
      ("b", 5 * H, 100.0), ("b", 6 * H, 200.0))
    // a's gap interpolates from a's neighbors only
    assert(out(("a", H)) == (2.0, false))
    // b's grid starts at hour 5 — no phantom hours from a's span
    assert(!out.contains(("b", 0L)) && !out.contains(("b", 4 * H)))
    assert(out(("b", 5 * H)) == (100.0, true))
    assert(out.size == 5)
  }

  test("uneven gap lengths weight by hour distance") {
    // observed at hours 0 (0.0) and 4 (8.0): hour 1 → 2, hour 3 → 6
    val out = series(("a", 0L, 0.0), ("a", 4 * H, 8.0))
    assert(out(("a", H)) == (2.0, false))
    assert(out(("a", 3 * H)) == (6.0, false))
  }

  test("single-observation series yields a single observed row") {
    val out = series(("a", H + 5L, 42.0))
    assert(out == Map(("a", H) -> (42.0, true)))
  }

  test("seasonal-naive forecast repeats the last observed period") {
    // 48 observed hours for type a: counts 1 in hours 0-23, then
    // hour 24+k carries k+1 events — the forecast must repeat the
    // SECOND day, not the first
    val rows = (0 until 24).map(h => ("a", h * H + 1L, 1.0)) ++
      (0 until 24).flatMap(h =>
        (0 to h).map(i => ("a", (24 + h) * H + 10L + i, 1.0)))
    val out = TimeSeries.forecastSeasonalNaive(ev(rows: _*))
      .collect()
      .map(r => r.getAs[Long]("hour_us") ->
        (r.getAs[Long]("source_hour_us"), r.getAs[Long]("forecast_n"),
          r.getAs[Double]("mean_baseline"))).toMap
    assert(out.size == 24)
    (0 until 24).foreach { h =>
      val fcHour = (48 + h) * H
      val (src, n, mb) = out(fcHour)
      assert(src == (24 + h) * H, s"hour $h sourced from the wrong day")
      assert(n == h + 1L, s"hour $h forecast $n != ${h + 1}")
      // mean of 1..24 = 12.5 — one exact division
      assert(mb == 12.5)
    }
    // a shorter horizon truncates, never shifts
    val short = TimeSeries.forecastSeasonalNaive(ev(rows: _*), horizon = 6)
      .collect().map(_.getAs[Long]("hour_us")).sorted
    assert(short.toSeq == (0 until 6).map(h => (48 + h) * H))
  }

  test("autocorr: hand-computed ACF on a period-2 series, zero hours " +
    "grid-filled, lags beyond the span absent") {
    // hourly counts [2, 0, 2, 0, 2]: n=5, S=6, dev = 5x−6 =
    // [4,−6,4,−6,4], den = Σdev² = 120
    val rows = Seq(0L, 0L, 2L, 2L, 4L, 4L).map(h => ("x", h * H, 1.0))
    val out = TimeSeries.autocorr(ev(rows: _*), maxLag = 6).collect()
      .map(r => r.getAs[Long]("lag") ->
        (r.getAs[Long]("n_terms"),
         r.getAs[java.math.BigDecimal]("acf_num").longValueExact(),
         r.getAs[java.math.BigDecimal]("acf_den").longValueExact(),
         r.getAs[Double]("acf"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L),
      "lags >= series length must be absent")
    assert(out(1L) == ((4L, -96L, 120L, -96.0 / 120.0)))
    assert(out(2L) == ((3L, 68L, 120L, 68.0 / 120.0)))
    assert(out(3L) == ((2L, -48L, 120L, -48.0 / 120.0)))
    assert(out(4L) == ((1L, 16L, 120L, 16.0 / 120.0)))
  }

  test("crosscorr: a planted 1-hour lead peaks at lag +1 with xcorr 1, " +
    "pair ordered, lags without overlap absent") {
    // x: counts [2,0,2,0,2] on hours 0-4; y: the SAME series shifted
    // +1 hour (hours 1-5). dev = [4,−6,4,−6,4] on each type's own
    // grid, den = 120 for both. At lag +1 every x hour aligns with
    // its shifted copy → num = Σdev² = 120, xcorr = 1; at lag 0 the 4
    // overlapping hours anti-align → num = −96.
    val rows = Seq(0L, 0L, 2L, 2L, 4L, 4L).map(h => ("x", h * H, 1.0)) ++
      Seq(1L, 1L, 3L, 3L, 5L, 5L).map(h => ("y", h * H, 1.0))
    val out = TimeSeries.crosscorr(ev(rows: _*), maxLag = 12).collect()
    assert(out.forall(r => r.getAs[String]("type_a") == "x" &&
      r.getAs[String]("type_b") == "y"), "pairs must be ordered a < b")
    val byLag = out.map(r => r.getAs[Long]("lag") ->
      (r.getAs[Long]("n_terms"), r.getAs[String]("xcorr_num"),
        r.getAs[String]("den_a"), r.getAs[String]("den_b"),
        r.getAs[Double]("xcorr"))).toMap
    // y's grid is hours 1..5: x hour t only pairs when t+L ∈ [1,5]
    assert(byLag.keySet == (-3L to 5L).toSet,
      s"unexpected lag set ${byLag.keySet}")
    assert(byLag(1L) == ((5L, "120", "120", "120",
      120.0 / (math.sqrt(120.0) * math.sqrt(120.0)))))
    assert(byLag(0L) == ((4L, "-96", "120", "120",
      -96.0 / (math.sqrt(120.0) * math.sqrt(120.0)))))
  }

  test("crosscorr: a constant series yields NULL xcorr but exact sums") {
    // z is flat (1 event every hour 0-3): dev ≡ 0, den = 0 → the
    // coefficient is undefined and must be NULL, never NaN/Infinity
    val rows = Seq(0L, 2L).map(h => ("a", h * H, 1.0)) ++
      (0L to 3L).map(h => ("z", h * H, 1.0))
    val out = TimeSeries.crosscorr(ev(rows: _*), maxLag = 2).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.isNullAt(r.fieldIndex("xcorr"))))
    assert(out.forall(r => r.getAs[String]("den_b") == "0"))
  }

  test("debounce flags repeats within the gap, first events never") {
    import spark.implicits._
    // user 1 click at t=0, retry at +1s (bounce), next at +700s
    // (clean); user 1 view at +0.5s is a DIFFERENT type — no bounce;
    // user 2 click at +1s — different user, no bounce
    val rows = Seq(
      (1L, 1L, "click", 0L), (2L, 1L, "click", 1000000L),
      (3L, 1L, "click", 701000000L), (4L, 1L, "view", 500000L),
      (5L, 2L, "click", 1000000L))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = TimeSeries.debounce(rows, gapUs = 600000000L)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Boolean]("is_bounce"),
          Option(r.getAs[java.lang.Long]("gap_us")).map(_.toLong)))
      .toMap
    assert(out(1L) == ((false, None)))
    assert(out(2L) == ((true, Some(1000000L))))
    assert(out(3L) == ((false, Some(700000000L))))
    assert(out(4L) == ((false, None)))
    assert(out(5L) == ((false, None)))
    // equal-ts ties order by event_id: the higher id is the bounce
    val tie = Seq((7L, 9L, "click", 42L), (6L, 9L, "click", 42L))
      .toDF("event_id", "user_id", "event_type", "ts")
    val t = TimeSeries.debounce(tie, gapUs = 1L).collect()
      .map(r => r.getAs[Long]("event_id") ->
        r.getAs[Boolean]("is_bounce")).toMap
    assert(t(6L) == false && t(7L) == true)
  }

  test("CUSUM changepoint lands on a clean mean shift") {
    // 4 hours at 1 event/hour then 4 hours at 5/hour: μ = 3,
    // S_t = cum − 3t = (−2,−4,−6,−8,−6,−4,−2,0) — argmax |S| at
    // t = 4 (hour 3), mean_before = 1, mean_after = 5
    val rows = (0 until 4).map(h => ("a", h * H + 1L, 0.0)) ++
      (4 until 8).flatMap(h => (0 until 5).map(i => ("a", h * H + i + 1L, 0.0)))
    val out = TimeSeries.changepoint(ev(rows: _*)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("change_hour_us") == 3 * H)
    assert(r.getAs[Double]("cusum") == -8.0)
    assert(r.getAs[Long]("n_hours") == 8 && r.getAs[Long]("n_total") == 24)
    assert(r.getAs[Double]("mean_before") == 1.0)
    assert(r.getAs[Double]("mean_after") == 5.0)
  }

  test("CUSUM on a flat series picks the earliest hour with zero shift") {
    val rows = (0 until 6).map(h => ("a", h * H + 1L, 0.0))
    val r = TimeSeries.changepoint(ev(rows: _*)).collect().head
    assert(r.getAs[Double]("cusum") == 0.0)
    assert(r.getAs[Long]("change_hour_us") == 0L)
    assert(r.getAs[Double]("mean_before") == 1.0)
    // argmax at t = 1 → after-side mean over the remaining 5 flat hours
    assert(r.getAs[Double]("mean_after") == 1.0)
  }

  test("decayed popularity halves per day and outranks raw counts") {
    val D = 86400000000L
    // b has MORE events but they are 2 days old: 6 × (1000000 >> 2)
    // = 1.5e6 < a's 3 fresh × 1e6 = 3e6 — decay must invert the
    // raw-count ranking
    val rows = (0 until 3).map(i => ("a", 10 * D + i + 1L, 0.0)) ++
      (0 until 6).map(i => ("b", 8 * D - 100 + i.toLong, 0.0))
    val out = TimeSeries.decayedPopularity(ev(rows: _*)).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("n_events") == 3 &&
      out("a").getAs[Long]("decayed_mass") == 3000000L)
    assert(out("b").getAs[Long]("n_events") == 6 &&
      out("b").getAs[Long]("decayed_mass") == 1500000L)
    assert(out("a").getAs[Long]("decay_rank") == 1L &&
      out("b").getAs[Long]("decay_rank") == 2L)
    // shares: 3e6/4.5e6 and 1.5e6/4.5e6 in floor ppm
    assert(out("a").getAs[Long]("decayed_share_ppm") == 666666L)
    assert(out("b").getAs[Long]("decayed_share_ppm") == 333333L)
  }

  test("decay clamps: ancient events weigh zero, never shift-overflow") {
    val D = 86400000000L
    val rows = Seq(("a", 200 * D, 0.0), ("a", 0L, 0.0))
    val out = TimeSeries.decayedPopularity(ev(rows: _*)).collect().head
    // fresh event contributes 1e6; the 200-day-old one shifts ≥ 62 → 0
    assert(out.getAs[Long]("decayed_mass") == 1000000L)
  }

  test("lateArrivalAudit: hand-computed exclusive watermark across bands") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // arrival = event_id, bandShift=1 → bands of 2 ids: the two-phase
    // max must equal the straight exclusive prefix max
    // ts by arrival: 100, 50, 200, 90, 210, 10; delay 20
    // wm-excl:      none, 100, 100, 200, 200, 210
    // late:          -,   yes,  no, yes,  no, yes (lateness 30/90/180)
    val d = Seq((1L, "x", 100L), (2L, "x", 50L), (3L, "x", 200L),
      (4L, "x", 90L), (5L, "x", 210L), (6L, "x", 10L))
      .toDF("event_id", "event_type", "ts")
    val r = TimeSeries.lateArrivalAudit(d, delayUs = 20L,
      arrivalCol = col("event_id"), bandShift = 1).collect().head
    assert(r.getAs[Long]("n_events") == 6L)
    assert(r.getAs[Long]("n_late") == 3L)
    assert(r.getAs[Long]("late_ppm") == 500000L)
    assert(r.getAs[Long]("max_late_us") == 180L)
  }

  test("watermarkCurve: longer delays drop monotonically less; the " +
    "single-delay slice equals lateArrivalAudit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = Seq((1L, "x", 100L), (2L, "x", 50L), (3L, "x", 200L),
      (4L, "x", 90L), (5L, "x", 210L), (6L, "x", 10L))
      .toDF("event_id", "event_type", "ts")
    val curve = TimeSeries.watermarkCurve(d, Seq(20L, 120L, 1000L),
      arrivalCol = col("event_id"), bandShift = 1)
      .collect().map(r => r.getAs[Long]("delay_us") -> r).toMap
    assert(curve(20L).getAs[Long]("n_late") >=
      curve(120L).getAs[Long]("n_late"))
    assert(curve(120L).getAs[Long]("n_late") >=
      curve(1000L).getAs[Long]("n_late"))
    assert(curve(1000L).getAs[Long]("n_late") == 0L)
    val single = TimeSeries.lateArrivalAudit(d, 20L,
      arrivalCol = col("event_id"), bandShift = 1).collect().head
    assert(curve(20L).getAs[Long]("n_late") ==
      single.getAs[Long]("n_late") &&
      curve(20L).getAs[Long]("max_late_us") ==
        single.getAs[Long]("max_late_us"))
  }

  test("lateArrivalAudit: the first arrival is never late; per-type rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val d = Seq((1L, "a", 1000L), (2L, "b", 0L))
      .toDF("event_id", "event_type", "ts")
    val out = TimeSeries.lateArrivalAudit(d, delayUs = 10L,
      arrivalCol = col("event_id"), bandShift = 1)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("a").getAs[Long]("n_late") == 0L)
    // b arrived after a's ts=1000 watermark: 0 < 1000-10 → late 990
    assert(out("b").getAs[Long]("n_late") == 1L &&
      out("b").getAs[Long]("max_late_us") == 990L)
  }

  test("decompose: a pure period-24 signal leaves zero residual on full frames") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val hourUs = 3600000000L
    // 72 hours; count = 10 for hod < 12, 14 otherwise → one full
    // period sums to C = 288, so every full centered frame has
    // frame_sum = 288 → trend = 12.0 exactly; detrended numerator
    // 24n − 288 ∈ {−48, +48} is divisible by 24 → seasonal ∈
    // {−2, +2} exact and the residual cancels to exactly 0.0
    val rows = for {
      h <- 0 until 72
      i <- 0 until (if (h % 24 < 12) 10 else 14)
    } yield (h.toLong * 100 + i, "a", h.toLong * hourUs)
    val events = rows.toDF("event_id", "event_type", "ts")
    val out = TimeSeries.decompose(events, period = 24)
      .orderBy("hour_us").collect()
    assert(out.length == 72)
    val full = out.filter(!_.isNullAt(3))
    // frame is full exactly where 12 predecessors and 11 successors
    // exist: rows 12 .. 60 inclusive
    assert(full.length == 49)
    assert(full.forall(_.getAs[Double]("trend") == 12.0))
    for (r <- full) {
      val hod = (r.getAs[Long]("hour_us") / hourUs) % 24
      val expSeason = if (hod < 12) -2.0 else 2.0
      assert(r.getAs[Double]("seasonal") == expSeason,
        s"hod=$hod got ${r.getAs[Double]("seasonal")}")
      assert(r.getAs[Double]("residual") == 0.0)
    }
    // edge rows: count present, decomposition honestly null
    val edges = out.filter(_.isNullAt(3))
    assert(edges.forall(r => r.isNullAt(4) && r.isNullAt(5)))
  }

  test("seasonalAnomaly flags a planted spike, not the daily rhythm") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val hourUs = 3600000000L
    // 96 hours of a strong period-24 rhythm (10 vs 14) with small
    // aperiodic jitter (so MAD > 0), plus a +40 spike at hour 50 —
    // a raw-count monitor would fire every "rush" hour; the
    // de-seasonalized monitor must fire on the spike alone
    val rows = for {
      h <- 0 until 96
      base = (if (h % 24 < 12) 10 else 14) + (h * 7) % 3
      n = base + (if (h == 50) 40 else 0)
      i <- 0 until n
    } yield (h.toLong * 1000 + i, "a", h.toLong * hourUs)
    val events = rows.toDF("event_id", "event_type", "ts")
    val out = TimeSeries.seasonalAnomaly(events, period = 24,
      threshold = 3.5).collect()
    val flaggedHours = out.map(_.getAs[Long]("hour_us") / hourUs).toSet
    assert(flaggedHours.contains(50L), "the spike must be flagged")
    assert(out.forall(_.getAs[Double]("mod_z") > 3.5))
    // the spike is the LOUDEST alert by far (its echoes — MA-window
    // neighbors and same-hour-of-day siblings whose seasonal estimate
    // it contaminated — score lower), and the rhythm's base hours
    // stay a majority-quiet series, not a fire-every-hour monitor
    val byHour = out.map(r => r.getAs[Long]("hour_us") / hourUs ->
      r.getAs[Double]("mod_z")).toMap
    assert(byHour(50L) == byHour.values.max,
      "the planted spike must carry the maximum score")
    assert(flaggedHours.size * 2 < 73,
      s"over half the series fired: ${flaggedHours.size} hours")
  }

  test("decompose reconstructs n = trend + seasonal + residual on irregular data") {
    import org.apache.spark.sql.functions._
    val out = TimeSeries.decompose(tables.events, period = 24)
      .filter(col("trend").isNotNull).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val n = r.getAs[Long]("n_events").toDouble
      val sum = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      assert(math.abs(n - sum) < 1e-6,
        s"decomposition must reconstruct the series: n=$n sum=$sum")
    }
  }
}
