package graft

import org.apache.spark.sql.functions._
import graft.functions.Scalars

/** Scalar semantics from the reference scripts (SURVEY.md §2.9/§2.11). */
class ScalarsSpec extends SparkSpec {
  import spark.implicits._

  test("P4 anyNonEmpty keeps rows with at least one non-empty column") {
    val df = Seq(("", "", "x"), ("", "", ""), ("a", "", ""), (null, null, null))
      .toDF("c1", "c2", "c3")
    val kept = df.where(Scalars.anyNonEmpty(Seq($"c1", $"c2", $"c3"))).count()
    assert(kept == 2)
  }

  test("P5/P8 qcRange nulls out-of-range but keeps rows; maskUnless masks by flag") {
    val df = Seq((3.0, true), (50.0, true), (120.0, false)).toDF("v", "f")
    val got = df.select(
      Scalars.qcRange($"v", 4.0, 100.0).as("qc"),
      Scalars.maskUnless($"v", $"f").as("m")).collect()
    assert(got.length == 3, "rows kept, not dropped")
    assert(got(0).isNullAt(0) && got(1).getDouble(0) == 50.0 && got(2).isNullAt(0))
    assert(got(0).getDouble(1) == 3.0 && got(2).isNullAt(1))
  }

  test("efficiency expression: classic and stages branches (daily-measures.R:20-49)") {
    val df = Seq(
      ("classic", 10.0, 80.0, 10.0, 0.0, 0.0, 0.0, 0.0), // (80+10)/(10+80+10)=0.9 → 90
      ("stages", 0.0, 0.0, 0.0, 40.0, 20.0, 20.0, 20.0)) // 80/100 → 80
      .toDF("typ", "awake", "asleep", "restless", "light", "deep", "rem", "wake")
    val got = df.select(Scalars.efficiency($"typ", $"awake", $"asleep", $"restless",
      $"light", $"deep", $"rem", $"wake").as("e")).as[Double].collect()
    assert(got.toSeq == Seq(90.0, 80.0))
  }

  test("efficiencyPct: na.rm sums, all-NA→NULL, unknown Type→NULL, R half-EVEN .5 ties " +
    "(weekly-sleep-efficiencies.R:20-50)") {
    val df = Seq(
      // classic, restless NA: (7+0)/(3+7+0) → round(70.0) = 70
      ("classic", Some(3L), Some(7L), None: Option[Long], None: Option[Long], None: Option[Long], None: Option[Long], None: Option[Long]),
      // classic exact 1.0 (no tie): 100·1/100 → 1
      ("classic", Some(99L), Some(1L), Some(0L), None, None, None, None),
      // .5 tie, even target: num=1, den=200 → 0.5 → R round() → 0
      ("classic", Some(199L), Some(1L), Some(0L), None, None, None, None),
      // .5 tie, even target: num=1, den=40 → 2.5 → R round() → 2
      ("classic", Some(39L), Some(1L), Some(0L), None, None, None, None),
      // .5 tie, odd floor: num=3, den=40 → 7.5 → R round() → 8
      ("classic", Some(37L), Some(3L), Some(0L), None, None, None, None),
      // NEGATIVE .5 tie (remainder carries the dividend's sign — abs()):
      // num=-7, den=200 → -3.5 → R round() → -4 (floor -4 is even)
      ("classic", Some(207L), Some(-7L), Some(0L), None, None, None, None),
      // stages: (2+3+5)/(2+3+5+10) = 50
      ("stages", None, None, None, Some(2L), Some(3L), Some(5L), Some(10L)),
      // all-NA levels → den 0 → NULL
      ("classic", None, None, None, None, None, None, None),
      // unknown type → NULL
      ("other", Some(3L), Some(7L), Some(1L), None, None, None, None))
      .toDF("typ", "awake", "asleep", "restless", "light", "deep", "rem", "wake")
    val got = df.select(Scalars.efficiencyPct($"typ", $"awake", $"asleep", $"restless",
      $"light", $"deep", $"rem", $"wake").as("e")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq ==
      Seq(Some(70L), Some(1L), Some(0L), Some(2L), Some(8L), Some(-4L), Some(50L), None, None))
  }

  test("epochIdx floors negative (pre-1970) epochs instead of truncating toward zero") {
    import graft.functions.TimeBuckets
    val got = Seq(
      "1969-12-31 23:59:59", // epoch −1 → day −1 (truncation would say 0)
      "1970-01-01 00:00:00", // epoch 0 → day 0
      "1969-12-30 00:00:01", // epoch −172799 → −1.99…, floor → −2
      "1970-01-02 12:00:00") // epoch 129600 → 1.5, floor → 1
      .toDF("t")
      .select(TimeBuckets.epochIdx($"t", 86400L).as("d"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(-1L, 0L, -2L, 1L))
  }

  test("weekday label + Between8and2 boundaries") {
    val df = Seq("2025-01-06 20:00:00", "2025-01-07 02:00:00", "2025-01-08 02:00:01", "2025-01-09 19:59:59")
      .toDF("tss").withColumn("ts", to_timestamp($"tss"))
    val got = df.select(Scalars.weekdayLabel($"ts").as("d"), Scalars.between8pm2am($"ts").as("b")).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("Monday", "Tuesday", "Wednesday", "Thursday"))
    assert(got.map(_.getBoolean(1)).toSeq == Seq(true, true, false, false))
  }

  test("rangeMean: range strings and single values (weekly-cardio-measures.R:13-22)") {
    val df = Seq("30-34", "42", "0-100").toDF("s")
    val got = df.select(Scalars.rangeMean($"s")).as[Double].collect()
    assert(got.toSeq == Seq(32.0, 42.0, 50.0))
  }
}
