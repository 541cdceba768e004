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
