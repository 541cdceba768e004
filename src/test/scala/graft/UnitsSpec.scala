package graft

import org.apache.spark.sql.functions._
import graft.functions.Units
import graft.sources.SelectedVars

/** Unit-standardization registry (standardize_units.R parity) and
  * selected_vars metadata projection (fetch-data.R parity). */
class UnitsSpec extends SparkSpec {
  import spark.implicits._

  test("convert rescales through the time ladder; unknown units rejected") {
    val df = Seq((120.0, 2.0, 1.5)).toDF("secs", "hrs", "ms")
    val r = df.select(
      Units.convert($"secs", "s", "min").as("m1"),
      Units.convert($"hrs", "h", "min").as("m2"),
      Units.convert($"ms", "ms", "us").as("m3")).head()
    // factor ratios are IEEE quotients (e.g. 1e-3/1e-6 is not exactly 1000),
    // deterministic across engines but not decimal-exact — compare with tolerance
    assert(math.abs(r.getDouble(0) - 2.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 120.0) < 1e-9)
    assert(math.abs(r.getDouble(2) - 1500.0) < 1e-9)
    intercept[IllegalArgumentException](Units.convert($"secs", "fortnight", "min"))
  }

  test("standardize applies rules ONLY to present columns (reference %in% colnames)") {
    // the reference ruleset on a frame with a subset of its columns
    val df = Seq((7.5, 90.0)).toDF("MidSleep", "remOnsetLatency")
    val out = Units.standardizeByUnits(df, Units.sleepRules).head()
    assert(out.getDouble(0) == 450.0, "MidSleep hrs -> min (x60)")
    assert(out.getDouble(1) == 1.5, "remOnsetLatency sec -> min (/60)")
    // absent SleepStartTime/duration_sd rules are skipped, schema unchanged
    assert(Units.standardizeByUnits(df, Units.sleepRules).columns.toSeq ==
      Seq("MidSleep", "remOnsetLatency"))
  }

  test("selected_vars CSV drives the projection; unknown export rejected") {
    val dir = java.nio.file.Files.createTempDirectory("sv")
    val csv = dir.resolve("selected_vars.csv")
    java.nio.file.Files.write(csv,
      "Export,Variable\nevents,user_id\nevents,value\ndocuments,doc_id\n".getBytes)
    val selected = SelectedVars.read(spark, csv.toString)
    assert(SelectedVars.variablesFor(selected, "events") == Seq("user_id", "value"))
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val projected = SelectedVars.projectTo(ev, selected, "events")
    assert(projected.columns.toSeq == Seq("user_id", "value"))
    intercept[IllegalArgumentException](SelectedVars.projectTo(ev, selected, "nope"))
  }
}
