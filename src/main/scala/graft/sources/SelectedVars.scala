package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata-table-driven projection — the engine form of the reference's
  * `selected_vars` CSV contract (/root/reference/scripts/etl/fetch-data.R:13-22
  * and daily-measures.R:92-95): a side CSV of (Export, Variable [, bounds])
  * rows decides which columns each dataset read projects to, so analysts
  * change WHAT is read by editing a table, not code.
  *
  * The CSV is driver-side metadata (a handful of rows): collecting it to
  * build the projection list is the correct pattern — the projection then
  * reaches the parquet scan as ordinary column pruning (ReadSchema shows
  * only the selected columns; asserted in PlanSpec). */
object SelectedVars {

  /** Read a selected-vars CSV (header: Export,Variable[,Lower_Bound,Upper_Bound]). */
  def read(spark: SparkSession, csvPath: String): DataFrame =
    spark.read.option("header", "true").csv(csvPath)

  /** Variables registered for one export/dataset name. */
  def variablesFor(selected: DataFrame, export: String): Seq[String] =
    selected.where(col("Export") === export)
      .select(col("Variable"))
      .collect()
      .map(_.getString(0))
      .toSeq

  /** Project `df` to the columns the metadata table registers for `export`
    * (fetch-data.R's `select(all_of(vars))`). Fails like the reference if a
    * registered column is missing from the data. */
  def projectTo(df: DataFrame, selected: DataFrame, export: String): DataFrame = {
    val vars = variablesFor(selected, export)
    require(vars.nonEmpty, s"no variables registered for export '$export'")
    df.select(vars.map(col): _*)
  }
}
