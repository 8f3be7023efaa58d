package graft.log

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten propagation — given a set of record keys tied to
  * erasure subjects, remove (and account for) every row carrying those
  * keys across ALL surfaces a CDC deployment accumulates: the replica
  * target, every change-log batch, and the SCD2 history. A compliance
  * deletion that misses the log or the history tier has not deleted
  * anything.
  *
  * Scale shape: the key set is per-subject (thousands of rows against a
  * 100 TB estate), so every probe is a BROADCAST semi/anti join — no
  * surface ever shuffles. The audit report is one map-side-combined
  * aggregate per surface over the same broadcast flag, so erase + report
  * together read each surface once.
  */
object Erasure {

  /** Rows of `df` that survive erasure of `keys` (broadcast anti join). */
  def eraseKeys(df: DataFrame, keys: DataFrame, keyCol: String): DataFrame =
    df.join(broadcast(keys.select(col(keyCol)).distinct()), Seq(keyCol), "left_anti")

  /** Per-surface audit of what an erasure of `keys` removes: one row per
    * surface with rows before/erased/after and distinct keys touched.
    * `keys` must expose `keyCol`; each surface must expose `keyCol` too.
    */
  def eraseReport(
      surfaces: Seq[(String, DataFrame)],
      keys: DataFrame,
      keyCol: String): DataFrame = {
    require(surfaces.nonEmpty, "erasure over zero surfaces")
    val keySet = broadcast(
      keys.select(col(keyCol).as("__erase_key")).distinct())
    surfaces.map { case (name, df) =>
      df.join(keySet, col(keyCol) === col("__erase_key"), "left")
        .agg(
          count(lit(1)).as("rows_before"),
          sum(when(col("__erase_key").isNotNull, 1L).otherwise(0L)).as("rows_erased"),
          sum(when(col("__erase_key").isNull, 1L).otherwise(0L)).as("rows_after"),
          count_distinct(when(col("__erase_key").isNotNull, col(keyCol))).as("keys_touched"))
        .select(lit(name).as("surface"), col("rows_before"), col("rows_erased"),
          col("rows_after"), col("keys_touched"))
    }.reduce(_ unionByName _)
  }
}
