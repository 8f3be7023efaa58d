package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rule-driven data-quality expectations — the contract check a pipeline
  * runs on every new drop of data before letting it downstream (the
  * dbt-test / Great-Expectations surface re-expressed as one declarative
  * report). Three rule families, each with the cheapest plan that can
  * evaluate it:
  *
  *   - '''row rules''' (not-null, accepted-values, range — any Boolean
  *     predicate over one row): ALL of them fold into ONE wide aggregate
  *     over a single scan of the table. Per rule the aggregate carries a
  *     violation count and the minimum violating key — two map-side
  *     combinable scalars; shuffle volume is O(rules), independent of
  *     table size.
  *   - '''uniqueness''' (a key must not repeat): one hash aggregate on
  *     the key; rows participating in a duplicated key count as
  *     violations. Shuffle is O(distinct keys) with map-side combine.
  *   - '''referential''' (a foreign key must exist in a dimension): a
  *     broadcast LEFT join against the dimension's key column — the fact
  *     table never shuffles. NULL foreign keys are not referential
  *     violations (they are the not-null rule's job), matching SQL
  *     `IN`/FK semantics.
  *
  * The report has one row per rule — `rule_name, n_checked,
  * n_violations, pass_rate, first_bad_key` — including rules with zero
  * violations, so a consumer can assert on the full rule inventory, not
  * just the failures it happened to see.
  */
object Expectations {

  /** A row-level rule: `violation` true ⇒ the row fails `name`. */
  final case class RowRule(name: String, violation: Column)

  /** A referential rule: `fkCol` of the checked table must appear in
    * `dim`'s `dimKeyCol` (NULLs pass — see class doc).
    */
  final case class RefRule(name: String, fkCol: String, dim: DataFrame, dimKeyCol: String)

  /** Evaluate `rowRules` + optional uniqueness on `uniqueKey` + `refRules`
    * over `df`; `keyCol` identifies rows in the report's `first_bad_key`.
    */
  def check(
      df: DataFrame,
      keyCol: String,
      rowRules: Seq[RowRule],
      uniqueKey: Option[String] = None,
      refRules: Seq[RefRule] = Nil): DataFrame = {
    require(rowRules.nonEmpty || uniqueKey.nonEmpty || refRules.nonEmpty,
      "expectations with zero rules")
    val key = col(keyCol).cast("long")

    // every row rule in ONE aggregate pass: (count, min-violating-key) each
    val rowAgg = df.agg(
      count(lit(1)).as("n_checked"),
      rowRules.flatMap { r =>
        Seq(
          sum(when(r.violation, 1L).otherwise(0L)).as(s"nv_${r.name}"),
          min(when(r.violation, key)).as(s"fb_${r.name}"))
      }: _*)
    val nChecked = rowAgg.select(col("n_checked"))
    val rowReport = rowAgg.select(explode(array(rowRules.map { r =>
      struct(
        lit(r.name).as("rule_name"),
        coalesce(col(s"nv_${r.name}"), lit(0L)).as("n_violations"),
        col(s"fb_${r.name}").as("first_bad_key"))
    }: _*)).as("r")).select(col("r.*"))

    // uniqueness: rows whose key occurs more than once all count
    val uniqReport = uniqueKey.toSeq.map { k =>
      df.groupBy(col(k)).agg(count(lit(1)).as("__cnt"))
        .filter(col("__cnt") > 1)
        .agg(
          coalesce(sum(col("__cnt")), lit(0L)).as("n_violations"),
          min(col(k).cast("long")).as("first_bad_key"))
        .select(lit(s"unique:$k").as("rule_name"),
          col("n_violations"), col("first_bad_key"))
    }

    // referential: broadcast the dimension keys; fact side never shuffles
    val refReports = refRules.map { r =>
      df.join(
          broadcast(r.dim.select(col(r.dimKeyCol).as("__dim_key")).distinct()),
          col(r.fkCol) === col("__dim_key"), "left")
        .filter(col(r.fkCol).isNotNull && col("__dim_key").isNull)
        .agg(
          count(lit(1)).as("n_violations"),
          min(key).as("first_bad_key"))
        .select(lit(r.name).as("rule_name"), col("n_violations"),
          col("first_bad_key"))
    }

    val all = (rowReport +: (uniqReport ++ refReports)).reduce(_ unionByName _)
    all
      .crossJoin(nChecked)
      .select(
        col("rule_name"),
        col("n_checked"),
        col("n_violations"),
        round(lit(1.0) - col("n_violations").cast("double") / col("n_checked"), 6)
          .as("pass_rate"),
        col("first_bad_key"))
  }
}
