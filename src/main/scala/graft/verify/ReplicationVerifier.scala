package graft.verify

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Replication verification.
  *
  * The reference verifies by count equality only
  * (reference: example_usage.py:94-111). We keep that as the cheap check
  * and upgrade to full-row multiset equivalence via `exceptAll` both ways
  * (SURVEY §2.7) — at scale this is two sort-merge joins over bucketed
  * tables, still far cheaper than it sounds because both sides prune to
  * shared partitions.
  */
object ReplicationVerifier {

  /** Count-parity check (J3 in SURVEY §2.3). */
  def countsMatch(source: DataFrame, target: DataFrame): Boolean =
    source.count() == target.count()

  /** Rows present in `source` but not `target` (multiset difference). */
  def missingInTarget(source: DataFrame, target: DataFrame): DataFrame =
    source.exceptAll(target.select(source.columns.map(col): _*))

  /** Rows present in `target` but not `source`. */
  def extraInTarget(source: DataFrame, target: DataFrame): DataFrame =
    target.select(source.columns.map(col): _*).exceptAll(source)

  /** Full-fidelity equivalence: true iff both difference directions are
    * empty. Short-circuits on the cheap count check first.
    */
  def fullyReplicated(source: DataFrame, target: DataFrame): Boolean =
    countsMatch(source, target) && missingInTarget(source, target).isEmpty

  /** One DataFrame of all mismatched rows tagged by direction — useful as
    * a quarantine/diagnostic view.
    */
  def diff(source: DataFrame, target: DataFrame): DataFrame =
    missingInTarget(source, target).withColumn("__side", lit("source_only"))
      .unionByName(extraInTarget(source, target).withColumn("__side", lit("target_only")))
}
