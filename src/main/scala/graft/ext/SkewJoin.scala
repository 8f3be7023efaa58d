package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual skew weapon for when AQE's skew-join
  * splitting can't help (e.g. the skew is in a grouping key feeding the
  * join, or the join is followed by a window that re-partitions on the
  * same hot key).
  *
  * A hash shuffle routes every row of a hot key to ONE reducer; at
  * 100 TB a single key holding 1% of the data serializes 1 TB through
  * one task. Salting splits each key into `saltFactor` sub-keys: the
  * big side appends a deterministic salt in [0, saltFactor), the small
  * side replicates each row once per salt value, and the join runs on
  * (key, salt) — the hot key's rows now spread over `saltFactor` tasks,
  * at the cost of small-side replication (size × saltFactor, which is
  * why this is for big⋈small shapes; big⋈big skew wants AQE's split).
  *
  * The salt is derived from `bigSaltSource` (any expression spreading
  * the big side's rows, e.g. a line number) — results are identical to
  * the unsalted join REGARDLESS of the salt values (salt only routes
  * rows), which the spec asserts; a deterministic source just keeps
  * plans/metrics reproducible run-over-run.
  */
object SkewJoin {

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keyCols: Seq[String],
      saltFactor: Int,
      bigSaltSource: Column): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(bigSaltSource), lit(saltFactor.toLong)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    bigS.join(smallS, keyCols :+ "__salt").drop("__salt")
  }
}
