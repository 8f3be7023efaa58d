package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable, deterministic Bloom filter — semi-join reduction as a
  * reusable primitive.
  *
  * The classic 100 TB problem: `big SEMI JOIN small` pays a full shuffle
  * of `big` (sort-merge) or a full broadcast of `small`'s keys. A Bloom
  * filter of the small side's keys is a fixed `m`-bit array that rides
  * into the big side's scan as a narrow filter — no shuffle of `big`, no
  * exact key set in memory, a bounded false-positive rate that a
  * downstream exact join (now over a reduced input) cleans up. Spark's
  * own runtime-filter rewrite does this only inside equi-join planning;
  * this operator makes the primitive explicit so it can guard ANY
  * expensive downstream (window, dedup verify, range join).
  *
  * Determinism contract (what makes it oracle-checkable, unlike Spark's
  * native `BloomFilterAggregate`, whose bit layout is engine-internal):
  * bit positions are `((hash32(key) mod P) · a_i + b_i) mod P mod m` for
  * the same literal universal-hash constants [[PortableHash.minhashAB]]
  * inlines into the minhash family — both engines compute the identical
  * bit array, so even the FALSE POSITIVES match row-for-row.
  *
  * Layout: 32 bits per word, stored in a BIGINT (values stay in
  * [0, 2^32) — no sign-bit hazards in either engine's shift semantics).
  */
object BloomFilter {

  import PortableHash.P

  /** Build the filter: one distinct-position shuffle bounded by m (NOT by
    * key count — map-side combine collapses to at most m/32 words), then
    * a driver collect of the word table (m/32 longs — 16 KB for
    * m = 2^16, the same structurally-small class as an IVF codebook; the
    * same array rides as a plan literal in [[mightContain]], so size m
    * accordingly). The returned array is dense: index w holds the OR of
    * its 32 bits.
    */
  def build(keys: DataFrame, key: Column, mBits: Int, k: Int): Array[Long] = {
    require(mBits > 0 && mBits % 32 == 0, s"mBits must be a positive multiple of 32, got $mBits")
    require(k > 0, s"k must be positive, got $k")
    val ab = PortableHash.minhashAB(k)
    val x = pmod(PortableHash.hash32(key), lit(P))
    val words = keys
      .select(explode(array(ab.map { case (a, b) =>
        pmod(x * a + b, lit(P)) % mBits
      }: _*)).as("__pos"))
      .filter(col("__pos").isNotNull) // null keys contribute no bits
      .select(expr("__pos div 32").as("__w"),
        call_function("shiftleft", lit(1L), expr("CAST(__pos % 32 AS INT)")).as("__bv"))
      .groupBy(col("__w")).agg(expr("bit_or(__bv)").as("__wv"))
      .collect()
    val arr = new Array[Long](mBits / 32)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Membership test as a narrow Column over the big side: k unrolled
    * bit probes into the literal word array (2 KB in the plan), AND-ed.
    * True for every inserted key; false positives at the standard
    * `(1 - e^{-kn/m})^k` rate. Zero shuffle, codegen-friendly.
    */
  def mightContain(words: Seq[Long], key: Column, mBits: Int, k: Int): Column = {
    require(words.length == mBits / 32, s"word table length ${words.length} != $mBits/32")
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.expr.BloomProbe(
        org.apache.spark.sql.GraftSqlBridge.expression(key),
        words, PortableHash.minhashAB(k), mBits))
  }

  /** Pure-built-ins twin of [[mightContain]] — the definition the oracle
    * SQL mirrors; kept as the reference the native kernel is cross-checked
    * against. Pays one md5 per PROBE (Catalyst's predicate pushdown
    * re-inlines any staged hash column into each conjunct), which is why
    * the hot path uses the kernel.
    */
  def mightContainColumnar(words: Seq[Long], key: Column, mBits: Int, k: Int): Column = {
    require(words.length == mBits / 32, s"word table length ${words.length} != $mBits/32")
    val ab = PortableHash.minhashAB(k)
    val arr = typedLit(words)
    val x = pmod(PortableHash.hash32(key), lit(P))
    ab.map { case (a, b) =>
      val pos = pmod(x * a + b, lit(P)) % mBits
      val word = element_at(arr, (pos / 32).cast("int") + 1) // /32 is exact in doubles
      call_function("shiftrightunsigned", word, (pos % 32).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
  }

  /** DuckDB CTEs reproducing [[build]] bit-for-bit: `barr` is a single
    * row whose `arr` column is the dense word list. `keysFromSql` is a
    * FROM-able source for the key set; `keySql` the key string expr.
    */
  def buildSqlCtes(keysFromSql: String, keySql: String, mBits: Int, k: Int): String = {
    val ab = PortableHash.minhashAB(k)
    val ha = PortableHash.bigintListSql(ab.map(_._1))
    val hb = PortableHash.bigintListSql(ab.map(_._2))
    s"""bab AS (SELECT $ha AS ha, $hb AS hb),
       |bpos AS (SELECT DISTINCT
       |           ((${PortableHash.hash32Sql(keySql)} % $P) * ha[CAST(i AS INT)]
       |            + hb[CAST(i AS INT)]) % $P % $mBits AS pos
       |         FROM $keysFromSql, bab, (SELECT unnest(range(1, ${k + 1})) AS i)),
       |bw AS (SELECT pos // 32 AS w,
       |         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS wv
       |       FROM bpos GROUP BY 1),
       |barr AS (SELECT list(COALESCE(bw.wv, 0) ORDER BY r.i) AS arr
       |         FROM (SELECT unnest(range(0, ${mBits / 32})) AS i) r
       |         LEFT JOIN bw ON bw.w = r.i)""".stripMargin
  }

  /** SQL boolean mirroring [[mightContain]] for key expr `keySql`,
    * against `barr.arr` (alias the CTE into scope).
    */
  def mightContainSql(keySql: String, mBits: Int, k: Int): String = {
    val ab = PortableHash.minhashAB(k)
    val probes = ab.map { case (a, b) =>
      val pos = s"(((${PortableHash.hash32Sql(keySql)} % $P) * $a + $b) % $P % $mBits)"
      s"((arr[CAST($pos // 32 + 1 AS INT)] >> CAST($pos % 32 AS INT)) & 1) = 1"
    }
    probes.mkString("(", " AND ", ")")
  }
}
