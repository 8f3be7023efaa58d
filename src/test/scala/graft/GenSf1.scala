package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (not shipped): materialize an sf1-equivalent testdata
  * directory — the driver's sf0.1 tables replicated `Reps`× to real
  * parquet under /tmp/graft_sf1 — so the heavy queries can be probed at
  * 10× scale through the UNCHANGED bench harness (`SPARK_GRAFT_SF_DIR=
  * /tmp/graft_sf1 SPARK_GRAFT_ONLY=… runMain graft.Bench`), with honest
  * disk scans rather than in-memory unions.
  *
  * Replication rules:
  *  - keyed tables get per-replica id offsets (+i·10M), preserving the
  *    intra-replica FK structure (orders↔customer key spaces shift
  *    together; lineitem follows orders);
  *  - `documents.text` is token-suffixed per replica (replica 0 keeps
  *    the original), so shingle/gram universes are DISJOINT across
  *    replicas: duplicate density stays that of the source corpus
  *    instead of every doc gaining Reps−1 exact copies — exact-copy
  *    replication would change the dedup problem itself, not its size
  *    (same rationale as the round-5 containment replicas, SCALE.md);
  *  - `embeddings` replicate with id offsets only (vector values repeat;
  *    the probed ANN paths don't block on text identity);
  *  - `events` replicates with per-replica user/event id offsets: 10×
  *    users, per-user timeline depth preserved; `ts` passes through in
  *    whatever physical encoding the source uses (INT64 ns or µs NTZ —
  *    `Fixtures.events` branches on the loaded dtype for both);
  *  - small dimensions (part/supplier/nation/region) stay 1× — facts
  *    outgrow dims in any real warehouse.
  */
object GenSf1 {
  private val Off = 10000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    // optional 3rd arg: replication factor (10 = sf1-equivalent, the
    // default; 100 = the sf10 probe tier). Key offsets stay i·10M —
    // max source key ≈ 6e5, so even 100 replicas stay disjoint.
    val Reps = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rep(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until Reps).map(i => shift(df, i)).reduce(_.unionByName(_))

    def write(df: DataFrame, name: String): Unit = {
      df.repartition(32).write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[gensf1] wrote $name")
    }

    val orders = spark.read.parquet(s"$src/orders.parquet")
    write(rep(orders) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * Off))
        .withColumn("o_custkey", col("o_custkey") + lit(i * Off))
    }, "orders")

    val customer = spark.read.parquet(s"$src/customer.parquet")
    write(rep(customer) { (d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * Off))
    }, "customer")

    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    write(rep(lineitem) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * Off))
    }, "lineitem")

    val documents = spark.read.parquet(s"$src/documents.parquet")
    write(rep(documents) { (d, i) =>
      val shifted = d.withColumn("doc_id", col("doc_id") + lit(i * Off))
      if (i == 0) shifted
      else shifted.withColumn("text",
        regexp_replace(col("text"), "(\\S+)", "$1" + i.toString))
    }, "documents")

    val embeddings = spark.read.parquet(s"$src/embeddings.parquet")
    write(rep(embeddings) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * Off))
    }, "embeddings")

    // events: ids and users offset per replica so timelines stay
    // disjoint and per-user depth is preserved while user count scales
    // 10×. `ts` is untouched and round-trips in the source encoding:
    // nanosAsLong makes legacy TIMESTAMP(NANOS) data readable as
    // ns-longs and is a no-op for the current µs-NTZ testdata —
    // Fixtures.events branches on the loaded dtype either way. (Earlier
    // sf1 rounds byte-copied events UN-replicated, so events-query "sf1"
    // numbers measured unchanged input — corrected in SCALE.md.)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$src/events.parquet")
    write(rep(events) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * Off))
        .withColumn("user_id", col("user_id") + lit(i * Off))
    }, "events")

    // small dimensions (part/supplier/nation/region) copy UN-replicated
    // — dims grow far slower than facts, so 10× facts against the same
    // dim is the honest scale-up (and lineitem's l_partkey still joins)
    def byteCopy(name: String): Unit = {
      val from = java.nio.file.Paths.get(s"$src/$name.parquet")
      val to = java.nio.file.Paths.get(s"$dst/$name.parquet")
      val walk = java.nio.file.Files.walk(from)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.foreach { p =>
          val rel = to.resolve(from.relativize(p).toString)
          if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(rel)
          else {
            java.nio.file.Files.createDirectories(rel.getParent)
            java.nio.file.Files.copy(p, rel,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
        }
      } finally walk.close()
      println(s"[gensf1] copied $name")
    }
    Seq("part", "supplier", "nation", "region").foreach(byteCopy)
    spark.stop()
  }
}
