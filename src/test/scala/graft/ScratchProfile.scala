package graft

// Temporary dev tool (not shipped): phase timings for the minhash pipeline.
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.ext.{Dedup, HashMode}

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Fixtures.documents(spark, sfDir)
    val par = spark.sparkContext.defaultParallelism

    val base = time("shingle+checkpoint") {
      docs.select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("shs"))
        .repartition(par).localCheckpoint(true)
    }
    time("hashed sorted arrays") {
      base.select(col("id"),
        array_sort(array_distinct(transform(col("shs"), s => xxhash64(s)))).as("sh"))
        .write.format("noop").mode("overwrite").save()
    }
    time("portable signature") {
      base.select(col("id"),
        Dedup.minhashSignature(col("shs"), 128, HashMode.Portable).as("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    time("full minhashLshDedup") {
      Dedup.minhashLshDedup(docs, "text", "doc_id",
        n = 3, bands = 16, rowsPerBand = 8, threshold = 0.5,
        mode = HashMode.Portable).count()
    }
    for (fanout <- Seq(16, 8, 4)) {
      time(s"full ngram fanout=$fanout") {
        Dedup.ngramJaccardDedup(docs, "text", "doc_id",
          col("lang"), n = 3, threshold = 0.2, saltFanout = fanout,
          maxBlockRows = Some(100000L)).count()
      }
    }
    time("ngram no-guard fanout=16") {
      Dedup.ngramJaccardDedup(docs, "text", "doc_id",
        col("lang"), n = 3, threshold = 0.2, saltFanout = 16).count()
    }
    time("simhash portable") {
      Dedup.simhashDedup(docs, "text", "doc_id", maxHamming = 3,
        mode = HashMode.Portable).count()
    }
    time("decontaminate n=5") {
      val inEval = graft.ext.PortableHash.hash32(
        concat(lit("evalset"), col("doc_id").cast("string"))) % 1000 < 100
      graft.ext.Corpus.decontaminate(docs.filter(!inEval), docs.filter(inEval),
        "text", "doc_id", n = 5).count()
    }
    val emb = Fixtures.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val cents = graft.ext.Similarity.collectCentroids(
      emb.filter(col("vec_id") % 61 === 0), "vec_id", "embedding")
    time("pq codes + adc topk") {
      val codes = graft.ext.Similarity.pqCodes(emb, "vec_id", "embedding", cents, m = 4)
      graft.ext.Similarity.pqTopK(codes, queries, "vec_id", "codes",
        "vec_id", "embedding", cents, m = 4, k = 10).count()
    }
    time("brute force topk") {
      graft.ext.Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", "vec_id", "embedding", k = 10).count()
    }
    spark.stop()
  }
}

/** Round-5 scaling probe: time the new operators at 1× and 4× corpus
  * (ids offset so the replicas are distinct rows) to corroborate the
  * asymptotic claims in SCALE.md. `sbt "Test/runMain graft.Scale5Profile"`.
  */
object Scale5Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.ext.{BloomFilter, Dedup, Sketches}

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-36s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    def rep(df: org.apache.spark.sql.DataFrame, idCol: String, k: Int) =
      (0 until k).map(i => df.withColumn(idCol, col(idCol) + lit(i * 10000000L)))
        .reduce(_.unionByName(_))

    val docs = Fixtures.documents(spark, sfDir)
    val li = Fixtures.lineitem(spark, sfDir)
    docs.count(); li.count() // warm

    // incremental dedup: FIXED batch probed against a 1x vs 4x corpus
    // index — probe cost should track the batch's bucket spread, not
    // corpus size (modulo bigger probed partitions)
    val batch = docs.filter(col("doc_id") % 29 === 0)
    for (k <- Seq(1, 4)) {
      val corpus = rep(docs, "doc_id", k).filter(col("doc_id") % 29 =!= 0)
      val idx = Fixtures.scratchDir(s"scale5_sigidx_$k", sfDir)
      time(s"index build corpus x$k") {
        Dedup.writeSignatureIndex(corpus, "text", "doc_id", idx)
      }
      time(s"index PROBE (fixed batch) corpus x$k") {
        Dedup.dedupAgainstIndex(batch, "text", "doc_id", idx, threshold = 0.5).count()
      }
    }

    // bloom membership scan: linear in the big side
    val hot = Fixtures.orders(spark, sfDir)
      .filter(col("o_totalprice") > 300000.0).select(col("o_orderkey"))
    val words = BloomFilter.build(hot, col("o_orderkey").cast("string"), 1 << 16, 5)
    for (k <- Seq(1, 4)) {
      val big = rep(li, "l_orderkey", k)
      time(s"bloom filter scan x$k") {
        big.filter(BloomFilter.mightContain(
          words.toSeq, col("l_orderkey").cast("string"), 1 << 16, 5)).count()
      }
    }

    // count-min build: linear, shuffle bounded by the cell table
    for (k <- Seq(1, 4)) {
      val big = rep(li, "l_orderkey", k)
      time(s"count-min table build x$k") {
        Sketches.countMinTable(big, col("l_partkey").cast("string"), 4, 4096)
      }
    }

    // grid quantiles: linear scan, bounded bucket table
    for (k <- Seq(1, 4)) {
      val big = rep(li, "l_orderkey", k)
      time(s"grid quantiles x$k") {
        Sketches.gridQuantiles(big, Seq("l_returnflag"),
          (col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
            .cast("long"), 25600L, Seq(25, 50, 90, 99)).count()
      }
    }
    spark.stop()
  }
}
