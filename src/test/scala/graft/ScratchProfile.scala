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
