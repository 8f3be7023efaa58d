package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over embedding columns (`array<float>`) —
  * north-star surface for the `embeddings` table.
  *
  * All math is `zip_with`/`aggregate` higher-order functions in double
  * precision: codegen-friendly, no UDF, no driver-side loops. Three tiers:
  *
  *  - [[bruteForceTopK]] — exact baseline: broadcast the (small) query set
  *    against the corpus; the corpus is scanned ONCE regardless of query
  *    count. At 100 TB this is the correct exact plan: the cross product
  *    is queries × corpus but only top-k per query survives the
  *    partial-aggregation, so nothing quadratic is shuffled.
  *  - [[lshTopK]] — approximate: random-hyperplane sign buckets prune the
  *    corpus to same-bucket candidates (recall tunable via planes/probes).
  *  - [[ivfTopK]] — approximate: IVF coarse quantization; corpus vectors
  *    are assigned to their nearest centroid once (materializable), and a
  *    query searches only its `nprobe` nearest inverted lists.
  */
object Similarity {

  /** Dot product of two numeric arrays in double precision. Sequential
    * left-fold, so the summation order is deterministic (stable hashes
    * across runs and vs the DuckDB oracle).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** L2-normalize a vector (pass-through for all-zero vectors). */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0, a.cast("array<double>"))
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  /** Exact top-k cosine neighbors for each query vector.
    *
    * `queries` must be small (it is broadcast); `corpus` is arbitrary
    * size. Plan: one corpus scan → broadcast-nested-loop against queries →
    * per-query top-k via window. Scores are rounded to 6 dp BEFORE ranking
    * so rank boundaries are stable under floating-point noise; ties break
    * on the neighbor id.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String,
      k: Int): DataFrame = {
    val scored = corpus
      .select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"))
      .crossJoin(broadcast(queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", round(cosine(col("__cv"), col("__qv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rnk"))
  }

  /** Deterministic random hyperplanes: `planes` × `dim` doubles in
    * [-0.5, 0.5) from a fixed-seed generator. Stable across cluster sizes.
    */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rng.nextDouble() - 0.5))
  }

  /** Sign-pattern LSH bucket id for a vector: bit i = sign of the dot
    * product with hyperplane i, folded into one long.
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedLit(p)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Approximate top-k: compare only vectors sharing the query's LSH
    * bucket. With `planes` = 12–16 the corpus is cut by ~2^planes while
    * keeping high-cosine pairs (their sign patterns agree w.h.p.).
    * Same output shape as [[bruteForceTopK]]; recall < 1 by construction.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String,
      k: Int,
      planes: Int = 12,
      dim: Int = 64): DataFrame = {
    val hp = hyperplanes(planes, dim)
    val c = corpus.select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"),
      lshBucket(col(corpusVec), hp).as("__bkt"))
    val q = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"),
      lshBucket(col(queryVec), hp).as("__bkt"))
    val scored = c.join(broadcast(q), Seq("__bkt"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", round(cosine(col("__cv"), col("__qv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rnk"))
  }

  /** Assign every corpus vector to its nearest centroid (IVF list).
    * `centroids` must be small (broadcast). Output adds `centroid_id`.
    * At scale this assignment is computed once and persisted partitioned
    * by `centroid_id`, making [[ivfTopK]]'s probe a partition-pruned scan.
    */
  def ivfAssign(
      corpus: DataFrame,
      centroids: DataFrame,
      corpusId: String,
      corpusVec: String,
      centroidId: String,
      centroidVec: String): DataFrame = {
    val scored = corpus.crossJoin(broadcast(
        centroids.select(col(centroidId).as("centroid_id"), col(centroidVec).as("__ctv"))))
      .withColumn("__cdist", round(cosine(col(corpusVec), col("__ctv")), 6))
    val w = Window.partitionBy(col(corpusId))
      .orderBy(col("__cdist").desc, col("centroid_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__ctv", "__cdist")
  }

  /** IVF approximate top-k: search only the `nprobe` inverted lists whose
    * centroids are nearest to the query. `assigned` is [[ivfAssign]]
    * output (corpus + centroid_id).
    */
  def ivfTopK(
      assigned: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      centroidId: String,
      centroidVec: String,
      queryId: String,
      queryVec: String,
      k: Int,
      nprobe: Int = 4): DataFrame = {
    // nprobe nearest centroids per query — both sides tiny, driver-free.
    val qc = queries.select(col(queryId).as("query_id"), col(queryVec).as("__qv"))
      .crossJoin(broadcast(centroids.select(col(centroidId).as("centroid_id"), col(centroidVec).as("__ctv"))))
      .withColumn("__cdist", round(cosine(col("__qv"), col("__ctv")), 6))
    val wq = Window.partitionBy("query_id").orderBy(col("__cdist").desc, col("centroid_id").asc)
    val probes = qc.withColumn("__rn", row_number().over(wq))
      .filter(col("__rn") <= nprobe)
      .select(col("query_id"), col("__qv"), col("centroid_id"))

    val scored = assigned
      .select(col(corpusId).as("neighbor_id"), col(corpusVec).as("__cv"), col("centroid_id"))
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", round(cosine(col("__cv"), col("__qv")), 6))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rnk"))
  }

  /** Embedding near-duplicate pairs: cosine >= `threshold`, LSH-blocked
    * so only same-bucket pairs are compared (the scale path for
    * "embedding-cosine near-dup" dedup).
    */
  def embeddingNearDup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      planes: Int = 8,
      dim: Int = 64): DataFrame = {
    val hp = hyperplanes(planes, dim)
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), hp).as("bkt"))
    val a = base.select(col("id").as("id_a"), col("v").as("v_a"), col("bkt"))
    val b = base.select(col("id").as("id_b"), col("v").as("v_b"), col("bkt"))
    a.join(b, Seq("bkt"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", round(cosine(col("v_a"), col("v_b")), 6))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
      .distinct()
  }
}
