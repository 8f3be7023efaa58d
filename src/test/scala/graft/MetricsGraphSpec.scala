package graft

import graft.ext.{Graph, Metrics}
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the classifier-evaluation metrics
  * ([[graft.ext.Metrics]]) and the triangle census
  * ([[graft.ext.Graph.triangleStats]]) — the cases the sf-level oracle
  * can't isolate: tie handling in AUC, degenerate single-class /
  * constant-score inputs, duplicate+reversed edges, and triangle-free
  * graphs.
  */
class MetricsGraphSpec extends SparkSpecBase {

  // ---- binaryAuc ----

  test("binaryAuc: tie-aware rank-sum on a hand-computed mix") {
    val s = spark
    import s.implicits._
    // pos scores {0.9, 0.7, 0.5}, neg {0.7, 0.3}: pairs won =
    // 2 (0.9) + 1.5 (0.7: tie with neg 0.7 counts half) + 1 (0.5)
    // = 4.5 of 6 → 0.75
    val df = Seq(
      (true, 0.9), (true, 0.7), (true, 0.5),
      (false, 0.7), (false, 0.3)).toDF("is_pos", "score")
    val r = Metrics.binaryAuc(df, "is_pos", "score").collect()(0)
    assert(r.getAs[Long]("n_pos") == 3L && r.getAs[Long]("n_neg") == 2L)
    assert(r.getAs[Long]("n_scores") == 4L)
    assert(r.getAs[Double]("auc") == 0.75)
  }

  test("binaryAuc: perfect separation is 1, inverted is 0, one class is NULL") {
    val s = spark
    import s.implicits._
    val perfect = Seq((true, 0.9), (true, 0.8), (false, 0.2)).toDF("p", "sc")
    assert(Metrics.binaryAuc(perfect, "p", "sc").collect()(0).getAs[Double]("auc") == 1.0)
    val inverted = Seq((true, 0.1), (false, 0.8), (false, 0.9)).toDF("p", "sc")
    assert(Metrics.binaryAuc(inverted, "p", "sc").collect()(0).getAs[Double]("auc") == 0.0)
    val oneClass = Seq((true, 0.1), (true, 0.8)).toDF("p", "sc")
    assert(Metrics.binaryAuc(oneClass, "p", "sc").collect()(0).isNullAt(3))
  }

  // ---- calibration ----

  test("calibration: fixed-width buckets over the observed range; max lands in top bucket") {
    val s = spark
    import s.implicits._
    // range [0, 1], 4 buckets: 0.0→b0, 0.3→b1, 0.6→b2, 1.0→b3 (max
    // clamped by least(), not dropped by a half-open edge)
    val df = Seq((false, 0.0), (true, 0.3), (false, 0.6), (true, 1.0))
      .toDF("p", "sc")
    val rows = Metrics.calibration(df, "p", "sc", nBuckets = 4)
      .orderBy("bucket").collect()
    assert(rows.map(_.getAs[Int]("bucket")).sameElements(Array(0, 1, 2, 3)))
    assert(rows.forall(_.getAs[Long]("n") == 1L))
    assert(rows(1).getAs[Double]("frac_pos") == 1.0)
    assert(rows(2).getAs[Double]("frac_pos") == 0.0)
    assert(rows(3).getAs[Double]("mean_score") == 1.0)
  }

  test("calibration: constant score degenerates to one bucket-0 row") {
    val s = spark
    import s.implicits._
    val df = Seq((true, 0.5), (false, 0.5), (true, 0.5)).toDF("p", "sc")
    val rows = Metrics.calibration(df, "p", "sc", nBuckets = 10).collect()
    assert(rows.length == 1 && rows(0).getAs[Int]("bucket") == 0)
    assert(rows(0).getAs[Long]("n") == 3L)
    assert(rows(0).getAs[Double]("frac_pos") == 0.666667)
  }

  // ---- prAtThresholds ----

  test("prAtThresholds: tp/fp/precision/recall/f1 at each operating point") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (true, 0.9), (true, 0.6), (true, 0.2),
      (false, 0.7), (false, 0.1)).toDF("p", "sc")
    val rows = Metrics.prAtThresholds(df, "p", "sc", Seq(0.0, 0.65, 0.95))
      .orderBy("threshold").collect()
    // t=0.0: everything predicted → tp=3 fp=2, recall 1
    assert(rows(0).getAs[Long]("tp") == 3L && rows(0).getAs[Long]("fp") == 2L)
    assert(rows(0).getAs[Double]("precision") == 0.6)
    assert(rows(0).getAs[Double]("recall") == 1.0)
    // t=0.65: {0.9 pos, 0.7 neg} → tp=1 fp=1; recall 1/3;
    // f1 = 2·1/(1+1+3) = 0.4
    assert(rows(1).getAs[Long]("tp") == 1L && rows(1).getAs[Long]("fp") == 1L)
    assert(rows(1).getAs[Double]("precision") == 0.5)
    assert(rows(1).getAs[Double]("recall") == 0.333333)
    assert(rows(1).getAs[Double]("f1") == 0.4)
    // t=0.95: nothing predicted → precision/f1 NULL, recall 0
    assert(rows(2).getAs[Long]("tp") == 0L && rows(2).isNullAt(3))
    assert(rows(2).getAs[Double]("recall") == 0.0)
    assert(rows(2).isNullAt(5))
  }

  // ---- ksTest ----

  test("ksTest: hand-computed max CDF gap with ties; identical samples give 0") {
    val s = spark
    import s.implicits._
    // A = {1, 2, 2}, B = {2, 3}: CDFs at 1 → 1/3 vs 0 (gap .333…),
    // at 2 → 1 vs 1/2 (gap .5), at 3 → 1 vs 1 (0) → KS = 0.5 at 2
    val df = Seq((true, 1.0), (true, 2.0), (true, 2.0),
      (false, 2.0), (false, 3.0)).toDF("a", "sc")
    val r = Metrics.ksTest(df, "a", "sc").collect()(0)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("ks_stat") == 0.5)
    assert(r.getAs[Double]("at_score") == 2.0)
    val same = Seq((true, 1.0), (false, 1.0), (true, 7.0), (false, 7.0))
      .toDF("a", "sc")
    assert(Metrics.ksTest(same, "a", "sc").collect()(0).getAs[Double]("ks_stat") == 0.0)
  }

  test("ksTest: one empty side yields NULL statistic") {
    val s = spark
    import s.implicits._
    val df = Seq((true, 1.0), (true, 2.0)).toDF("a", "sc")
    val r = Metrics.ksTest(df, "a", "sc").collect()(0)
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  // ---- chiSquare ----

  test("chiSquare: independent 2x2 grid gives 0; hand-computed dependence") {
    val s = spark
    import s.implicits._
    // perfectly proportional counts → E = O everywhere → chi2 = 0
    val indep = Seq.fill(10)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(30)(("y", "u")) ++ Seq.fill(60)(("y", "v"))
    val r0 = Metrics.chiSquare(indep.toDF("a", "b"), "a", "b").collect()(0)
    assert(r0.getAs[Long]("dof") == 1L)
    assert(r0.getAs[Double]("chi2") == 0.0)
    // 2x2 with O = [[10, 0], [0, 10]]: E = 5 everywhere → chi2 = 20
    val dep = Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("y", "v"))
    val r1 = Metrics.chiSquare(dep.toDF("a", "b"), "a", "b").collect()(0)
    assert(r1.getAs[Long]("n") == 20L)
    assert(r1.getAs[Double]("chi2") == 20.0)
  }

  // ---- triangleStats ----

  test("triangleStats: K4 counts 4 triangles with clustering 1") {
    val s = spark
    import s.implicits._
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a, b))
      .toDF("a", "b")
    val r = Graph.triangleStats(k4, "a", "b").collect()(0)
    assert(r.getAs[Long]("n_vertices") == 4L)
    assert(r.getAs[Long]("n_edges") == 6L)
    assert(r.getAs[Long]("n_wedges") == 12L)
    assert(r.getAs[Long]("n_triangles") == 4L)
    assert(r.getAs[Double]("clustering_coeff") == 1.0)
  }

  test("triangleStats: duplicate, reversed, and self-loop edges collapse; star has no triangles") {
    val s = spark
    import s.implicits._
    // star 0-{1,2,3} with noise: dup (0,1), reversed (1,0), loop (2,2)
    val star = Seq((0, 1), (0, 1), (1, 0), (0, 2), (0, 3), (2, 2))
      .toDF("a", "b")
    val r = Graph.triangleStats(star, "a", "b").collect()(0)
    assert(r.getAs[Long]("n_vertices") == 4L)
    assert(r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Long]("n_wedges") == 3L)
    assert(r.getAs[Long]("n_triangles") == 0L)
    assert(r.getAs[Double]("clustering_coeff") == 0.0)
  }

  test("triangleStats: skewed wheel — hub plus rim closes exactly the rim-adjacent triangles") {
    val s = spark
    import s.implicits._
    // wheel: hub 0 to every rim vertex 1..6, rim cycle 1-2-…-6-1 →
    // 6 triangles (hub, i, i+1); degree orientation points rim→hub
    val rim = (1 to 6).map(i => (i, i % 6 + 1))
    val spokes = (1 to 6).map(i => (0, i))
    val wheel = (rim ++ spokes).toDF("a", "b")
    val r = Graph.triangleStats(wheel, "a", "b").collect()(0)
    assert(r.getAs[Long]("n_vertices") == 7L)
    assert(r.getAs[Long]("n_edges") == 12L)
    assert(r.getAs[Long]("n_triangles") == 6L)
  }
}
