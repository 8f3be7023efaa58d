package graft

import graft.ext.{EventAnalytics, Graph, MarketBasket}
import org.apache.spark.sql.functions._

/** Hand-checkable cases for the round-6 batch-4 operators: multi-touch
  * attribution, PageRank, market-basket lift.
  */
class GraphBasketSpec extends SparkSpecBase {

  private lazy val s = spark
  import s.implicits._

  // ---------------------------------------------------------- attribution

  test("attribution: first/last touch, strict-before tiebreak, unattributed NULLs") {
    // user 1: click@1, view@2, purchase@3           -> (click, view)
    // user 2: purchase@1 (no touch)                 -> (NULL, NULL)
    // user 3: view@5, purchase@5 with id order v<p  -> same-ts touch COUNTS
    //         (strictly before in (ts, id) order)
    // user 4: purchase@5, view@5 with id order p<v  -> same-ts touch does NOT
    // user 5: click@1, purchase@2, view@3, purchase@4 -> 2 conversions:
    //         (click, click) and (click, view)
    val ev = Seq(
      (1L, 1L, 1L, "click"), (2L, 1L, 2L, "view"), (3L, 1L, 3L, "purchase"),
      (4L, 2L, 1L, "purchase"),
      (5L, 3L, 5L, "view"), (6L, 3L, 5L, "purchase"),
      (7L, 4L, 5L, "purchase"), (8L, 4L, 5L, "view"),
      (9L, 5L, 1L, "click"), (10L, 5L, 2L, "purchase"),
      (11L, 5L, 3L, "view"), (12L, 5L, 4L, "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val got = EventAnalytics.attribution(ev, "user_id", "ts", "event_type",
        "event_id", "purchase", Seq("click", "view"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2)))
      .toSet
    assert(got == Set(
      (Some("click"), Some("view"), 2L), // users 1 and 5(second purchase)
      (Some("click"), Some("click"), 1L), // user 5 first purchase
      (Some("view"), Some("view"), 1L),  // user 3 same-ts touch, id-before
      (None, None, 2L)),                 // user 2 + user 4 (id-after)
      s"got $got")
  }

  // ------------------------------------------------------------- pageRank

  test("pageRank equals a driver-side reference computation") {
    // small weighted digraph with asymmetric weights + a sink-free cycle
    val edges = Seq(
      ("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
      ("c", "a", 1L), ("b", "a", 2L)
    ).toDF("src", "dst", "w")
    val iters = 4
    val d = 0.85
    val got = Graph.pageRank(edges, "src", "dst", "w", iters, d)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    // reference: same recurrence, driver-side
    val es = Seq(("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 2.0),
      ("c", "a", 1.0), ("b", "a", 2.0))
    val outW = es.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val verts = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val n = verts.size
    def rnd(x: Double, p: Int) = BigDecimal(x)
      .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    var r = verts.map(v => v -> rnd(1.0 / n, 12)).toMap
    for (_ <- 1 to iters) {
      r = verts.map { v =>
        val in = es.filter(_._2 == v)
          .map { case (u, _, w) => r(u) * (w / outW(u)) }.sum
        v -> rnd((1 - d) / n + d * in, 12)
      }.toMap
    }
    verts.foreach { v =>
      assert(math.abs(got(v) - r(v)) < 1e-9, s"$v: got ${got(v)} want ${r(v)}")
    }
    // ranks are a probability distribution (no dangling mass here)
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
  }

  test("pageRank: dangling redistribution conserves mass on a sink graph") {
    // b is a sink (no out-edges): a->b, c->b, b-> nothing.
    val edges = Seq(("a", "b", 1L), ("c", "b", 1L)).toDF("src", "dst", "w")
    val iters = 3
    val d = 0.85
    // Flag OFF: sink mass leaks — the distribution sums below 1.
    val off = Graph.pageRank(edges, "src", "dst", "w", iters, d)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(off.values.sum < 1.0 - 1e-3, s"expected leaked mass, got $off")
    // Flag ON: matches a driver-side reference with M/N redistribution
    // and sums to 1 (up to per-iteration 12-dp rounding).
    val got = Graph.pageRank(edges, "src", "dst", "w", iters, d,
        redistributeDangling = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    def rnd(x: Double, p: Int) = BigDecimal(x)
      .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    val verts = Seq("a", "b", "c")
    val n = verts.size
    var r = verts.map(v => v -> rnd(1.0 / n, 12)).toMap
    for (_ <- 1 to iters) {
      val m = rnd(r("b"), 12) // b is the only dangling vertex
      r = verts.map { v =>
        val in = if (v == "b") r("a") + r("c") else 0.0
        v -> rnd((1 - d) / n + d * (in + m / n), 12)
      }.toMap
    }
    verts.foreach { v =>
      assert(math.abs(got(v) - r(v)) < 1e-9, s"$v: got ${got(v)} want ${r(v)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-6, s"mass not conserved: $got")
  }

  // ------------------------------------------------------------- pairLift

  test("pairLift: hand-computed support/confidence/lift; minPairCount prunes") {
    // baskets: 1{A,B} 2{A,B} 3{A,C} 4{B} 5{A,B,C}  (duplicate item rows collapse)
    val items = Seq(
      (1L, "A"), (1L, "B"), (1L, "B"),
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"),
      (4L, "B"),
      (5L, "A"), (5L, "B"), (5L, "C")
    ).toDF("bk", "it")
    val got = MarketBasket.pairLift(items, "bk", "it", minPairCount = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toSet
    // n=5 baskets; A:4 B:4 C:2 | AB:3 AC:2 BC:1(pruned)
    assert(got == Set(
      ("A", "B", 3L, 4L, 4L, 0.75, 5.0 * 3 / 16),
      ("A", "C", 2L, 4L, 2L, 0.5, 5.0 * 2 / 8)),
      s"got $got")
  }

  test("pairLift: mega-basket guard fails fast naming the offender; compliant data unchanged") {
    // basket 9 has 5 distinct items — over a cap of 4; basket 1 is fine.
    val items = (Seq((1L, "A"), (1L, "B")) ++
      (1 to 5).map(i => (9L, s"X$i"))).toDF("bk", "it")
    val e = intercept[IllegalStateException] {
      MarketBasket.pairLift(items, "bk", "it", minPairCount = 1L,
        maxBasketSize = Some(4L))
    }
    assert(e.getMessage.contains("basket=9") && e.getMessage.contains("5 distinct items"),
      e.getMessage)
    // Under the cap, guarded and unguarded results agree exactly.
    val want = MarketBasket.pairLift(items, "bk", "it", minPairCount = 1L)
      .collect().map(_.toSeq).toSet
    val guarded = MarketBasket.pairLift(items, "bk", "it", minPairCount = 1L,
        maxBasketSize = Some(5L))
      .collect().map(_.toSeq).toSet
    assert(guarded == want)
  }

  test("guardFanout (shared): fires for the triangle-edge shape, silent under the cap") {
    // the qPartTriangles edge derivation guards through the same helper:
    // a planted 6-distinct-part order must abort a cap-5 run by name
    val edges = (Seq((1L, 10L), (1L, 11L)) ++
      (1 to 6).map(i => (99L, 100L + i))).toDF("ok", "pk").distinct()
    val e = intercept[IllegalStateException] {
      MarketBasket.guardFanout(edges, "ok", cap = 5L, what = "triangle edges")
    }
    assert(e.getMessage.contains("triangle edges")
      && e.getMessage.contains("basket=99")
      && e.getMessage.contains("6 distinct items"), e.getMessage)
    MarketBasket.guardFanout(edges, "ok", cap = 6L, what = "triangle edges")
  }

  test("guardFanoutInline: raises mid-job on a planted mega-basket; pass-through otherwise") {
    val edges = (Seq((1L, 10L), (1L, 11L)) ++
      (1 to 6).map(i => (99L, 100L + i))).toDF("ok", "pk").distinct()
    // under the cap: rows and values pass through unchanged
    val ok = MarketBasket.guardFanoutInline(edges, "ok", cap = 6L, "inline")
    assert(ok.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    // over the cap: the SAME job raises, naming the basket — no
    // separate guard action to forget
    val bad = MarketBasket.guardFanoutInline(edges, "ok", cap = 5L, "inline")
    val e = intercept[Throwable] { bad.collect() }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("exceeds maxBasketSize=5"), msgs(e).take(500))
  }
}
