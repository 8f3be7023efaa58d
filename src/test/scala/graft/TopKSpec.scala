package graft

import graft.ext.{ScoredId, TopKAggregator}
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Pure-Scala properties for the bounded top-k aggregator — the custom
  * merge logic every ANN query rides on. No SparkSession needed, so the
  * search space can be large.
  */
class TopKSpec extends AnyFunSuite {

  private def checkProp(prop: Prop, min: Int = 200): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  private val genItems: Gen[List[ScoredId]] = for {
    n <- Gen.choose(0, 40)
    scores <- Gen.listOfN(n, Gen.chooseNum(-1.0, 1.0))
  } yield scores.zipWithIndex.map { case (s, i) => ScoredId(s, i.toLong) }

  private def expected(items: List[ScoredId], k: Int): List[ScoredId] =
    items.sortBy(x => (-x.score, x.id)).take(k)

  test("reduce-fold in any order equals sorted take(k)") {
    checkProp(Prop.forAll(genItems, Gen.choose(1, 10), Gen.long) { (items, k, seed) =>
      val agg = new TopKAggregator(k)
      val shuffled = new scala.util.Random(seed).shuffle(items)
      val folded = shuffled.foldLeft(agg.zero)(agg.reduce)
      agg.finish(folded) == expected(items, k)
    })
  }

  test("arbitrary partition + merge equals sorted take(k)") {
    checkProp(Prop.forAll(genItems, Gen.choose(1, 10), Gen.choose(1, 8)) { (items, k, parts) =>
      val agg = new TopKAggregator(k)
      val groups = items.grouped(math.max(1, items.size / parts + 1)).toList
      val buffers = groups.map(g => g.foldLeft(agg.zero)(agg.reduce))
      val merged = buffers.foldLeft(agg.zero)(agg.merge)
      agg.finish(merged) == expected(items, k)
    })
  }

  test("merge is commutative on buffers") {
    checkProp(Prop.forAll(genItems, genItems, Gen.choose(1, 6)) { (a, b, k) =>
      val agg = new TopKAggregator(k)
      // distinct id spaces so the tie rule is exercised only via scores
      val bShift = b.map(x => x.copy(id = x.id + 1000))
      val ba = a.foldLeft(agg.zero)(agg.reduce)
      val bb = bShift.foldLeft(agg.zero)(agg.reduce)
      agg.merge(ba, bb) == agg.merge(bb, ba)
    })
  }

  test("ties break on ascending id deterministically") {
    val agg = new TopKAggregator(2)
    val items = List(ScoredId(0.5, 7), ScoredId(0.5, 3), ScoredId(0.5, 9))
    val out = agg.finish(items.foldLeft(agg.zero)(agg.reduce))
    assert(out == List(ScoredId(0.5, 3), ScoredId(0.5, 7)))
  }

  test("k larger than input returns everything, sorted") {
    val agg = new TopKAggregator(100)
    val items = List(ScoredId(0.1, 1), ScoredId(0.9, 2), ScoredId(0.5, 3))
    val out = agg.finish(items.foldLeft(agg.zero)(agg.reduce))
    assert(out == List(ScoredId(0.9, 2), ScoredId(0.5, 3), ScoredId(0.1, 1)))
  }
}
