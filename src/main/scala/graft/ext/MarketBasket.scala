package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence analysis — pairwise association rules
  * (support / confidence / lift) over (basket, item) facts: "orders that
  * contain brand A also contain brand B". The recommender-adjacent
  * aggregate every retail warehouse derives from its order lines.
  */
object MarketBasket {

  /** Pairwise lift over `(basketCol, itemCol)` rows.
    *
    * Output per unordered item pair (emitted once, `item_a < item_b`):
    * `n_ab` (baskets containing both), `n_a`/`n_b` (baskets containing
    * each), `confidence` = n_ab/n_a (P(b|a)), `lift` =
    * N·n_ab/(n_a·n_b); pairs below `minPairCount` baskets are pruned.
    *
    * Scale shape: input collapses to DISTINCT (basket, item) first —
    * one shuffle on the pair, map-side combined. Pair generation is the
    * basket self-join (co-partitioned on the basket key — one shuffle
    * both sides, fanout bounded by basket size², never corpus²), then a
    * map-side-combined pair count bounded by |items|². Per-item counts
    * and the one-row basket total ride in as broadcasts. All counts are
    * exact integers; `lift`/`confidence` are single divisions of exact
    * doubles, rounded to 6 dp — bit-identical across engines.
    *
    * At 100 TB the only watch item is a mega-basket (size² fanout):
    * `maxBasketSize` guards it — when set, baskets whose DISTINCT item
    * count exceeds the cap fail the job fast with the offenders named
    * (same pattern as [[Dedup]]'s hot-block guard: silently letting one
    * hot basket go quadratic is the scale failure mode, and a 10⁶-item
    * basket is a data-quality bug, not a workload). `None` (default)
    * keeps the plan byte-identical to the unguarded shape — zero extra
    * aggregates. Item-alphabet skew is absorbed by the partial
    * aggregates either way.
    */
  def pairLift(
      items: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long,
      maxBasketSize: Option[Long] = None): DataFrame = {
    // the distinct frame feeds four consumers; its shuffle is one
    // subplan, deduped by ReusedExchange — an eager localCheckpoint
    // measured slower at sf0.1 (blocking materialization, no saved work),
    // and a collect_set + array-pair-explode rewrite (one basket shuffle)
    // measured 10.0 s vs this plan's 8.1 s at sf1: the nested
    // transform/slice pair lambda runs interpreted per basket row
    val d0 = items.select(col(basketCol).as("__bk"), col(itemCol).as("__it"))
      .distinct()
    // With the guard on, d gains a fifth consumer (the guard count);
    // materialize once so the distinct shuffle isn't re-run per consumer
    // (ReusedExchange dedups within ONE action, not across the guard's
    // separate collect()). Round 14 A/B, kept ROUND-ROBIN: partitioning
    // the checkpoint by the basket key shared one exchange across
    // distinct/guard/self-join and won ~35% at sf0.1, but measured 4.5x
    // WORSE at the sf10 tier (23.7 -> 106.8 s) — the pair self-join then
    // inherits the checkpoint's partition count, sized by the SMALL
    // pre-join bytes, and the quadratic post-join fanout runs
    // under-parallelized. Letting the join re-exchange keeps AQE free to
    // size the explosive stage (OPTIMIZATION_r14.md).
    val d =
      if (maxBasketSize.isDefined)
        d0.repartition(items.sparkSession.sparkContext.defaultParallelism)
          .localCheckpoint(true)
      else d0
    maxBasketSize.foreach(cap => guardFanout(d, "__bk", cap, "pairLift"))
    val totals = d.agg(countDistinct(col("__bk")).as("__n"))
    val itemCounts = d.groupBy(col("__it")).agg(count(lit(1)).as("__ni"))

    val a = d.select(col("__bk"), col("__it").as("item_a"))
    val b = d.select(col("__bk").as("__bk2"), col("__it").as("item_b"))
    val pairs = a.join(b, col("__bk") === col("__bk2") && col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)

    pairs
      .join(broadcast(itemCounts.select(col("__it").as("item_a"), col("__ni").as("n_a"))), "item_a")
      .join(broadcast(itemCounts.select(col("__it").as("item_b"), col("__ni").as("n_b"))), "item_b")
      .crossJoin(broadcast(totals))
      .select(
        col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("confidence"),
        round((col("__n") * col("n_ab")).cast("double") /
          (col("n_a") * col("n_b")), 6).as("lift"))
  }

  /** Shared mega-basket fail-fast: abort when any basket's DISTINCT
    * item count exceeds `cap`, naming the top offenders. Every consumer
    * that self-joins on a basket key (pair lift, co-purchase edge
    * derivation, triangle census) has the same size²-per-basket fanout,
    * so they guard through the same check — silently letting one hot
    * basket go quadratic is the 100 TB failure mode, and a 10⁶-item
    * basket is a data-quality bug, not a workload. `d` should be
    * materialized (localCheckpoint) by the caller when it also feeds the
    * main plan — the guard's collect is a separate action and would
    * otherwise recompute the distinct shuffle.
    */
  /** In-plan form of [[guardFanout]]: NO extra action. Per-basket
    * distinct counts reduce to only the OVER-CAP baskets (empty by
    * contract — broadcasting all counts would itself be O(baskets)),
    * which ride back as a broadcast left-outer probe; the first row of
    * an offending basket raises mid-stage, failing the SAME job that
    * would otherwise go quadratic. Use when the frame has one consumer
    * chain (no checkpoint to amortize a separate guard action over);
    * rows/columns pass through unchanged when every basket is legal.
    */
  def guardFanoutInline(d: DataFrame, basketCol: String, cap: Long,
      what: String): DataFrame = {
    val hot = d.groupBy(col(basketCol)).agg(count(lit(1)).as("__gn"))
      .filter(col("__gn") > cap)
    d.join(broadcast(hot), Seq(basketCol), "left_outer")
      .select(d.columns.map { c =>
        if (c == basketCol)
          when(col("__gn").isNotNull,
            raise_error(concat(
              lit(s"$what: basket "), col(basketCol).cast("string"),
              lit(s" exceeds maxBasketSize=$cap ("),
              col("__gn").cast("string"),
              lit(" distinct items); pair fanout is size² per basket"))))
            .otherwise(col(c)).as(c)
        else col(c)
      }.toSeq: _*)
  }

  def guardFanout(d: DataFrame, basketCol: String, cap: Long,
      what: String): Unit = {
    val hot = d.groupBy(col(basketCol)).count()
      .filter(col("count") > cap)
      .orderBy(col("count").desc).limit(5)
      .collect()
    if (hot.nonEmpty) {
      val desc = hot.map(r => s"(basket=${r.get(0)}: ${r.getLong(1)} distinct items)")
        .mkString(", ")
      throw new IllegalStateException(
        s"$what: baskets exceed maxBasketSize=$cap — $desc. " +
          "Filter or sample mega-baskets upstream; pair fanout is size² per basket.")
    }
  }
}
