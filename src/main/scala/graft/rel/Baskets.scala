package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Market-basket association mining: pairwise support / confidence /
  * lift over order baskets. [EXT] SURVEY §2.11 — the co-occurrence
  * statistics pass behind "customers who bought X also bought Y",
  * recommendation candidate generation, and (in a training-data
  * pipeline) tag/source co-occurrence audits.
  *
  * Deliberately PAIR-level, not general frequent-itemset search: pair
  * enumeration inside a basket is quadratic in BASKET size (bounded by
  * construction — TPC-H orders hold ≤7 items) and linear in corpus
  * size, so the same plan survives 100 TB; unbounded itemset lattices
  * (A-priori/FP-growth) do not have that property and would hide an
  * exponential blowup behind an innocent-looking operator.
  *
  * Scale shape: distinct (basket, item) → self-join on basket (the one
  * fanout, basket-bounded) → groupBy pair with map-side combine. Item
  * supports join back on each pair leg — SF-proportional relations,
  * left to AQE (a forced broadcast here is the q10 mistake the round-3
  * verdict flagged). Ratios are single IEEE divisions of exact integer
  * counts, identical in any engine — no accumulation, so the floats
  * are hash-safe.
  */
object Baskets {

  /** Distinct (basket, item) pairs from order lines. */
  def baskets(lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey").as("basket"),
      col("l_partkey").as("item")).distinct()

  /** Association rules over item pairs with support ≥ minSupport
    * baskets. One row per ORDERED pair (a → b and b → a both emitted:
    * confidence is directional). */
  def pairRules(baskets: DataFrame, minSupport: Long): DataFrame = {
    // ONE aggregation packs each basket's distinct items into a sorted
    // array; pairs, item supports and the basket count are all narrow
    // derivations of that relation. The previous shape (distinct →
    // self-join on basket → pair groupBy) exchanged the (basket, item)
    // relation three times — the distinct, then BOTH join inputs
    // re-keyed by basket (ReusedExchange shares the subtree, not the
    // re-key) — where collect_set reaches the same per-basket item sets
    // with a single basket-keyed exchange (partial map-side dedup
    // included). Pair fanout stays basket-bounded (≤7 items per TPC-H
    // order → ≤21 unordered pairs), and sort_array gives the a < b
    // orientation for free.
    val arr = baskets.groupBy(col("basket"))
      .agg(sort_array(collect_set(col("item"))).as("items"))
    val n = arr.agg(count(lit(1)).as("n_baskets"))
    val itemSupp = arr.select(explode(col("items")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("supp"))
    // co-occurrence counts are symmetric: count each unordered pair once
    // (a < b) and mirror AFTER the support filter — halves the rows
    // through the pair-count shuffle, which is this operator's one big
    // exchange
    val half = arr
      .select(explode(flatten(transform(col("items"), (a, i) =>
        transform(slice(col("items"), i + lit(2), size(col("items")) - i - 1),
          b => struct(a.as("antecedent"), b.as("consequent")))))).as("p"))
      .select(col("p.antecedent").as("antecedent"),
        col("p.consequent").as("consequent"))
      .groupBy(col("antecedent"), col("consequent"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    val pairSupp = half.unionByName(half.select(
      col("consequent").as("antecedent"),
      col("antecedent").as("consequent"), col("n_ab")))
    pairSupp
      .join(itemSupp.select(col("item").as("antecedent"), col("supp").as("n_a")),
        Seq("antecedent"))
      .join(itemSupp.select(col("item").as("consequent"), col("supp").as("n_b")),
        Seq("consequent"))
      .crossJoin(n) // 1 row
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        (col("n_ab").cast("double") / col("n_a")).as("confidence"),
        (col("n_baskets").cast("double") * col("n_ab") /
          (col("n_a") * col("n_b"))).as("lift"))
      .orderBy(col("antecedent"), col("consequent"))
  }

  def pairRulesSql(minSupport: Long): String =
    s"""WITH bk AS (
       |  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem),
       |n AS (SELECT COUNT(DISTINCT basket) AS n_baskets FROM bk),
       |isupp AS (SELECT item, COUNT(*) AS supp FROM bk GROUP BY item),
       |ps AS (
       |  SELECT a.item AS antecedent, b.item AS consequent, COUNT(*) AS n_ab
       |  FROM bk a JOIN bk b ON a.basket = b.basket AND a.item <> b.item
       |  GROUP BY a.item, b.item
       |  HAVING COUNT(*) >= $minSupport)
       |SELECT ps.antecedent, ps.consequent, ps.n_ab,
       |       CAST(ps.n_ab AS DOUBLE) / ia.supp AS confidence,
       |       CAST(n.n_baskets AS DOUBLE) * ps.n_ab / (ia.supp * ib.supp) AS lift
       |FROM ps
       |JOIN isupp ia ON ia.item = ps.antecedent
       |JOIN isupp ib ON ib.item = ps.consequent
       |CROSS JOIN n
       |ORDER BY antecedent, consequent""".stripMargin

  def queries: Seq[(String, QueryDef)] = Seq(
    "assoc_rules" -> QueryDef(
      (s, d) => pairRules(baskets(Tables.lineitem(s, d)), 3L),
      pairRulesSql(3L)))
}
