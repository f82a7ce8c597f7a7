package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, Tables}

/** Declarative data-quality audit (the Deequ/expectations pattern): a
  * fixed suite of constraint checks evaluated in ONE pass per table
  * plus one anti-join for referential integrity, emitting a compact
  * (check, measured, ok) report. [EXT] — the reference trusts its
  * input after header conformance; a pipeline feeding a 100 TB corpus
  * runs exactly this before anything downstream is allowed to read a
  * new drop.
  *
  * Scale shape: every per-table constraint (uniqueness, null rate,
  * range, row count) folds into a single aggregate over that table —
  * the checks share one scan and one reduce, however many constraints
  * the suite carries. Referential integrity is a left-anti join keyed
  * on the FK (AQE decides broadcast vs shuffle); its violation count
  * aggregates the anti side, never materializing violations unless
  * asked. Measured values are exact integer counts or single IEEE
  * divisions of them — hash-safe cross-engine.
  */
object Quality {

  private def report(rows: Seq[(String, Column, Column)]): Column =
    // (check, measured, ok) triples exploded from one struct array so
    // the whole suite stays a single-row aggregate until the very end
    explode(array(rows.map { case (name, measured, ok) =>
      struct(lit(name).as("check"), measured.cast("double").as("measured"),
        ok.as("ok"))
    }: _*))

  /** The declared audit suite over the star schema's fact spine. */
  def dqAudit(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    // one scan of orders: primary-key uniqueness + row floor
    val o = orders.agg(
      count(lit(1)).as("n"),
      countDistinct(col("o_orderkey")).as("n_pk"))
      .select(report(Seq(
        ("orders.pk_unique", col("n") - col("n_pk"), col("n") === col("n_pk")),
        ("orders.row_floor", col("n"), col("n") >= 1000)
      )).as("r"))
    // one scan of lineitem: null rates + domain ranges
    val l = lineitem.agg(
      count(lit(1)).as("n"),
      sum(when(col("l_shipdate").isNull, 1).otherwise(0)).as("null_ship"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1)
        .otherwise(0)).as("bad_disc"),
      sum(when(col("l_quantity") <= 0, 1).otherwise(0)).as("bad_qty"))
      .select(report(Seq(
        ("lineitem.shipdate_null_rate",
          col("null_ship").cast("double") / col("n"),
          col("null_ship").cast("double") / col("n") <= 0.01),
        ("lineitem.discount_in_range", col("bad_disc"), col("bad_disc") === 0),
        ("lineitem.quantity_positive", col("bad_qty"), col("bad_qty") === 0)
      )).as("r"))
    // referential integrity: lineitem.l_orderkey ⊆ orders.o_orderkey
    val fk = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
      .select(report(Seq(
        ("lineitem.fk_orders", col("orphans"), col("orphans") === 0)
      )).as("r"))
    o.unionByName(l).unionByName(fk)
      .select(col("r.check").as("check"), col("r.measured").as("measured"),
        col("r.ok").as("ok"))
      .orderBy(col("check"))
  }

  val dqAuditSql: String =
    """WITH o AS (
      |  SELECT COUNT(*) AS n, COUNT(DISTINCT o_orderkey) AS n_pk FROM orders),
      |l AS (
      |  SELECT COUNT(*) AS n,
      |    SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS null_ship,
      |    SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS bad_disc,
      |    SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS bad_qty
      |  FROM lineitem),
      |fk AS (
      |  SELECT COUNT(*) AS orphans FROM lineitem
      |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
      |rep AS (
      |  SELECT 'orders.pk_unique' AS check, CAST(n - n_pk AS DOUBLE) AS measured,
      |         n = n_pk AS ok FROM o
      |  UNION ALL
      |  SELECT 'orders.row_floor', CAST(n AS DOUBLE), n >= 1000 FROM o
      |  UNION ALL
      |  SELECT 'lineitem.shipdate_null_rate',
      |         CAST(null_ship AS DOUBLE) / n,
      |         CAST(null_ship AS DOUBLE) / n <= 0.01 FROM l
      |  UNION ALL
      |  SELECT 'lineitem.discount_in_range', CAST(bad_disc AS DOUBLE),
      |         bad_disc = 0 FROM l
      |  UNION ALL
      |  SELECT 'lineitem.quantity_positive', CAST(bad_qty AS DOUBLE),
      |         bad_qty = 0 FROM l
      |  UNION ALL
      |  SELECT 'lineitem.fk_orders', CAST(orphans AS DOUBLE),
      |         orphans = 0 FROM fk)
      |SELECT "check", measured, ok FROM rep ORDER BY "check"""".stripMargin

  def queries: Seq[(String, QueryDef)] = Seq(
    "dq_audit" -> QueryDef(
      (s, d) => dqAudit(Tables.lineitem(s, d), Tables.orders(s, d)),
      dqAuditSql))
}
