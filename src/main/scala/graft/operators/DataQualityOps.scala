package graft.operators

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the Deequ-shaped
  * validation layer a 100 TB ingest runs before publishing a snapshot:
  * uniqueness, completeness, accepted-value domains, range checks, and
  * referential integrity, each reported as one (constraint, n_rows,
  * n_violations, passed) row.
  *
  * Scale design: row-local constraints (nullness, domains, ranges) for a
  * table are compiled into ONE aggregate pass — adding a constraint adds
  * a conditional-sum column, never a scan. Uniqueness rides the same agg
  * (count − count DISTINCT; Catalyst plans one Expand). Referential
  * integrity is a LEFT ANTI join per FK edge — broadcastable when the
  * parent's keys fit, shuffled otherwise, and only VIOLATION COUNTS cross
  * the wire, never violating rows. The report itself is a handful of
  * 1-row frames broadcast-crossed and stacked: O(#constraints) output no
  * matter the corpus size.
  *
  * The `orders_priority_subset` constraint is deliberately narrower than
  * the fixture's domain so the suite provably COUNTS violations rather
  * than rubber-stamping zeros (its row reads passed=false on TPC-H-shaped
  * data, where priorities 4-NOT SPECIFIED / 5-LOW exist).
  */
object DataQualityOps {

  /** Gate query: the full constraint report over orders / customer /
    * lineitem / documents. `passed` is violations == 0 for hard
    * constraints; the documents completeness check tolerates ≤5% null
    * text (violations × 20 ≤ rows — exact integer arithmetic, no float
    * in the verdict). Every count is restated independently by the
    * DuckDB oracle, so the whole row hash-gates.
    */
  def constraintReport(t: Tables): DataFrame = {
    // one pass over orders for every row-local orders constraint
    val ordersLocal = t.orders.agg(
      count(lit(1)).as("o_rows"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_o_pk"),
      sum(when(col("o_custkey").isNotNull, 0L).otherwise(1L)).as("v_o_custkey"),
      sum(when(col("o_orderstatus").isin("F", "O", "P"), 0L).otherwise(1L))
        .as("v_o_status"),
      sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM"),
        0L).otherwise(1L)).as("v_o_priority"),
      sum(when(col("o_totalprice") > 0, 0L).otherwise(1L)).as("v_o_price"))
    val docsLocal = t.documents.agg(
      count(lit(1)).as("d_rows"),
      (count(lit(1)) - countDistinct(col("doc_id"))).as("v_d_pk"),
      sum(when(col("text").isNotNull, 0L).otherwise(1L)).as("v_d_text"))
    val liLocal = t.lineitem.agg(
      count(lit(1)).as("l_rows"),
      sum(when(col("l_quantity").between(1, 50), 0L).otherwise(1L))
        .as("v_l_qty"))
    // referential integrity: anti joins counting orphans only. NULL FKs
    // are excluded — nullness is the *_not_null constraint's finding;
    // counting it here too would double-report one defect as two
    val orphanOrders = t.orders.select("o_custkey")
      .filter(col("o_custkey").isNotNull)
      .join(t.customer.select("c_custkey"),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("v_o_fk"))
    val orphanLineitem = t.lineitem.select("l_orderkey")
      .filter(col("l_orderkey").isNotNull)
      .join(t.orders.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("v_l_fk"))
    val all = ordersLocal
      .crossJoin(broadcast(docsLocal))
      .crossJoin(broadcast(liLocal))
      .crossJoin(broadcast(orphanOrders))
      .crossJoin(broadcast(orphanLineitem))
    all.select(expr(
      """stack(10,
        |  'orders_pk_unique',           o_rows, v_o_pk,
        |  'orders_custkey_not_null',    o_rows, v_o_custkey,
        |  'orders_status_domain',       o_rows, v_o_status,
        |  'orders_priority_subset',     o_rows, v_o_priority,
        |  'orders_totalprice_positive', o_rows, v_o_price,
        |  'orders_fk_customer',         o_rows, v_o_fk,
        |  'documents_pk_unique',        d_rows, v_d_pk,
        |  'documents_text_complete',    d_rows, v_d_text,
        |  'lineitem_quantity_range',    l_rows, v_l_qty,
        |  'lineitem_fk_orders',         l_rows, v_l_fk
        |) AS (constraint, n_rows, n_violations)""".stripMargin))
      .select(col("constraint"), col("n_rows"), col("n_violations"),
        when(col("constraint") === "documents_text_complete",
          col("n_violations") * 20 <= col("n_rows"))
          .otherwise(col("n_violations") === 0L).as("passed"))
      .orderBy("constraint")
  }
}
