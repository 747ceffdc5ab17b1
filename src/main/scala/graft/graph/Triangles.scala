package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed triangle counting + global clustering
  * coefficient — the classic graph statistic (community structure,
  * spam/bot detection on co-engagement graphs) via the
  * DEGREE-ORIENTED join: orient every undirected edge from its
  * lower-(degree, id) endpoint to the higher, so each node's
  * out-neighborhood is O(sqrt(m)) and the wedge join's fan-out is
  * bounded by arboricity — the standard trick that makes exact
  * triangle counting feasible at scale where the naive three-way
  * edge join explodes on hubs. Every triangle is counted exactly
  * once (its orientation is a DAG).
  *
  * Shuffles: one degree aggregate, two degree-attach joins, the
  * wedge self-join on the low endpoint, and the closing-edge
  * semi-join — all equi-joins on node keys, AQE-skew-coverable.
  * Output is ONE row of exact integers: nodes, edges, wedges
  * (Σ C(deg,2)), triangles, and the global clustering coefficient
  * `3·T·1e6 div wedges` in e6 fixed point.
  */
object Triangles {

  /** `edges` must be distinct undirected pairs with a < b. */
  def stats(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b"))
    val deg = e.select(col("a").as("n"))
      .unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient each edge from lower (degree, id) to higher
    val oriented = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    // wedges at u: (v1, v2) pairs of u's out-neighbors; the closing
    // edge (v1, v2) must itself be an oriented edge (either way the
    // DAG ordered it — match both orderings via the canonical pair)
    val w = oriented.select(col("u"), col("v").as("v1"))
      .join(oriented.select(col("u"), col("v").as("v2")), "u")
      .filter(col("v1") < col("v2"))
    val canon = oriented.select(
      least(col("u"), col("v")).as("x"), greatest(col("u"), col("v")).as("y"))
    val tri = w.join(canon,
      col("v1") === col("x") && col("v2") === col("y"))
      .agg(count(lit(1)).as("n_triangles"))
    val shape = deg.agg(
      count(lit(1)).as("n_nodes"),
      sum(col("d")).as("deg_sum"),
      sum(expr("(d * (d - 1)) div 2")).as("n_wedges"))
    shape.crossJoin(broadcast(tri))
      .select(
        col("n_nodes"),
        expr("deg_sum div 2").as("n_edges"),
        col("n_wedges"),
        col("n_triangles"),
        expr("n_triangles * 3 * 1000000 div n_wedges").as("gcc_e6"))
  }
}
