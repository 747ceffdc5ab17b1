package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression utilities shared across operator modules. */
object Exprs {

  /** Let-binding for column expressions: evaluates `value` once per
    * row and exposes it to `body` as a lambda variable.
    *
    * Why it matters: higher-order array functions run interpreted —
    * outside whole-stage codegen and its common-subexpression
    * elimination — so an expression tree that textually repeats an
    * expensive subexpression (a shingle array, a normalized vector)
    * re-evaluates it at every occurrence, per row. Binding turns
    * O(occurrences) into O(1): measured 25s → ~1s per LSH query at
    * sf0.1.
    */
  def bind(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)
}
