package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, element_at, transform}

/** Expression-level helpers shared across packs. */
object Expr {

  /** Single-evaluation let-binding for Catalyst expressions.
    *
    * A higher-order function evaluates its ARGUMENT exactly once per
    * row, so `transform(array(e), v → body)` binds `e` to the lambda
    * variable `v` and body reads are O(1) — no matter how the
    * optimizer collapses projections. Without this, an alias that is
    * referenced once STATICALLY inside a lambda body gets inlined by
    * CollapseProject and then re-evaluated per lambda ELEMENT at
    * runtime: for a λ over n elements whose body uses a subtree of
    * cost c, that is n·c instead of c — the a07/l05 pitfall (a 320×
    * blow-up for the MLP hidden-layer fold).
    *
    * Zero-shuffle, zero-allocation beyond a 1-element array per row;
    * works identically in codegen'd and interpreted paths. */
  def let(e: Column)(body: Column => Column): Column =
    element_at(transform(array(e), body), 1)
}
