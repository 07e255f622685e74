package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, get, lit, transform}

/** Let-binding for Column expressions. Catalyst does NOT
  * common-subexpression-eliminate higher-order-function lambda bodies,
  * so a non-trivial expression referenced inside a `transform`/
  * `aggregate`/`zip_with` lambda re-evaluates on EVERY element — an
  * O(array) subexpression there turns the whole expression O(n²) per
  * row (the q240-isotropy trap, re-found by LambdaAuditSpec in the
  * quantizer and matryoshka kernels). `bindOnce` evaluates the value a
  * single time per row by binding it as a one-element-`transform`
  * lambda variable — lambda-variable reads are O(1), and the outer
  * lambda body executes exactly once. */
object Let {

  /** Evaluate `v` once per row; `body` sees it as an O(1) variable. */
  def bindOnce(v: Column)(body: Column => Column): Column =
    get(transform(array(v), x => body(x)), lit(0))
}
