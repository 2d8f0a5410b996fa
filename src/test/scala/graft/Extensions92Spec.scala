package graft

import org.apache.spark.sql.functions._

/** Batch-92 invariants: the directed purchase flow exercises BOTH
  * general-loop paths (every supplier a sink, every customer
  * inflow-free) on every round, and the corrected semantics hold.
  */
class Extensions92Spec extends SparkSpec {

  test("x211 fixture: customers (no inflow) all hold the same rank; supplier ranks grow with in-degree; mass conserved") {
    val out = SparkEntry.queries("x211_directed_pagerank")(spark, sf0001)
      .collect()
    val (cust, supp) = out.partition(_.getString(0) == "customer")
    assert(cust.nonEmpty && supp.nonEmpty)
    // no customer has an in-edge: contribution is identically zero, so
    // every customer's rank is teleport + its dangling share — equal
    assert(cust.map(_.getLong(2)).distinct.length == 1,
      s"inflow-free nodes must rank equally: ${cust.map(_.getLong(2)).distinct.toSeq}")
    // suppliers receive real mass: every supplier outranks the customers
    val custRank = cust.head.getLong(2)
    assert(supp.forall(_.getLong(2) > custRank),
      "sinks with inflow must outrank inflow-free sources")
    // total mass ~ 1e6 micro-units (integer rounding loses O(1)/edge)
    val total = out.map(_.getLong(2)).sum
    assert(math.abs(total - 1000000L) < 10000L,
      s"mass must be conserved up to rounding: $total")
  }
}
