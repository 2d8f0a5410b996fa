package graft

import org.apache.spark.sql.functions._
import graft.ops.Extensions117

/** Batch-117 invariants: a group with label-contradicting text is worth
  * LESS than a clean group (its removal improves validation Brier),
  * the identity columns are exact, and the fixture is stable.
  */
class Extensions117Spec extends SparkSpec {

  /** Signal docs: the token decides the label. The 'noisy' group has
    * the association INVERTED — training on it hurts calibration.
    */
  private def labeled = {
    import spark.implicits._
    val rows =
      (0 until 60).map { i =>
        val y = i % 2
        (i.toLong, if (y == 1) "good good good" else "bad bad bad", "clean", y)
      } ++
      (100 until 130).map { i =>
        val y = i % 2
        // inverted: 'good' text labelled 0, 'bad' text labelled 1
        (i.toLong, if (y == 1) "bad bad bad" else "good good good", "noisy", y)
      }
    rows.toDF("doc_id", "text", "grp_in", "keep")
  }

  test("a label-inverted group values below a clean group") {
    val card = Extensions117.dataValuation(
        labeled, "doc_id", "text", "keep", "grp_in")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(card.keySet == Set("clean", "noisy"))
    val (_, full1, excl1, vClean) = card("clean")
    val (_, full2, excl2, vNoisy) = card("noisy")
    assert(full1 == full2, "the full-model baseline is shared")
    assert(vClean == excl1 - full1 && vNoisy == excl2 - full2)
    assert(vNoisy < 0, s"removing inverted labels must IMPROVE Brier: $card")
    assert(vClean > vNoisy, s"clean outvalues noisy: $card")
  }

  test("x265 fixture: one row per language, shared baseline, exact delta") {
    val r = SparkEntry.queries("x265_data_valuation")(spark, sf0001).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("de", "en", "es", "fr", "zh"))
    assert(r.map(_.getLong(2)).distinct.length == 1, "one shared baseline")
    r.foreach { row =>
      assert(row.getLong(4) == row.getLong(3) - row.getLong(2)) }
  }
}
