package graft

import org.apache.spark.sql.functions._
import graft.log.EventLog
import scala.util.Random

/** Sharded id allocation invariants: interleaved writers never collide,
  * allocation is deterministic, and the bounds fail loudly.
  */
class EventLogIdSpec extends SparkSpec {

  private def batch(rnd: Random, n: Int) = {
    import spark.implicits._
    (0 until n).map(_ => (rnd.nextInt(1000), s"p${rnd.nextInt(50)}"))
      .toDF("ord", "payload")
  }

  test("property: two interleaved create batches under different epochs never collide") {
    for (seed <- Seq(3, 11, 29)) {
      val rnd = new Random(seed)
      // simulate interleaving: each writer allocates several batches in
      // arbitrary order; ONLY the epoch separates them
      val idsA = (0 until 3).flatMap { _ =>
        EventLog.allocateIdsSharded(batch(rnd, 50 + rnd.nextInt(50)), "ord",
          writerEpoch = 7L, seqBits = 20)
          .select("id").collect().map(_.getLong(0))
      }
      val idsB = (0 until 3).flatMap { _ =>
        EventLog.allocateIdsSharded(batch(rnd, 50 + rnd.nextInt(50)), "ord",
          writerEpoch = 8L, seqBits = 20)
          .select("id").collect().map(_.getLong(0))
      }
      assert(idsA.toSet.intersect(idsB.toSet).isEmpty,
        s"seed $seed: epochs 7 and 8 must allocate disjoint ids")
      assert(idsA.forall(id => (id >> 20) == 7L) && idsB.forall(id => (id >> 20) == 8L),
        s"seed $seed: every id must carry its writer's epoch prefix")
      assert((idsA ++ idsB).forall(_ > 0L), "ids stay positive")
    }
  }

  test("allocation is deterministic and dense within a batch") {
    import spark.implicits._
    val rows = Seq((5, "a"), (1, "b"), (1, "a"), (9, "z")).toDF("ord", "payload")
    val a = EventLog.allocateIdsSharded(rows, "ord", 3L, seqBits = 10)
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val b = EventLog.allocateIdsSharded(rows, "ord", 3L, seqBits = 10)
      .orderBy("id").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq, "same batch, same epoch -> same assignment")
    assert(a.map(_._3).toSeq == (1L to 4L).map((3L << 10) + _).toSeq,
      s"dense seq under the epoch prefix: ${a.mkString(",")}")
    // ordered by ord, ties broken deterministically
    assert(a.head._1 == 1 && a.last._1 == 9)
  }

  test("bounds fail loudly: oversized epoch rejected; oversized batch raises") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      EventLog.allocateIdsSharded(batch(new Random(1), 5), "ord",
        writerEpoch = 1L << 40, seqBits = 40)
    }
    // cap is 2^seqBits - 1 ids per (epoch, batch): seqBits=2 admits 3
    val atCap = (0 until 4).map(i => (i, "x")).toDF("ord", "payload")
    val thrown = intercept[Exception] {
      EventLog.allocateIdsSharded(atCap, "ord", 0L, seqBits = 2).collect()
    }
    assert(thrown.getMessage.contains("allocateIdsSharded") ||
      thrown.getCause != null, s"batch past 2^seqBits - 1 must raise: $thrown")
  }

  test("extreme epoch with a full batch stays positive (no 2^63 wrap)") {
    import spark.implicits._
    // writerEpoch at its require-enforced max, batch at the seq cap:
    // the last id is (2^61 - 1) << 2 + 3 = 2^63 - 1 — the exact corner
    // that used to wrap to Long.MinValue when seq could reach 2^seqBits
    val maxEpoch = (1L << 61) - 1L
    val full = (0 until 3).map(i => (i, "x")).toDF("ord", "payload")
    val ids = EventLog.allocateIdsSharded(full, "ord", maxEpoch, seqBits = 2)
      .select("id").collect().map(_.getLong(0))
    assert(ids.forall(_ > 0L), s"ids must stay positive at the corner: ${ids.mkString(",")}")
    assert(ids.max == Long.MaxValue, s"last id is 2^63 - 1: ${ids.max}")
  }
}
