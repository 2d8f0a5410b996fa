package graft.ops

import org.apache.spark.sql.SparkSession

/** Session-scoped scratch directories for interchange/round-trip cards
  * (round-12 advice, promoted to a shared helper in round 13): keying
  * the path on the Spark applicationId makes two concurrent sessions
  * (test JVM + a bench child, say) unable to race each other's scratch
  * files, while staying DETERMINISTIC within a session so reruns
  * overwrite instead of leaking an unbounded tmpdir trail. Every card
  * that writes a temporary on-disk artifact goes through here — a new
  * interchange card hand-building its own path is exactly how the
  * shared-tmpdir race got reintroduced once already.
  */
object Scratch {

  /** `/tmp/graft_<tag>_<applicationId>` (honoring java.io.tmpdir). */
  def sessionDir(spark: SparkSession, tag: String): String =
    sys.props("java.io.tmpdir").stripSuffix("/") +
      s"/graft_${tag}_${spark.sparkContext.applicationId}"
}
