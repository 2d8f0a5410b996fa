package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops.{EventSourcing, Extensions, Extensions2, Extensions3, Extensions4, Extensions5, Extensions6, Extensions7, Extensions8, Extensions9, Extensions10, Extensions11, Extensions12, Extensions13, Extensions14, Extensions15, Extensions16, Extensions17, Extensions18, Extensions19, Extensions20, Extensions21, Extensions22, Extensions23, Extensions24, Extensions25, Extensions26, Extensions27, Extensions28, Extensions29, Extensions30, Extensions31, Extensions32, Extensions33, Extensions34, Extensions35, Extensions36, Extensions37, Extensions38, Extensions39, Extensions40, Extensions41, Extensions42, Extensions43, Extensions44, Extensions45, Extensions46, Extensions47, Extensions48, Extensions49, Extensions50, Extensions51, Extensions52, Extensions53, Extensions54, Extensions55, Extensions56, Extensions57, Extensions58, Extensions59, Extensions60, Extensions61, Extensions62, Extensions63, Extensions64, Extensions65, Extensions66, Extensions67, Extensions68, Extensions69, Extensions70, Extensions71, Extensions72, Extensions73, Extensions74, Extensions75, Extensions76, Extensions77, Extensions78, Extensions79, Extensions80, Extensions81, Extensions82, Extensions83, Extensions84, Extensions85, Extensions86, Multimodal, Relational, Relational2, Relational3, Relational4, Scale, TimeWindows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine re-expresses the reference CQRS system
  * (robertBrem/pokertracker-cassandra-st) Spark-first: an append-only event
  * log + latest-state materialization (the query service's read model,
  * reference start_container.sh:95), plus the full relational / streaming /
  * data-pipeline operator inventory of SURVEY §2.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * "Current state of every aggregate" — the reference's findAll
    * (PlayerResourceIT.java:164-171) as one Spark query.
    */
  def entry(spark: SparkSession): DataFrame =
    EventSourcing.latestState(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Relational2.queries ++ Relational3.queries ++ Relational4.queries ++
      EventSourcing.queries ++ Extensions.queries ++ Extensions2.queries ++ Extensions3.queries ++
      Extensions4.queries ++ Extensions5.queries ++ Extensions6.queries ++ Extensions7.queries ++ Extensions8.queries ++ Extensions9.queries ++ Extensions10.queries ++ Extensions11.queries ++ Extensions12.queries ++ Extensions13.queries ++ Extensions14.queries ++ Extensions15.queries ++ Extensions16.queries ++ Extensions17.queries ++ Extensions18.queries ++ Extensions19.queries ++ Extensions20.queries ++ Extensions21.queries ++ Extensions22.queries ++ Extensions23.queries ++ Extensions24.queries ++ Extensions25.queries ++ Extensions26.queries ++ Extensions27.queries ++ Extensions28.queries ++ Extensions29.queries ++ Extensions30.queries ++ Extensions31.queries ++ Extensions32.queries ++ Extensions33.queries ++ Extensions34.queries ++ Extensions35.queries ++ Extensions36.queries ++ Extensions37.queries ++ Extensions38.queries ++ Extensions39.queries ++ Extensions40.queries ++ Extensions41.queries ++ Extensions42.queries ++ Extensions43.queries ++ Extensions44.queries ++ Extensions45.queries ++ Extensions46.queries ++ Extensions47.queries ++ Extensions48.queries ++ Extensions49.queries ++ Extensions50.queries ++ Extensions51.queries ++ Extensions52.queries ++ Extensions53.queries ++ Extensions54.queries ++ Extensions55.queries ++ Extensions56.queries ++ Extensions57.queries ++ Extensions58.queries ++ Extensions59.queries ++ Extensions60.queries ++ Extensions61.queries ++ Extensions62.queries ++ Extensions63.queries ++ Extensions64.queries ++ Extensions65.queries ++ Extensions66.queries ++ Extensions67.queries ++ Extensions68.queries ++ Extensions69.queries ++ Extensions70.queries ++ Extensions71.queries ++ Extensions72.queries ++ Extensions73.queries ++ Extensions74.queries ++ Extensions75.queries ++ Extensions76.queries ++ Extensions77.queries ++ Extensions78.queries ++ Extensions79.queries ++ Extensions80.queries ++ Extensions81.queries ++ Extensions82.queries ++ Extensions83.queries ++ Extensions84.queries ++ Extensions85.queries ++ Extensions86.queries ++ TimeWindows.queries ++ Multimodal.queries ++
      Scale.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Relational2.oracles ++ Relational3.oracles ++ Relational4.oracles ++
      EventSourcing.oracles ++ Extensions.oracles ++ Extensions2.oracles ++ Extensions3.oracles ++
      Extensions4.oracles ++ Extensions5.oracles ++ Extensions6.oracles ++ Extensions7.oracles ++ Extensions8.oracles ++ Extensions9.oracles ++ Extensions10.oracles ++ Extensions11.oracles ++ Extensions12.oracles ++ Extensions13.oracles ++ Extensions14.oracles ++ Extensions15.oracles ++ Extensions16.oracles ++ Extensions17.oracles ++ Extensions18.oracles ++ Extensions19.oracles ++ Extensions20.oracles ++ Extensions21.oracles ++ Extensions22.oracles ++ Extensions23.oracles ++ Extensions24.oracles ++ Extensions25.oracles ++ Extensions26.oracles ++ Extensions27.oracles ++ Extensions28.oracles ++ Extensions29.oracles ++ Extensions30.oracles ++ Extensions31.oracles ++ Extensions32.oracles ++ Extensions33.oracles ++ Extensions34.oracles ++ Extensions35.oracles ++ Extensions36.oracles ++ Extensions37.oracles ++ Extensions38.oracles ++ Extensions39.oracles ++ Extensions40.oracles ++ Extensions41.oracles ++ Extensions42.oracles ++ Extensions43.oracles ++ Extensions44.oracles ++ Extensions45.oracles ++ Extensions46.oracles ++ Extensions47.oracles ++ Extensions48.oracles ++ Extensions49.oracles ++ Extensions50.oracles ++ Extensions51.oracles ++ Extensions52.oracles ++ Extensions53.oracles ++ Extensions54.oracles ++ Extensions55.oracles ++ Extensions56.oracles ++ Extensions57.oracles ++ Extensions58.oracles ++ Extensions59.oracles ++ Extensions60.oracles ++ Extensions61.oracles ++ Extensions62.oracles ++ Extensions63.oracles ++ Extensions64.oracles ++ Extensions65.oracles ++ Extensions66.oracles ++ Extensions67.oracles ++ Extensions68.oracles ++ Extensions69.oracles ++ Extensions70.oracles ++ Extensions71.oracles ++ Extensions72.oracles ++ Extensions73.oracles ++ Extensions74.oracles ++ Extensions75.oracles ++ Extensions76.oracles ++ Extensions77.oracles ++ Extensions78.oracles ++ Extensions79.oracles ++ Extensions80.oracles ++ Extensions81.oracles ++ Extensions82.oracles ++ Extensions83.oracles ++ Extensions84.oracles ++ Extensions85.oracles ++ Extensions86.oracles ++ TimeWindows.oracles ++ Multimodal.oracles ++
      Scale.oracles
}
