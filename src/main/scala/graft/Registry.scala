package graft

import graft.operators._

/** The engine's complete declared capability surface (SURVEY.md §2.3):
  * every operator family as oracle-checked queries.
  */
object Registry {
  val all: Seq[Q] =
    Relational.all ++ AdvancedJoins.all ++ ScalarQueries.all ++ TextQueries.all ++
      EventQueries.all ++ VectorQueries.all ++ IvfQueries.all ++
      DedupQueries.all ++ GraphQueries.all ++ Multimodal.all ++ KMeans.all ++
      PipelineQueries.all ++ MapReduceQueries.all ++ SqlQueries.all ++
      SamplingQueries.all ++ TopK.all ++ StatsTests.all ++ TrainPrepQueries.all ++
      TpchQueries.all ++ AuditQueries.all ++ LayoutQueries.all ++
      SketchQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  lazy val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** Oracle SQL with whitespace collapsed (single line, driver-JSON-safe). */
  lazy val oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.replaceAll("\\s+", " ").trim)).toMap
}
