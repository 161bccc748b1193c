package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Debug peek at logical stats for the spread-gate calibration. */
object StatsPeek {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.get("SPARK_GRAFT_CACHE_TABLES").contains("1"))
      graft.Tables.names.foreach { n =>
        try graft.Tables(spark, dir, n).cache().count()
        catch { case _: Throwable => () }
      }
    val df = graft.Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    println(s"BYTES=$bytes TARGET=$target THRESHOLD=${BigInt(target.toLong) * (64L << 10)}")
    val out = graft.Tables.spreadIfUnderSplitAtScale(df)
    println(s"SPREAD=${out ne df} PARTS=${out.rdd.getNumPartitions}")
    spark.stop()
  }
}
