package graft.operators

import graft.{Q, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over the embeddings — the trainer behind
  * the IVF index (q_knn_ivf uses fixed seed centroids; this is the "real
  * deployment would k-means these" step).
  *
  * Scale shape per iteration: centroids broadcast (k×dim doubles),
  * assignment is a rank window over a crossJoin with k rows (linear scan),
  * recompute is one partial-aggregated groupBy(cluster, dim) mean. Only
  * the k×dim centroid matrix ever reaches the driver — the iterative
  * driver loop carries model state, never data.
  *
  * Determinism: cosine ties break on centroid id; init is vec_id < k.
  */
object KMeans {

  /** Assign each vector to its highest-cosine centroid (ties → lowest id). */
  def assign(e: DataFrame, cents: Seq[(Long, Array[Double])]): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val cdf = broadcast(cents.toDF("cid", "c"))
    val byVec = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cid"))
    e.crossJoin(cdf)
      .select(col("vec_id"), col("embedding"), col("cid"),
        VectorOps.cosine(col("embedding"), col("c")).as("ccos"))
      .withColumn("rn", row_number().over(byVec))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid").as("cluster"))
  }

  /** One recompute step: per-cluster per-dimension mean. */
  def recompute(assigned: DataFrame): Seq[(Long, Array[Double])] =
    assigned
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("cluster"), col("d"))
      .agg(avg(col("x").cast("double")).as("m"))
      .collect() // k×dim rows — model state, bounded
      .groupBy(_.getLong(0))
      .map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
      }
      .toSeq.sortBy(_._1)

  /** Train `iters` Lloyd iterations from the deterministic vec_id<k init. */
  def train(spark: SparkSession, dir: String, k: Int, iters: Int): Seq[(Long, Array[Double])] = {
    val e = Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    var cents: Seq[(Long, Array[Double])] = e.filter(col("vec_id") < k)
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .toSeq.sortBy(_._1)
    for (_ <- 1 to iters)
      cents = recompute(assign(e, cents))
    cents
  }

  /** Mean cosine of each vector to its centroid (training quality metric). */
  def meanCosine(e: DataFrame, cents: Seq[(Long, Array[Double])]): Double =
    assign(e, cents)
      .join(broadcast(e.sparkSession.createDataFrame(
        cents.map { case (c, v) => (c, v.toSeq) }).toDF("cluster", "c")), "cluster")
      .select(avg(VectorOps.cosine(col("embedding"), col("c"))))
      .collect()(0).getDouble(0)

  /** Declared query: assignment after ONE trained iteration (init = the
    * first k vectors, one mean-recompute, re-assign). The oracle replays
    * the identical iteration in SQL — centroid means differ only by
    * accumulation-order float noise (~1e-15), far from any assignment
    * decision boundary.
    */
  private val kmeansAssign = Q(
    "q_kmeans_assign",
    (spark, dir) => {
      val e = Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val c1 = train(spark, dir, k = 8, iters = 1)
      assign(e, c1)
        .select(col("vec_id"), col("cluster"))
        .orderBy(col("vec_id"))
    },
    Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            c0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < 8),
            a1 AS (SELECT vec_id, cid FROM (
                     SELECT e.vec_id, c0.cid,
                       row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_cosine_similarity(e.v, c0.c) DESC, c0.cid) AS rn
                     FROM e CROSS JOIN c0) WHERE rn = 1),
            m1 AS (SELECT a1.cid, t.d, AVG(e.v[t.d]) AS md
                   FROM a1 JOIN e USING (vec_id),
                        UNNEST(generate_series(1, 64)) AS t(d)
                   GROUP BY a1.cid, t.d),
            c1 AS (SELECT cid, list(md ORDER BY d) AS c FROM m1 GROUP BY cid)
            SELECT vec_id, cid AS cluster FROM (
              SELECT e.vec_id, c1.cid,
                row_number() OVER (PARTITION BY e.vec_id
                  ORDER BY list_cosine_similarity(e.v, c1.c) DESC, c1.cid) AS rn
              FROM e CROSS JOIN c1) WHERE rn = 1
            ORDER BY vec_id"""))

  val all: Seq[Q] = Seq(kmeansAssign)
}
