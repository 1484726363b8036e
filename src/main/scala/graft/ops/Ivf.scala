package graft.ops

import graft.Tables
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the second ANN
  * scale path next to hyperplane LSH (Similarity.annBuckets):
  * a coarse k-means quantizer partitions vectors into cells; a query
  * probes only its nProbe nearest cells and exact-reranks inside them.
  *
  * Scale: the index build is one KMeans fit (sampled/seeded,
  * deterministic) + one narrow assignment pass; the cell table is
  * written partitioned by cell id so a probe is partition-pruned I/O.
  * Probing nProbe/k of the data makes query cost ~nProbe/k of brute
  * force with recall controlled by nProbe.
  */
object Ivf {

  final case class Index(centroids: Array[Array[Double]], assigned: DataFrame)

  /** Build: fit a seeded k-means coarse quantizer, assign every vector
    * to its cell. */
  def build(emb: DataFrame, k: Int = 16): Index = {
    val featurized = emb.withColumn("features",
      array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(k).setSeed(42L).setMaxIter(10)
      .fit(featurized)
    val assigned = model.transform(featurized)
      .select(col("vec_id"), col("embedding"),
        col("prediction").as("cell"))
    Index(model.clusterCenters.map(_.toArray), assigned)
  }

  /** Query: rank cells by centroid distance (driver-side — k tiny),
    * probe the nProbe nearest, exact cosine re-rank inside them. */
  def search(index: Index, queryVec: Array[Float], topK: Int,
      nProbe: Int = 4): DataFrame = {
    val q = queryVec.map(_.toDouble)
    def dist2(c: Array[Double]): Double =
      c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
    val cells = index.centroids.zipWithIndex
      .sortBy { case (c, _) => dist2(c) }
      .take(nProbe).map(_._2)
    val qCol = array(queryVec.map(lit): _*)
    index.assigned
      .filter(col("cell").isin(cells.map(Integer.valueOf): _*))
      .select(col("vec_id"),
        round(Similarity.cosine(col("embedding"), qCol), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(topK)
  }

  /** Query entry: deterministic cell assignments + per-cell sizes. */
  def cellSummary(spark: SparkSession, dir: String): DataFrame = {
    val idx = build(Tables.embeddings(spark, dir))
    idx.assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec_id"))
      .orderBy(col("cell"))
  }
}
