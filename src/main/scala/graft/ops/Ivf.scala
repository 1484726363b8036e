package graft.ops

import graft.Tables
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the second ANN
  * scale path next to hyperplane LSH (Similarity.annBuckets):
  * a coarse k-means quantizer partitions vectors into cells; a query
  * probes only its nProbe nearest cells and exact-reranks inside them.
  *
  * Scale shape: the quantizer is fitted on a seeded SAMPLE (k-means
  * needs only enough points to place k coarse centroids — fitting on
  * the full corpus is wasted passes at 100 TB); assignment is one
  * narrow codegen'd pass; the cell table is persisted
  * `partitionBy("cell")` so a probe is partition-pruned I/O
  * (PartitionFilters at the scan, nProbe/k of the files read). The
  * index is built once per corpus and reused across queries — never
  * rebuilt per query.
  */
object Ivf {

  final case class Index(centroids: Array[Array[Double]], assigned: DataFrame)

  /** Build: fit a seeded k-means coarse quantizer on a sample, assign
    * every vector to its cell. `fitFraction` bounds the fit cost: the
    * sample only has to be large enough to place k coarse centroids
    * (guarded to >= 20*k expected rows; tiny inputs fit on everything
    * so local tests and huge corpora take the same code path). */
  def build(emb: DataFrame, k: Int = 16, fitFraction: Double = 1.0): Index = {
    val featurized = emb.withColumn("features",
      array_to_vector(col("embedding").cast("array<double>")))
    val fitOn =
      if (fitFraction >= 1.0) featurized
      else {
        val sampled = featurized.sample(withReplacement = false, fitFraction, 42L)
        if (sampled.limit(20 * k).count() < 20 * k) featurized else sampled
      }
    val model = new KMeans().setK(k).setSeed(42L).setMaxIter(10)
      .fit(fitOn)
    val assigned = model.transform(featurized)
      .select(col("vec_id"), col("embedding"),
        col("prediction").as("cell"))
    Index(model.clusterCenters.map(_.toArray), assigned)
  }

  /** Persist an index: the cell table partitioned by cell id (so probes
    * are partition-pruned) plus the k centroids. */
  def writeIndex(index: Index, path: String): Unit = {
    index.assigned.write.mode("overwrite")
      .partitionBy("cell").parquet(s"$path/cells")
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Load a persisted index; `assigned` reads the partitioned cell
    * table, so cell filters prune at the file level. */
  def readIndex(spark: SparkSession, path: String): Index = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)
    Index(centroids, spark.read.parquet(s"$path/cells"))
  }

  // one persisted index per (indexRoot, corpus dir) per JVM — queries
  // share it instead of re-fitting. Keyed by BOTH root and dir so an
  // explicit cluster root (distributed FS) is never shadowed by an
  // earlier default-root build; the on-disk name is a SHA-256 prefix
  // of the dir (String.hashCode collisions would cross-contaminate
  // two corpora's indexes)
  private val indexPaths = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The persisted index for a corpus dir: built + written on first
    * use (sampled fit), read from the partitioned parquet after.
    * `indexRoot` may be any Hadoop-FS path (local tmp by default; a
    * distributed FS on a cluster). */
  def persistedIndex(spark: SparkSession, dir: String,
      indexRoot: String = sys.props("java.io.tmpdir") + "/graft_ivf"): Index = {
    val path = indexPaths.computeIfAbsent(s"$indexRoot|$dir", _ => {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(dir.getBytes("UTF-8")).take(8)
        .map(b => f"${b & 0xff}%02x").mkString
      val p = s"$indexRoot/$digest"
      writeIndex(build(Tables.embeddings(spark, dir), fitFraction = 0.25), p)
      p
    })
    readIndex(spark, path)
  }

  /** Query: rank cells by centroid distance (driver-side — k tiny),
    * probe the nProbe nearest, exact cosine re-rank inside them. */
  def search(index: Index, queryVec: Array[Float], topK: Int,
      nProbe: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(index.assigned.sparkSession)
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

  /** Query entry: cell sizes from the PERSISTED index (first call
    * builds it; steady state is a pruned parquet read, which is the
    * honest per-query cost of an IVF system). */
  def cellSummary(spark: SparkSession, dir: String): DataFrame = {
    val idx = persistedIndex(spark, dir)
    idx.assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("min_vec_id"))
      .orderBy(col("cell"))
  }
}
