package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{ArrayDot, ArrayMath, VectorAgg}

/** Lloyd's k-means over the vector table + IVF-style ANN on top of it —
  * the centroid-bucketed index the reference ecosystem uses for ANN (its
  * IVF implementations moved to cuVS; the primitives remain: pairwise
  * distance + argmin + reduce_rows_by_key, SURVEY §2.4/§2.5).
  *
  * Distributed shape: centroids are k×d driver-side literals broadcast into
  * a codegen'd argmin expression (k·d multiply-adds per row, no shuffle);
  * the update step is one reduce_rows_by_key shuffle carrying k×d partials.
  * Deterministic: init = first k rows by id, fixed iteration count.
  */
object ClusterOps {

  private def centroidLit(c: Array[Double]): Column =
    array(c.map(lit(_)): _*)

  /** (−2·v·c + ‖c‖², clusterId) structs; array_min picks the nearest
    * centroid with lowest-id tie-break (‖v‖² is constant per row). */
  private def nearestExpr(centroids: Array[Array[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val cNorm = c.map(x => x * x).sum
      struct((ArrayDot.dot(col("vec"), centroidLit(c)) * -2.0 + cNorm).as("s"),
        lit(i).as("c"))
    }
    array_min(array(scored: _*)).getField("c")
  }

  /** Probe list: the `nprobe` nearest centroid ids, ascending by distance. */
  private def probesExpr(centroids: Array[Array[Double]], nprobe: Int): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val cNorm = c.map(x => x * x).sum
      struct((ArrayDot.dot(col("vec"), centroidLit(c)) * -2.0 + cNorm).as("s"),
        lit(i).as("c"))
    }
    slice(transform(array_sort(array(scored: _*)), s => s.getField("c")), 1, nprobe)
  }

  /** Lloyd's k-means; returns (assignments (id, vec, cluster), centroids).
    * Empty clusters keep their previous centroid. */
  def kmeans(vectors: DataFrame, k: Int, iters: Int): (DataFrame, Array[Array[Double]]) = {
    var centroids = vectors.where(col("id") < k).orderBy(col("id"))
      .select(col("vec")).collect().map(_.getSeq[Double](0).toArray)
    for (_ <- 0 until iters) {
      val sums = vectors
        .select(nearestExpr(centroids).as("cluster"), col("vec"))
        .groupBy(col("cluster"))
        .agg(VectorAgg.vectorSum(col("vec")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        val c = r.getInt(0)
        val s = r.getSeq[Double](1)
        val n = r.getLong(2).toDouble
        next(c) = s.map(_ / n).toArray
      }
      centroids = next
    }
    (vectors.select(col("id"), col("vec"), nearestExpr(centroids).as("cluster")), centroids)
  }

  /** Within-cluster sum of squares (inertia) for given assignments. */
  def inertia(assigned: DataFrame, centroids: Array[Array[Double]]): Double = {
    val withDist = assigned.select(
      (ArrayMath.foldSum(col("vec"), x => x * x)
        + element_at(array(centroids.map(c => lit(c.map(x => x * x).sum)): _*),
          col("cluster") + 1)
        - ArrayDot.dot(col("vec"),
          element_at(array(centroids.map(centroidLit): _*), col("cluster") + 1)) * 2.0)
        .as("d2"))
    withDist.agg(sum(col("d2"))).head().getDouble(0)
  }

  /** IVF ANN: nlist k-means cells, queries probe the nprobe nearest cells,
    * exact cosine top-k within candidates. The candidate join is an
    * equi-join on cell id — each query touches nprobe/nlist of the corpus.
    */
  def ivfTopK(vectors: DataFrame, nQueries: Int, topK: Int, nlist: Int = 16,
      nprobe: Int = 4, iters: Int = 5): DataFrame = {
    val (assigned, centroids) = kmeans(vectors, nlist, iters)
    val corpus = assigned.select(col("id").as("nid"), col("vec").as("nv"),
      col("cluster"))
    val queries = vectors.where(col("id") < nQueries)
      .select(col("id").as("qid"), col("vec").as("qv"),
        explode(probesExpr(centroids, nprobe)).as("cluster"))
    val scored = queries.join(corpus, Seq("cluster"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), ArrayMath.cosine(col("qv"), col("nv")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= topK)
      .select(col("qid"), col("nid"), round(col("cos"), 4).as("cos"), col("rnk"))
  }
}
