package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.F

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>). Two paths:
  *
  *  - bruteTopK: exact top-k by fixed-point dot product. The query side is
  *    broadcast; the data side never shuffles (map-side score + per-query
  *    top-k via window). Scores are computed in integer fixed point
  *    (floor(x*1e6) per element, summed as BIGINT) so ranking is exact,
  *    order-independent, and bit-reproducible by a SQL oracle.
  *  - lshTopK: the scale path — random-hyperplane (sign) LSH buckets the
  *    data once; queries probe only their bucket. Recall<1 by design;
  *    re-rank within bucket is exact.
  */
object Ann {

  private def fixedDot(a: String, b: String) =
    F.fixed_dot(col(a), col(b), 1000000)

  /** Exact top-k neighbors (by fixed-point dot product, ties → smaller
    * data id first) for each query row. */
  def bruteTopK(queries: DataFrame, qId: String, qVec: String,
                data: DataFrame, dId: String, dVec: String, k: Int): DataFrame = {
    F.ensureRegistered(queries.sparkSession)
    val q = broadcast(queries.select(col(qId).as("query_id"), col(qVec).as("qv")))
    val d = data.select(col(dId).as("neighbor_id"), col(dVec).as("dv"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    d.crossJoin(q)
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", fixedDot("qv", "dv"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Sign-LSH bucketed top-k: `planes` deterministic hyperplanes (from
    * SplitMix64 streams), bucket = sign-bit key; exact re-rank in-bucket.
    * Returns same shape as bruteTopK but with approximate recall. */
  def lshTopK(queries: DataFrame, qId: String, qVec: String,
              data: DataFrame, dId: String, dVec: String,
              k: Int, planes: Int = 8, dim: Int = 64): DataFrame = {
    F.ensureRegistered(queries.sparkSession)
    // plane p, dim i weight: deterministic pseudo-gaussian from mix64 via
    // centered uniform sum; expressed in SQL for codegen
    def bucketOf(vec: String) = {
      val bits = (0 until planes).map { p =>
        // dot(v, plane_p) sign bit, plane weights from a fixed hash grid
        val dot = (0 until dim).map { i =>
          val wgt = (graft.core.TextCore.mix64(p.toLong * 131071 + i) % 1000L).toDouble / 1000.0 - 0.5 + 0.0005
          s"(CAST(element_at($vec, ${i + 1}) AS DOUBLE) * $wgt)"
        }.mkString(" + ")
        s"(CASE WHEN ($dot) >= 0 THEN ${1L << p}L ELSE 0L END)"
      }.mkString(" + ")
      expr(bits)
    }
    val d = data.select(col(dId).as("neighbor_id"), col(dVec).as("dv"))
      .withColumn("bucket", bucketOf("dv"))
    val q = broadcast(queries.select(col(qId).as("query_id"), col(qVec).as("qv"))
      .withColumn("bucket", bucketOf("qv")))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    d.join(q, Seq("bucket"), "inner")
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", fixedDot("qv", "dv"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Embedding near-duplicate pairs: cosine >= minCos via brute pairing
    * (exact; use lsh buckets at scale). */
  def cosineDupPairs(data: DataFrame, dId: String, dVec: String,
                     minCos: Double): DataFrame = {
    F.ensureRegistered(data.sparkSession)
    val a = data.select(col(dId).as("id_a"), col(dVec).as("va"))
    val b = data.select(col(dId).as("id_b"), col(dVec).as("vb"))
    a.crossJoin(broadcast(b))
      .where(col("id_a") < col("id_b"))
      .withColumn("cos", F.cosine_sim(col("va"), col("vb")))
      .where(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
  }
}
