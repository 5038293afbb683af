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
  *  - lshTopK: the scale path — banded random-hyperplane (sign) LSH
  *    buckets the data once per band; queries probe their bucket in every
  *    band (OR-amplification). Recall<1 by design (measured vs bruteTopK
  *    in PipelineSpec); re-rank within candidates is exact.
  *  - cosineDupPairs: near-dup pair mining, LSH-bucketed candidates +
  *    exact rational-threshold fixed-point verify.
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

  /** Banded sign-LSH top-k: `bands` independent hash tables of
    * `rowsPerBand` deterministic hyperplanes each (sign_lsh_buckets);
    * candidates = data points sharing ANY band bucket with the query
    * (OR-amplification: recall per neighbor = 1-(1-p^rows)^bands at
    * per-plane agreement p = 1-θ/π), exact fixed-point re-rank.
    * Returns the bruteTopK shape with approximate recall; a query whose
    * buckets are all empty yields < k (or zero) rows by design.
    * bands=1 degenerates to the single-table probe. */
  def lshTopK(queries: DataFrame, qId: String, qVec: String,
              data: DataFrame, dId: String, dVec: String,
              k: Int, bands: Int = 4, rowsPerBand: Int = 8,
              probeHamming: Int = 2): DataFrame = {
    F.ensureRegistered(queries.sparkSession)
    val d = data.select(col(dId).as("neighbor_id"), col(dVec).as("dv"))
      .select(col("neighbor_id"), col("dv"),
        posexplode(F.sign_lsh_buckets(col("dv"), bands, rowsPerBand)).as(Seq("band_i", "bucket")))
    // multi-probe: each query also probes every bucket within hamming
    // distance `probeHamming` of its own (flip-mask XOR). The data side is
    // indexed ONCE; only the small broadcast query side fans out
    // (sum_{h<=probe} C(rows,h) keys per band), trading query fan-out for
    // recall instead of replicating the corpus into more tables.
    val probeMasks = (0 until (1 << rowsPerBand))
      .filter(m => java.lang.Integer.bitCount(m) <= probeHamming)
      .map(_.toLong)
    val q = broadcast(queries.select(col(qId).as("query_id"), col(qVec).as("qv"))
      .select(col("query_id"), col("qv"),
        posexplode(F.sign_lsh_buckets(col("qv"), bands, rowsPerBand)).as(Seq("band_i", "bucket0")))
      .withColumn("bucket",
        explode(array(probeMasks.map(m => col("bucket0").bitwiseXOR(lit(m))): _*)))
      .drop("bucket0"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    d.join(q, Seq("band_i", "bucket"), "inner")
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "qv", "neighbor_id", "dv")
      .dropDuplicates("query_id", "neighbor_id") // same pair may share several bands
      .withColumn("score", fixedDot("qv", "dv"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** Embedding near-duplicate pairs with an EXACT rational cosine
    * threshold cos >= num/den: banded sign-LSH candidate generation (a
    * bucketed equi-join — never all-pairs) + exact integer fixed-point
    * verify (dot > 0 AND den²·dot² >= num²·|a|²·|b|², all in BIGINT), so
    * the surviving pair set is bit-reproducible by a SQL oracle.
    * Recall is 1-(1-p^rows)^bands per qualifying pair; at near-duplicate
    * thresholds (num/den >= 0.8) and the defaults (8 bands × 8 rows) the
    * miss probability per pair is < 1e-8 at cos 0.999 — verified exactly
    * vs brute force in PipelineSpec on the synthetic corpus.
    * Overflow bound: |element|·scale ≤ ~46k keeps den²·dot² within Long
    * for dim 64 (defaults: elements in [-2,2], scale 1000 ⇒ dot ≤ 2.6e8,
    * 25·dot² ≤ 1.7e18 < 2^63). The bound is ENFORCED at runtime: any
    * candidate whose fixed-point magnitudes leave the exact-Long envelope
    * raises (assert_true) instead of silently wrapping. */
  def cosineDupPairs(data: DataFrame, dId: String, dVec: String,
                     minCosNum: Long, minCosDen: Long, fixedScale: Int = 1000,
                     bands: Int = 8, rowsPerBand: Int = 8): DataFrame = {
    require(minCosNum > 0 && minCosDen >= minCosNum,
      s"cosineDupPairs: need 0 < num/den <= 1; got $minCosNum/$minCosDen")
    F.ensureRegistered(data.sparkSession)
    val d = data.select(col(dId).as("id"), col(dVec).as("v"))
    val keyed = d.select(col("id"),
      posexplode(F.sign_lsh_buckets(col("v"), bands, rowsPerBand)).as(Seq("band_i", "bucket")))
    val cand = keyed.select(col("band_i"), col("bucket"), col("id").as("id_a"))
      .join(keyed.select(col("band_i"), col("bucket"), col("id").as("id_b")),
        Seq("band_i", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // vector payloads join back by id (shuffle joins; candidates are the
    // small side after LSH pruning — AQE broadcasts when genuinely small)
    val va = d.select(col("id").as("id_a"), col("v").as("va"))
    val vb = d.select(col("id").as("id_b"), col("v").as("vb"))
    def fdot(a: String, b: String) = F.fixed_dot(col(a), col(b), fixedScale)
    // Overflow-SAFE exact comparison: regroup dot²·den² >= na2·nb2·num² as
    // (dot·den)² >= (na2·num)·(nb2·num), guarded by the TIGHT no-wrap
    // conditions (any input that would actually wrap raises; anything the
    // regrouped arithmetic evaluates exactly passes): |dot·den| must fit
    // under sqrt(Long.Max) for its square; each RHS factor must not wrap;
    // and the RHS product is checked pairwise (a·b wraps iff a > Max/b for
    // positive a, b in truncated division) — a one-sided large norm with a
    // small partner stays exactly representable and is NOT rejected.
    val maxSafe = 3037000499L // floor(sqrt(2^63 - 1))
    val rhsB = col("nb2") * lit(minCosNum)
    val overflow =
      abs(col("dot_fp")) > lit(maxSafe / minCosDen) ||
        col("na2") > lit(Long.MaxValue / minCosNum) ||
        col("nb2") > lit(Long.MaxValue / minCosNum) ||
        (rhsB > lit(0L) && col("na2") * lit(minCosNum) > lit(Long.MaxValue) / rhsB)
    cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("dot_fp", fdot("va", "vb"))
      .withColumn("na2", fdot("va", "va"))
      .withColumn("nb2", fdot("vb", "vb"))
      .where(assert_true(!overflow, lit(
        s"cosineDupPairs: fixed-point magnitudes would wrap Long in the exact " +
          s"comparison (threshold $minCosNum/$minCosDen) — lower fixedScale")).isNull &&
        col("dot_fp") > 0 &&
        (col("dot_fp") * lit(minCosDen)) * (col("dot_fp") * lit(minCosDen)) >=
          (col("na2") * lit(minCosNum)) * (col("nb2") * lit(minCosNum)))
      .select("id_a", "id_b", "dot_fp")
  }
}
