package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.F

/** Fixed-length SEQUENCE PACKING for LLM pretraining — the public
  * "concat-then-chunk" law (GPT-2/3-style pipelines: tokenized documents
  * are concatenated in a deterministic shuffle order and sliced into
  * training sequences of exactly `seqLen` tokens; a document may straddle
  * sequence boundaries, in which case it contributes to several
  * consecutive sequences).
  *
  * The deterministic shuffle order is (fingerprint64(text), doc_id) — a
  * content-derived total order, so the packing is reproducible from the
  * corpus alone (re-running on a re-ingested copy of the data packs
  * identically; ingest order never leaks into the training stream).
  *
  * The global running offset — the sequential-looking part — is the
  * classic TWO-PHASE DISTRIBUTED SCAN, never a single-partition window:
  *
  *  1. range-partition by the shuffle key: global order ACROSS partitions,
  *     each partition holds a contiguous key range;
  *  2. per-partition local cumulative sums (window keyed by the physical
  *     partition id — the only window in the plan, and it is keyed, so
  *     every partition sorts independently);
  *  3. per-partition totals: ONE bounded collect of numPartitions rows,
  *     prefix-summed on the driver, rejoined as a literal map lookup.
  *
  * Offsets are INVARIANT to the partition count and to range-boundary
  * sampling (any boundaries that preserve the total order yield the same
  * global prefix sums), so output is bit-stable at any parallelism — the
  * property the 7-core probe checks. At 100 TB the collect is
  * O(partitions) longs and the data makes exactly two exchanges (range +
  * pid window).
  */
object Pack {

  def pack(docs: DataFrame, idCol: String, textCol: String,
           seqLen: Long): DataFrame = {
    require(seqLen > 0, s"pack: seqLen must be positive, got $seqLen")
    F.ensureRegistered(docs.sparkSession)
    // ws_tokens law shared with q29: whitespace tokens of the normalized
    // text (>= 1 for any text, so n_seqs below is always well-defined)
    val d = docs.select(col(idCol).as("doc_id"),
      expr(s"fingerprint64($textCol)").as("fp"),
      size(split(trim(lower(regexp_replace(col(textCol), "\\s+", " "))), " "))
        .cast("long").as("n_tokens"))
    val parts = d.repartitionByRange(col("fp"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
    val w = Window.partitionBy("pid").orderBy("fp", "doc_id")
    val local = parts
      .withColumn("run", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // phase 3: per-partition totals — bounded collect (numPartitions rows)
    val totals = local.groupBy("pid").agg(sum("n_tokens").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val prefix = totals.map { case (p, t) => val r = (p, acc); acc += t; r }
    val prefixMap = map_from_arrays(
      array(prefix.map(p => lit(p._1)).toIndexedSeq: _*),
      array(prefix.map(p => lit(p._2)).toIndexedSeq: _*))
    local
      .withColumn("offset", element_at(prefixMap, col("pid")) + col("run"))
      .withColumn("seq_id", floor(col("offset") / lit(seqLen)))
      .withColumn("n_seqs",
        floor((col("offset") + col("n_tokens") - 1) / lit(seqLen))
          - col("seq_id") + 1)
      .select("doc_id", "n_tokens", "offset", "seq_id", "n_seqs")
  }
}
