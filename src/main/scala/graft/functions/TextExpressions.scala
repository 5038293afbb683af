package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.core.TextCore

/** Text-pipeline expressions for the training-data operators (dedup,
  * near-dup, language-ID, quality, fingerprinting). Pure functions over
  * StringType; all hashing is SplitMix64-based (TextCore) — deterministic
  * across JVMs and partitionings. */

/** minhash_sig(text, num_perm, shingle_k) → array<long> word-shingle
  * MinHash signature. */
case class MinhashSig(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any, np: Any, k: Any): Any = {
    val sh = TextCore.wordShingles(t.asInstanceOf[UTF8String].toString, k.asInstanceOf[Int])
    new GenericArrayData(TextCore.minhash(sh, np.asInstanceOf[Int]))
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(a, b, c)
  override def prettyName: String = "minhash_sig"
}

/** lsh_bands(sig, bands, rows) → array<long> band keys. */
case class LshBands(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(sig0: Any, b0: Any, r0: Any): Any = {
    val arr = sig0.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    new GenericArrayData(TextCore.lshBands(arr, b0.asInstanceOf[Int], r0.asInstanceOf[Int]))
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(a, b, c)
  override def prettyName: String = "lsh_bands"
}

case class Simhash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextCore.simhash64(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "simhash64"
}

case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextCore.hamming64(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  override def prettyName: String = "hamming64"
}

/** jaccard_shingles(a, b, k): exact word-k-shingle Jaccard — the verify
  * step after LSH candidate generation. */
case class JaccardShingles(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any, k0: Any): Any = {
    val k = k0.asInstanceOf[Int]
    TextCore.jaccard(
      TextCore.wordShingles(a.asInstanceOf[UTF8String].toString, k),
      TextCore.wordShingles(b.asInstanceOf[UTF8String].toString, k))
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(a, b, c)
  override def prettyName: String = "jaccard_shingles"
}

case class LangId(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(TextCore.langId(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "lang_id"
}

case class QualityScore(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    TextCore.qualityScore(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "quality_score"
}

case class Fingerprint64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextCore.fingerprint(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "fingerprint64"
}

/** cosine_sim(a, b) over array<float> embeddings (sequential fold,
  * deterministic order). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a0: Any, b0: Any): Any = {
    val a = a0.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray()
    val b = b0.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  override def prettyName: String = "cosine_sim"
}

/** checksum_px(pixels array<double>) — the reference's golden raster
  * comparator as a scalar over an assembled tile
  * (reference: alg/gdalchecksum.cpp :: GDALChecksumImage). */
case class ChecksumPx(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any = {
    val px = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
    graft.core.Checksum.checksum(px, px.length, 1)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "checksum_px"
}

/** fixed_dot(a: array<double>, b: array<double>, scale: int) → bigint:
  * Σ floor(a_i·scale)·floor(b_i·scale). The exact-integer dot product the
  * ANN/near-dup operators rank by — native (one tight loop) instead of
  * interpreted zip_with/aggregate higher-order functions, ~10× on the
  * 64-dim embedding benchmarks, and bit-identical to the SQL oracle. */
case class FixedDot(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(a0: Any, b0: Any, s0: Any): Any = {
    val a = a0.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = b0.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val scale = s0.asInstanceOf[Int].toDouble
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += math.floor(a.getDouble(i) * scale).toLong *
        math.floor(b.getDouble(i) * scale).toLong
      i += 1
    }
    sum
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(a, b, c)
  override def prettyName: String = "fixed_dot"
}
