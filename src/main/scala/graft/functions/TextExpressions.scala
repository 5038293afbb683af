package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
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
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextCore.fingerprint(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TextCore.fingerprint($c.toString())")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "fingerprint64"
}

/** mix64(x) → long: the bare SplitMix64 finalizer over a BIGINT — the
  * integer-keyed member of the engine's deterministic hash family (the
  * string hashes above run the same mix after their polynomial fold).
  * Used where a per-row uniform must derive from a numeric id with an
  * oracle-replayable bit pattern (the HUGEINT mix64 chain in
  * OracleHashSql replays it mod 2^64). */
case class Mix64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextCore.mix64(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TextCore.mix64($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "mix64"
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

/** sign_lsh_buckets(vec, bands, rowsPerBand) → array<long> of length
  * `bands`: banded random-hyperplane (sign) LSH keys. Plane p's weight for
  * dimension i is a deterministic pseudo-uniform in (-0.5, 0.5] derived
  * from SplitMix64 (same stream family as the engine's other hashing), so
  * buckets are identical across executors, runs, and partitionings. Band b
  * packs the sign bits of planes [b*rows, (b+1)*rows) into one long; a
  * candidate join ORs over bands (any shared band ⇒ candidate), giving
  * 1-(1-p^rows)^bands recall per pair at per-plane agreement p = 1-θ/π. */
case class SignLshBuckets(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // weight table lazily built once per (planes, dim) — bands/rows are
  // literals in practice so this caches across rows within a task
  @transient private var wPlanes = -1
  @transient private var wDim = -1
  @transient private var wTab: Array[Double] = _
  private def weights(planes: Int, dim: Int): Array[Double] = {
    if (wTab == null || wPlanes != planes || wDim != dim) {
      val t = new Array[Double](planes * dim)
      var p = 0
      while (p < planes) {
        var i = 0
        while (i < dim) {
          t(p * dim + i) =
            (graft.core.TextCore.mix64(p.toLong * 131071 + i) % 1000L).toDouble / 1000.0 - 0.5 + 0.0005
          i += 1
        }
        p += 1
      }
      wPlanes = planes; wDim = dim; wTab = t
    }
    wTab
  }
  override def nullSafeEval(v0: Any, b0: Any, r0: Any): Any = {
    val v = v0.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
    val bands = b0.asInstanceOf[Int]
    val rows = r0.asInstanceOf[Int]
    val w = weights(bands * rows, v.length)
    val out = new Array[Long](bands)
    var band = 0
    while (band < bands) {
      var key = 0L
      var r = 0
      while (r < rows) {
        val base = (band * rows + r) * v.length
        var dot = 0.0
        var i = 0
        while (i < v.length) { dot += v(i) * w(base + i); i += 1 }
        if (dot >= 0) key |= (1L << r)
        r += 1
      }
      out(band) = key
      band += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression): Expression =
    copy(a, b, c)
  override def prettyName: String = "sign_lsh_buckets"
}

/** OGR feature-style-string parsing (reference: ogr/ogrfeaturestyle.cpp
  * :: OGRStyleMgr/OGRStyleTool — the PEN/BRUSH/SYMBOL/LABEL mini-language
  * attached to features as `TOOL(key:value,...)`). style_tool extracts
  * the tool name; style_params returns the (k,v) pairs in source order
  * (array<struct<k,v>>, pairs with posexplode). Values keep everything
  * after the first ':' (so LABEL t:"a:b" survives) with ONE pair of
  * surrounding double quotes stripped, and top-level commas inside
  * quotes do not split — the reference's own tokenizer rules. */
case class StyleTool(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val i = s.indexOf('(')
    if (i <= 0 || !s.trim.endsWith(")")) null
    else UTF8String.fromString(s.substring(0, i).trim.toUpperCase)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "style_tool"
}

case class StyleParams(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("k", StringType, nullable = false),
    StructField("v", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString.trim
    val open = s.indexOf('(')
    if (open <= 0 || !s.endsWith(")")) return null
    val body = s.substring(open + 1, s.length - 1)
    // split top-level commas (quotes guard), then k:v at the FIRST colon
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    body.foreach {
      case '"' => inQ = !inQ; cur += '"'
      case ',' if !inQ => parts += cur.result(); cur.clear()
      case ch => cur += ch
    }
    if (cur.nonEmpty) parts += cur.result()
    val rows = parts.filter(_.trim.nonEmpty).map { p =>
      val c = p.indexOf(':')
      val (k, raw) = if (c < 0) (p.trim, "") else (p.substring(0, c).trim, p.substring(c + 1).trim)
      val vv = if (raw.length >= 2 && raw.head == '"' && raw.last == '"')
        raw.substring(1, raw.length - 1) else raw
      org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(k.toLowerCase), UTF8String.fromString(vv))
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(rows.toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "style_params"
}

/** csv_line(array<string>) → string: one CSV record in the OGR CSV
  * driver's dialect (reference: ogr/ogrsf_frmts/csv/ogrcsvlayer.cpp ::
  * OGRCSVLayer::ICreateFeature via port/cpl_string CSLT quoting, RFC
  * 4180): a field is double-quoted iff it contains a comma, a double
  * quote, or a line break; embedded quotes double. No trailing
  * newline — the record separator belongs to the file sink. */
case class CsvLine(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val sb = new StringBuilder
    var i = 0
    while (i < arr.numElements()) {
      if (i > 0) sb += ','
      val f = arr.getUTF8String(i).toString
      if (f.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r')) {
        sb += '"'
        f.foreach { c => if (c == '"') sb ++= "\"\"" else sb += c }
        sb += '"'
      } else sb ++= f
      i += 1
    }
    UTF8String.fromString(sb.result())
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "csv_line"
}

/** csv_fields(string) → array<string>: the matching quote-aware record
  * splitter (reference: port/cpl_string.cpp :: CSLTokenizeString2 with
  * CSLT_HONOURSTRINGS, as the CSV layer reader uses it): commas split
  * only outside quotes; a quoted field drops its delimiting quotes and
  * collapses doubled quotes. Unterminated quotes run to end-of-record
  * (reader tolerance). */
case class CsvFields(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val out = Array.newBuilder[Any]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < s.length && s.charAt(i + 1) == '"') { cur += '"'; i += 1 }
          else inQ = false
        } else cur += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += UTF8String.fromString(cur.result()); cur.clear()
        case ch  => cur += ch
      }
      i += 1
    }
    out += UTF8String.fromString(cur.result())
    new GenericArrayData(out.result())
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "csv_fields"
}

/** vrt_feature(line; VRT config and CSV header fixed at plan time) →
  * array<string> [layerName, mapped fields…, wkt]: the OGR VRT layer
  * applied to one CSV record (core/OgrVrt — reference ogr/ogrsf_frmts/
  * vrt/ogrvrtlayer.cpp :: OGRVRTLayer with encoding="PointFromColumns").
  * Config XML parses once per plan (the dbf_fields eager-literal
  * pattern); per row only the quote-aware split + index shuffle run. */
case class VrtFeature(child: Expression, cfgXml: String, headerStr: String)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val cfg = graft.core.OgrVrt.parse(cfgXml)
  @transient private lazy val header = headerStr.split(",", -1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val rec = graft.core.OgrVrt.csvSplit(v.asInstanceOf[UTF8String].toString)
    val out = graft.core.OgrVrt.feature(cfg, header, rec)
    new GenericArrayData(out.map(UTF8String.fromString).toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(c, cfgXml, headerStr)
  override def prettyName: String = "vrt_feature"
}

/** ogr_parse_date(s) → struct(y,m,d,hh,mi,ss_milli,tz): the OGR datetime
  * field scanner (core/OgrDate — reference ogr/ogrutils.cpp ::
  * OGRParseDate) with the TZFlag encoding (100 = GMT, ±15-minute steps). */
case class OgrParseDate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("y", IntegerType, nullable = false),
    StructField("m", IntegerType, nullable = false),
    StructField("d", IntegerType, nullable = false),
    StructField("hh", IntegerType, nullable = false),
    StructField("mi", IntegerType, nullable = false),
    StructField("ss_milli", IntegerType, nullable = false),
    StructField("tz", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val p = graft.core.OgrDate.parse(v.asInstanceOf[UTF8String].toString)
    InternalRow(p.y, p.m, p.d, p.hh, p.mi, p.ssMilli, p.tzFlag)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "ogr_parse_date"
}

/** hash64(text) → long: TextCore's base-31 polynomial + mix64 word hash
  * as a standalone scalar — the primitive the hashing-trick featurizer
  * (q188) keys dimensions and signs from. Same hash the shingle/minhash
  * family uses internally, so the oracle replay already exists. */
case class Hash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextCore.hash64(v.asInstanceOf[UTF8String].toString)
  // static-call codegen keeps the surrounding projection inside
  // whole-stage codegen (feature hashing is the hot inner loop of the
  // q220/q239 classifier family)
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.TextCore.hash64($c.toString())")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "hash64"
}

/** shingles64(text, k) → array<long>: the DISTINCT word-k-shingle hash
  * set (TextCore.wordShingles — the same set minhash_sig permutes), as
  * data. This is the raw currency of the decontamination semi-join:
  * 8 bytes per shingle, never the text. */
case class Shingles64(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(t: Any, k0: Any): Any = {
    val sh = TextCore.wordShingles(t.asInstanceOf[UTF8String].toString,
      k0.asInstanceOf[Int])
    new GenericArrayData(sh)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
  override def prettyName: String = "shingles64"
}
