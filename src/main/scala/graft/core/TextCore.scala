package graft.core

/** Text-pipeline primitives for the training-data operators: shingling,
  * MinHash, SimHash, n-gram Jaccard, token counting, language scoring,
  * quality scoring, rolling fingerprints. Pure Scala (no Spark), shared by
  * the Catalyst expressions and the scalar test oracles.
  *
  * Hash family: SplitMix64 finalizer (public-domain constant set from
  * Steele et al., "Fast Splittable Pseudorandom Number Generators") — fully
  * deterministic, platform-independent, no dependency on JVM string
  * hashing.
  */
object TextCore {

  /** SplitMix64 finalizer — avalanching 64-bit mix. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic 64-bit polynomial hash of a string (base 31, mixed). */
  def hash64(s: String): Long = {
    var h = 1125899906842597L // prime
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    mix64(h)
  }

  /** Normalize: lowercase, collapse whitespace runs to single space, trim. */
  def normalize(s: String): String =
    s.toLowerCase.replaceAll("\\s+", " ").trim

  /** Whitespace tokens of the normalized text. */
  def tokens(s: String): Array[String] = {
    val n = normalize(s)
    if (n.isEmpty) Array.empty else n.split(" ")
  }

  /** Word k-shingles as 64-bit hashes (distinct). */
  def wordShingles(s: String, k: Int): Array[Long] = {
    val ts = tokens(s)
    if (ts.length < k) {
      if (ts.isEmpty) Array.empty else Array(hash64(ts.mkString(" ")))
    } else {
      val set = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i + k <= ts.length) {
        set.add(hash64(ts.slice(i, i + k).mkString(" ")))
        i += 1
      }
      val out = new Array[Long](set.size)
      val it = set.iterator(); var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      out
    }
  }

  /** Character k-grams of the normalized text (distinct strings). */
  def charNgrams(s: String, k: Int): Set[String] = {
    val n = normalize(s)
    if (n.length < k) (if (n.isEmpty) Set.empty else Set(n))
    else (0 to n.length - k).map(i => n.substring(i, i + k)).toSet
  }

  /** MinHash signature of numPerm permutations over shingle hashes.
    * Permutation i: h_i(x) = mix64(x + GOLDEN*i) — a distinct avalanche per
    * slot; min over the shingle set. Empty set → Long.MaxValue slots. */
  def minhash(shingles: Array[Long], numPerm: Int): Array[Long] = {
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      var p = 0
      while (p < numPerm) {
        val h = mix64(shingles(i) + 0x9e3779b97f4a7c15L * (p + 1))
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band keys: signature split into `bands` bands of `rows` each,
    * each band hashed to one Long key (band index folded in). */
  def lshBands(sig: Array[Long], bands: Int, rows: Int): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong + 0x51ed2701L
      var r = 0
      while (r < rows) { h = mix64(h ^ sig(b * rows + r)); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** SimHash64 over word-unigram hashes (unweighted). */
  def simhash64(s: String): Long = {
    val ts = tokens(s)
    val counts = new Array[Int](64)
    var i = 0
    while (i < ts.length) {
      val h = hash64(ts(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Exact Jaccard over two sorted-distinct long arrays. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    var i = 0; var j = 0; var inter = 0L
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    val union = a.length.toLong + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union.toDouble
  }

  /** Rolling polynomial fingerprint of normalized text, base 257 modulo
    * 2^61-1 (Mersenne): SQL-reproducible integer arithmetic. */
  final val FpMod = 2305843009213693951L // 2^61 - 1
  def fingerprint(s: String): Long = {
    val n = normalize(s)
    var h = 0L
    var i = 0
    while (i < n.length) {
      h = (mulMod61(h, 257L) + n.charAt(i)) % FpMod
      i += 1
    }
    h
  }

  /** (a*b) mod (2^61-1) via 128-bit product; a,b < 2^61. Uses
    * 2^61 ≡ 1 (mod M): fold the product's high bits back in. */
  def mulMod61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // product = hi*2^64 + lo
    val lo = a * b
    var r = ((hi << 3) | (lo >>> 61)) + (lo & FpMod)
    while (r >= FpMod) r -= FpMod
    r
  }

  /** Language-ID n-gram/stopword heuristic. Deliberately simple and
    * SQL-expressible (the DuckDB oracle replicates the same scoring):
    * count language-marker tokens; argmax with fixed priority on ties.
    * Markers chosen from high-frequency function words. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "und", "die", "nicht", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScores(s: String): Map[String, Int] = {
    val ts = tokens(s)
    LangMarkers.map { case (lang, markers) =>
      lang -> ts.count(markers.contains)
    }.toMap
  }

  /** argmax over langScores; ties → order of LangMarkers; all-zero → "und". */
  def langId(s: String): String = {
    val scores = langScores(s)
    val best = LangMarkers.map(_._1).maxBy(scores)
    if (scores(best) == 0) "und" else best
  }

  /** Quality score in [0,1]: mean of three ratio features (SQL-expressible):
    * len_ok      = 1 if 20 <= n_chars <= 2000 else 0
    * alpha_ratio = alphabetic+space chars / chars
    * word_len_ok = 1 if mean token length in [2, 12] else 0           */
  def qualityScore(s: String): Double = {
    val n = normalize(s)
    if (n.isEmpty) return 0.0
    val lenOk = if (n.length >= 20 && n.length <= 2000) 1.0 else 0.0
    var alpha = 0
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      // [a-z ] only (not Character.isLetter) so a SQL oracle's
      // regexp_replace '[^a-z ]' reproduces the count exactly
      if ((c >= 'a' && c <= 'z') || c == ' ') alpha += 1
      i += 1
    }
    val alphaRatio = alpha.toDouble / n.length
    val ts = tokens(s)
    val meanLen = ts.map(_.length).sum.toDouble / ts.length
    val wordOk = if (meanLen >= 2.0 && meanLen <= 12.0) 1.0 else 0.0
    (lenOk + alphaRatio + wordOk) / 3.0
  }
}
