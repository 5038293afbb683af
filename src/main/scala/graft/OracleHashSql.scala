package graft

/** DuckDB SQL generators replicating graft.core.TextCore's 64-bit hashing
  * (SplitMix64 mix, polynomial hash64, MinHash/LSH banding, SimHash) and
  * the sign-LSH ANN path in exact wrapping-u64 arithmetic, so the driver's
  * DuckDB oracle can score the hash-dependent queries (q24/q25/q45) that
  * were previously rows-only.
  *
  * Representation: every 64-bit value is a non-negative HUGEINT in
  * [0, 2^64). Multiplication splits the left operand into 32-bit halves so
  * no intermediate exceeds HUGEINT range; xor operates directly on the
  * (non-negative, < 2^64) HUGEINTs; Java's SIGNED long comparisons (the
  * MinHash min) map to unsigned order after flipping the top bit
  * (u XOR 2^63 == (u + 2^63) mod 2^64). Java's sign-preserving `%` matches
  * DuckDB's `%` on the signed reconstruction. Validated bit-exact against
  * TextCore on the sf0.01 corpus.
  */
object OracleHashSql {
  private final val M = "18446744073709551616"     // 2^64
  private final val Half = "9223372036854775808"    // 2^63
  private final val Gold = "11400714819323198485"   // 0x9e3779b97f4a7c15
  private final val C1 = "13787848793156543929"     // 0xbf58476d1ce4e5b9
  private final val C2 = "10723151780598845931"     // 0x94d049bb133111eb

  // unique lambda variable names: nested mix64 calls must not shadow each
  // other's bindings inside DuckDB's list_transform lambdas
  private var ctr = 0
  private def sym(p: String): String = { ctr += 1; s"__$p$ctr" }

  /** Single-use let-binding via a one-element list_transform lambda. */
  private def let(bind: String)(body: String => String): String = {
    val v = sym("v")
    s"list_transform([$bind], $v -> ${body(v)})[1]"
  }

  /** (a * c) mod 2^64, a and c in [0, 2^64): split a into 32-bit halves so
    * partial products stay below 2^96 (HUGEINT-safe). */
  private def mulmod(a: String, c: String): String =
    let(a) { v =>
      s"(($v % 4294967296) * $c + " +
        s"(($v // 4294967296) * ($c % 4294967296) % 4294967296) * 4294967296) % $M"
    }

  /** TextCore.mix64: SplitMix64 finalizer. `//` on non-negative HUGEINT is
    * the unsigned right shift. */
  def mix64(x: String): String =
    let(s"(($x) + $Gold) % $M") { z1 =>
      let(mulmod(s"xor($z1, $z1 // 1073741824)", C1)) { z2 =>        // >>> 30
        let(mulmod(s"xor($z2, $z2 // 134217728)", C2)) { z3 =>       // >>> 27
          s"xor($z3, $z3 // 2147483648)"                             // >>> 31
        }
      }
    }

  /** TextCore.hash64: base-31 polynomial over UTF-16 units, then mix64.
    * unicode(char) == Java charAt for BMP text (the synth corpus). */
  def hash64(s: String): String = {
    val sv = sym("s"); val iv = sym("i"); val hv = sym("h"); val cv = sym("c")
    val codes = s"list_transform(range(1, length($sv)+1), " +
      s"$iv -> unicode(substring($sv, $iv, 1))::HUGEINT)"
    val red = s"list_reduce(list_prepend(1125899906842597::HUGEINT, $codes), " +
      s"($hv, $cv) -> (31*$hv + $cv) % $M)"
    s"list_transform([$s], $sv -> ${mix64(red)})[1]"
  }

  /** Signed order ⇄ unsigned order: flip the top bit. */
  private def flip(u: String): String = s"(($u) + $Half) % $M"

  private def toSigned(u: String): String =
    s"(CASE WHEN ($u) >= $Half THEN ($u) - $M ELSE ($u) END)"

  /** q24: MinHash(64 perms, 16 bands × 4 rows, word 3-shingles) LSH
    * candidates + exact-Jaccard >= 0.3, j_micro = floor(j*1e6). */
  def q24MinhashLsh: String =
    s"""
WITH $minhashCtes
SELECT id_a, id_b, CAST(floor(j * 1000000) AS BIGINT) AS j_micro
FROM jac WHERE j >= 0.3
"""

  /** q169: connected components over the q24 near-dup pair graph —
    * cluster_id = min doc id reachable, is_keeper = (self = min). The
    * recursive walk CTE is the exact fixpoint the engine's min-label
    * propagation converges to. */
  def q169Clusters: String =
    s"""
WITH RECURSIVE $minhashCtes,
pairs AS (SELECT id_a, id_b FROM jac WHERE j >= 0.3),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
walk(src, node) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT w.src, e.b FROM walk w JOIN edges e ON w.node = e.a)
SELECT src AS doc_id, min(node) AS cluster_id,
  CAST(CASE WHEN min(node) = src THEN 1 ELSE 0 END AS INTEGER) AS is_keeper
FROM walk GROUP BY src
"""

  /** Shared k-means CTE chain (q170/q171): quantize floor((x+2)·2^20) →
    * init = 8 smallest vec_ids → 2 Lloyd iterations (assign by exact
    * BIGINT squared-L2, ties → smaller centroid; update = sum // count,
    * emptied cluster keeps its previous centroid) → final assignment.
    * Replays operators/Ann.kmeans step for step. */
  private def kmeansAssign(name: String, cents: String): String =
    s"""d_$name AS (
  SELECT q.vec_id, q.qv, c.c,
    list_sum(list_transform(range(1, 65), __i ->
      (q.qv[__i] - c.cv[__i]) * (q.qv[__i] - c.cv[__i]))) AS d2
  FROM q, $cents c),
$name AS (
  SELECT vec_id, qv, c, d2,
    row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
  FROM d_$name)"""

  private def kmeansUpdate(prev: String, asg: String, out: String): String =
    s"""u_$out AS (
  SELECT a.c, i.i, CAST(sum(a.qv[i.i]) // count(*) AS BIGINT) AS v
  FROM $asg a, (SELECT unnest(range(1, 65)) AS i) i
  WHERE a.rn = 1 GROUP BY a.c, i.i),
$out AS (
  SELECT p.c, coalesce(n.cv, p.cv) AS cv
  FROM $prev p LEFT JOIN
    (SELECT c, list(v ORDER BY i) AS cv FROM u_$out GROUP BY c) n
    ON n.c = p.c)"""

  private def kmeansCtes: String =
    s"""q AS (
  SELECT vec_id, list_transform(embedding, __x ->
    CAST(floor((CAST(__x AS DOUBLE) + 2.0) * 1048576.0) AS BIGINT)) AS qv
  FROM embeddings),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c, qv AS cv
  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 8) s),
${kmeansAssign("a1", "c0")},
${kmeansUpdate("c0", "a1", "c1")},
${kmeansAssign("a2", "c1")},
${kmeansUpdate("c1", "a2", "c2")},
${kmeansAssign("af", "c2")}"""

  /** kmeansAssign/kmeansUpdate generalized over the source table and
    * dimension (the q170 pair hardcodes `q`/range(1,65)) — one chain per
    * PQ subspace. */
  private def pqAssign(name: String, cents: String, qtab: String, dimP1: Int): String =
    s"""d_$name AS (
  SELECT q.vec_id, q.qv, c.c,
    list_sum(list_transform(range(1, $dimP1), __i ->
      (q.qv[__i] - c.cv[__i]) * (q.qv[__i] - c.cv[__i]))) AS d2
  FROM $qtab q, $cents c),
$name AS (
  SELECT vec_id, qv, c, d2,
    row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
  FROM d_$name)"""

  private def pqUpdate(prev: String, asg: String, out: String, dimP1: Int): String =
    s"""u_$out AS (
  SELECT a.c, i.i, CAST(sum(a.qv[i.i]) // count(*) AS BIGINT) AS v
  FROM $asg a, (SELECT unnest(range(1, $dimP1)) AS i) i
  WHERE a.rn = 1 GROUP BY a.c, i.i),
$out AS (
  SELECT p.c, coalesce(n.cv, p.cv) AS cv
  FROM $prev p LEFT JOIN
    (SELECT c, list(v ORDER BY i) AS cv FROM u_$out GROUP BY c) n
    ON n.c = p.c)"""

  /** q181: product quantization — 4 subspaces × 16 dims, k = 8 per
    * codebook, 2 Lloyd iterations each (the q170 law per subspace);
    * pq_code = base-8 digit pack of the 4 sub-assignments. */
  def q181Pq: String = {
    val chains = (0 until 4).map { s =>
      val off = s * 16
      s"""qs$s AS (SELECT vec_id, list_slice(qv, ${off + 1}, ${off + 16}) AS qv FROM q),
cs${s}_0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c, qv AS cv
  FROM (SELECT vec_id, qv FROM qs$s ORDER BY vec_id LIMIT 8) t),
${pqAssign(s"as${s}_1", s"cs${s}_0", s"qs$s", 17)},
${pqUpdate(s"cs${s}_0", s"as${s}_1", s"cs${s}_1", 17)},
${pqAssign(s"as${s}_2", s"cs${s}_1", s"qs$s", 17)},
${pqUpdate(s"cs${s}_1", s"as${s}_2", s"cs${s}_2", 17)},
${pqAssign(s"as${s}_f", s"cs${s}_2", s"qs$s", 17)}"""
    }.mkString(",\n")
    val union = (0 until 4)
      .map(s => s"SELECT vec_id, ${Iterator.fill(s)(8L).product} AS w, c, d2 FROM as${s}_f WHERE rn = 1")
      .mkString("\n  UNION ALL ")
    s"""
WITH q AS (
  SELECT vec_id, list_transform(embedding, __x ->
    CAST(floor((CAST(__x AS DOUBLE) + 2.0) * 1048576.0) AS BIGINT)) AS qv
  FROM embeddings),
$chains,
allsub AS (
  $union)
SELECT vec_id,
  CAST(sum(c * w) AS BIGINT) AS pq_code,
  CAST(sum(d2) AS BIGINT) AS total_d2
FROM allsub GROUP BY 1
"""
  }

  /** q190: ExactSubstr repetition census — strided char-32-gram hashes
    * (the hash64 replay over substrings), >= 2-doc grams, per-doc counts;
    * zero-gram docs kept via LEFT joins. */
  def q190SubstrRep: String = {
    ctr = 0
    s"""
WITH d AS (
  SELECT doc_id,
    trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))) ||
      CASE WHEN doc_id % 10 = 0
      THEN ' call me ishmael some years ago never mind how long precisely'
      ELSE '' END AS norm
  FROM documents),
g0 AS (
  SELECT doc_id, norm,
    unnest(range(0, (length(norm) - 32) // 16 + 1)) AS kk
  FROM d WHERE length(norm) >= 32),
g AS (
  SELECT doc_id, ${hash64("substr(norm, CAST(kk*16 + 1 AS INT), 32)")} AS h
  FROM g0),
rep AS (
  SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd FROM g GROUP BY 1) s
  WHERE nd >= 2),
fl AS (
  SELECT g.doc_id, count(*) AS n_grams,
    sum(CASE WHEN r.h IS NOT NULL THEN 1 ELSE 0 END) AS n_repeated
  FROM g LEFT JOIN rep r ON r.h = g.h
  GROUP BY 1)
SELECT d.doc_id,
  CAST(coalesce(fl.n_grams, 0) AS BIGINT) AS n_grams,
  CAST(coalesce(fl.n_repeated, 0) AS BIGINT) AS n_repeated
FROM d LEFT JOIN fl ON fl.doc_id = d.doc_id
"""
  }

  /** q189: MIF driver — rebuild the ENTIRE geometry block text (keyword +
    * bare `x y` lines under the GeoJson.fmt contract) and the round-trip
    * vertex rows from the generating arithmetic. */
  def q189Mif: String = {
    def f(e: String): String =
      s"CASE WHEN ($e) = floor($e) THEN CAST(CAST(($e) AS BIGINT) AS VARCHAR) " +
        s"ELSE CAST(($e) AS VARCHAR) END"
    def pt(x: String, y: String): String = s"${f(x)} || ' ' || ${f(y)}"
    val nl = "chr(10)"
    s"""WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 1024 AS DOUBLE) / 4.0 AS ax,
    CAST((s_suppkey * 104729) % 512 AS DOUBLE) AS ay,
    1.0 + CAST(s_suppkey % 7 AS DOUBLE) / 2.0 AS w,
    2.0 + CAST(s_suppkey % 5 AS DOUBLE) AS h
  FROM supplier),
cc AS (
  SELECT q_id, ax, ay, ax + w AS x2, ay + h AS y2, ay + 2.0 * h AS y3,
    ax + 4.0*w AS sx2, ay + 4.0*h AS sy2,
    ax + w AS hx1, ay + h AS hy1, ax + 2.0*w AS hx2, ay + 2.0*h AS hy2
  FROM sp),
ks AS (
  SELECT q_id,
    CASE WHEN q_id % 4 = 0 THEN
      'POINT ' || ${pt("ax", "ay")}
    WHEN q_id % 4 = 1 THEN
      'PLINE 3' || $nl || ${pt("ax", "ay")} || $nl || ${pt("x2", "y2")} || $nl || ${pt("ax", "y3")}
    WHEN q_id % 4 = 2 THEN
      'PLINE MULTIPLE 2' || $nl || '2' || $nl || ${pt("ax", "ay")} || $nl || ${pt("x2", "y2")} ||
        $nl || '2' || $nl || ${pt("ax", "y2")} || $nl || ${pt("x2", "ay")}
    ELSE
      'REGION 2' || $nl || '5' || $nl ||
        ${pt("ax", "ay")} || $nl || ${pt("sx2", "ay")} || $nl || ${pt("sx2", "sy2")} || $nl ||
        ${pt("ax", "sy2")} || $nl || ${pt("ax", "ay")} || $nl || '5' || $nl ||
        ${pt("hx1", "hy1")} || $nl || ${pt("hx2", "hy1")} || $nl || ${pt("hx2", "hy2")} || $nl ||
        ${pt("hx1", "hy2")} || $nl || ${pt("hx1", "hy1")}
    END AS mif
  FROM cc),
vr AS (
  SELECT q_id, 0 AS seq, ax AS x, ay AS y FROM cc WHERE q_id % 4 = 0
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 1
  UNION ALL SELECT q_id, 1, x2, y2 FROM cc WHERE q_id % 4 = 1
  UNION ALL SELECT q_id, 2, ax, y3 FROM cc WHERE q_id % 4 = 1
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 1, x2, y2 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 2, ax, y2 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 3, x2, ay FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 1, sx2, ay FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 2, sx2, sy2 FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 3, ax, sy2 FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 4, ax, ay FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 5, hx1, hy1 FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 6, hx2, hy1 FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 7, hx2, hy2 FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 8, hx1, hy2 FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 9, hx1, hy1 FROM cc WHERE q_id % 4 = 3)
SELECT v.q_id, k.mif, CAST(v.seq AS BIGINT) AS seq, v.x, v.y
FROM vr v JOIN ks k ON k.q_id = v.q_id
"""
  }

  /** q203: DXF entity-block replica — group-code/value line pairs
    * rebuilt byte-for-byte (codes unpadded, layer 8/0, the engine's
    * pinned profile) plus the parsed-back vertex rows. */
  def q203Dxf: String = {
    def f(e: String): String =
      s"CASE WHEN ($e) = floor($e) THEN CAST(CAST(($e) AS BIGINT) AS VARCHAR) " +
        s"ELSE CAST(($e) AS VARCHAR) END"
    val nl = "chr(10)"
    def cv(code: String, value: String): String = s"'$code' || $nl || $value"
    def pt(x: String, y: String): String =
      s"${cv("10", f(x))} || $nl || ${cv("20", f(y))}"
    s"""WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 1024 AS DOUBLE) / 4.0 AS ax,
    CAST((s_suppkey * 104729) % 512 AS DOUBLE) AS ay,
    1.0 + CAST(s_suppkey % 7 AS DOUBLE) / 2.0 AS w,
    2.0 + CAST(s_suppkey % 5 AS DOUBLE) AS h
  FROM supplier),
cc AS (
  SELECT q_id, ax, ay, ax + w AS x2, ay + h AS y2,
    ay + 2.0*h AS y3, ay + 3.0*h AS y4,
    ax + 4.0*w AS sx2, ay + 4.0*h AS sy2
  FROM sp),
ks AS (
  SELECT q_id,
    CASE WHEN q_id % 4 = 0 THEN
      ${cv("0", "'POINT'")} || $nl || ${cv("8", "'0'")} || $nl || ${pt("ax", "ay")}
    WHEN q_id % 4 = 1 THEN
      ${cv("0", "'LINE'")} || $nl || ${cv("8", "'0'")} || $nl || ${pt("ax", "ay")} ||
        $nl || ${cv("11", f("x2"))} || $nl || ${cv("21", f("y2"))}
    WHEN q_id % 4 = 2 THEN
      ${cv("0", "'LWPOLYLINE'")} || $nl || ${cv("8", "'0'")} || $nl ||
        ${cv("90", "'4'")} || $nl || ${cv("70", "'0'")} || $nl ||
        ${pt("ax", "ay")} || $nl || ${pt("x2", "y2")} || $nl ||
        ${pt("ax", "y3")} || $nl || ${pt("x2", "y4")}
    ELSE
      ${cv("0", "'LWPOLYLINE'")} || $nl || ${cv("8", "'0'")} || $nl ||
        ${cv("90", "'4'")} || $nl || ${cv("70", "'1'")} || $nl ||
        ${pt("ax", "ay")} || $nl || ${pt("sx2", "ay")} || $nl ||
        ${pt("sx2", "sy2")} || $nl || ${pt("ax", "sy2")}
    END AS dxf
  FROM cc),
vr AS (
  SELECT q_id, 0 AS seq, ax AS x, ay AS y FROM cc WHERE q_id % 4 = 0
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 1
  UNION ALL SELECT q_id, 1, x2, y2 FROM cc WHERE q_id % 4 = 1
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 1, x2, y2 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 2, ax, y3 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 3, x2, y4 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 1, sx2, ay FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 2, sx2, sy2 FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 3, ax, sy2 FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 4, ax, ay FROM cc WHERE q_id % 4 = 3)
SELECT v.q_id, k.dxf, CAST(v.seq AS BIGINT) AS seq, v.x, v.y
FROM vr v JOIN ks k ON k.q_id = v.q_id
"""
  }

  /** q188: hashing-trick featurization — the engine's signed-tf law with
    * the unsigned hash64 replay: dim = u mod 32, sign = bit 5 of u (both
    * invariant under the signed/unsigned 2^64 congruence). */
  /** q195: DSIR importance resampling — replay the hashed-unigram
    * bucket models (target = lang 'en', raw = all), the exact-integer
    * div-1000 likelihood-ratio score, and the per-source top-quarter
    * keep rank. */
  def q195Dsir: String = {
    ctr = 0
    s"""
WITH toks AS (
  SELECT doc_id, source, lang,
    unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
  FROM documents),
t2 AS (SELECT doc_id, source, lang, term FROM toks WHERE term <> ''),
h AS (SELECT doc_id, source, lang,
        ((${hash64("term")} % 4096) + 4096) % 4096 AS b FROM t2),
model AS (SELECT b, count(*) AS raw_cnt,
            count(*) FILTER (WHERE lang = 'en') AS tgt_cnt
          FROM h GROUP BY 1),
dtf AS (SELECT doc_id, source, b, count(*) AS tf FROM h GROUP BY 1, 2, 3),
sc AS (SELECT doc_id, source,
         sum(tf * ((1000 * (m.tgt_cnt + 1)) // (m.raw_cnt + 1))) AS score
       FROM dtf JOIN model m USING (b) GROUP BY 1, 2),
rk AS (SELECT doc_id, source, score,
         row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS nsrc
       FROM sc)
SELECT doc_id, CAST(score AS BIGINT) AS score,
  CAST(CASE WHEN rn <= (nsrc + 3) // 4 THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM rk
"""
  }

  def q188FeatureHash: String = {
    ctr = 0
    s"""
WITH toks AS (
  SELECT doc_id,
    unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
  FROM documents),
t2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t2 GROUP BY 1, 2),
h AS (SELECT doc_id, tf, ${hash64("term")} AS u FROM tf)
SELECT doc_id, CAST(u % 32 AS BIGINT) AS dim,
  CAST(sum(CASE WHEN (u // 32) % 2 = 0 THEN tf ELSE -tf END) AS BIGINT) AS val
FROM h GROUP BY 1, 2
"""
  }

  /** q222: T5 span corruption — deterministic one-span-per-segment
    * placement, sentinel input/target rebuild, signed hash64 grading. */
  def q222T5Spans: String = {
    ctr = 0
    val c = "((15 * n) // 100)"
    val nsp = s"greatest(1, $c // 3)"
    val lenS = s"($c // $nsp + CASE WHEN s < $c % $nsp THEN 1 ELSE 0 END)"
    val startS = s"(s * seg + (doc_id * 7919 + s * 104729) % (seg - $lenS + 1))"
    val s0 = "((i - 1) // seg)"
    val sp0 = s"sps[CAST($s0 + 1 AS INT)]"
    val inside = s"($s0 < len(sps) AND (i - 1) >= $sp0.st AND (i - 1) < $sp0.st + $sp0.ln)"
    val isStart = s"($s0 < len(sps) AND (i - 1) = $sp0.st)"
    val sAt = "sps[CAST(s + 1 AS INT)]"
    s"""
WITH d0 AS (
  SELECT doc_id,
    list_filter(string_split(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
      t -> t <> '') AS tk
  FROM documents),
d1 AS (
  SELECT doc_id, tk, n, n // $nsp AS seg
  FROM (SELECT doc_id, tk, len(tk) AS n FROM d0)),
sp AS (
  SELECT doc_id, tk, n, seg,
    CASE WHEN $c = 0 THEN CAST([] AS STRUCT(st BIGINT, ln BIGINT)[])
    ELSE list_transform(range(0, $nsp),
      s -> struct_pack(st := $startS, ln := $lenS)) END AS sps
  FROM d1),
txt AS (
  SELECT doc_id, CAST(n AS BIGINT) AS n_toks, CAST($c AS BIGINT) AS n_corrupt,
    CAST(len(sps) AS BIGINT) AS n_spans,
    CASE WHEN n = 0 THEN ''
    ELSE array_to_string(list_filter(list_transform(range(1, n + 1), i ->
      CASE WHEN $isStart THEN '<x' || CAST($s0 AS VARCHAR) || '>'
           WHEN $inside THEN ''
           ELSE tk[CAST(i AS INT)] END), x -> x <> ''), ' ') END AS inp,
    CASE WHEN len(sps) = 0 THEN ''
    ELSE array_to_string(flatten(list_transform(range(0, len(sps)), s ->
      ['<x' || CAST(s AS VARCHAR) || '>'] ||
      tk[CAST($sAt.st + 1 AS INT) : CAST($sAt.st + $sAt.ln AS INT)])), ' ') END AS tgt
  FROM sp)
SELECT doc_id, n_toks, n_corrupt, n_spans,
  CAST(${toSigned(hash64("inp"))} AS BIGINT) AS inp_fp,
  CAST(${toSigned(hash64("tgt"))} AS BIGINT) AS tgt_fp
FROM txt
"""
  }

  /** q220: fastText-style classifier inference — unigram+bigram features,
    * the q188 hashed-dim/sign law, literal weights (d·7919)%31−15, bias 3. */
  /** Shared q220/q239 fastText-margin CTE chain (unigram+bigram hashed
    * features → 32-dim signed tf vector → literal-weight dot). */
  private def classifierCtes: String =
    s"""d0 AS (
  SELECT doc_id,
    list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
      t -> t <> '') AS toks
  FROM documents),
fe AS (
  SELECT doc_id, unnest(toks ||
    CASE WHEN len(toks) >= 2
    THEN list_transform(range(1, len(toks)),
      i -> toks[CAST(i AS INT)] || '_' || toks[CAST(i AS INT) + 1])
    ELSE [] END) AS feat
  FROM d0),
tf AS (SELECT doc_id, feat, count(*) AS tf FROM fe GROUP BY 1, 2),
h AS (SELECT doc_id, tf, ${hash64("feat")} AS u FROM tf),
dv AS (
  SELECT doc_id, CAST(u % 32 AS BIGINT) AS dim,
    CAST(sum(CASE WHEN (u // 32) % 2 = 0 THEN tf ELSE -tf END) AS BIGINT) AS v
  FROM h GROUP BY 1, 2),
dt AS (
  SELECT doc_id, CAST(sum(v * ((dim * 7919) % 31 - 15)) AS BIGINT) AS dot,
    count(*) AS n_dims
  FROM dv GROUP BY 1)"""

  def q220QualityClassifier: String = {
    ctr = 0
    s"""
WITH ${classifierCtes}
SELECT d.doc_id, CAST(coalesce(t.n_dims, 0) AS BIGINT) AS n_dims,
  CAST(coalesce(t.dot, 0) + 3 AS BIGINT) AS margin,
  CAST(CASE WHEN coalesce(t.dot, 0) + 3 > 0 THEN 1 ELSE 0 END AS BIGINT) AS label
FROM documents d LEFT JOIN dt t ON t.doc_id = d.doc_id
"""
  }

  /** q239: DPO chosen/rejected pairing over the q220 margin law —
    * chosen = (margin desc, doc_id asc) rank 1 per prompt group,
    * rejected = (margin asc, doc_id asc) rank 1, emitted only when the
    * gap is strictly positive. */
  def q239DpoPairs: String = {
    ctr = 0
    s"""
WITH ${classifierCtes},
m AS (
  SELECT d.doc_id, d.doc_id % 32 AS g,
    CAST(coalesce(t.dot, 0) + 3 AS BIGINT) AS margin
  FROM documents d LEFT JOIN dt t ON t.doc_id = d.doc_id),
ch AS (SELECT g, doc_id AS chosen_id, margin AS cm,
    row_number() OVER (PARTITION BY g ORDER BY margin DESC, doc_id ASC) AS r
  FROM m),
rj AS (SELECT g, doc_id AS rejected_id, margin AS rm,
    row_number() OVER (PARTITION BY g ORDER BY margin ASC, doc_id ASC) AS r
  FROM m),
nc AS (SELECT g, count(*) AS n_cand FROM m GROUP BY 1)
SELECT ch.g, ch.chosen_id, rj.rejected_id,
  CAST(ch.cm - rj.rm AS BIGINT) AS gap, nc.n_cand
FROM ch
JOIN rj ON rj.g = ch.g AND rj.r = 1
JOIN nc ON nc.g = ch.g
WHERE ch.r = 1 AND ch.cm > rj.rm
"""
  }

  /** q186: image dHash near-dup — replay the 56-bit difference hash from
    * the z3 synth pixel law ((tx·131+ty·173+x·7+y·11+3) mod 256), then the
    * 5-chunk pigeonhole candidate join and exact popcount verify at
    * hamming <= 4 (the q25 machinery at 56 bits). */
  def q186Dhash: String = {
    val nChunks = 5
    val widths = Array.tabulate(nChunks)(i => 56 / nChunks + (if (i < 56 % nChunks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _).init
    val chunkRows = (0 until nChunks).map { i =>
      s"($i, ${1L << offsets(i)}::BIGINT, ${1L << widths(i)}::BIGINT)"
    }.mkString(", ")
    val pows = (0 until 56).map(b => (1L << b).toString + "::BIGINT")
      .mkString("[", ",", "]")
    s"""
WITH imgs AS (
  SELECT gx.x AS tx, gy.y AS ty, gy.y * 16 + gx.x AS img_id
  FROM generate_series(0, 15) gx(x), generate_series(0, 7) gy(y)),
blk AS (
  SELECT img_id,
    list_transform(range(0, 64), b -> CAST(list_sum(list_transform(range(0, 64), j ->
      (tx*131 + ty*173 + ((b % 8)*8 + (j % 8))*7 + ((b // 8)*8 + (j // 8))*11 + 3) % 256
    )) // 64 AS BIGINT)) AS blocks
  FROM imgs),
hs AS (
  SELECT img_id, CAST(list_sum(list_transform(range(0, 56), k ->
    CASE WHEN blocks[CAST((k // 7)*8 + (k % 7) + 2 AS INT)]
              > blocks[CAST((k // 7)*8 + (k % 7) + 1 AS INT)]
         THEN ($pows)[k + 1] ELSE 0::BIGINT END)) AS BIGINT) AS dhash
  FROM blk),
chunked AS (
  SELECT img_id, dhash, c.ci AS chunk_i, (dhash // c.dv) % c.md AS chunk
  FROM hs, (VALUES $chunkRows) AS c(ci, dv, md)),
cand AS (
  SELECT DISTINCT a.img_id AS id_a, b.img_id AS id_b, a.dhash AS h_a, b.dhash AS h_b
  FROM chunked a JOIN chunked b
    ON a.chunk_i = b.chunk_i AND a.chunk = b.chunk AND a.img_id < b.img_id)
SELECT id_a, id_b, CAST(bit_count(xor(h_a, h_b)::UBIGINT) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(h_a, h_b)::UBIGINT) <= 4
"""
  }

  /** q182: SemDedup — the q170 kmeans chain over q43's derived twin corpus,
    * then within-cluster pair mining with the q43 exact rational cosine law
    * (25·dot² >= 16·na2·nb2 == den²·dot² >= num²·na2·nb2 at 4/5) and the
    * smaller-id keeper verdict. */
  def q182SemDedup: String =
    s"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
pert AS (
  SELECT vec_id + 10000000 AS pid,
    list_transform(range(1, 65), i ->
      (floor(CAST(embedding[i] AS DOUBLE) * 1000.0) + ((vec_id * 31 + i) % 13) - 6) / 1000.0) AS v
  FROM embeddings),
u AS (SELECT vec_id, v FROM base UNION ALL SELECT pid AS vec_id, v FROM pert),
q AS (
  SELECT vec_id, list_transform(v, __x ->
    CAST(floor((__x + 2.0) * 1048576.0) AS BIGINT)) AS qv
  FROM u),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c, qv AS cv
  FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 8) s),
${kmeansAssign("a1", "c0")},
${kmeansUpdate("c0", "a1", "c1")},
${kmeansAssign("a2", "c1")},
${kmeansUpdate("c1", "a2", "c2")},
${kmeansAssign("af", "c2")},
m AS (
  SELECT u.vec_id, asg.c AS cluster, u.v
  FROM u JOIN (SELECT vec_id, c FROM af WHERE rn = 1) asg ON asg.vec_id = u.vec_id),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_sum(list_transform(range(1, 65), i ->
      CAST(floor(a.v[i]*1000.0) AS BIGINT) * CAST(floor(b.v[i]*1000.0) AS BIGINT))) AS dot_fp,
    list_sum(list_transform(range(1, 65), i ->
      CAST(floor(a.v[i]*1000.0) AS BIGINT) * CAST(floor(a.v[i]*1000.0) AS BIGINT))) AS na2,
    list_sum(list_transform(range(1, 65), i ->
      CAST(floor(b.v[i]*1000.0) AS BIGINT) * CAST(floor(b.v[i]*1000.0) AS BIGINT))) AS nb2
  FROM m a JOIN m b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
dd AS (SELECT DISTINCT id_b FROM p WHERE dot_fp > 0 AND 25*dot_fp*dot_fp >= 16*na2*nb2)
SELECT m.vec_id, CAST(m.cluster AS BIGINT) AS cluster,
  CAST(CASE WHEN d.id_b IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM m LEFT JOIN dd d ON d.id_b = m.vec_id
"""

  /** q170: final k-means assignment (vec_id, cluster, d2). */
  def q170Kmeans: String =
    s"""
WITH $kmeansCtes
SELECT vec_id, c AS cluster, CAST(d2 AS BIGINT) AS d2 FROM af WHERE rn = 1
"""

  /** q171: IVF top-5 — probe the 4 nearest coarse cells per query
    * (vec_id % 50 = 0), exact re-rank inside probed cells only. */
  def q171Ivf: String =
    s"""
WITH $kmeansCtes,
lists AS (SELECT vec_id AS neighbor_id, c AS cluster, qv FROM af WHERE rn = 1),
qry AS (SELECT vec_id AS query_id, qv FROM q WHERE vec_id % 50 = 0),
pc0 AS (
  SELECT y.query_id, y.qv, c.c,
    list_sum(list_transform(range(1, 65), __i ->
      (y.qv[__i] - c.cv[__i]) * (y.qv[__i] - c.cv[__i]))) AS cd2
  FROM qry y, c2 c),
pc AS (
  SELECT query_id, qv, c,
    row_number() OVER (PARTITION BY query_id ORDER BY cd2, c) AS prn
  FROM pc0),
cd AS (
  SELECT p.query_id, l.neighbor_id,
    list_sum(list_transform(range(1, 65), __i ->
      (p.qv[__i] - l.qv[__i]) * (p.qv[__i] - l.qv[__i]))) AS d2
  FROM (SELECT query_id, qv, c AS cluster FROM pc WHERE prn <= 4) p
  JOIN lists l ON l.cluster = p.cluster
  WHERE l.neighbor_id <> p.query_id),
rk AS (
  SELECT query_id, neighbor_id, d2,
    row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
  FROM cd)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
  CAST(d2 AS BIGINT) AS d2
FROM rk WHERE rank <= 5
"""

  /** The norm → toks → sh → sig → bandk → cand → jac CTE chain shared by
    * the q24 pair oracle and the q169 cluster oracle (same MinHash law). */
  private def minhashCtes: String = {
    ctr = 0
    val shingleHash = hash64("concat_ws(chr(32), ts[__w], ts[__w+1], ts[__w+2])")
    val shortHash = hash64("array_to_string(ts, chr(32))")
    val shExpr =
      "CASE WHEN len(ts) = 0 THEN CAST([] AS HUGEINT[]) " +
        s"WHEN len(ts) < 3 THEN [$shortHash] " +
        s"ELSE list_distinct(list_transform(range(1, len(ts)-1), __w -> $shingleHash)) END"
    // slot p: signed min over mix64(shingle + GOLD*(p+1)) via the flip trick
    val slot = flip(s"list_min(list_transform(sh, __x -> " +
      flip(mix64(s"(__x + (($Gold * (__p+1)) % $M)) % $M")) + "))")
    val sigExpr =
      s"CASE WHEN len(sh) = 0 THEN list_transform(range(0,64), __p -> 9223372036854775807::HUGEINT) " +
        s"ELSE list_transform(range(0,64), __p -> $slot) END"
    // band b: h = b + 0x51ed2701; 4 × (h = mix64(h xor sig[b*4+r]))
    var h = "(__b + 1374496513)::HUGEINT"
    for (r <- 0 until 4) h = mix64(s"xor($h, sig[__b*4 + ${r + 1}])")
    val bandsExpr = s"list_transform(range(0,16), __b -> $h)"
    s"""norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS n FROM documents),
toks AS (
  SELECT doc_id, CASE WHEN n = '' THEN CAST([] AS VARCHAR[]) ELSE string_split(n, ' ') END AS ts FROM norm),
sh AS (SELECT doc_id, $shExpr AS sh FROM toks),
sig AS (SELECT doc_id, sh, $sigExpr AS sig FROM sh),
bandk AS (SELECT doc_id, unnest($bandsExpr) AS band FROM sig),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandk a JOIN bandk b ON a.band = b.band AND a.doc_id < b.doc_id),
jac AS (
  SELECT c.id_a, c.id_b,
    CASE WHEN len(sa.sh) = 0 AND len(sb.sh) = 0 THEN 1.0
         ELSE len(list_intersect(sa.sh, sb.sh))::DOUBLE /
              (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE END AS j
  FROM cand c JOIN sh sa ON sa.doc_id = c.id_a JOIN sh sb ON sb.doc_id = c.id_b)"""
  }

  /** q25: SimHash64 (word-unigram, unweighted) + pigeonhole bucketing into
    * 7 chunks (maxHamming=6) + exact hamming <= 6. */
  def q25Simhash: String = {
    ctr = 0
    val widths = Array.tabulate(7)(i => 64 / 7 + (if (i < 64 % 7) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _).init
    val chunkRows = (0 until 7).map { i =>
      s"($i, ${java.math.BigInteger.TWO.pow(offsets(i))}::HUGEINT, " +
        s"${java.math.BigInteger.TWO.pow(widths(i))}::HUGEINT)"
    }.mkString(", ")
    val pows = (0 until 64).map(b =>
      java.math.BigInteger.TWO.pow(b).toString + "::HUGEINT").mkString("[", ",", "]")
    s"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS n FROM documents),
toks AS (
  SELECT doc_id, CASE WHEN n = '' THEN CAST([] AS VARCHAR[]) ELSE string_split(n, ' ') END AS ts FROM norm),
hs AS (SELECT doc_id, list_transform(ts, __t -> ${hash64("__t")}) AS hs FROM toks),
sims AS (
  SELECT doc_id, list_sum(list_transform(range(0,64), __b ->
    CASE WHEN 2 * len(list_filter(hs, __x -> (__x // ($pows)[__b+1]) % 2 = 1)) > len(hs)
         THEN ($pows)[__b+1] ELSE 0::HUGEINT END)) AS sim
  FROM hs),
chunked AS (
  SELECT doc_id, sim, c.ci AS chunk_i, (sim // c.dv) % c.md AS chunk
  FROM sims, (VALUES $chunkRows) AS c(ci, dv, md)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sim AS sim_a, b.sim AS sim_b
  FROM chunked a JOIN chunked b ON a.chunk_i = b.chunk_i AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST(bit_count(xor(sim_a, sim_b)::UBIGINT) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sim_a, sim_b)::UBIGINT) <= 6
"""
  }

  /** q45: banded sign-LSH top-k (4 bands × 8 planes, multi-probe hamming
    * <= 2) with the engine's deterministic SplitMix64-derived hyperplane
    * weights, exact fixed-point re-rank — the sequential double summation
    * of the plane dot product is replicated with list_reduce (IEEE order). */
  def q45AnnLsh: String = {
    ctr = 0
    val bands = 4; val rows = 8; val k = 5; val probe = 2
    val masks = (0 until (1 << rows))
      .filter(m => java.lang.Integer.bitCount(m) <= probe)
      .mkString("[", ",", "]")
    val w = s"(${toSigned(mix64("(__p*131071 + __i)::HUGEINT"))} % 1000) / 1000.0 - 0.5 + 0.0005"
    s"""
WITH wtab AS (
  SELECT __p AS p, list($w ORDER BY __i) AS ws
  FROM range(0, ${bands * rows}) t1(__p), range(0, 64) t2(__i) GROUP BY __p),
vecs AS (
  SELECT vec_id, list_transform(embedding, __x -> CAST(__x AS DOUBLE)) AS v FROM embeddings),
dots AS (
  SELECT vec_id, p, list_reduce(list_prepend(0.0::DOUBLE,
      list_transform(range(0,64), __i -> v[__i+1] * ws[__i+1])), (__a,__b) -> __a+__b) AS dot
  FROM vecs, wtab),
buckets AS (
  SELECT vec_id, p // $rows AS band_i,
    CAST(sum(CASE WHEN dot >= 0 THEN (1::BIGINT << (p % $rows)) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id, p // $rows),
qprobe AS (
  SELECT b.vec_id AS query_id, b.band_i, xor(b.bucket::UBIGINT, m.m::UBIGINT)::BIGINT AS bucket
  FROM buckets b, (SELECT unnest($masks) AS m) m
  WHERE b.vec_id % 50 = 0),
cand AS (
  SELECT DISTINCT q.query_id, d.vec_id AS neighbor_id
  FROM qprobe q JOIN buckets d ON q.band_i = d.band_i AND q.bucket = d.bucket
  WHERE d.vec_id <> q.query_id),
scored AS (
  SELECT c.query_id, c.neighbor_id,
    list_sum(list_transform(range(1,65), __i ->
      CAST(floor(qv.v[__i]*1000000.0) AS BIGINT) * CAST(floor(dv.v[__i]*1000000.0) AS BIGINT))) AS score
  FROM cand c JOIN vecs qv ON qv.vec_id = c.query_id JOIN vecs dv ON dv.vec_id = c.neighbor_id)
SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, CAST(score AS BIGINT) AS score FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
  FROM scored) WHERE rnk <= $k
"""
  }

  /** q73: per-point natural-zone UTM forward (6th-order Krüger,
    * core/Utm.forward) replicated op-for-op: identical IEEE arithmetic
    * order, constants embedded as the engine's exact runtime doubles
    * (Double.toString round-trips), hyperbolics expanded to exp — the only
    * divergence left is libm-vs-JVM transcendental ULPs, absorbed by the
    * centimeter quantization (floor(x*100 + 0.5) on BOTH sides). */
  def q73Utm(qptsSql: String): String = {
    val c1 = java.lang.Double.toString(graft.core.Utm.oracleC1)
    val kA = java.lang.Double.toString(graft.core.Utm.oracleKA)
    val a = graft.core.Utm.oracleAlpha.map(java.lang.Double.toString)
    def cosh(x: String): String = s"((exp($x) + exp(-($x))) / 2.0)"
    def sinh(x: String): String = s"((exp($x) - exp(-($x))) / 2.0)"
    // engine loop: xi += al(j)*sin(k*xip)*cosh(k*etap), j = 0..5 — the
    // left-assoc '+' chain below reproduces the summation order
    val xiSer = (0 until 6).map { j =>
      val k = s"${2.0 * (j + 1)}"
      s"(${a(j)} * sin($k * xip)) * ${cosh(s"$k * etap")}"
    }.mkString(" + ")
    val etaSer = (0 until 6).map { j =>
      val k = s"${2.0 * (j + 1)}"
      s"(${a(j)} * cos($k * xip)) * ${sinh(s"$k * etap")}"
    }.mkString(" + ")
    s"""
WITH qp AS ($qptsSql),
z AS (
  SELECT q_id, lon, lat,
    LEAST(60, CAST(floor((lon + 180.0) / 6.0) AS BIGINT) + 1) AS zone FROM qp),
base AS (
  SELECT q_id, lon, lat, zone,
    CASE WHEN lat >= 0 THEN 32600 + zone ELSE 32700 + zone END AS epsg,
    (lat / 180.0) * pi() AS phi,
    ((lon - (zone * 6 - 183)) / 180.0) * pi() AS lam
  FROM z),
s1 AS (SELECT *, sin(phi) AS sphi, cos(lam) AS cosl, sin(lam) AS sinl FROM base),
s2 AS (SELECT *,
    0.5 * ln((1.0 + sphi) / (1.0 - sphi))
      - $c1 * (0.5 * ln((1.0 + $c1 * sphi) / (1.0 - $c1 * sphi))) AS u
  FROM s1),
s3 AS (SELECT *, ${sinh("u")} AS t FROM s2),
s4 AS (SELECT *, atan2(t, cosl) AS xip, sinl / sqrt(t * t + cosl * cosl) AS xr FROM s3),
s5 AS (SELECT *,
    CASE WHEN xr < 0 THEN -(ln(abs(xr) + sqrt(xr * xr + 1.0)))
         ELSE ln(abs(xr) + sqrt(xr * xr + 1.0)) END AS etap
  FROM s4),
ser AS (SELECT *, xip + $xiSer AS xi, etap + $etaSer AS eta FROM s5),
fin AS (
  SELECT q_id, epsg,
    500000.0 + $kA * eta AS e,
    CASE WHEN lat >= 0 THEN 0.0 ELSE 10000000.0 END + $kA * xi AS nth
  FROM ser)
SELECT q_id, CAST(epsg AS INT) AS epsg,
  CAST(floor(e * 100.0 + 0.5) AS BIGINT) AS e_cm,
  CAST(floor(nth * 100.0 + 0.5) AS BIGINT) AS n_cm
FROM fin
"""
  }

  /** q76: per-row UTM inverse (beta/delta Krüger series, core/Utm.inverse)
    * replicated op-for-op under the q73 discipline: engine-exact runtime
    * constants as decimal literals, exp-expanded hyperbolics, the engine's
    * sequential -=/+= loops as left-assoc chains. Only transcendental
    * ULPs remain, absorbed by the 1e-6-degree quantization on BOTH sides. */
  def q76UtmInv: String = {
    val kA = java.lang.Double.toString(graft.core.Utm.oracleKA)
    val b = graft.core.Utm.oracleBeta.map(java.lang.Double.toString)
    val dl = graft.core.Utm.oracleDelta.map(java.lang.Double.toString)
    def cosh(x: String): String = s"((exp($x) + exp(-($x))) / 2.0)"
    def sinh(x: String): String = s"((exp($x) - exp(-($x))) / 2.0)"
    // engine: xip -= be(j)*sin(k*xi)*cosh(k*eta) — sequential -= is a
    // left-assoc subtraction chain starting from xi (likewise etap)
    val xipSer = (0 until 6).map { j =>
      val k = s"${2.0 * (j + 1)}"
      s"- (${b(j)} * sin($k * xi)) * ${cosh(s"$k * eta")}"
    }.mkString(" ")
    val etapSer = (0 until 6).map { j =>
      val k = s"${2.0 * (j + 1)}"
      s"- (${b(j)} * cos($k * xi)) * ${sinh(s"$k * eta")}"
    }.mkString(" ")
    val phiSer = (0 until 6).map { j =>
      val k = s"${2.0 * (j + 1)}"
      s"+ ${dl(j)} * sin($k * chi)"
    }.mkString(" ")
    s"""
WITH sp AS (SELECT s_suppkey AS q_id FROM supplier),
base AS (
  SELECT q_id, q_id % 60 + 1 AS zone, (q_id % 2 = 0) AS north,
    CAST(100000 + (q_id * 48271) % 800001 AS DOUBLE) AS e_m,
    (q_id * 16807) % 9000001 AS nr
  FROM sp),
x0 AS (
  SELECT q_id, zone, north,
    CASE WHEN north THEN 32600 + zone ELSE 32700 + zone END AS epsg,
    ((CASE WHEN north THEN CAST(nr AS DOUBLE) ELSE CAST(10000000 - nr AS DOUBLE) END)
      - CASE WHEN north THEN 0.0 ELSE 10000000.0 END) / $kA AS xi,
    (e_m - 500000.0) / $kA AS eta
  FROM base),
s1 AS (SELECT *, xi $xipSer AS xip, eta $etapSer AS etap FROM x0),
s2 AS (SELECT *, asin(sin(xip) / ${cosh("etap")}) AS chi FROM s1),
s3 AS (SELECT *, chi $phiSer AS phi, atan2(${sinh("etap")}, cos(xip)) AS lam FROM s2),
fin AS (
  SELECT q_id, epsg,
    (zone * 6.0 - 183.0) + ((lam * 180.0) / pi()) AS lon,
    (phi * 180.0) / pi() AS lat
  FROM s3)
SELECT q_id, CAST(epsg AS INT) AS epsg,
  CAST(floor(lon * 1000000.0 + 0.5) AS BIGINT) AS lon_e6,
  CAST(floor(lat * 1000000.0 + 0.5) AS BIGINT) AS lat_e6
FROM fin
"""
  }

  /** q248: generalized Gauss-Krüger round trip — the q73 forward series
    * AND the q76 inverse series chained in one statement, with the TM
    * parameters (lon0 = 3°-band center, k0 = 1 so kA collapses to the
    * rectifying radius A, zone-encoded false easting z·10⁶+500000)
    * replacing the UTM constants. The inverse leg consumes the forward
    * leg's UNQUANTIZED doubles exactly as the engine does; cm / 1e-6-deg
    * quantization absorbs the transcendental ULP gaps at both exits (the
    * round-trip legs use offset 0.3, not 0.5 — the k/1024° input grid
    * puts x·10⁶+0.5 exactly ON floor boundaries, see the query). */
  def q248GaussKruger(qptsSql: String): String = {
    val c1 = java.lang.Double.toString(graft.core.Utm.oracleC1)
    val rA = java.lang.Double.toString(graft.core.Utm.oracleRectA)
    val a = graft.core.Utm.oracleAlpha.map(java.lang.Double.toString)
    val b = graft.core.Utm.oracleBeta.map(java.lang.Double.toString)
    val dl = graft.core.Utm.oracleDelta.map(java.lang.Double.toString)
    def cosh(x: String): String = s"((exp($x) + exp(-($x))) / 2.0)"
    def sinh(x: String): String = s"((exp($x) - exp(-($x))) / 2.0)"
    val xiSer = (0 until 6).map { j =>
      val k = s"${2.0 * (j + 1)}"
      s"(${a(j)} * sin($k * xip)) * ${cosh(s"$k * etap")}"
    }.mkString(" + ")
    val etaSer = (0 until 6).map { j =>
      val k = s"${2.0 * (j + 1)}"
      s"(${a(j)} * cos($k * xip)) * ${sinh(s"$k * etap")}"
    }.mkString(" + ")
    val xipSer = (0 until 6).map { j =>
      val k = s"${2.0 * (j + 1)}"
      s"- (${b(j)} * sin($k * ixi)) * ${cosh(s"$k * ieta")}"
    }.mkString(" ")
    val etapSer = (0 until 6).map { j =>
      val k = s"${2.0 * (j + 1)}"
      s"- (${b(j)} * cos($k * ixi)) * ${sinh(s"$k * ieta")}"
    }.mkString(" ")
    val phiSer = (0 until 6).map { j =>
      val k = s"${2.0 * (j + 1)}"
      s"+ ${dl(j)} * sin($k * chi)"
    }.mkString(" ")
    s"""
WITH qp AS ($qptsSql),
z AS (
  SELECT q_id, lon, lat,
    LEAST(119, GREATEST(0, CAST(floor((lon + 180.0) / 3.0) AS BIGINT))) AS zone
  FROM qp),
base AS (
  SELECT q_id, lon, lat, zone,
    CAST(zone AS DOUBLE) * 3.0 - 178.5 AS lon0,
    CAST(zone AS DOUBLE) * 1000000.0 + 500000.0 AS e0,
    (lat / 180.0) * pi() AS phi0
  FROM z),
bl AS (SELECT *, ((lon - lon0) / 180.0) * pi() AS lam FROM base),
s1 AS (SELECT *, sin(phi0) AS sphi, cos(lam) AS cosl, sin(lam) AS sinl FROM bl),
s2 AS (SELECT *,
    0.5 * ln((1.0 + sphi) / (1.0 - sphi))
      - $c1 * (0.5 * ln((1.0 + $c1 * sphi) / (1.0 - $c1 * sphi))) AS u
  FROM s1),
s3 AS (SELECT *, ${sinh("u")} AS t FROM s2),
s4 AS (SELECT *, atan2(t, cosl) AS xip, sinl / sqrt(t * t + cosl * cosl) AS xr FROM s3),
s5 AS (SELECT *,
    CASE WHEN xr < 0 THEN -(ln(abs(xr) + sqrt(xr * xr + 1.0)))
         ELSE ln(abs(xr) + sqrt(xr * xr + 1.0)) END AS etap
  FROM s4),
fw AS (SELECT q_id, zone, lon0, e0,
    e0 + $rA * (etap + $etaSer) AS e,
    0.0 + $rA * (xip + $xiSer) AS nth
  FROM s5),
x0 AS (
  SELECT q_id, zone, lon0, e, nth,
    (nth - 0.0) / $rA AS ixi,
    (e - e0) / $rA AS ieta
  FROM fw),
i1 AS (SELECT *, ixi $xipSer AS xip, ieta $etapSer AS ietap FROM x0),
i2 AS (SELECT *, asin(sin(xip) / ${cosh("ietap")}) AS chi FROM i1),
i3 AS (SELECT *, chi $phiSer AS phi, atan2(${sinh("ietap")}, cos(xip)) AS lam FROM i2),
fin AS (
  SELECT q_id, zone, e, nth,
    lon0 + ((lam * 180.0) / pi()) AS lon_b,
    (phi * 180.0) / pi() AS lat_b
  FROM i3)
SELECT q_id, zone,
  CAST(floor(e * 100.0 + 0.5) AS BIGINT) AS e_cm,
  CAST(floor(nth * 100.0 + 0.5) AS BIGINT) AS n_cm,
  CAST(floor(lon_b * 1000000.0 + 0.3) AS BIGINT) AS lon_udeg,
  CAST(floor(lat_b * 1000000.0 + 0.3) AS BIGINT) AS lat_udeg
FROM fin
"""
  }

  /** q249: per-point Albers Equal-Area forward (Snyder/EPSG-9822,
    * core/Albers.forward) replicated op-for-op under the q80 discipline:
    * derived constants (n, C, ρ0) embedded as the engine's exact runtime
    * doubles, identical IEEE op order — only transcendental ULPs remain,
    * absorbed by the cm quantization. Both supported CRS are GRS80, so
    * e / e² are single shared literals. */
  def q249Albers(qptsSql: String): String = {
    val c1 = graft.core.Albers.crs5070; val c2 = graft.core.Albers.crs3577
    def d(x: Double): String = java.lang.Double.toString(x)
    val e = d(c1.e); val e2 = d(c1.e2)
    s"""
WITH qp AS ($qptsSql),
c AS (
  SELECT q_id, lon, lat,
    CASE WHEN q_id % 2 = 0 THEN 5070 ELSE 3577 END AS epsg,
    CASE WHEN q_id % 2 = 0 THEN ${d(c1.n)} ELSE ${d(c2.n)} END AS cn,
    CASE WHEN q_id % 2 = 0 THEN ${d(c1.bigC)} ELSE ${d(c2.bigC)} END AS cc,
    CASE WHEN q_id % 2 = 0 THEN ${d(c1.rho0)} ELSE ${d(c2.rho0)} END AS rho0,
    CASE WHEN q_id % 2 = 0 THEN -96.0 ELSE 132.0 END AS lon0
  FROM qp),
w AS (
  SELECT *, CASE WHEN lon - lon0 > 180.0 THEN lon - lon0 - 360.0
                 WHEN lon - lon0 < -180.0 THEN lon - lon0 + 360.0
                 ELSE lon - lon0 END AS lamd FROM c),
s1 AS (SELECT *, (lat / 180.0) * pi() AS phi, (lamd / 180.0) * pi() AS lam FROM w),
s2 AS (SELECT *, sin(phi) AS sphi FROM s1),
s3 AS (SELECT *,
    (1.0 - $e2) * (sphi / (1.0 - $e2 * sphi * sphi)
      - (1.0 / (2.0 * $e)) * ln((1.0 - $e * sphi) / (1.0 + $e * sphi))) AS q
  FROM s2),
s4 AS (SELECT *, 6378137.0 * sqrt(cc - cn * q) / cn AS rho, cn * lam AS th FROM s3),
fin AS (
  SELECT q_id, epsg,
    rho * sin(th) AS e_m,
    rho0 - rho * cos(th) AS n_m
  FROM s4)
SELECT q_id, CAST(epsg AS INT) AS epsg,
  CAST(floor(e_m * 100.0 + 0.5) AS BIGINT) AS e_cm,
  CAST(floor(n_m * 100.0 + 0.5) AS BIGINT) AS n_cm
FROM fin
"""
  }

  /** q250: per-row Albers Equal-Area inverse (core/Albers.inverse) —
    * asin(q′/2) seed then the Snyder 3-16 Newton step unrolled to the
    * engine's exact 6 iterations (each a (sin, 1−e²s²) CTE feeding the
    * update, so the shared subexpressions evaluate once per step exactly
    * like the engine's locals); n<0 (EPSG:3577) flips both atan2 args via
    * the embedded sgn literal. 1e-6-degree quantization (q81 trick). */
  def q250AlbersInv: String = {
    val c1 = graft.core.Albers.crs5070; val c2 = graft.core.Albers.crs3577
    def d(x: Double): String = java.lang.Double.toString(x)
    val e = d(c1.e); val e2 = d(c1.e2)
    def step(k: Int): String = {
      val p = s"p${k - 1}"
      s"""g$k AS (SELECT *, sin($p) AS s$k FROM ${if (k == 1) "i0" else s"i${k - 1}"}),
h$k AS (SELECT *, 1.0 - $e2 * s$k * s$k AS om$k FROM g$k),
i$k AS (SELECT *, $p + (om$k * om$k) / (2.0 * cos($p)) *
    (qp / (1.0 - $e2) - s$k / om$k
      + (1.0 / (2.0 * $e)) * ln((1.0 - $e * s$k) / (1.0 + $e * s$k))) AS p$k FROM h$k)"""
    }
    s"""
WITH sp AS (SELECT s_suppkey AS q_id FROM supplier),
c AS (
  SELECT q_id,
    CASE WHEN q_id % 2 = 0 THEN 5070 ELSE 3577 END AS epsg,
    CASE WHEN q_id % 2 = 0 THEN ${d(c1.n)} ELSE ${d(c2.n)} END AS cn,
    CASE WHEN q_id % 2 = 0 THEN ${d(c1.bigC)} ELSE ${d(c2.bigC)} END AS cc,
    CASE WHEN q_id % 2 = 0 THEN ${d(c1.rho0)} ELSE ${d(c2.rho0)} END AS rho0,
    CASE WHEN q_id % 2 = 0 THEN -96.0 ELSE 132.0 END AS lon0,
    CASE WHEN q_id % 2 = 0 THEN 1.0 ELSE -1.0 END AS sgn
  FROM sp),
b AS (
  SELECT *,
    CAST((q_id * 69621) % 2000001 AS DOUBLE) - 1000000.0 AS e_m,
    CAST((q_id * 40692) % 3000001 AS DOUBLE) - 1500000.0 AS n_m
  FROM c),
x0 AS (SELECT *, e_m AS dx, rho0 - n_m AS dy FROM b),
r1 AS (SELECT *, sqrt(dx * dx + dy * dy) AS rhop FROM x0),
r2 AS (SELECT *,
    (cc - (rhop * rhop) * (cn * cn) / (6378137.0 * 6378137.0)) / cn AS qp,
    atan2(sgn * dx, sgn * dy) / cn AS lam
  FROM r1),
i0 AS (SELECT *, asin(qp / 2.0) AS p0 FROM r2),
${(1 to 6).map(step).mkString(",\n")},
fin AS (
  SELECT q_id, epsg,
    lon0 + (lam * 180.0) / pi() AS lon_r,
    (p6 * 180.0) / pi() AS lat
  FROM i6),
fw AS (
  SELECT q_id, epsg,
    CASE WHEN lon_r > 180.0 THEN lon_r - 360.0
         WHEN lon_r < -180.0 THEN lon_r + 360.0
         ELSE lon_r END AS lon, lat
  FROM fin)
SELECT q_id, CAST(epsg AS INT) AS epsg,
  CAST(floor(lon * 1000000.0 + 0.5) AS BIGINT) AS lon_e6,
  CAST(floor(lat * 1000000.0 + 0.5) AS BIGINT) AS lat_e6
FROM fw
"""
  }

  /** q251: A-Res weighted reservoir sampling — the mix64(doc_id) uniform
    * replayed through the HUGEINT SplitMix64 chain, power-of-two weight
    * buckets, and the u^(1/w) key as 0–3 correctly-rounded sqrt
    * applications (bit-exact in both engines, so even the ORDER BY on the
    * key is deterministic); top-10 per lang by (key desc, doc_id). */
  def q251WeightedReservoir: String =
    s"""
WITH d AS (SELECT doc_id, lang, n_chars FROM documents),
w AS (SELECT doc_id, lang,
    CASE WHEN n_chars < 150 THEN 1 WHEN n_chars < 300 THEN 2
         WHEN n_chars < 450 THEN 4 ELSE 8 END AS w
  FROM d),
m AS (SELECT *, ${mix64("doc_id::HUGEINT")} % 9007199254740992 AS um FROM w),
u AS (SELECT *, CAST(um + 1 AS DOUBLE) / 9007199254740992.0 AS u FROM m),
k AS (SELECT *, CASE w WHEN 1 THEN u WHEN 2 THEN sqrt(u)
                       WHEN 4 THEN sqrt(sqrt(u)) ELSE sqrt(sqrt(sqrt(u))) END AS key
  FROM u),
r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY key DESC, doc_id) AS rnk FROM k)
SELECT lang, CAST(rnk AS BIGINT) AS rnk, doc_id, CAST(w AS BIGINT) AS w,
  CAST(floor(key * 4503599627370496.0) AS BIGINT) AS key_f
FROM r WHERE rnk <= 10
"""

  /** q252: character-distribution Shannon entropy — the engine's exact
    * HOF chain replayed with DuckDB list functions: codepoint-sorted
    * distinct chars, per-char p as the identical IEEE division, and the
    * −Σ p·ln p fold LEFT-ASSOC over the same sorted order (list_reduce
    * seeded by a prepended 0.0 = Spark's aggregate zero); only ln ULPs
    * differ, absorbed by the milli quantum. */
  def q252CharEntropy: String =
    s"""
WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
           FROM documents),
n0 AS (SELECT doc_id, norm, CAST(length(norm) AS BIGINT) AS n FROM d),
cx AS (SELECT *, CASE WHEN n = 0 THEN CAST([] AS VARCHAR[])
    ELSE list_transform(range(1, n + 1), i -> substring(norm, CAST(i AS INT), 1)) END AS cs
  FROM n0),
dx AS (SELECT *, list_sort(list_distinct(cs)) AS ds FROM cx),
px AS (SELECT *, list_transform(ds,
    ch -> CAST(len(list_filter(cs, c -> c = ch)) AS DOUBLE) / CAST(n AS DOUBLE)) AS ps
  FROM dx),
en AS (SELECT *, -(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
    list_transform(ps, p -> p * ln(p))), (acc, t) -> acc + t)) / ln(2.0) AS ent
  FROM px)
SELECT doc_id, n AS n_chars_norm, CAST(len(ds) AS BIGINT) AS n_distinct,
  CAST(floor(ent * 1000.0 + 0.5) AS BIGINT) AS ent_milli,
  CASE WHEN CAST(floor(ent * 1000.0 + 0.5) AS BIGINT) < 4000 THEN 'low' ELSE 'ok' END AS verdict
FROM en
"""

  /** q253: Hilbert curve index — the core/Hilbert.xy2d rotate-and-flip
    * walk UNROLLED to the 8 levels of the order-8 grid (s = 128 … 1),
    * pure &, CASE, xor integer arithmetic on both engine and oracle; run
    * once per (point, east-neighbor) variant via an exploded two-row
    * table and folded back with a conditional max. Bit-exact — no floats
    * anywhere past the tile snap (whose /·× chain is IEEE-identical). */
  def q253Hilbert(qptsSql: String): String = {
    def step(k: Int): String = {
      val s = 1L << (8 - k)
      val prev = if (k == 1) "h0" else s"h${k - 1}"
      s"""r$k AS (SELECT q_id, wh, x, y, d,
    CASE WHEN (x & $s) <> 0 THEN 1 ELSE 0 END AS rx,
    CASE WHEN (y & $s) <> 0 THEN 1 ELSE 0 END AS ry FROM $prev),
h$k AS (SELECT q_id, wh,
    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ($s - 1) - y ELSE y END) ELSE x END AS x,
    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ($s - 1) - x ELSE x END) ELSE y END AS y,
    d + $s * $s * xor(3 * rx, ry) AS d
  FROM r$k)"""
    }
    s"""
WITH qp AS ($qptsSql),
base AS (
  SELECT q_id,
    CAST(floor((lon + 180.0) / 360.0 * 256.0) AS BIGINT) AS tx,
    CAST(floor((90.0 - lat) / 180.0 * 256.0) AS BIGINT) AS ty
  FROM qp),
v AS (SELECT q_id, tx, ty, (tx + 1) % 256 AS txr FROM base),
pts AS (SELECT q_id, 0 AS wh, tx AS x, ty AS y FROM v
        UNION ALL SELECT q_id, 1, txr, ty FROM v),
h0 AS (SELECT q_id, wh, x, y, CAST(0 AS BIGINT) AS d FROM pts),
${(1 to 8).map(step).mkString(",\n")},
agg AS (
  SELECT q_id,
    max(CASE WHEN wh = 0 THEN d END) AS h,
    max(CASE WHEN wh = 1 THEN d END) AS hr
  FROM h8 GROUP BY q_id)
SELECT v.q_id, v.tx, v.ty, agg.h, agg.hr - agg.h AS dh
FROM v JOIN agg ON agg.q_id = v.q_id
"""
  }

  /** q254: rotated-geotransform round trip — the identical arithmetic
    * chain as the engine (dyadic-exact forward; the GDALInvGeoTransform
    * 2×2 inversion with its inv_det division chain mirrored op-for-op),
    * so only division ULPs could differ — and they can't, IEEE division
    * is correctly rounded on both engines over identical operand bits. */
  def q254RotatedGt: String =
    s"""
WITH sp AS (SELECT s_suppkey AS q_id FROM supplier),
g AS (
  SELECT q_id,
    -64.0 + CAST(q_id % 17 AS DOUBLE) / 4.0 AS x0,
    0.25 + CAST(q_id % 5 AS DOUBLE) / 64.0 AS dx,
    CAST(q_id % 9 - 4 AS DOUBLE) / 64.0 AS rx,
    32.0 - CAST(q_id % 13 AS DOUBLE) / 8.0 AS y0,
    CAST(q_id % 7 - 3 AS DOUBLE) / 64.0 AS ry,
    -(0.25 + CAST(q_id % 3 AS DOUBLE) / 32.0) AS dy,
    CAST(q_id % 50 AS DOUBLE) AS px,
    CAST((q_id * 3) % 40 AS DOUBLE) AS py
  FROM sp),
f AS (SELECT *, x0 + px * dx + py * rx AS gx, y0 + px * ry + py * dy AS gy FROM g),
d AS (SELECT *, 1.0 / (dx * dy - rx * ry) AS inv_det FROM f),
i AS (SELECT *,
    (rx * y0 - dy * x0) * inv_det AS g0, dy * inv_det AS g1, -(rx) * inv_det AS g2,
    (ry * x0 - dx * y0) * inv_det AS g3, -(ry) * inv_det AS g4, dx * inv_det AS g5
  FROM d),
b AS (SELECT *, g0 + gx * g1 + gy * g2 AS pxb, g3 + gx * g4 + gy * g5 AS pyb FROM i)
SELECT q_id,
  CAST(floor(gx * 1048576.0 + 0.5) AS BIGINT) AS gx_fx,
  CAST(floor(gy * 1048576.0 + 0.5) AS BIGINT) AS gy_fx,
  CAST(floor(pxb * 1000000.0 + 0.5) AS BIGINT) AS px_u,
  CAST(floor(pyb * 1000000.0 + 0.5) AS BIGINT) AS py_u
FROM b
"""

  /** q255: GDALSuggestedWarpOutput — the identical edge-ring sampling,
    * web-mercator forward (the q19/q60 spherical replay), bbox agg and
    * diagonal pixel-size law; only exp/ln/tan ULPs differ, absorbed by
    * the cm/micro quanta and the reference's own +0.5 size rounding. */
  def q255SuggestedWarp: String =
    s"""
WITH sp AS (SELECT s_suppkey AS q_id FROM supplier),
r AS (
  SELECT q_id, 20 * (1 + q_id % 4) AS w, 20 * (1 + q_id % 3) AS h,
    -100.0 + CAST(q_id % 9 AS DOUBLE) * 16.0 AS x0,
    60.0 - CAST(q_id % 7 AS DOUBLE) * 12.0 AS y0
  FROM sp),
ring AS (
  SELECT r.*, i.i AS i, j.j AS j FROM r,
    generate_series(0, 20) i(i), generate_series(0, 3) j(j)),
pxy AS (
  SELECT *,
    CASE WHEN j < 2 THEN CAST(i AS DOUBLE) * CAST(w AS DOUBLE) / 20.0
         WHEN j = 2 THEN 0.0 ELSE CAST(w AS DOUBLE) END AS px,
    CASE WHEN j = 0 THEN 0.0 WHEN j = 1 THEN CAST(h AS DOUBLE)
         ELSE CAST(i AS DOUBLE) * CAST(h AS DOUBLE) / 20.0 END AS py
  FROM ring),
ll AS (SELECT *, x0 + px * 0.5 AS lon, y0 + py * -0.5 AS lat FROM pxy),
mm AS (SELECT *,
    lon * (pi() * 6378137.0) / 180.0 AS mx,
    ln(tan((90.0 + lat) * pi() / 360.0)) * 6378137.0 AS my
  FROM ll),
agg AS (
  SELECT q_id, w, h, x0, y0,
    min(mx) AS minx, max(mx) AS maxx, min(my) AS miny, max(my) AS maxy
  FROM mm GROUP BY q_id, w, h, x0, y0),
cor AS (SELECT *,
    x0 * (pi() * 6378137.0) / 180.0 AS c1x,
    ln(tan((90.0 + y0) * pi() / 360.0)) * 6378137.0 AS c1y,
    (x0 + CAST(w AS DOUBLE) * 0.5) * (pi() * 6378137.0) / 180.0 AS c2x,
    ln(tan((90.0 + (y0 + CAST(h AS DOUBLE) * -0.5)) * pi() / 360.0)) * 6378137.0 AS c2y
  FROM agg),
ps AS (SELECT *,
    sqrt((c2x - c1x) * (c2x - c1x) + (c2y - c1y) * (c2y - c1y))
      / sqrt(CAST(w * w + h * h AS DOUBLE)) AS psize
  FROM cor)
SELECT q_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
  CAST(floor((maxx - minx) / psize + 0.5) AS BIGINT) AS npx,
  CAST(floor((maxy - miny) / psize + 0.5) AS BIGINT) AS npy,
  CAST(floor(psize * 1000000.0 + 0.5) AS BIGINT) AS psize_u,
  CAST(floor(minx * 100.0 + 0.5) AS BIGINT) AS gt_x0_cm,
  CAST(floor(maxy * 100.0 + 0.5) AS BIGINT) AS gt_y0_cm
FROM ps
"""

  /** q258: MMR greedy selection replayed as a recursive CTE — the pool
    * and pairwise sims use the q26 fixed-dot subquery, the recursion
    * carries the selected set as a LIST column and each step re-derives
    * the argmax of rel − max(sim to picked) with the engine's exact
    * BIGINT arithmetic and (obj desc, doc asc) tie law. */
  def q258Mmr: String = {
    def fdot(a: String, b: String): String =
      s"""(SELECT CAST(sum(CAST(floor(CAST($a[i.i] AS DOUBLE)*1000000.0) AS BIGINT)
                 * CAST(floor(CAST($b[i.i] AS DOUBLE)*1000000.0) AS BIGINT)) AS BIGINT)
          FROM generate_series(1, 64) i(i))"""
    s"""
WITH RECURSIVE
q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.qid, e.vec_id AS doc, e.embedding AS dv, ${fdot("q.qv", "e.embedding")} AS rel
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid),
pool AS (SELECT qid, doc, dv, rel FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, doc) AS rn FROM scored)
  WHERE rn <= 20),
sims AS (
  SELECT a.qid, a.doc AS a, b.doc AS b, ${fdot("a.dv", "b.dv")} AS sim
  FROM pool a JOIN pool b ON a.qid = b.qid AND a.doc <> b.doc),
sel(qid, step, picked, doc, rel, obj) AS (
  SELECT qid, 1, [doc], doc, rel, rel FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, doc) AS rn FROM pool)
    WHERE rn = 1
  UNION ALL
  SELECT qid, step, list_append(picked, doc), doc, rel, obj FROM (
    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY obj DESC, doc) AS rn FROM (
      SELECT s.qid, s.step + 1 AS step, s.picked, c.doc, c.rel,
        c.rel - max(si.sim) AS obj
      FROM sel s
      JOIN pool c ON c.qid = s.qid AND NOT list_contains(s.picked, c.doc)
      JOIN sims si ON si.qid = s.qid AND si.a = c.doc AND list_contains(s.picked, si.b)
      WHERE s.step < 5
      GROUP BY s.qid, s.step, s.picked, c.doc, c.rel))
  WHERE rn = 1)
SELECT qid AS query_id, CAST(step AS BIGINT) AS sel_rank, doc AS neighbor_id,
  rel AS rel_fx, obj AS obj_fx
FROM sel
"""
  }

  /** q261: geohash — the oracle recomputes the two 20-bit indices from
    * the identical floor snap and rebuilds the 8-char base32 string with
    * the same interleave, so the engine's DECODED indices must equal the
    * direct ones (encode∘decode = id is the graded law). Integer shifts
    * and masks only. */
  def q261Geohash(qptsSql: String): String = {
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    def bitExpr(p: Int): String =
      if (p % 2 == 0) s"((lonidx >> ${19 - p / 2}) & 1)"
      else s"((latidx >> ${19 - (p - 1) / 2}) & 1)"
    val chars = (0 until 8).map { j =>
      val idx = (0 until 5).map(t => s"${bitExpr(5 * j + t)} * ${1L << (4 - t)}").mkString(" + ")
      s"substring('$alpha', CAST(($idx) AS INT) + 1, 1)"
    }
    s"""
WITH qp AS ($qptsSql),
ix AS (
  SELECT q_id,
    least(CAST(floor((lon + 180.0) / 360.0 * 1048576.0) AS BIGINT), 1048575) AS lonidx,
    least(CAST(floor((lat + 90.0) / 180.0 * 1048576.0) AS BIGINT), 1048575) AS latidx
  FROM qp)
SELECT q_id, ${chars.mkString(" || ")} AS gh, lonidx AS lon_idx, latidx AS lat_idx
FROM ix
"""
  }

  /** q268: KMV sketch — the mix64 53-bit uniform replay, per-group
    * (h, suppkey)-ordered top-32 window, and the (k−1)·2^53 div h_(k)
    * estimate; exact distinct count beside it. */
  def q268KmvSketch: String =
    s"""
WITH pairs AS (SELECT DISTINCT CASE WHEN l_partkey % 2 = 0 THEN l_partkey % 256 ELSE 100000 + l_partkey END AS grp, l_suppkey FROM lineitem),
h AS (SELECT grp, l_suppkey,
    ${mix64("l_suppkey::HUGEINT")} % 9007199254740992 AS h FROM pairs),
r AS (SELECT *, row_number() OVER (PARTITION BY grp ORDER BY h, l_suppkey) AS rn FROM h),
sk AS (SELECT grp, count(*) AS nk, max(h) AS hk FROM r WHERE rn <= 32 GROUP BY grp),
ex AS (SELECT grp, count(*) AS exact_n FROM pairs GROUP BY grp)
SELECT sk.grp, CAST(ex.exact_n AS BIGINT) AS exact_n,
  CAST(CASE WHEN sk.nk < 32 THEN sk.nk
       ELSE (31 * 9007199254740992) // sk.hk END AS BIGINT) AS est_n
FROM sk JOIN ex ON ex.grp = sk.grp
"""

  /** q269: integer PageRank — the q263 graph (weights dropped), outdeg
    * table, and TEN unrolled damped-floor-division iterations; all
    * BIGINT, bit-exact. */
  def q269Pagerank: String = {
    val edgesCte = """sp AS (SELECT s_suppkey - 1 AS i FROM supplier),
nt AS (SELECT count(*) AS n FROM sp),
edges AS (
  SELECT i AS src, i + 1 AS dst FROM sp, nt WHERE (i + 1) % 10 <> 0 AND i + 1 < nt.n
  UNION ALL SELECT i, i + 10 FROM sp, nt WHERE i + 10 < nt.n
  UNION ALL SELECT i, i + 33 FROM sp, nt WHERE i + 33 < nt.n
  UNION ALL SELECT i, i + 205 FROM sp, nt WHERE i + 205 < nt.n),
outd AS (SELECT src, count(*) AS od FROM edges GROUP BY 1),
m0 AS (SELECT i AS node, CAST(1000000 AS BIGINT) AS m FROM sp)"""
    val iters = (1 to 10).map { t =>
      s"""c$t AS (
  SELECT e.dst AS node, sum(((m.m * 85) // 100) // o.od) AS cs
  FROM edges e JOIN m${t - 1} m ON m.node = e.src JOIN outd o ON o.src = e.src
  GROUP BY e.dst),
m$t AS (
  SELECT s.i AS node, 150000 + coalesce(c.cs, 0) AS m
  FROM sp s LEFT JOIN c$t c ON c.node = s.i)"""
    }.mkString(",\n")
    s"WITH $edgesCte,\n$iters\nSELECT node, CAST(m AS BIGINT) AS rank_micro FROM m10"
  }

  /** q271: layout audit — the q253 Hilbert chain applied per box tile
    * (exploded via two generate_series), Morton by explicit bit
    * interleave, row group = curve index div 256, DISTINCT counts. */
  def q271LayoutAudit: String = {
    def step(k: Int): String = {
      val s = 1L << (8 - k)
      val prev = if (k == 1) "h0" else s"h${k - 1}"
      s"""r$k AS (SELECT q_id, tx0, ty0, x, y, d,
    CASE WHEN (x & $s) <> 0 THEN 1 ELSE 0 END AS rx,
    CASE WHEN (y & $s) <> 0 THEN 1 ELSE 0 END AS ry FROM $prev),
h$k AS (SELECT q_id, tx0, ty0,
    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ($s - 1) - y ELSE y END) ELSE x END AS x,
    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ($s - 1) - x ELSE x END) ELSE y END AS y,
    d + $s * $s * xor(3 * rx, ry) AS d
  FROM r$k)"""
    }
    val morton = (0 until 8).map(b =>
      s"((((tx0 >> $b) & 1) << ${2 * b + 1}) + (((ty0 >> $b) & 1) << ${2 * b}))")
      .mkString(" + ")
    s"""
WITH sp AS (SELECT s_suppkey AS q_id FROM supplier),
box AS (
  SELECT q_id, (q_id * 37) % 230 AS x0, (q_id * 53) % 230 AS y0,
    4 + q_id % 17 AS w, 4 + q_id % 11 AS h
  FROM sp),
txs AS (SELECT q_id, y0, h, x0 + unnest(range(0, w + 1)) AS tx0 FROM box),
tiles AS (SELECT q_id, tx0, y0 + unnest(range(0, h + 1)) AS ty0 FROM txs),
h0 AS (SELECT q_id, tx0, ty0, tx0 AS x, ty0 AS y, CAST(0 AS BIGINT) AS d FROM tiles),
${(1 to 8).map(step).mkString(",\n")},
fin AS (
  SELECT h8.q_id, h8.tx0, h8.ty0, h8.d AS hd, $morton AS md
  FROM h8)
SELECT q_id, CAST(count(*) AS BIGINT) AS n_tiles,
  CAST(count(DISTINCT hd // 32) AS BIGINT) AS rg_hilbert,
  CAST(count(DISTINCT md // 32) AS BIGINT) AS rg_morton
FROM fin GROUP BY q_id
"""
  }

  /** q264: curriculum interleave — per-bucket mix64 epoch-shuffle rank
    * (the HUGEINT mix64 replay folded back to SIGNED order, matching the
    * engine's long ordering) and the closed-form period-6 step law. */
  def q264Curriculum: String =
    s"""
WITH d AS (SELECT doc_id,
    CASE WHEN n_chars < 250 THEN 0 WHEN n_chars < 400 THEN 1 ELSE 2 END AS bucket,
    ${toSigned(mix64("doc_id::HUGEINT"))} AS shuf
  FROM documents),
r AS (SELECT doc_id, bucket,
    CAST(row_number() OVER (PARTITION BY bucket ORDER BY shuf, doc_id) - 1 AS BIGINT) AS r
  FROM d)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, r,
  CAST(CASE bucket
    WHEN 0 THEN (r // 3) * 6 + [0, 2, 4][CAST(r % 3 AS INT) + 1]
    WHEN 1 THEN (r // 2) * 6 + [1, 5][CAST(r % 2 AS INT) + 1]
    ELSE r * 6 + 3 END AS BIGINT) AS step
FROM r
"""

  /** q80: per-point LCC 2SP forward (Snyder/EPSG-9802, core/Lcc.forward)
    * replicated op-for-op under the q73 discipline: derived projection
    * constants (n, a·F, ρ0) embedded as the engine's exact runtime doubles,
    * every power written exp(k·ln x), identical IEEE op order — only
    * transcendental ULPs remain, absorbed by the cm quantization. Both
    * supported CRS are GRS80, so e / e/2 are single shared literals. */
  def q80Lcc(qptsSql: String): String = {
    val c1 = graft.core.Lcc.crs2154; val c2 = graft.core.Lcc.crs3978
    def d(x: Double): String = java.lang.Double.toString(x)
    val e = d(c1.e); val he = d(c1.halfE)
    s"""
WITH qp AS ($qptsSql),
c AS (
  SELECT q_id, lon, lat,
    CASE WHEN q_id % 2 = 0 THEN 2154 ELSE 3978 END AS epsg,
    CASE WHEN q_id % 2 = 0 THEN ${d(c1.n)} ELSE ${d(c2.n)} END AS cn,
    CASE WHEN q_id % 2 = 0 THEN ${d(c1.aF)} ELSE ${d(c2.aF)} END AS af,
    CASE WHEN q_id % 2 = 0 THEN ${d(c1.rho0)} ELSE ${d(c2.rho0)} END AS rho0,
    CASE WHEN q_id % 2 = 0 THEN 3.0 ELSE -95.0 END AS lon0,
    CASE WHEN q_id % 2 = 0 THEN 700000.0 ELSE 0.0 END AS fe,
    CASE WHEN q_id % 2 = 0 THEN 6600000.0 ELSE 0.0 END AS fn
  FROM qp),
w AS (
  SELECT *, CASE WHEN lon - lon0 > 180.0 THEN lon - lon0 - 360.0
                 WHEN lon - lon0 < -180.0 THEN lon - lon0 + 360.0
                 ELSE lon - lon0 END AS lamd FROM c),
s1 AS (SELECT *, (lat / 180.0) * pi() AS phi, (lamd / 180.0) * pi() AS lam FROM w),
s2 AS (SELECT *, sin(phi) AS sphi FROM s1),
s3 AS (SELECT *,
    tan(pi() / 4.0 - phi / 2.0)
      * exp($he * ln((1.0 + $e * sphi) / (1.0 - $e * sphi))) AS tt
  FROM s2),
s4 AS (SELECT *, af * exp(cn * ln(tt)) AS rho, cn * lam AS th FROM s3),
fin AS (
  SELECT q_id, epsg,
    fe + rho * sin(th) AS e_m,
    fn + rho0 - rho * cos(th) AS n_m
  FROM s4)
SELECT q_id, CAST(epsg AS INT) AS epsg,
  CAST(floor(e_m * 100.0 + 0.5) AS BIGINT) AS e_cm,
  CAST(floor(n_m * 100.0 + 0.5) AS BIGINT) AS n_cm
FROM fin
"""
  }

  /** q81: per-row LCC 2SP inverse (core/Lcc.inverse) — spherical seed then
    * the φ fixed-point iteration unrolled to the engine's exact 5 steps,
    * exp(k·ln x) powers, engine-runtime constants as literals; 1e-6-degree
    * quantization absorbs the transcendental ULPs (q76 trick). */
  def q81LccInv: String = {
    val c1 = graft.core.Lcc.crs2154; val c2 = graft.core.Lcc.crs3978
    def d(x: Double): String = java.lang.Double.toString(x)
    val e = d(c1.e); val he = d(c1.halfE)
    def it(prev: String): String =
      s"pi() / 2.0 - 2.0 * atan(tp * exp($he * ln((1.0 - $e * sin($prev)) / (1.0 + $e * sin($prev)))))"
    s"""
WITH sp AS (SELECT s_suppkey AS q_id FROM supplier),
c AS (
  SELECT q_id,
    CASE WHEN q_id % 2 = 0 THEN 2154 ELSE 3978 END AS epsg,
    CASE WHEN q_id % 2 = 0 THEN ${d(c1.n)} ELSE ${d(c2.n)} END AS cn,
    CASE WHEN q_id % 2 = 0 THEN ${d(c1.aF)} ELSE ${d(c2.aF)} END AS af,
    CASE WHEN q_id % 2 = 0 THEN ${d(c1.rho0)} ELSE ${d(c2.rho0)} END AS rho0,
    CASE WHEN q_id % 2 = 0 THEN 3.0 ELSE -95.0 END AS lon0,
    CASE WHEN q_id % 2 = 0 THEN 700000.0 ELSE 0.0 END AS fe,
    CASE WHEN q_id % 2 = 0 THEN 6600000.0 ELSE 0.0 END AS fn
  FROM sp),
b AS (
  SELECT *,
    fe + (CAST((q_id * 48271) % 2000001 AS DOUBLE) - 1000000.0) AS e_m,
    fn + (CAST((q_id * 16807) % 3000001 AS DOUBLE) - 1500000.0) AS n_m
  FROM c),
x0 AS (SELECT *, e_m - fe AS dx, rho0 - (n_m - fn) AS dy FROM b),
r1 AS (SELECT *, sqrt(dx * dx + dy * dy) AS rhop, atan2(dx, dy) AS thp FROM x0),
r2 AS (SELECT *, exp(ln(rhop / af) / cn) AS tp, thp / cn AS lam FROM r1),
i0 AS (SELECT *, pi() / 2.0 - 2.0 * atan(tp) AS p0 FROM r2),
i1 AS (SELECT *, ${it("p0")} AS p1 FROM i0),
i2 AS (SELECT *, ${it("p1")} AS p2 FROM i1),
i3 AS (SELECT *, ${it("p2")} AS p3 FROM i2),
i4 AS (SELECT *, ${it("p3")} AS p4 FROM i3),
i5 AS (SELECT *, ${it("p4")} AS p5 FROM i4),
fin AS (
  SELECT q_id, epsg,
    lon0 + (lam * 180.0) / pi() AS lon,
    (p5 * 180.0) / pi() AS lat
  FROM i5)
SELECT q_id, CAST(epsg AS INT) AS epsg,
  CAST(floor(lon * 1000000.0 + 0.5) AS BIGINT) AS lon_e6,
  CAST(floor(lat * 1000000.0 + 0.5) AS BIGINT) AS lat_e6
FROM fin
"""
  }

  /** q196: gdaltransform chained coordinate pipeline — UTM inverse
    * (q76's Krüger beta/delta replay) hubbed through WGS84 into the LCC
    * 2SP forward (q80's Snyder replay), with NO intermediate quantization,
    * exactly the reference's chained-CT semantics (apps/gdaltransform.cpp
    * hubs src→geographic→dst when neither side is geographic). Both legs
    * reuse the established op-for-op discipline, so only transcendental
    * ULPs remain — absorbed by the cm output quantum. */
  def q196Pipeline: String = {
    val kA = java.lang.Double.toString(graft.core.Utm.oracleKA)
    val b = graft.core.Utm.oracleBeta.map(java.lang.Double.toString)
    val dl = graft.core.Utm.oracleDelta.map(java.lang.Double.toString)
    def cosh(x: String): String = s"((exp($x) + exp(-($x))) / 2.0)"
    def sinh(x: String): String = s"((exp($x) - exp(-($x))) / 2.0)"
    val xipSer = (0 until 6).map { j =>
      val k = s"${2.0 * (j + 1)}"
      s"- (${b(j)} * sin($k * xi)) * ${cosh(s"$k * eta")}"
    }.mkString(" ")
    val etapSer = (0 until 6).map { j =>
      val k = s"${2.0 * (j + 1)}"
      s"- (${b(j)} * cos($k * xi)) * ${sinh(s"$k * eta")}"
    }.mkString(" ")
    val phiSer = (0 until 6).map { j =>
      val k = s"${2.0 * (j + 1)}"
      s"+ ${dl(j)} * sin($k * chi)"
    }.mkString(" ")
    val c1 = graft.core.Lcc.crs2154; val c2 = graft.core.Lcc.crs3978
    def d(x: Double): String = java.lang.Double.toString(x)
    val e = d(c1.e); val he = d(c1.halfE)
    s"""
WITH sp AS (SELECT s_suppkey AS q_id FROM supplier),
base AS (
  SELECT q_id, q_id % 60 + 1 AS zone, (q_id % 2 = 0) AS north,
    CAST(100000 + (q_id * 48271) % 800001 AS DOUBLE) AS e_m,
    (q_id * 16807) % 9000001 AS nr
  FROM sp),
x0 AS (
  SELECT q_id, zone, north,
    CASE WHEN north THEN 32600 + zone ELSE 32700 + zone END AS src_epsg,
    ((CASE WHEN north THEN CAST(nr AS DOUBLE) ELSE CAST(10000000 - nr AS DOUBLE) END)
      - CASE WHEN north THEN 0.0 ELSE 10000000.0 END) / $kA AS xi,
    (e_m - 500000.0) / $kA AS eta
  FROM base),
u1 AS (SELECT *, xi $xipSer AS xip, eta $etapSer AS etap FROM x0),
u2 AS (SELECT *, asin(sin(xip) / ${cosh("etap")}) AS chi FROM u1),
u3 AS (SELECT *, chi $phiSer AS gphi, atan2(${sinh("etap")}, cos(xip)) AS glam FROM u2),
geo AS (
  SELECT q_id, src_epsg,
    (zone * 6.0 - 183.0) + ((glam * 180.0) / pi()) AS lon,
    (gphi * 180.0) / pi() AS lat
  FROM u3),
c AS (
  SELECT q_id, src_epsg, lon, lat,
    CASE WHEN q_id % 2 = 0 THEN 2154 ELSE 3978 END AS dst_epsg,
    CASE WHEN q_id % 2 = 0 THEN ${d(c1.n)} ELSE ${d(c2.n)} END AS cn,
    CASE WHEN q_id % 2 = 0 THEN ${d(c1.aF)} ELSE ${d(c2.aF)} END AS af,
    CASE WHEN q_id % 2 = 0 THEN ${d(c1.rho0)} ELSE ${d(c2.rho0)} END AS rho0,
    CASE WHEN q_id % 2 = 0 THEN 3.0 ELSE -95.0 END AS lon0,
    CASE WHEN q_id % 2 = 0 THEN 700000.0 ELSE 0.0 END AS fe,
    CASE WHEN q_id % 2 = 0 THEN 6600000.0 ELSE 0.0 END AS fn
  FROM geo),
w AS (
  SELECT *, CASE WHEN lon - lon0 > 180.0 THEN lon - lon0 - 360.0
                 WHEN lon - lon0 < -180.0 THEN lon - lon0 + 360.0
                 ELSE lon - lon0 END AS lamd FROM c),
l1 AS (SELECT *, (lat / 180.0) * pi() AS phi, (lamd / 180.0) * pi() AS lam FROM w),
l2 AS (SELECT *, sin(phi) AS sphi FROM l1),
l3 AS (SELECT *,
    tan(pi() / 4.0 - phi / 2.0)
      * exp($he * ln((1.0 + $e * sphi) / (1.0 - $e * sphi))) AS tt
  FROM l2),
l4 AS (SELECT *, af * exp(cn * ln(tt)) AS rho, cn * lam AS th FROM l3),
fin AS (
  SELECT q_id, src_epsg, dst_epsg,
    fe + rho * sin(th) AS oe,
    fn + rho0 - rho * cos(th) AS onn
  FROM l4)
SELECT q_id, CAST(src_epsg AS INT) AS src_epsg, CAST(dst_epsg AS INT) AS dst_epsg,
  CAST(floor(oe * 100.0 + 0.5) AS BIGINT) AS e_cm,
  CAST(floor(onn * 100.0 + 0.5) AS BIGINT) AS n_cm
FROM fin
"""
  }

  /** q82: RPC warp replica. The ground→image transform is pure +,·,/ on
    * doubles with a fixed evaluation order (basis-order sums, left-assoc
    * monomials), so the SQL below is BIT-EXACT — the only nondeterminism
    * classes (transcendental libm gaps, reassociation) don't exist here.
    * Coefficients embed as the engine's exact runtime doubles; the floor
    * sampling and tile checksum mirror q79's. */
  def q82Rpc: String = rpcOracle("0.0")

  /** q198: the q82 replica with the DEM height leg — h is the
    * nearest-cell elevation of a synthetic 2.8125°-cell DEM, replayed
    * with the engine's exact op order (floor((lon+180)/2.8125) etc.; the
    * dyadic grid makes every floor argument exact). */
  def q198RpcDem: String = rpcOracle(
    "CAST((CAST(floor((lon + 180.0) / 2.8125) AS BIGINT) * 37 " +
      "+ CAST(floor((90.0 - lat) / 2.8125) AS BIGINT) * 91) % 400 AS DOUBLE)")

  private def rpcOracle(hSql: String): String = {
    val m = graft.core.Rpc.demo
    def d(x: Double): String = java.lang.Double.toString(x)
    def polySql(cs: Array[Double]): String =
      graft.core.Rpc.basis.zip(cs).map { case ((i, j, k), c) =>
        val factors = Seq.fill(i)("l") ++ Seq.fill(j)("p") ++ Seq.fill(k)("hh")
        val mono = if (factors.isEmpty) "1.0" else factors.mkString(" * ")
        s"${d(c)} * ($mono)"
      }.mkString(" + ")
    s"""
WITH px AS (
  SELECT dx.i AS gdx, dy.i AS gdy
  FROM generate_series(0, 1023) dx(i), generate_series(0, 511) dy(i)),
g AS (
  SELECT gdx, gdy,
    -180.0 + gdx * 0.3515625 AS lon,
    90.0 + gdy * (-0.3515625) AS lat
  FROM px),
nrm AS (
  SELECT gdx, gdy,
    (lon - ${d(m.lonOff)}) / ${d(m.lonScale)} AS l,
    (lat - ${d(m.latOff)}) / ${d(m.latScale)} AS p,
    (($hSql) - ${d(m.hOff)}) / ${d(m.hScale)} AS hh
  FROM g),
r AS (
  SELECT gdx, gdy,
    (${polySql(m.sampNum)}) / (${polySql(m.sampDen)}) * ${d(m.sampScale)} + ${d(m.sampOff)} AS samp,
    (${polySql(m.lineNum)}) / (${polySql(m.lineDen)}) * ${d(m.lineScale)} + ${d(m.lineOff)} AS line
  FROM nrm),
sm AS (
  SELECT gdx, gdy,
    CAST(floor(samp) AS BIGINT) AS sgx, CAST(floor(line) AS BIGINT) AS sgy
  FROM r),
v AS (
  SELECT gdx, gdy,
    CASE WHEN sgx >= 0 AND sgx < 1024 AND sgy >= 0 AND sgy < 512
      THEN ((sgx // 64)*131 + (sgy // 64)*173 + (sgx % 64)*7 + (sgy % 64)*11 + 3) % 256
      ELSE NULL END AS val
  FROM sm),
t AS (
  SELECT gdx // 64 AS tx, gdy // 64 AS ty,
    (gdy % 64) * 64 + gdx % 64 AS i, val
  FROM v)
SELECT CAST(tx AS BIGINT) AS tx, CAST(ty AS BIGINT) AS ty,
  CAST(sum(CAST(coalesce(val, 0) AS BIGINT) * (i % 49 + 1)) % 65535 AS INT) AS cks
FROM t GROUP BY 1, 2 HAVING count(val) > 0
"""
  }

  /** q93: haversine replica — engine op order exactly (toRadians as
    * (x/180)·π, sin half-angles squared, min(1,·) clamp), mm quantization
    * absorbing the sin/cos/asin libm ULPs. */
  def q93Sphere: String = """
WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 368640 AS DOUBLE) / 1024.0 - 180.0 AS lon1,
    CAST((s_suppkey * 104729) % 163840 AS DOUBLE) / 1024.0 - 80.0 AS lat1,
    CAST((s_suppkey * 48271) % 368640 AS DOUBLE) / 1024.0 - 180.0 AS lon2,
    CAST((s_suppkey * 16807) % 163840 AS DOUBLE) / 1024.0 - 80.0 AS lat2
  FROM supplier),
r1 AS (SELECT q_id,
    (lat1 / 180.0) * pi() AS phi1, (lat2 / 180.0) * pi() AS phi2,
    ((lat2 - lat1) / 180.0) * pi() AS dphi,
    ((lon2 - lon1) / 180.0) * pi() AS dlam
  FROM sp),
r2 AS (SELECT *, sin(dphi / 2.0) AS sp2, sin(dlam / 2.0) AS sl2 FROM r1),
r3 AS (SELECT *, sp2 * sp2 + cos(phi1) * cos(phi2) * (sl2 * sl2) AS h FROM r2),
fin AS (SELECT q_id, 2.0 * 6371008.8 * asin(LEAST(1.0, sqrt(h))) AS d FROM r3)
SELECT q_id, CAST(floor(d * 1000.0 + 0.5) AS BIGINT) AS dist_mm FROM fin
"""

  /** q98: explodecollections replica — the member/vertex rows rebuilt
    * from the generating arithmetic (dyadic coords; the engine's %s WKT
    * round-trip is exact), so the compare is bit-exact unquantized and
    * grades st_dump's member ORDER against ground truth. */
  def q98Explode: String = """
WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 1024 AS DOUBLE) / 64.0 AS ax,
    CAST((s_suppkey * 104729) % 1024 AS DOUBLE) / 64.0 AS ay
  FROM supplier),
p2 AS (SELECT *,
    ax + 1.0 + CAST(q_id % 9 AS DOUBLE) / 4.0 AS bx,
    ay + CAST(q_id % 5 AS DOUBLE) / 2.0 AS by,
    ax - CAST(q_id % 7 AS DOUBLE) / 8.0 AS cx,
    ay + 2.0 AS cy
  FROM sp),
vrows AS (
  SELECT q_id, 0 AS part, 'LINESTRING' AS gtype, 0 AS seq, ax AS x, ay AS y FROM p2 WHERE q_id % 3 = 0
  UNION ALL SELECT q_id, 0, 'LINESTRING', 1, bx, by FROM p2 WHERE q_id % 3 = 0
  UNION ALL SELECT q_id, 0, 'LINESTRING', 0, ax, ay FROM p2 WHERE q_id % 3 = 1
  UNION ALL SELECT q_id, 0, 'LINESTRING', 1, bx, by FROM p2 WHERE q_id % 3 = 1
  UNION ALL SELECT q_id, 1, 'LINESTRING', 0, cx, cy FROM p2 WHERE q_id % 3 = 1
  UNION ALL SELECT q_id, 1, 'LINESTRING', 1, ax, ay FROM p2 WHERE q_id % 3 = 1
  UNION ALL SELECT q_id, 0, 'POINT', 0, ax, ay FROM p2 WHERE q_id % 3 = 2
  UNION ALL SELECT q_id, 1, 'POINT', 0, cx, cy FROM p2 WHERE q_id % 3 = 2
  UNION ALL SELECT q_id, 2, 'POINT', 0, bx, by FROM p2 WHERE q_id % 3 = 2)
SELECT q_id, CAST(part AS BIGINT) AS part, gtype, CAST(seq AS BIGINT) AS seq, x, y
FROM vrows
"""

  /** q101: GeoJSON replica — the JSON string is rebuilt with the writer's
    * exact formatting contract (integer-valued doubles → BIGINT cast,
    * others → DuckDB's shortest-round-trip VARCHAR cast, which matches
    * Java's Double.toString on this dyadic corpus), and the vertex rows
    * replay the generating arithmetic, grading writer AND parser with no
    * quantization. */
  def q101GeoJson: String = {
    def f(e: String): String =
      s"CASE WHEN ($e) = floor($e) THEN CAST(CAST(($e) AS BIGINT) AS VARCHAR) " +
        s"ELSE CAST(($e) AS VARCHAR) END"
    def pt(x: String, y: String): String =
      s"'[' || ${f(x)} || ',' || ${f(y)} || ']'"
    s"""WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 1024 AS DOUBLE) / 4.0 AS ax,
    CAST((s_suppkey * 104729) % 512 AS DOUBLE) AS ay,
    1.0 + CAST(s_suppkey % 7 AS DOUBLE) / 2.0 AS w,
    2.0 + CAST(s_suppkey % 5 AS DOUBLE) AS h
  FROM supplier),
cc AS (
  SELECT q_id, ax, ay, ax + w AS x2, ay + h AS y2, ay + 2.0 * h AS y3 FROM sp),
js AS (
  SELECT q_id,
    CASE WHEN q_id % 3 = 0 THEN
      '{"type":"Point","coordinates":' || ${pt("ax", "ay")} || '}'
    WHEN q_id % 3 = 1 THEN
      '{"type":"LineString","coordinates":[' || ${pt("ax", "ay")} || ',' ||
        ${pt("x2", "y2")} || ',' || ${pt("ax", "y3")} || ']}'
    ELSE
      '{"type":"Polygon","coordinates":[[' || ${pt("ax", "ay")} || ',' ||
        ${pt("x2", "ay")} || ',' || ${pt("x2", "y2")} || ',' ||
        ${pt("ax", "y2")} || ',' || ${pt("ax", "ay")} || ']]}'
    END AS gjson
  FROM cc),
vr AS (
  SELECT q_id, 0 AS seq, ax AS x, ay AS y FROM cc WHERE q_id % 3 = 0
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 3 = 1
  UNION ALL SELECT q_id, 1, x2, y2 FROM cc WHERE q_id % 3 = 1
  UNION ALL SELECT q_id, 2, ax, y3 FROM cc WHERE q_id % 3 = 1
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 3 = 2
  UNION ALL SELECT q_id, 1, x2, ay FROM cc WHERE q_id % 3 = 2
  UNION ALL SELECT q_id, 2, x2, y2 FROM cc WHERE q_id % 3 = 2
  UNION ALL SELECT q_id, 3, ax, y2 FROM cc WHERE q_id % 3 = 2
  UNION ALL SELECT q_id, 4, ax, ay FROM cc WHERE q_id % 3 = 2)
SELECT v.q_id, j.gjson, CAST(v.seq AS BIGINT) AS seq, v.x, v.y
FROM vr v JOIN js j ON j.q_id = v.q_id
"""
  }

  /** q92: segmentize replica — BIT-exact with no quantization: the whole
    * chain is −,·,/,sqrt,ceil (all exactly rounded IEEE ops), original
    * vertices copy through untouched, interiors interpolate with the
    * engine's exact op order. */
  def q92Segmentize: String = """
WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 1024 AS DOUBLE) / 64.0 AS ax,
    CAST((s_suppkey * 104729) % 1024 AS DOUBLE) / 64.0 AS ay,
    0.5 + CAST(s_suppkey % 4 AS DOUBLE) / 8.0 AS ml
  FROM supplier),
p2 AS (SELECT *, ax + 1.0 + CAST(q_id % 13 AS DOUBLE) / 2.0 AS bx,
    ay + CAST(q_id % 7 AS DOUBLE) / 4.0 AS by FROM sp),
p3 AS (SELECT *, bx - CAST(q_id % 5 AS DOUBLE) / 2.0 AS cx,
    by + 2.0 + CAST(q_id % 11 AS DOUBLE) / 8.0 AS cy FROM p2),
segs AS (
  SELECT q_id, ml, 0 AS seg, ax AS x0, ay AS y0, bx AS x1, by AS y1 FROM p3
  UNION ALL
  SELECT q_id, ml, 1, bx, by, cx, cy FROM p3),
sn AS (SELECT *, x1 - x0 AS dx, y1 - y0 AS dy FROM segs),
sn2 AS (SELECT *, GREATEST(CAST(1 AS BIGINT),
    CAST(ceil(sqrt(dx * dx + dy * dy) / ml) AS BIGINT)) AS n FROM sn),
verts AS (
  SELECT q_id, -1 AS seg, 0 AS k, ax AS x, ay AS y FROM p3
  UNION ALL
  SELECT q_id, seg, gs.i AS k,
    CASE WHEN gs.i = n THEN x1 ELSE x0 + dx * CAST(gs.i AS DOUBLE) / CAST(n AS DOUBLE) END,
    CASE WHEN gs.i = n THEN y1 ELSE y0 + dy * CAST(gs.i AS DOUBLE) / CAST(n AS DOUBLE) END
  FROM sn2, generate_series(1, 32) gs(i) WHERE gs.i <= sn2.n)
SELECT q_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY seg, k) - 1 AS BIGINT) AS seq,
  x, y
FROM verts
"""

  /** q106: ogrlineref mileposts + locate replayed closed-form over the
    * 3-point corpus. Replicates LineRefOps' pinned op order exactly:
    * dx=x1−x0, ls=dx·dx+dy·dy, len=sqrt(ls), cum left-assoc from 0.0
    * (0.0+l1 == l1 bit-exact, so `cum+li` is l1 / l1+l2 verbatim);
    * every op is exactly rounded so NO quantization is needed. Segment
    * choice `d <= l1` / `d <= l1+l2`, the locate clamp and the strict
    * d22 < d21 argmin all decide on identical doubles in both engines. */
  def q106LineRef: String = """
WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 1024 AS DOUBLE) / 64.0 AS ax,
    CAST((s_suppkey * 104729) % 1024 AS DOUBLE) / 64.0 AS ay
  FROM supplier),
p2 AS (SELECT *, ax + 1.0 + CAST(q_id % 13 AS DOUBLE) / 2.0 AS bx,
    ay + CAST(q_id % 7 AS DOUBLE) / 4.0 AS by FROM sp),
p3 AS (SELECT *, bx - CAST(q_id % 5 AS DOUBLE) / 2.0 AS cx,
    by + 2.0 + CAST(q_id % 11 AS DOUBLE) / 8.0 AS cy,
    0.5 + CAST(q_id % 4 AS DOUBLE) / 8.0 AS step FROM p2),
dg AS (SELECT *, bx - ax AS dx1, by - ay AS dy1, cx - bx AS dx2, cy - by AS dy2,
    ax + 1.0 AS qx, ay + 2.0 AS qy FROM p3),
ll AS (SELECT *, dx1*dx1 + dy1*dy1 AS ls1, dx2*dx2 + dy2*dy2 AS ls2,
    sqrt(dx1*dx1 + dy1*dy1) AS l1, sqrt(dx2*dx2 + dy2*dy2) AS l2 FROM dg),
tt AS (SELECT *, l1 + l2 AS tot FROM ll),
pr AS (SELECT *,
    LEAST(GREATEST(((qx - ax) * dx1 + (qy - ay) * dy1) / ls1, 0.0), 1.0) AS t1,
    LEAST(GREATEST(((qx - bx) * dx2 + (qy - by) * dy2) / ls2, 0.0), 1.0) AS t2
  FROM tt),
dc AS (SELECT *,
    (qx - (ax + dx1 * t1)) * (qx - (ax + dx1 * t1))
      + (qy - (ay + dy1 * t1)) * (qy - (ay + dy1 * t1)) AS d21,
    (qx - (bx + dx2 * t2)) * (qx - (bx + dx2 * t2))
      + (qy - (by + dy2 * t2)) * (qy - (by + dy2 * t2)) AS d22
  FROM pr),
lc AS (SELECT *,
    CASE WHEN d22 < d21 THEN (l1 + l2 * t2) / tot ELSE (l1 * t1) / tot END AS loc
  FROM dc),
mp AS (SELECT lc.*, gs.i AS k, CAST(gs.i AS DOUBLE) * step AS d
  FROM lc, generate_series(0, 63) gs(i)
  WHERE gs.i <= CAST(floor(tot / step) AS BIGINT))
SELECT q_id, CAST(k AS BIGINT) AS k,
  CASE WHEN d <= l1 THEN ax + dx1 * (d / l1)
       WHEN d <= l1 + l2 THEN bx + dx2 * ((d - l1) / l2)
       ELSE cx END AS mx,
  CASE WHEN d <= l1 THEN ay + dy1 * (d / l1)
       WHEN d <= l1 + l2 THEN by + dy2 * ((d - l1) / l2)
       ELSE cy END AS my,
  loc
FROM mp
"""

  /** q107: sub-line vertex rows rebuilt closed-form — interpolate(d0),
    * the middle vertex iff l1 strictly inside (d0,d1), interpolate(d1);
    * d0/d1 are exact ×2^-2 scalings of tot, comparisons and lerps run
    * the identical op sequence, so the vertex doubles match BIT-exactly
    * with no quantization. */
  def q107LineSub: String = """
WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 1024 AS DOUBLE) / 64.0 AS ax,
    CAST((s_suppkey * 104729) % 1024 AS DOUBLE) / 64.0 AS ay
  FROM supplier),
p2 AS (SELECT *, ax + 1.0 + CAST(q_id % 13 AS DOUBLE) / 2.0 AS bx,
    ay + CAST(q_id % 7 AS DOUBLE) / 4.0 AS by FROM sp),
p3 AS (SELECT *, bx - CAST(q_id % 5 AS DOUBLE) / 2.0 AS cx,
    by + 2.0 + CAST(q_id % 11 AS DOUBLE) / 8.0 AS cy FROM p2),
dg AS (SELECT *, bx - ax AS dx1, by - ay AS dy1, cx - bx AS dx2, cy - by AS dy2 FROM p3),
ll AS (SELECT *, sqrt(dx1*dx1 + dy1*dy1) AS l1, sqrt(dx2*dx2 + dy2*dy2) AS l2 FROM dg),
tt AS (SELECT *, l1 + l2 AS tot FROM ll),
dd AS (SELECT *, tot * 0.25 AS d0, tot * 0.75 AS d1 FROM tt),
verts AS (
  SELECT q_id, 0 AS ord,
    CASE WHEN d0 <= l1 THEN ax + dx1 * (d0 / l1) ELSE bx + dx2 * ((d0 - l1) / l2) END AS x,
    CASE WHEN d0 <= l1 THEN ay + dy1 * (d0 / l1) ELSE by + dy2 * ((d0 - l1) / l2) END AS y
  FROM dd
  UNION ALL
  SELECT q_id, 1, bx, by FROM dd WHERE l1 > d0 AND l1 < d1
  UNION ALL
  SELECT q_id, 2,
    CASE WHEN d1 <= l1 THEN ax + dx1 * (d1 / l1) ELSE bx + dx2 * ((d1 - l1) / l2) END,
    CASE WHEN d1 <= l1 THEN ay + dy1 * (d1 / l1) ELSE by + dy2 * ((d1 - l1) / l2) END
  FROM dd)
SELECT q_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY ord) - 1 AS BIGINT) AS seq,
  x, y
FROM verts
"""

  /** q112: KML writer + parser graded against the generating arithmetic
    * (the q101 shape): the oracle rebuilds the exact KML text — tuples
    * `x,y` space-joined under the shared integer-vs-shortest-decimal
    * contract — and the vertex rows, both UNQUANTIZED. */
  def q112Kml: String = {
    def f(e: String): String =
      s"CASE WHEN ($e) = floor($e) THEN CAST(CAST(($e) AS BIGINT) AS VARCHAR) " +
        s"ELSE CAST(($e) AS VARCHAR) END"
    def pt(x: String, y: String): String =
      s"${f(x)} || ',' || ${f(y)}"
    s"""WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 1024 AS DOUBLE) / 4.0 AS ax,
    CAST((s_suppkey * 104729) % 512 AS DOUBLE) AS ay,
    1.0 + CAST(s_suppkey % 7 AS DOUBLE) / 2.0 AS w,
    2.0 + CAST(s_suppkey % 5 AS DOUBLE) AS h
  FROM supplier),
cc AS (
  SELECT q_id, ax, ay, ax + w AS x2, ay + h AS y2, ay + 2.0 * h AS y3 FROM sp),
ks AS (
  SELECT q_id,
    CASE WHEN q_id % 4 = 0 THEN
      '<Point><coordinates>' || ${pt("ax", "ay")} || '</coordinates></Point>'
    WHEN q_id % 4 = 1 THEN
      '<LineString><coordinates>' || ${pt("ax", "ay")} || ' ' ||
        ${pt("x2", "y2")} || ' ' || ${pt("ax", "y3")} ||
        '</coordinates></LineString>'
    WHEN q_id % 4 = 2 THEN
      '<Polygon><outerBoundaryIs><LinearRing><coordinates>' ||
        ${pt("ax", "ay")} || ' ' || ${pt("x2", "ay")} || ' ' ||
        ${pt("x2", "y2")} || ' ' || ${pt("ax", "y2")} || ' ' ||
        ${pt("ax", "ay")} ||
        '</coordinates></LinearRing></outerBoundaryIs></Polygon>'
    ELSE
      '<MultiGeometry><LineString><coordinates>' ||
        ${pt("ax", "ay")} || ' ' || ${pt("x2", "y2")} ||
        '</coordinates></LineString><LineString><coordinates>' ||
        ${pt("ax", "y2")} || ' ' || ${pt("x2", "ay")} ||
        '</coordinates></LineString></MultiGeometry>'
    END AS kml
  FROM cc),
vr AS (
  SELECT q_id, 0 AS seq, ax AS x, ay AS y FROM cc WHERE q_id % 4 = 0
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 1
  UNION ALL SELECT q_id, 1, x2, y2 FROM cc WHERE q_id % 4 = 1
  UNION ALL SELECT q_id, 2, ax, y3 FROM cc WHERE q_id % 4 = 1
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 1, x2, ay FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 2, x2, y2 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 3, ax, y2 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 4, ax, ay FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 1, x2, y2 FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 2, ax, y2 FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 3, x2, ay FROM cc WHERE q_id % 4 = 3)
SELECT v.q_id, k.kml, CAST(v.seq AS BIGINT) AS seq, v.x, v.y
FROM vr v JOIN ks k ON k.q_id = v.q_id
"""
  }

  /** q159: the GML writer + parser graded like q112 — the oracle rebuilds
    * the exact GML 2 text (gml: prefixes, coordinates syntax, member
    * wrappers; tuples under the shared integer-vs-shortest-decimal
    * contract) and the vertex rows, both UNQUANTIZED. */
  def q159Gml: String = {
    def f(e: String): String =
      s"CASE WHEN ($e) = floor($e) THEN CAST(CAST(($e) AS BIGINT) AS VARCHAR) " +
        s"ELSE CAST(($e) AS VARCHAR) END"
    def pt(x: String, y: String): String =
      s"${f(x)} || ',' || ${f(y)}"
    def cs(ts: String): String =
      s"'<gml:coordinates>' || $ts || '</gml:coordinates>'"
    s"""WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 1024 AS DOUBLE) / 4.0 AS ax,
    CAST((s_suppkey * 104729) % 512 AS DOUBLE) AS ay,
    1.0 + CAST(s_suppkey % 7 AS DOUBLE) / 2.0 AS w,
    2.0 + CAST(s_suppkey % 5 AS DOUBLE) AS h
  FROM supplier),
cc AS (
  SELECT q_id, ax, ay, ax + w AS x2, ay + h AS y2, ay + 2.0 * h AS y3 FROM sp),
ks AS (
  SELECT q_id,
    CASE WHEN q_id % 4 = 0 THEN
      '<gml:Point>' || ${cs(pt("ax", "ay"))} || '</gml:Point>'
    WHEN q_id % 4 = 1 THEN
      '<gml:LineString>' ||
        ${cs(s"${pt("ax", "ay")} || ' ' || ${pt("x2", "y2")} || ' ' || ${pt("ax", "y3")}")} ||
        '</gml:LineString>'
    WHEN q_id % 4 = 2 THEN
      '<gml:Polygon><gml:outerBoundaryIs><gml:LinearRing>' ||
        ${cs(s"${pt("ax", "ay")} || ' ' || ${pt("x2", "ay")} || ' ' || ${pt("x2", "y2")} || ' ' || ${pt("ax", "y2")} || ' ' || ${pt("ax", "ay")}")} ||
        '</gml:LinearRing></gml:outerBoundaryIs></gml:Polygon>'
    ELSE
      '<gml:MultiLineString><gml:lineStringMember><gml:LineString>' ||
        ${cs(s"${pt("ax", "ay")} || ' ' || ${pt("x2", "y2")}")} ||
        '</gml:LineString></gml:lineStringMember><gml:lineStringMember><gml:LineString>' ||
        ${cs(s"${pt("ax", "y2")} || ' ' || ${pt("x2", "ay")}")} ||
        '</gml:LineString></gml:lineStringMember></gml:MultiLineString>'
    END AS gml
  FROM cc),
vr AS (
  SELECT q_id, 0 AS seq, ax AS x, ay AS y FROM cc WHERE q_id % 4 = 0
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 1
  UNION ALL SELECT q_id, 1, x2, y2 FROM cc WHERE q_id % 4 = 1
  UNION ALL SELECT q_id, 2, ax, y3 FROM cc WHERE q_id % 4 = 1
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 1, x2, ay FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 2, x2, y2 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 3, ax, y2 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 4, ax, ay FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 1, x2, y2 FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 2, ax, y2 FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 3, x2, ay FROM cc WHERE q_id % 4 = 3)
SELECT v.q_id, k.gml, CAST(v.seq AS BIGINT) AS seq, v.x, v.y
FROM vr v JOIN ks k ON k.q_id = v.q_id
"""
  }

  /** q175: the GPX writer + parser graded like q112/q159 — the oracle
    * rebuilds the exact GPX text (positions as lat="y" lon="x" ATTRIBUTE
    * pairs under the shared integer-vs-shortest-decimal contract; tracks
    * as trkseg/trkpt, the MultiPoint branch as a gpx waypoint layer) and
    * the vertex rows, both UNQUANTIZED. */
  def q175Gpx: String = {
    def f(e: String): String =
      s"CASE WHEN ($e) = floor($e) THEN CAST(CAST(($e) AS BIGINT) AS VARCHAR) " +
        s"ELSE CAST(($e) AS VARCHAR) END"
    def pt(tag: String, x: String, y: String): String =
      s"'<$tag lat=\"' || ${f(y)} || '\" lon=\"' || ${f(x)} || '\"/>'"
    s"""WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 1024 AS DOUBLE) / 4.0 AS ax,
    CAST((s_suppkey * 104729) % 512 AS DOUBLE) AS ay,
    1.0 + CAST(s_suppkey % 7 AS DOUBLE) / 2.0 AS w,
    2.0 + CAST(s_suppkey % 5 AS DOUBLE) AS h
  FROM supplier),
cc AS (
  SELECT q_id, ax, ay, ax + w AS x2, ay + h AS y2, ay + 2.0 * h AS y3 FROM sp),
ks AS (
  SELECT q_id,
    CASE WHEN q_id % 4 = 0 THEN
      ${pt("wpt", "ax", "ay")}
    WHEN q_id % 4 = 1 THEN
      '<trk><trkseg>' || ${pt("trkpt", "ax", "ay")} || ${pt("trkpt", "x2", "y2")} ||
        ${pt("trkpt", "ax", "y3")} || '</trkseg></trk>'
    WHEN q_id % 4 = 2 THEN
      '<trk><trkseg>' || ${pt("trkpt", "ax", "ay")} || ${pt("trkpt", "x2", "y2")} ||
        '</trkseg><trkseg>' || ${pt("trkpt", "ax", "y2")} || ${pt("trkpt", "x2", "ay")} ||
        '</trkseg></trk>'
    ELSE
      '<gpx>' || ${pt("wpt", "ax", "ay")} || ${pt("wpt", "x2", "y2")} || '</gpx>'
    END AS gpx
  FROM cc),
vr AS (
  SELECT q_id, 0 AS seq, ax AS x, ay AS y FROM cc WHERE q_id % 4 = 0
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 1
  UNION ALL SELECT q_id, 1, x2, y2 FROM cc WHERE q_id % 4 = 1
  UNION ALL SELECT q_id, 2, ax, y3 FROM cc WHERE q_id % 4 = 1
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 1, x2, y2 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 2, ax, y2 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 3, x2, ay FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 1, x2, y2 FROM cc WHERE q_id % 4 = 3)
SELECT v.q_id, k.gpx, CAST(v.seq AS BIGINT) AS seq, v.x, v.y
FROM vr v JOIN ks k ON k.q_id = v.q_id
"""
  }

  /** q162: shapefile record round-trip replayed closed-form — record byte
    * lengths from the wire layout (8-byte header + type-specific content
    * sizing), dbf N/C values from their generators, and the vertex
    * sequences in CANONICAL ring order (shell rewound CCW→CW, hole
    * CW→CCW, so the polygon sequences are the REVERSED WKT rings). */
  def q162Shapefile: String =
    """WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 1024 AS DOUBLE) / 4.0 AS ax,
    CAST((s_suppkey * 104729) % 512 AS DOUBLE) AS ay,
    1.0 + CAST(s_suppkey % 7 AS DOUBLE) / 2.0 AS w,
    2.0 + CAST(s_suppkey % 5 AS DOUBLE) AS h
  FROM supplier),
cc AS (
  SELECT q_id, ax, ay, ax + w AS x2, ay + h AS y2, ay + 2.0 * h AS y3,
    ax + w / 4.0 AS hx0, ay + h / 4.0 AS hy0,
    ax + w / 2.0 AS hx1, ay + h / 2.0 AS hy1
  FROM sp),
meta AS (
  SELECT q_id,
    CASE q_id % 4
      WHEN 0 THEN 28   -- 8 + type(4) + point(16)
      WHEN 1 THEN 104  -- 8 + 4 + bbox(32) + counts(8) + parts(4) + 3 pts(48)
      WHEN 2 THEN 220  -- 8 + 4 + 32 + 8 + 2 parts(8) + 10 pts(160)
      ELSE 112         -- 8 + 4 + 32 + count(4) + 4 pts(64)
    END AS rec_len,
    CAST(q_id AS VARCHAR) AS id_back,
    'sup_' || CAST(q_id % 97 AS VARCHAR) AS name_back
  FROM cc),
vr AS (
  SELECT q_id, 0 AS seq, ax AS x, ay AS y FROM cc WHERE q_id % 4 = 0
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 1
  UNION ALL SELECT q_id, 1, x2, y2 FROM cc WHERE q_id % 4 = 1
  UNION ALL SELECT q_id, 2, ax, y3 FROM cc WHERE q_id % 4 = 1
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 1, ax, y2 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 2, x2, y2 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 3, x2, ay FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 4, ax, ay FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 5, hx0, hy0 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 6, hx1, hy0 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 7, hx1, hy1 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 8, hx0, hy1 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 9, hx0, hy0 FROM cc WHERE q_id % 4 = 2
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 1, x2, y2 FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 2, x2, ay FROM cc WHERE q_id % 4 = 3
  UNION ALL SELECT q_id, 3, ax, y2 FROM cc WHERE q_id % 4 = 3)
SELECT v.q_id, CAST(m.rec_len AS BIGINT) AS rec_len,
  CAST(v.q_id AS BIGINT) AS rn, m.id_back, m.name_back,
  CAST(v.seq AS BIGINT) AS seq, v.x, v.y
FROM vr v JOIN meta m ON m.q_id = v.q_id
"""

  /** q243: the GeoPackage cell round-trip replayed arithmetically. The
    * cell's byte length is closed-form: GPKG blob = 8B header + 32B XY
    * envelope + JTS WKB (BE 2-D: point 21, 3-pt line 57, 5-pt 1-ring
    * polygon 93 bytes); record = 5B header (1 + fid-serial 1 + name-
    * serial 1 + blob-serial 2) + minimal-int fid body (0 bytes for fid
    * 0/1 via serials 8/9, 1 below 128, 2 below 32768) + name + blob; cell =
    * varint(payload) + varint(rowid) + payload, each varint 1 byte below
    * 128 and 2 up to 16383. Geometry vertices replay the generating
    * arithmetic verbatim (WKB round-trips doubles bit-exact). */
  def q243Gpkg: String =
    """WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 1024 AS DOUBLE) / 4.0 AS ax,
    CAST((s_suppkey * 104729) % 512 AS DOUBLE) AS ay,
    1.0 + CAST(s_suppkey % 7 AS DOUBLE) / 2.0 AS w,
    2.0 + CAST(s_suppkey % 5 AS DOUBLE) AS h
  FROM supplier),
cc AS (
  SELECT q_id, ax, ay, ax + w AS x2, ay + h AS y2, ay + 2.0 * h AS y3
  FROM sp),
meta AS (
  SELECT q_id,
    CASE q_id % 3 WHEN 0 THEN 61 WHEN 1 THEN 97 ELSE 133 END AS gp_len,
    CASE WHEN q_id <= 1 THEN 0 WHEN q_id < 128 THEN 1 ELSE 2 END AS fid_bytes,
    2 + len(CAST(q_id % 89 AS VARCHAR)) AS name_len,
    'f_' || CAST(q_id % 89 AS VARCHAR) AS name_back
  FROM cc),
m2 AS (
  SELECT q_id, name_back,
    5 + fid_bytes + name_len + gp_len AS payload_len
  FROM meta),
m3 AS (
  SELECT q_id, name_back,
    (CASE WHEN payload_len < 128 THEN 1 ELSE 2 END)
    + (CASE WHEN q_id < 128 THEN 1 ELSE 2 END)
    + payload_len AS cell_len
  FROM m2),
vr AS (
  SELECT q_id, 0 AS seq, ax AS x, ay AS y FROM cc WHERE q_id % 3 = 0
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 3 = 1
  UNION ALL SELECT q_id, 1, x2, y2 FROM cc WHERE q_id % 3 = 1
  UNION ALL SELECT q_id, 2, ax, y3 FROM cc WHERE q_id % 3 = 1
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 3 = 2
  UNION ALL SELECT q_id, 1, x2, ay FROM cc WHERE q_id % 3 = 2
  UNION ALL SELECT q_id, 2, x2, y2 FROM cc WHERE q_id % 3 = 2
  UNION ALL SELECT q_id, 3, ax, y2 FROM cc WHERE q_id % 3 = 2
  UNION ALL SELECT q_id, 4, ax, ay FROM cc WHERE q_id % 3 = 2)
SELECT v.q_id, CAST(m.cell_len AS BIGINT) AS cell_len,
  CAST(v.q_id AS BIGINT) AS rowid_back, CAST(v.q_id AS BIGINT) AS fid_back,
  m.name_back, CAST(4326 AS BIGINT) AS srs_back,
  CAST(v.seq AS BIGINT) AS seq, v.x, v.y
FROM vr v JOIN m3 m ON m.q_id = v.q_id
"""

  /** q144: decontamination replayed in the q24 shingle arithmetic — the
    * benchmark subset's DISTINCT 3-shingle hashes, then any corpus doc
    * owning one of them. */
  def q144Decontaminate: String = {
    ctr = 0
    val shingleHash = hash64("concat_ws(chr(32), ts[__w], ts[__w+1], ts[__w+2])")
    val shortHash = hash64("array_to_string(ts, chr(32))")
    val shExpr =
      "CASE WHEN len(ts) = 0 THEN CAST([] AS HUGEINT[]) " +
        s"WHEN len(ts) < 3 THEN [$shortHash] " +
        s"ELSE list_distinct(list_transform(range(1, len(ts)-1), __w -> $shingleHash)) END"
    s"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS n FROM documents),
toks AS (
  SELECT doc_id, CASE WHEN n = '' THEN CAST([] AS VARCHAR[]) ELSE string_split(n, ' ') END AS ts FROM norm),
sh AS (SELECT doc_id, $shExpr AS sh FROM toks),
bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 97 = 0),
docsh AS (SELECT doc_id, unnest(sh) AS s FROM sh)
SELECT DISTINCT d.doc_id, TRUE AS contaminated
FROM docsh d JOIN bench b ON d.s = b.s
"""
  }

  /** q206: the Bloom prefilter graded at CONTRACT level — a probe
    * position is set iff some benchmark shingle produced it (the packed
    * long words are the engine's implementation detail; membership
    * semantics are identical). Positions = unsigned low 15 bits and the
    * next 15 (s % 2^15, (s // 2^15) % 2^15 on the HUGEINT hash — the
    * engine's positive-mask AND law under the 2^64 congruence). */
  def q206BloomDecontaminate: String = {
    ctr = 0
    val shingleHash = hash64("concat_ws(chr(32), ts[__w], ts[__w+1], ts[__w+2])")
    val shortHash = hash64("array_to_string(ts, chr(32))")
    val shExpr =
      "CASE WHEN len(ts) = 0 THEN CAST([] AS HUGEINT[]) " +
        s"WHEN len(ts) < 3 THEN [$shortHash] " +
        s"ELSE list_distinct(list_transform(range(1, len(ts)-1), __w -> $shingleHash)) END"
    s"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS n FROM documents),
toks AS (
  SELECT doc_id, CASE WHEN n = '' THEN CAST([] AS VARCHAR[]) ELSE string_split(n, ' ') END AS ts FROM norm),
sh AS (SELECT doc_id, $shExpr AS sh FROM toks),
bench AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 97 = 0),
bpos AS (
  SELECT DISTINCT unnest([s % 32768, (s // 32768) % 32768]) AS p FROM bench),
docsh AS (SELECT doc_id, unnest(sh) AS s FROM sh),
probe AS (
  SELECT doc_id, s FROM docsh
  WHERE s % 32768 IN (SELECT p FROM bpos)
    AND (s // 32768) % 32768 IN (SELECT p FROM bpos)),
bloomdocs AS (SELECT DISTINCT doc_id FROM probe),
exactdocs AS (SELECT DISTINCT p.doc_id FROM probe p JOIN bench b ON p.s = b.s)
SELECT bd.doc_id, CAST(1 AS BIGINT) AS bloom_hit,
  CAST(CASE WHEN ed.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS exact_hit
FROM bloomdocs bd LEFT JOIN exactdocs ed ON ed.doc_id = bd.doc_id
"""
  }

  /** q142: the OGR CSV driver graded against the generating arithmetic —
    * the oracle rebuilds the ENTIRE record string (conditional RFC-4180
    * quoting: the name field quotes + doubles its embedded quotes, the
    * WKT field quotes iff it contains a comma — POINTs don't) plus the
    * recovered name and the parsed-back vertex rows. Coordinates print
    * %.2f on quarters (exact, identical in Java and DuckDB printf), so
    * everything compares UNQUANTIZED. */
  def q142CsvDriver: String = {
    def p2(x: String, y: String) = s"printf('%.2f %.2f', $x, $y)"
    s"""WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 1024 AS DOUBLE) / 4.0 AS ax,
    CAST((s_suppkey * 104729) % 512 AS DOUBLE) AS ay,
    1.0 + CAST(s_suppkey % 7 AS DOUBLE) / 2.0 AS w,
    2.0 + CAST(s_suppkey % 5 AS DOUBLE) AS h
  FROM supplier),
cc AS (SELECT q_id, ax, ay, ax + w AS x2, ay + h AS y2 FROM sp),
wk AS (
  SELECT q_id,
    CASE WHEN q_id % 3 = 0 THEN 'POINT(' || ${p2("ax", "ay")} || ')'
    WHEN q_id % 3 = 1 THEN
      'LINESTRING(' || ${p2("ax", "ay")} || ', ' || ${p2("x2", "y2")} || ')'
    ELSE 'POLYGON((' || ${p2("ax", "ay")} || ', ' || ${p2("x2", "ay")} || ', ' ||
      ${p2("x2", "y2")} || ', ' || ${p2("ax", "y2")} || ', ' || ${p2("ax", "ay")} || '))'
    END AS wkt
  FROM cc),
ln AS (
  SELECT w.q_id,
    CAST(w.q_id AS VARCHAR) || ',' ||
    '"n' || CAST(w.q_id AS VARCHAR) || ', ""v' || CAST(w.q_id % 7 AS VARCHAR) || '""' || '"' || ',' ||
    CASE WHEN w.q_id % 3 = 0 THEN w.wkt ELSE '"' || w.wkt || '"' END AS line,
    printf('n%d, "v%d"', w.q_id, w.q_id % 7) AS name_back
  FROM wk w),
vr AS (
  SELECT q_id, 0 AS seq, ax AS x, ay AS y FROM cc WHERE q_id % 3 = 0
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 3 = 1
  UNION ALL SELECT q_id, 1, x2, y2 FROM cc WHERE q_id % 3 = 1
  UNION ALL SELECT q_id, 0, ax, ay FROM cc WHERE q_id % 3 = 2
  UNION ALL SELECT q_id, 1, x2, ay FROM cc WHERE q_id % 3 = 2
  UNION ALL SELECT q_id, 2, x2, y2 FROM cc WHERE q_id % 3 = 2
  UNION ALL SELECT q_id, 3, ax, y2 FROM cc WHERE q_id % 3 = 2
  UNION ALL SELECT q_id, 4, ax, ay FROM cc WHERE q_id % 3 = 2)
SELECT v.q_id, l.line, l.name_back, CAST(v.seq AS BIGINT) AS seq, v.x, v.y
FROM vr v JOIN ln l ON l.q_id = v.q_id
"""
  }

  /** q120: the streaming sessionizer replayed in its OWN arithmetic —
    * epoch-millisecond gaps (micros truncate identically on both
    * engines) with the engine's (ms, event_id) sort order, so the
    * batch replica produces exactly the sessions the stateful streaming
    * query emits once the sentinel batches flush its state. */
  def q120StreamSessionize: String = """
WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
g AS (
  SELECT user_id, event_id, ms,
    CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 1800000
         THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
s AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms, event_id
    ROWS UNBOUNDED PRECEDING) AS sid
  FROM g)
SELECT user_id, CAST(min(ms) AS BIGINT) AS start_ms,
  count(*) AS n_events, CAST(min(event_id) AS BIGINT) AS first_event
FROM s GROUP BY user_id, sid
"""

  /** q118: layer-algebra Identity replayed closed-form. Intersections are
    * GREATEST/LEAST rectangles; differences are rectangles or Ls whose
    * exact shoelace area is areaA − areaInt and whose envelope collapses
    * a side exactly when the method box covers that side's full strip
    * (edges never coincide across the two lattices, so every comparison
    * is strict). All coordinates are multiples of 1/8 ≤ 2^10 — every
    * product stays under 53 bits, both engines produce the same exact
    * doubles, NO quantization. */
  def q118LayerIdentity: String = """
WITH sp AS (SELECT s_suppkey AS q_id, s_suppkey % 32 AS rid FROM supplier),
aa AS (SELECT q_id, rid,
    CAST(rid * 32 AS DOUBLE) + 2.0 + CAST((q_id * 7919) % 96 AS DOUBLE) / 4.0 AS x0,
    2.0 + CAST((q_id * 104729) % 96 AS DOUBLE) / 4.0 AS y0
  FROM sp),
a2 AS (SELECT *, x0 + 1.0 + CAST(q_id % 14 AS DOUBLE) / 4.0 AS x1,
    y0 + 1.0 + CAST(q_id % 11 AS DOUBLE) / 4.0 AS y1 FROM aa),
bb AS (SELECT r.i AS rid,
    CAST(r.i * 32 AS DOUBLE) + 6.125 + CAST(r.i % 3 AS DOUBLE) AS u0,
    6.125 + CAST(r.i % 5 AS DOUBLE) AS v0
  FROM generate_series(0, 31) r(i)),
b2 AS (SELECT *, u0 + 14.0 AS u1, v0 + 12.0 AS v1 FROM bb),
j AS (SELECT a2.q_id, a2.x0, a2.y0, a2.x1, a2.y1, b2.u0, b2.v0, b2.u1, b2.v1
  FROM a2 JOIN b2 USING (rid)),
ii AS (SELECT *, GREATEST(x0, u0) AS ix0, GREATEST(y0, v0) AS iy0,
    LEAST(x1, u1) AS ix1, LEAST(y1, v1) AS iy1,
    (GREATEST(x0, u0) < LEAST(x1, u1) AND GREATEST(y0, v0) < LEAST(y1, v1)) AS hasint
  FROM j)
SELECT q_id, 'int' AS kind,
  (ix1 - ix0) * (iy1 - iy0) AS area,
  ix0 AS xmin, iy0 AS ymin, ix1 AS xmax, iy1 AS ymax
FROM ii WHERE hasint
UNION ALL
SELECT q_id, 'diff',
  (x1 - x0) * (y1 - y0) - CASE WHEN hasint THEN (ix1 - ix0) * (iy1 - iy0) ELSE 0.0 END,
  CASE WHEN hasint AND u0 < x0 AND v0 < y0 AND v1 > y1 THEN ix1 ELSE x0 END,
  CASE WHEN hasint AND v0 < y0 AND u0 < x0 AND u1 > x1 THEN iy1 ELSE y0 END,
  CASE WHEN hasint AND u1 > x1 AND v0 < y0 AND v1 > y1 THEN ix0 ELSE x1 END,
  CASE WHEN hasint AND v1 > y1 AND u0 < x0 AND u1 > x1 THEN iy0 ELSE y1 END
FROM ii
WHERE NOT (hasint AND u0 < x0 AND u1 > x1 AND v0 < y0 AND v1 > y1)
"""

  /** q126: layer-algebra Update — q118's diff arithmetic for the 'keep'
    * pieces plus every method box verbatim as an 'upd' row (keyed
    * rid−1000 to stay disjoint from supplier q_ids). */
  def q126LayerUpdate: String = """
WITH sp AS (SELECT s_suppkey AS q_id, s_suppkey % 32 AS rid FROM supplier),
aa AS (SELECT q_id, rid,
    CAST(rid * 32 AS DOUBLE) + 2.0 + CAST((q_id * 7919) % 96 AS DOUBLE) / 4.0 AS x0,
    2.0 + CAST((q_id * 104729) % 96 AS DOUBLE) / 4.0 AS y0
  FROM sp),
a2 AS (SELECT *, x0 + 1.0 + CAST(q_id % 14 AS DOUBLE) / 4.0 AS x1,
    y0 + 1.0 + CAST(q_id % 11 AS DOUBLE) / 4.0 AS y1 FROM aa),
bb AS (SELECT r.i AS rid,
    CAST(r.i * 32 AS DOUBLE) + 6.125 + CAST(r.i % 3 AS DOUBLE) AS u0,
    6.125 + CAST(r.i % 5 AS DOUBLE) AS v0
  FROM generate_series(0, 31) r(i)),
b2 AS (SELECT *, u0 + 14.0 AS u1, v0 + 12.0 AS v1 FROM bb),
j AS (SELECT a2.q_id, a2.x0, a2.y0, a2.x1, a2.y1, b2.u0, b2.v0, b2.u1, b2.v1
  FROM a2 JOIN b2 USING (rid)),
ii AS (SELECT *, GREATEST(x0, u0) AS ix0, GREATEST(y0, v0) AS iy0,
    LEAST(x1, u1) AS ix1, LEAST(y1, v1) AS iy1,
    (GREATEST(x0, u0) < LEAST(x1, u1) AND GREATEST(y0, v0) < LEAST(y1, v1)) AS hasint
  FROM j)
SELECT q_id, 'keep' AS kind,
  (x1 - x0) * (y1 - y0) - CASE WHEN hasint THEN (ix1 - ix0) * (iy1 - iy0) ELSE 0.0 END AS area,
  CASE WHEN hasint AND u0 < x0 AND v0 < y0 AND v1 > y1 THEN ix1 ELSE x0 END AS xmin,
  CASE WHEN hasint AND v0 < y0 AND u0 < x0 AND u1 > x1 THEN iy1 ELSE y0 END AS ymin,
  CASE WHEN hasint AND u1 > x1 AND v0 < y0 AND v1 > y1 THEN ix0 ELSE x1 END AS xmax,
  CASE WHEN hasint AND v1 > y1 AND u0 < x0 AND u1 > x1 THEN iy0 ELSE y1 END AS ymax
FROM ii
WHERE NOT (hasint AND u0 < x0 AND u1 > x1 AND v0 < y0 AND v1 > y1)
UNION ALL
SELECT rid - 1000, 'upd', (u1 - u0) * (v1 - v0), u0, v0, u1, v1 FROM b2
"""

  /** q210: layer-algebra Erase + SymDifference — erase rows reuse the
    * q118 rect-minus-rect diff arithmetic (single method rectangle per
    * region); the method-side rows are closed-form because same-region
    * inputs are disjoint (area = B minus the intersection sum) and no
    * input can contain a B corner (envelope = B's own). */
  /** Shared q210/q231 rectangle-corpus CTE chain (see SparkEntry's
    * algebraRects for the geometric invariants that keep every leg
    * closed-form). */
  private val algebraCtes: String = """
WITH sp AS (SELECT s_suppkey AS q_id, s_suppkey % 32 AS rid, s_suppkey // 32 AS k
  FROM supplier WHERE s_suppkey < 256),
cells AS (SELECT * FROM (VALUES (0,1,0),(1,3,0),(2,0,1),(3,1,1),(4,2,1),(5,3,1),(6,1,2),(7,3,2)) c(k, cx, cy)),
aa AS (SELECT q_id, rid,
    CAST(rid*32 + cx*8 AS DOUBLE) + 0.25 + CAST((q_id*7919) % 8 AS DOUBLE)/4.0 AS x0,
    CAST(cy*8 AS DOUBLE) + 0.25 + CAST((q_id*104729) % 8 AS DOUBLE)/4.0 AS y0
  FROM sp JOIN cells USING (k)),
a2 AS (SELECT *, x0 + 1.0 + CAST(q_id % 14 AS DOUBLE)/4.0 AS x1,
    y0 + 1.0 + CAST(q_id % 11 AS DOUBLE)/4.0 AS y1 FROM aa),
bb AS (SELECT r.i AS rid, CAST(r.i*32 AS DOUBLE) + 2.125 + CAST(r.i % 3 AS DOUBLE) AS u0,
    2.125 + CAST(r.i % 5 AS DOUBLE) AS v0 FROM generate_series(0, 31) r(i)),
b2 AS (SELECT *, u0 + 17.0 AS u1, v0 + 16.0 AS v1 FROM bb),
j AS (SELECT a2.q_id, a2.x0, a2.y0, a2.x1, a2.y1, b2.u0, b2.v0, b2.u1, b2.v1, a2.rid
  FROM a2 JOIN b2 USING (rid)),
ii AS (SELECT *, GREATEST(x0, u0) AS ix0, GREATEST(y0, v0) AS iy0,
    LEAST(x1, u1) AS ix1, LEAST(y1, v1) AS iy1,
    (GREATEST(x0, u0) < LEAST(x1, u1) AND GREATEST(y0, v0) < LEAST(y1, v1)) AS hasint
  FROM j),
bsum AS (SELECT rid, sum(CASE WHEN hasint THEN (ix1 - ix0) * (iy1 - iy0) ELSE 0.0 END) AS cut
  FROM ii GROUP BY rid)"""

  /** q231: Union mode = the q210 erase + bside legs plus the A∩B pieces
    * (axis-aligned rect ∩ rect = the ii rectangle itself). */
  def q231LayerUnion: String = algebraCtes + """
SELECT q_id, 'int' AS kind,
  (ix1 - ix0) * (iy1 - iy0) AS area, ix0 AS xmin, iy0 AS ymin,
  ix1 AS xmax, iy1 AS ymax
FROM ii WHERE hasint
UNION ALL
SELECT q_id, 'erase' AS kind,
  (x1 - x0) * (y1 - y0) - CASE WHEN hasint THEN (ix1 - ix0) * (iy1 - iy0) ELSE 0.0 END AS area,
  CASE WHEN hasint AND u0 < x0 AND v0 < y0 AND v1 > y1 THEN ix1 ELSE x0 END AS xmin,
  CASE WHEN hasint AND v0 < y0 AND u0 < x0 AND u1 > x1 THEN iy1 ELSE y0 END AS ymin,
  CASE WHEN hasint AND u1 > x1 AND v0 < y0 AND v1 > y1 THEN ix0 ELSE x1 END AS xmax,
  CASE WHEN hasint AND v1 > y1 AND u0 < x0 AND u1 > x1 THEN iy0 ELSE y1 END AS ymax
FROM ii
WHERE NOT (hasint AND u0 < x0 AND u1 > x1 AND v0 < y0 AND v1 > y1)
UNION ALL
SELECT b2.rid - 1000, 'bside',
  (u1 - u0) * (v1 - v0) - COALESCE(cut, 0.0),
  u0, v0, u1, v1
FROM b2 LEFT JOIN bsum ON b2.rid = bsum.rid
"""

  def q210LayerEraseSymdiff: String = algebraCtes + """
SELECT q_id, 'erase' AS kind,
  (x1 - x0) * (y1 - y0) - CASE WHEN hasint THEN (ix1 - ix0) * (iy1 - iy0) ELSE 0.0 END AS area,
  CASE WHEN hasint AND u0 < x0 AND v0 < y0 AND v1 > y1 THEN ix1 ELSE x0 END AS xmin,
  CASE WHEN hasint AND v0 < y0 AND u0 < x0 AND u1 > x1 THEN iy1 ELSE y0 END AS ymin,
  CASE WHEN hasint AND u1 > x1 AND v0 < y0 AND v1 > y1 THEN ix0 ELSE x1 END AS xmax,
  CASE WHEN hasint AND v1 > y1 AND u0 < x0 AND u1 > x1 THEN iy0 ELSE y1 END AS ymax
FROM ii
WHERE NOT (hasint AND u0 < x0 AND u1 > x1 AND v0 < y0 AND v1 > y1)
UNION ALL
SELECT b2.rid - 1000, 'bside',
  (u1 - u0) * (v1 - v0) - COALESCE(cut, 0.0),
  u0, v0, u1, v1
FROM b2 LEFT JOIN bsum ON b2.rid = bsum.rid
"""

  /** q111: Douglas–Peucker keep/drop replayed as ground truth — the
    * apex's perpendicular distance to the horizontal base is exactly h
    * (apex x strictly interior), so the simplifier's decision must equal
    * `h > tol` and survivors are bit-exact input vertices. */
  def q111Simplify: String = """
WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 1024 AS DOUBLE) / 64.0 AS ax,
    CAST((s_suppkey * 104729) % 1024 AS DOUBLE) / 64.0 AS ay
  FROM supplier),
p2 AS (SELECT *, 4.0 + CAST(q_id % 3 AS DOUBLE) AS ln,
    ax + 1.0 + CAST(q_id % 2 AS DOUBLE) AS mx,
    CAST(q_id % 8 AS DOUBLE) / 4.0 AS h FROM sp),
p3 AS (SELECT *, CASE WHEN q_id % 2 = 0 THEN ay + h ELSE ay - h END AS my FROM p2),
verts AS (
  SELECT q_id, 0 AS ord, ax AS x, ay AS y FROM p3
  UNION ALL
  SELECT q_id, 1, mx, my FROM p3 WHERE h > 0.875
  UNION ALL
  SELECT q_id, 2, ax + ln, ay FROM p3)
SELECT q_id,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY ord) - 1 AS BIGINT) AS seq,
  x, y
FROM verts
"""

  /** q122: gdal2xyz pixel-center dump — dyadic geotransform, every
    * coordinate exact, UNQUANTIZED. */
  def q122Gdal2xyz: String = """
WITH px AS (
  SELECT gx.x AS gx, gy.y AS gy
  FROM generate_series(0, 1023) gx(x), generate_series(0, 63) gy(y)),
v AS (
  SELECT gx, gy,
    CAST(((gx//64)*131 + (gy//64)*173 + (gx%64)*7 + (gy%64)*11 + 3) % 256 AS DOUBLE) AS v
  FROM px)
SELECT -32.0 + (CAST(gx AS DOUBLE) + 0.5) * 0.25 AS x,
       64.0 - (CAST(gy AS DOUBLE) + 0.5) * 0.25 AS y,
       v
FROM v WHERE v <> 0
"""

  /** q123: gdalcompare census — both value functions replayed per-pixel
    * (the +3 vs +4 zoom seeds), exact integer diffs. */
  def q123GdalCompare: String = """
WITH px AS (
  SELECT gx.x AS gx, gy.y AS gy
  FROM generate_series(0, 1023) gx(x), generate_series(0, 511) gy(y)),
v AS (
  SELECT
    ((gx//64)*131 + (gy//64)*173 + (gx%64)*7 + (gy%64)*11 + 3) % 256 AS v3,
    ((gx//64)*131 + (gy//64)*173 + (gx%64)*7 + (gy%64)*11 + 4) % 256 AS v4
  FROM px)
SELECT CAST(count(CASE WHEN v3 <> v4 THEN 1 END) AS BIGINT) AS pixels_differing,
  CAST(max(abs(v3 - v4)) AS BIGINT) AS max_abs_diff,
  CAST(sum(abs(v3 - v4)) AS BIGINT) AS sum_abs_diff
FROM v
"""

  /** q113: band statistics replayed per-pixel over the closed-form
    * zoom-3 grid. The mean/std expressions are graft.operators.Raster's
    * own SQL strings verbatim (same-string trick), fed by exact integer
    * sums on both sides — bit-exact with no quantization. */
  def q113BandStats: String = {
    val mean = graft.operators.Raster.bandStatsMeanSql
    val std = graft.operators.Raster.bandStatsStdSql
    s"""WITH px AS (
  SELECT gx.x AS gx, gy.y AS gy
  FROM generate_series(0, 1023) gx(x), generate_series(0, 511) gy(y)),
v AS (
  SELECT CAST(((gx // 64)*131 + (gy // 64)*173 + (gx % 64)*7 + (gy % 64)*11 + 3) % 256 AS BIGINT) AS val
  FROM px),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(val) AS BIGINT) AS s,
    CAST(sum(val * val) AS BIGINT) AS sq,
    CAST(min(val) AS BIGINT) AS mn, CAST(max(val) AS BIGINT) AS mx
  FROM v)
SELECT n, mn, mx, $mean AS mean, $std AS std FROM g
"""
  }

  /** q90: RAT per-class stats replayed per-pixel over the closed-form
    * grid; engine sums are exact BIGINT by construction, so plain
    * integer aggregation matches (outer CASTs per the q56 HUGEINT
    * lesson). */
  def q90Rat: String = """
WITH px AS (
  SELECT dx.i AS gx, dy.i AS gy
  FROM generate_series(0, 1023) dx(i), generate_series(0, 511) dy(i)),
v AS (
  SELECT ((gx // 64)*131 + (gy // 64)*173 + (gx % 64)*7 + (gy % 64)*11 + 3) % 256 AS val
  FROM px)
SELECT CAST(floor(CAST(val AS DOUBLE) / 16.0) AS BIGINT) AS cls,
  CAST(count(*) AS BIGINT) AS cnt,
  min(CAST(val AS DOUBLE)) AS mn,
  max(CAST(val AS DOUBLE)) AS mx,
  CAST(sum(CAST(val AS BIGINT)) AS BIGINT) AS sm
FROM v GROUP BY 1
"""

  /** q91: style-string parse vs direct reconstruction — the oracle
    * rebuilds the (tool, seq, k, v) rows from the same q_id arithmetic
    * the engine used to BUILD the style text, so the engine's parser is
    * graded against ground truth, not against another parser. */
  def q91Style: String = """
WITH sp AS (SELECT s_suppkey AS q_id FROM supplier),
allr AS (
  SELECT q_id, 'PEN' AS tool, CAST(0 AS BIGINT) AS seq, 'c' AS k,
    '#' || printf('%06x', (q_id * 2654435761) % 16777216) AS v
  FROM sp WHERE q_id % 3 = 0
  UNION ALL
  SELECT q_id, 'PEN', CAST(1 AS BIGINT), 'w',
    CAST(q_id % 10 + 1 AS VARCHAR) || 'px' FROM sp WHERE q_id % 3 = 0
  UNION ALL
  SELECT q_id, 'BRUSH', CAST(0 AS BIGINT), 'fc',
    '#' || printf('%06x', (q_id * 2654435761) % 16777216) FROM sp WHERE q_id % 3 = 1
  UNION ALL
  SELECT q_id, 'BRUSH', CAST(1 AS BIGINT), 'bc',
    '#' || printf('%06x', (q_id * 40503) % 16777216) FROM sp WHERE q_id % 3 = 1
  UNION ALL
  SELECT q_id, 'LABEL', CAST(0 AS BIGINT), 'f', 'Arial Narrow' FROM sp WHERE q_id % 3 = 2
  UNION ALL
  SELECT q_id, 'LABEL', CAST(1 AS BIGINT), 's',
    CAST(q_id % 31 + 6 AS VARCHAR) || 'pt' FROM sp WHERE q_id % 3 = 2
  UNION ALL
  SELECT q_id, 'LABEL', CAST(2 AS BIGINT), 't',
    'doc ' || CAST(q_id AS VARCHAR) FROM sp WHERE q_id % 3 = 2)
SELECT q_id, tool, seq, k, v FROM allr
"""

  /** q89: circular-arc linearization replica (core/Arc.linearize). The
    * dyadic lattice makes circumcenter/radius and BOTH endpoint angles
    * bit-exact (exact Cramer sums; atan2(±0,x) is exact in every libm);
    * the ceil carries the engine's own 1e-9 nudge so an exactly-integer
    * sweep/step cannot flip the segment count across libms; interior
    * cos/sin ULPs are absorbed by the 1e-6 quantization. */
  def q89Curve: String = {
    def m2p(x: String): String =
      s"($x - 2.0 * pi() * floor(($x) / (2.0 * pi())))"
    s"""
WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 2048 AS DOUBLE) / 64.0 - 16.0 AS u,
    CAST((s_suppkey * 104729) % 2048 AS DOUBLE) / 64.0 - 16.0 AS v,
    1.0 + CAST(s_suppkey % 57 AS DOUBLE) / 64.0 AS r
  FROM supplier),
pts AS (
  SELECT q_id, u - r AS ax, v AS ay, u AS bx,
    CASE WHEN q_id % 3 = 0 THEN v + r ELSE v - r END AS by,
    CASE WHEN q_id % 3 = 2 THEN u ELSE u + r END AS cx,
    CASE WHEN q_id % 3 = 2 THEN v + r ELSE v END AS cy
  FROM sp),
c1 AS (SELECT *, 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by)) AS d,
    ax * ax + ay * ay AS aa, bx * bx + by * by AS bb, cx * cx + cy * cy AS ccv
  FROM pts),
c2 AS (SELECT *, (aa * (by - cy) + bb * (cy - ay) + ccv * (ay - by)) / d AS ux,
    (aa * (cx - bx) + bb * (ax - cx) + ccv * (bx - ax)) / d AS uy FROM c1),
c3 AS (SELECT *, sqrt((ax - ux) * (ax - ux) + (ay - uy) * (ay - uy)) AS rr,
    atan2(ay - uy, ax - ux) AS a0, atan2(by - uy, bx - ux) AS a1,
    atan2(cy - uy, cx - ux) AS a2 FROM c2),
c4 AS (SELECT *, ${m2p("a1 - a0")} AS ccw1, ${m2p("a2 - a0")} AS ccw2 FROM c3),
c5 AS (SELECT *, ccw1 < ccw2 AS isccw,
    CASE WHEN ccw1 < ccw2 THEN ccw2 ELSE ${m2p("a0 - a2")} END AS sweep FROM c4),
c6 AS (SELECT *, GREATEST(CAST(1 AS BIGINT),
    CAST(ceil(sweep / (pi() / 45.0) - 1.0E-9) AS BIGINT)) AS n FROM c5),
vx AS (SELECT q_id, ux, uy, rr, a0, sweep, isccw, n, gs.i AS seq
  FROM c6, generate_series(0, 68) gs(i) WHERE gs.i <= c6.n),
ang AS (SELECT *,
    CASE WHEN isccw THEN a0 + sweep * CAST(seq AS DOUBLE) / CAST(n AS DOUBLE)
         ELSE a0 - sweep * CAST(seq AS DOUBLE) / CAST(n AS DOUBLE) END AS a
  FROM vx),
fin AS (SELECT q_id, seq, ux + rr * cos(a) AS x, uy + rr * sin(a) AS y FROM ang)
SELECT q_id, CAST(seq AS BIGINT) AS seq,
  CAST(floor(x * 1000000.0 + 0.5) AS BIGINT) AS x_e6,
  CAST(floor(y * 1000000.0 + 0.5) AS BIGINT) AS y_e6
FROM fin
"""
  }

  /** q87: BNG datum-shift forward — the full 4-stage chain (WGS84
    * geodetic → geocentric → Helmert → Airy geodetic via 5 unrolled
    * iterations → TM series) replicated op-for-op with every derived
    * constant (ellipsoid e², series coefficients, M0, Helmert params)
    * embedded as the engine's exact runtime doubles; cm quantization
    * absorbs transcendental ULPs (q73 discipline). */
  def q87Bng: String = {
    import graft.core.Bng._
    def d(x: Double): String = java.lang.Double.toString(x)
    val (sE2W, sAW, sE2A, sAA, sEp2) = (d(e2W), d(aW), d(e2A), d(aA), d(ep2))
    def geoIt(prev: String): String =
      s"atan2(z2 + $sE2A * ($sAA / sqrt(1.0 - $sE2A * sin($prev) * sin($prev))) * sin($prev), p)"
    s"""
WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 12288 AS DOUBLE) / 1024.0 - 8.0 AS lon,
    CAST((s_suppkey * 104729) % 11264 AS DOUBLE) / 1024.0 + 49.5 AS lat
  FROM supplier),
g1 AS (SELECT q_id, (lat / 180.0) * pi() AS phi, (lon / 180.0) * pi() AS lam FROM sp),
g2 AS (SELECT *, sin(phi) AS sphi, cos(phi) AS cphi FROM g1),
g3 AS (SELECT *, $sAW / sqrt(1.0 - $sE2W * sphi * sphi) AS nu FROM g2),
g4 AS (SELECT q_id,
    nu * cphi * cos(lam) AS x, nu * cphi * sin(lam) AS y,
    nu * (1.0 - $sE2W) * sphi AS z
  FROM g3),
h1 AS (SELECT q_id,
    ${d(tx)} + ${d(hs)} * (x - ${d(rz)} * y + ${d(ry)} * z) AS x2,
    ${d(ty)} + ${d(hs)} * (${d(rz)} * x + y - ${d(rx)} * z) AS y2,
    ${d(tz)} + ${d(hs)} * (${d(-ry)} * x + ${d(rx)} * y + z) AS z2
  FROM g4),
a1 AS (SELECT *, sqrt(x2 * x2 + y2 * y2) AS p, atan2(y2, x2) AS lam2 FROM h1),
i0 AS (SELECT *, atan2(z2, p * (1.0 - $sE2A)) AS p0 FROM a1),
i1 AS (SELECT *, ${geoIt("p0")} AS p1 FROM i0),
i2 AS (SELECT *, ${geoIt("p1")} AS p2 FROM i1),
i3 AS (SELECT *, ${geoIt("p2")} AS p3 FROM i2),
i4 AS (SELECT *, ${geoIt("p3")} AS p4 FROM i3),
i5 AS (SELECT *, ${geoIt("p4")} AS p5 FROM i4),
t1 AS (SELECT q_id, lam2, p5 AS phi2 FROM i5),
t2 AS (SELECT *, sin(phi2) AS s2a, cos(phi2) AS c2a, tan(phi2) AS tn FROM t1),
t3 AS (SELECT *,
    $sAA / sqrt(1.0 - $sE2A * s2a * s2a) AS nu2,
    tn * tn AS ttt, $sEp2 * c2a * c2a AS ccc,
    c2a * (lam2 - ${d(lon0Rad)}) AS ba
  FROM t2),
t4 AS (SELECT *, ba * ba AS a2 FROM t3),
t5 AS (SELECT *, a2 * ba AS a3, a2 * a2 AS a4 FROM t4),
t6 AS (SELECT *, a4 * ba AS a5, a4 * a2 AS a6,
    $sAA * (${d(m0c)} * phi2 - ${d(m2c)} * sin(2.0 * phi2) + ${d(m4c)} * sin(4.0 * phi2) - ${d(m6c)} * sin(6.0 * phi2)) AS mm
  FROM t5),
fin AS (SELECT q_id,
    ${d(fe)} + ${d(k0)} * nu2 * (ba + (1.0 - ttt + ccc) * a3 / 6.0 +
      (5.0 - 18.0 * ttt + ttt * ttt + 72.0 * ccc - 58.0 * $sEp2) * a5 / 120.0) AS e_m,
    ${d(fn)} + ${d(k0)} * (mm - ${d(m0v)} + nu2 * tn * (a2 / 2.0 +
      (5.0 - ttt + 9.0 * ccc + 4.0 * ccc * ccc) * a4 / 24.0 +
      (61.0 - 58.0 * ttt + ttt * ttt + 600.0 * ccc - 330.0 * $sEp2) * a6 / 720.0)) AS n_m
  FROM t6)
SELECT q_id,
  CAST(floor(e_m * 100.0 + 0.5) AS BIGINT) AS e_cm,
  CAST(floor(n_m * 100.0 + 0.5) AS BIGINT) AS n_cm
FROM fin
"""
  }

  /** q88: BNG inverse — TM footpoint series, Airy geocentric,
    * reverse-sign Helmert, then the WGS84 5-step φ chain; constants and
    * op order exactly the engine's (core/Bng.inverse). */
  def q88BngInv: String = {
    import graft.core.Bng._
    def d(x: Double): String = java.lang.Double.toString(x)
    val (sE2W, sAW, sE2A, sAA, sEp2) = (d(e2W), d(aW), d(e2A), d(aA), d(ep2))
    def geoIt(prev: String): String =
      s"atan2(z2 + $sE2W * ($sAW / sqrt(1.0 - $sE2W * sin($prev) * sin($prev))) * sin($prev), p)"
    s"""
WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST(100000 + (s_suppkey * 48271) % 500001 AS DOUBLE) AS e_m,
    CAST((s_suppkey * 16807) % 1100001 AS DOUBLE) AS n_m
  FROM supplier),
u1 AS (SELECT *, ((n_m - ${d(fn)}) / ${d(k0)} + ${d(m0v)}) / ${d(muDen)} AS mu FROM sp),
u2 AS (SELECT *, mu + ${d(f2c)} * sin(2.0 * mu) + ${d(f4c)} * sin(4.0 * mu) +
    ${d(f6c)} * sin(6.0 * mu) + ${d(f8c)} * sin(8.0 * mu) AS phi1 FROM u1),
u3 AS (SELECT *, sin(phi1) AS s1a, cos(phi1) AS c1a, tan(phi1) AS t1a FROM u2),
u4 AS (SELECT *, sqrt(1.0 - $sE2A * s1a * s1a) AS den FROM u3),
u5 AS (SELECT *, $sAA / den AS nu1, $sAA * (1.0 - $sE2A) / (den * den * den) AS rho1 FROM u4),
u6 AS (SELECT *, (e_m - ${d(fe)}) / (nu1 * ${d(k0)}) AS dd,
    t1a * t1a AS ttt1, $sEp2 * c1a * c1a AS cc1a FROM u5),
u7 AS (SELECT *, dd * dd AS d2 FROM u6),
u8 AS (SELECT *, d2 * dd AS d3, d2 * d2 AS d4 FROM u7),
u9 AS (SELECT *, d4 * dd AS d5, d4 * d2 AS d6 FROM u8),
v1 AS (SELECT q_id,
    phi1 - (nu1 * t1a / rho1) * (d2 / 2.0 -
      (5.0 + 3.0 * ttt1 + 10.0 * cc1a - 4.0 * cc1a * cc1a - 9.0 * $sEp2) * d4 / 24.0 +
      (61.0 + 90.0 * ttt1 + 298.0 * cc1a + 45.0 * ttt1 * ttt1 - 252.0 * $sEp2 -
        3.0 * cc1a * cc1a) * d6 / 720.0) AS phi2,
    ${d(lon0Rad)} + (dd - (1.0 + 2.0 * ttt1 + cc1a) * d3 / 6.0 +
      (5.0 - 2.0 * cc1a + 28.0 * ttt1 - 3.0 * cc1a * cc1a + 8.0 * $sEp2 +
        24.0 * ttt1 * ttt1) * d5 / 120.0) / c1a AS lam2
  FROM u9),
v2 AS (SELECT *, sin(phi2) AS sp2, cos(phi2) AS cp2 FROM v1),
v3 AS (SELECT *, $sAA / sqrt(1.0 - $sE2A * sp2 * sp2) AS nv FROM v2),
v4 AS (SELECT q_id,
    nv * cp2 * cos(lam2) AS x, nv * cp2 * sin(lam2) AS y,
    nv * (1.0 - $sE2A) * sp2 AS z
  FROM v3),
w1 AS (SELECT q_id,
    ${d(-tx)} + ${d(hsInv)} * (x + ${d(rz)} * y - ${d(ry)} * z) AS x2,
    ${d(-ty)} + ${d(hsInv)} * (${d(-rz)} * x + y + ${d(rx)} * z) AS y2,
    ${d(-tz)} + ${d(hsInv)} * (${d(ry)} * x - ${d(rx)} * y + z) AS z2
  FROM v4),
a1 AS (SELECT *, sqrt(x2 * x2 + y2 * y2) AS p, atan2(y2, x2) AS lam FROM w1),
i0 AS (SELECT *, atan2(z2, p * (1.0 - $sE2W)) AS p0 FROM a1),
i1 AS (SELECT *, ${geoIt("p0")} AS p1 FROM i0),
i2 AS (SELECT *, ${geoIt("p1")} AS p2 FROM i1),
i3 AS (SELECT *, ${geoIt("p2")} AS p3 FROM i2),
i4 AS (SELECT *, ${geoIt("p3")} AS p4 FROM i3),
i5 AS (SELECT *, ${geoIt("p4")} AS p5 FROM i4),
fin AS (SELECT q_id,
    (lam * 180.0) / pi() AS lon, (p5 * 180.0) / pi() AS lat
  FROM i5)
SELECT q_id,
  CAST(floor(lon * 1000000.0 + 0.5) AS BIGINT) AS lon_e6,
  CAST(floor(lat * 1000000.0 + 0.5) AS BIGINT) AS lat_e6
FROM fin
"""
  }

  /** q85: per-point polar stereographic variant B forward (EPSG 9829,
    * core/Ps.forward) under the q73/q80 discipline: the single derived
    * constant k = a·mF/tF embeds per CRS as the engine's exact runtime
    * double, identical IEEE op order, cm quantization absorbs the
    * transcendental ULPs. Both CRS are WGS84, so e / e/2 are shared. */
  def q85Ps(qptsSql: String): String = {
    val c1 = graft.core.Ps.crs3031; val c2 = graft.core.Ps.crs3413
    def d(x: Double): String = java.lang.Double.toString(x)
    val e = d(c1.e); val he = d(c1.halfE)
    s"""
WITH qp AS ($qptsSql),
c AS (
  SELECT q_id, lon, lat,
    CASE WHEN q_id % 2 = 0 THEN 3031 ELSE 3413 END AS epsg,
    CASE WHEN q_id % 2 = 0 THEN ${d(c1.k)} ELSE ${d(c2.k)} END AS kk,
    CASE WHEN q_id % 2 = 0 THEN 0.0 ELSE -45.0 END AS lon0,
    q_id % 2 = 0 AS south
  FROM qp),
w AS (
  SELECT *, CASE WHEN lon - lon0 > 180.0 THEN lon - lon0 - 360.0
                 WHEN lon - lon0 < -180.0 THEN lon - lon0 + 360.0
                 ELSE lon - lon0 END AS lamd FROM c),
s1 AS (SELECT *, (lat / 180.0) * pi() AS phi, (lamd / 180.0) * pi() AS lam FROM w),
s2 AS (SELECT *, sin(phi) AS sphi FROM s1),
s3 AS (SELECT *,
    CASE WHEN south
      THEN tan(pi() / 4.0 + phi / 2.0) * exp($he * ln((1.0 - $e * sphi) / (1.0 + $e * sphi)))
      ELSE tan(pi() / 4.0 - phi / 2.0) * exp($he * ln((1.0 + $e * sphi) / (1.0 - $e * sphi)))
    END AS tt
  FROM s2),
s4 AS (SELECT *, kk * tt AS rho FROM s3),
fin AS (
  SELECT q_id, epsg,
    0.0 + rho * sin(lam) AS e_m,
    CASE WHEN south THEN 0.0 + rho * cos(lam) ELSE 0.0 - rho * cos(lam) END AS n_m
  FROM s4)
SELECT q_id, CAST(epsg AS INT) AS epsg,
  CAST(floor(e_m * 100.0 + 0.5) AS BIGINT) AS e_cm,
  CAST(floor(n_m * 100.0 + 0.5) AS BIGINT) AS n_cm
FROM fin
"""
  }

  /** q86: polar stereographic inverse — north-form φ fixed-point chain
    * unrolled to the engine's exact 5 steps (q81 trick); south aspect
    * mirrors via 0.0 − p5, bit-equal to the engine's unary negation. */
  def q86PsInv: String = {
    val c1 = graft.core.Ps.crs3031; val c2 = graft.core.Ps.crs3413
    def d(x: Double): String = java.lang.Double.toString(x)
    val e = d(c1.e); val he = d(c1.halfE)
    def it(prev: String): String =
      s"pi() / 2.0 - 2.0 * atan(tp * exp($he * ln((1.0 - $e * sin($prev)) / (1.0 + $e * sin($prev)))))"
    s"""
WITH sp AS (SELECT s_suppkey AS q_id FROM supplier),
c AS (
  SELECT q_id,
    CASE WHEN q_id % 2 = 0 THEN 3031 ELSE 3413 END AS epsg,
    CASE WHEN q_id % 2 = 0 THEN ${d(c1.k)} ELSE ${d(c2.k)} END AS kk,
    CASE WHEN q_id % 2 = 0 THEN 0.0 ELSE -45.0 END AS lon0,
    q_id % 2 = 0 AS south
  FROM sp),
b AS (
  SELECT *,
    CAST((q_id * 48271) % 6000001 - 3000000 AS DOUBLE) AS e_m,
    CAST((q_id * 16807) % 6000001 - 3000000 AS DOUBLE) AS n_m
  FROM c),
x0 AS (SELECT *, e_m - 0.0 AS dx,
  CASE WHEN south THEN n_m - 0.0 ELSE 0.0 - n_m END AS dy FROM b),
r1 AS (SELECT *, sqrt(dx * dx + dy * dy) AS rho, atan2(dx, dy) AS lam FROM x0),
r2 AS (SELECT *, rho / kk AS tp FROM r1),
i0 AS (SELECT *, pi() / 2.0 - 2.0 * atan(tp) AS p0 FROM r2),
i1 AS (SELECT *, ${it("p0")} AS p1 FROM i0),
i2 AS (SELECT *, ${it("p1")} AS p2 FROM i1),
i3 AS (SELECT *, ${it("p2")} AS p3 FROM i2),
i4 AS (SELECT *, ${it("p3")} AS p4 FROM i3),
i5 AS (SELECT *, ${it("p4")} AS p5 FROM i4),
fin AS (
  SELECT q_id, epsg,
    lon0 + (lam * 180.0) / pi() AS lon,
    ((CASE WHEN south THEN 0.0 - p5 ELSE p5 END) * 180.0) / pi() AS lat
  FROM i5)
SELECT q_id, CAST(epsg AS INT) AS epsg,
  CAST(floor(lon * 1000000.0 + 0.5) AS BIGINT) AS lon_e6,
  CAST(floor(lat * 1000000.0 + 0.5) AS BIGINT) AS lat_e6
FROM fin
"""
  }

  /** q83: TPS forward transform. The oracle's samp/line expressions are
    * THE SAME STRINGS (Tps.evalSql) the engine runs through Spark `expr`
    * — op-sequence identity by construction. Coefficients are the solved
    * runtime doubles (the Gaussian elimination is deterministic IEEE
    * arithmetic, identical in any JVM); the only engine-vs-oracle gap is
    * StrictMath-vs-libm ln ULPs, absorbed by milli-pixel quantization. */
  def q83Tps: String = {
    val m = graft.core.Tps.demo
    s"""
WITH qp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 1048576 AS DOUBLE) / 1024.0 AS x,
    CAST((s_suppkey * 104729) % 524288 AS DOUBLE) / 1024.0 AS y
  FROM supplier),
r AS (
  SELECT q_id,
    (${graft.core.Tps.evalSql(m, "x", "y", 'x')}) AS samp,
    (${graft.core.Tps.evalSql(m, "x", "y", 'y')}) AS line
  FROM qp)
SELECT q_id,
  CAST(floor(samp * 1000.0 + 0.5) AS BIGINT) AS samp_mpx,
  CAST(floor(line * 1000.0 + 0.5) AS BIGINT) AS line_mpx
FROM r
"""
  }

  /** q84: TPS warp replica — q82's scaffold with the rational polynomial
    * swapped for the spline (same evalSql strings as q83). Unquantized
    * floor sampling: a flip needs samp/line within ~1e-13 (1 ln ulp) of
    * an integer, absent by construction on this deterministic grid. */
  /** q163: the order-2 least-squares GCP warp replayed with the SAME
    * printed polynomial op sequence the engine evaluates (coefficients
    * are the normal-equations solution embedded as exact runtime
    * doubles) — pure +,· so DuckDB's IEEE doubles match the JVM
    * bit-for-bit, then the q79/q84 floor-sample + checksum tail. */
  def q163GcpOrder2: String = {
    val p = graft.core.Gcp.demo2
    s"""
WITH px AS (
  SELECT dx.i AS gdx, dy.i AS gdy
  FROM generate_series(0, 1023) dx(i), generate_series(0, 511) dy(i)),
g AS (
  SELECT gdx, gdy, CAST(gdx AS DOUBLE) AS x, CAST(gdy AS DOUBLE) AS y
  FROM px),
r AS (
  SELECT gdx, gdy,
    (${graft.core.Gcp.polySql(p, "x", "y", 'x')}) AS samp,
    (${graft.core.Gcp.polySql(p, "x", "y", 'y')}) AS line
  FROM g),
sm AS (
  SELECT gdx, gdy,
    CAST(floor(samp) AS BIGINT) AS sgx, CAST(floor(line) AS BIGINT) AS sgy
  FROM r),
v AS (
  SELECT gdx, gdy,
    CASE WHEN sgx >= 0 AND sgx < 1024 AND sgy >= 0 AND sgy < 512
      THEN ((sgx // 64)*131 + (sgy // 64)*173 + (sgx % 64)*7 + (sgy % 64)*11 + 3) % 256
      ELSE NULL END AS val
  FROM sm),
t AS (
  SELECT gdx // 64 AS tx, gdy // 64 AS ty,
    (gdy % 64) * 64 + gdx % 64 AS i, val
  FROM v)
SELECT CAST(tx AS BIGINT) AS tx, CAST(ty AS BIGINT) AS ty,
  CAST(sum(CAST(coalesce(val, 0) AS BIGINT) * (i % 49 + 1)) % 65535 AS INT) AS cks
FROM t GROUP BY 1, 2 HAVING count(val) > 0
"""
  }

  /** q164: geolocation backmap warp replayed in pure integer arithmetic —
    * the geoloc grid regenerates from the same dgx/dgy templates, the
    * bilinear forward positions are step²-scaled Longs, the 9-cell offer
    * + nearest snap is a row_number pick over (d2, idx), and holes
    * simply contribute nothing to the tile checksum (engine writes 0). */
  def q164Geoloc: String =
    """WITH px AS (
  SELECT dx.i AS p, dy.i AS q
  FROM generate_series(0, 1023) dx(i), generate_series(0, 511) dy(i)),
sv AS (
  SELECT p, q,
    ((p // 64)*131 + (q // 64)*173 + (p % 64)*7 + (q % 64)*11 + 3) % 256 AS val,
    p // 32 AS i0, p % 32 AS a, q // 32 AS j0, q % 32 AS b
  FROM px),
gs AS (
  SELECT p, q, val,
    (128*i0 + ((5*i0 + 11*j0) % 7) - 3) * (32-a)*(32-b)
      + (128*(i0+1) + ((5*(i0+1) + 11*j0) % 7) - 3) * a*(32-b)
      + (128*i0 + ((5*i0 + 11*(j0+1)) % 7) - 3) * (32-a)*b
      + (128*(i0+1) + ((5*(i0+1) + 11*(j0+1)) % 7) - 3) * a*b AS gxs,
    (128*j0 + ((3*i0 + 13*j0) % 7) - 3) * (32-a)*(32-b)
      + (128*j0 + ((3*(i0+1) + 13*j0) % 7) - 3) * a*(32-b)
      + (128*(j0+1) + ((3*i0 + 13*(j0+1)) % 7) - 3) * (32-a)*b
      + (128*(j0+1) + ((3*(i0+1) + 13*(j0+1)) % 7) - 3) * a*b AS gys
  FROM sv),
sc AS (
  SELECT p, q, val, gxs, gys,
    gxs // 4096 + ddx.d AS cx, gys // 4096 + ddy.d AS cy
  FROM gs, generate_series(-1, 1) ddx(d), generate_series(-1, 1) ddy(d)
  WHERE gxs >= 0 AND gxs < 4194304 AND gys >= 0 AND gys < 2097152
    AND gxs // 4096 + ddx.d BETWEEN 0 AND 1023
    AND gys // 4096 + ddy.d BETWEEN 0 AND 511),
rk AS (
  SELECT cx, cy, val,
    row_number() OVER (PARTITION BY cx, cy ORDER BY
      (gxs - (cx*4096 + 2048))*(gxs - (cx*4096 + 2048))
        + (gys - (cy*4096 + 2048))*(gys - (cy*4096 + 2048)),
      q * 1024 + p) AS rn
  FROM sc),
bm AS (SELECT cx, cy, val FROM rk WHERE rn = 1),
t AS (
  SELECT cx // 64 AS tx, cy // 64 AS ty,
    (cy % 64) * 64 + cx % 64 AS i, val
  FROM bm)
SELECT CAST(tx AS BIGINT) AS tx, CAST(ty AS BIGINT) AS ty,
  CAST(sum(CAST(val AS BIGINT) * (i % 49 + 1)) % 65535 AS INT) AS cks
FROM t GROUP BY 1, 2
"""

  /** q165: the approx transformer replayed structurally — the SAME
    * segment recursion (exact TPS evals only at span ends/midpoints, the
    * split decision |interp(mid) − exact(mid)| ≤ ε with the engine's
    * pinned interp op order) runs as a recursive CTE, leaves emit
    * [x0,x1) interpolated pixels plus the exact row-end pixel, then the
    * q84 floor-sample + checksum tail. ε = 0.25 with authored margin
    * (ApproxSpec pins |err−ε| and floor distances ≫ ln-ULP noise). */
  def q165ApproxWarp: String = {
    val m = graft.core.Tps.demo
    def ex(xe: String) = graft.core.Tps.evalSql(m, xe, "CAST(gdy AS DOUBLE)", 'x')
    def ey(xe: String) = graft.core.Tps.evalSql(m, xe, "CAST(gdy AS DOUBLE)", 'y')
    val atX0 = "CAST(x0 AS DOUBLE)"; val atX1 = "CAST(x1 AS DOUBLE)"
    val atXm = "CAST(xm AS DOUBLE)"
    val interpMx = "(e0x + ((e1x - e0x) / (x1 - x0)) * (xm - x0))"
    val interpMy = "(e0y + ((e1y - e0y) / (x1 - x0)) * (xm - x0))"
    s"""WITH RECURSIVE spans AS (
  SELECT dy.i AS gdy, tx.i * 64 AS x0, tx.i * 64 + 63 AS x1
  FROM generate_series(0, 511) dy(i), generate_series(0, 15) tx(i)),
base AS (
  SELECT gdy, x0, x1,
    (${ex(atX0)}) AS e0x, (${ey(atX0)}) AS e0y,
    (${ex(atX1)}) AS e1x, (${ey(atX1)}) AS e1y
  FROM spans),
sg AS (
  SELECT gdy, x0, x1, e0x, e0y, e1x, e1y FROM base
  UNION ALL
  SELECT gdy,
    CASE sd.s WHEN 0 THEN x0 ELSE xm END AS x0,
    CASE sd.s WHEN 0 THEN xm ELSE x1 END AS x1,
    CASE sd.s WHEN 0 THEN e0x ELSE emx END AS e0x,
    CASE sd.s WHEN 0 THEN e0y ELSE emy END AS e0y,
    CASE sd.s WHEN 0 THEN emx ELSE e1x END AS e1x,
    CASE sd.s WHEN 0 THEN emy ELSE e1y END AS e1y
  FROM (
    SELECT gdy, x0, x1, e0x, e0y, e1x, e1y, xm,
      (${ex(atXm)}) AS emx, (${ey(atXm)}) AS emy
    FROM (SELECT *, (x0 + x1) // 2 AS xm FROM sg WHERE x1 - x0 > 1) p0) p
  CROSS JOIN (SELECT 0 AS s UNION ALL SELECT 1) sd
  WHERE NOT (abs($interpMx - emx) <= 0.25 AND abs($interpMy - emy) <= 0.25)),
lv AS (
  SELECT gdy, x0, x1, e0x, e0y, e1x, e1y
  FROM (
    SELECT gdy, x0, x1, e0x, e0y, e1x, e1y, xm,
      (${ex(atXm)}) AS emx, (${ey(atXm)}) AS emy
    FROM (SELECT *, (x0 + x1) // 2 AS xm FROM sg) s0) s1
  WHERE x1 - x0 = 1
     OR (abs($interpMx - emx) <= 0.25 AND abs($interpMy - emy) <= 0.25)),
pxs AS (
  SELECT gdy, x0 + gs.k AS gdx,
    CASE WHEN x1 - x0 = 1 THEN e0x
         ELSE e0x + ((e1x - e0x) / (x1 - x0)) * ((x0 + gs.k) - x0) END AS samp,
    CASE WHEN x1 - x0 = 1 THEN e0y
         ELSE e0y + ((e1y - e0y) / (x1 - x0)) * ((x0 + gs.k) - x0) END AS line
  FROM lv, generate_series(0, 62) gs(k)
  WHERE gs.k < x1 - x0
  UNION ALL
  SELECT gdy, x1 AS gdx, e1x AS samp, e1y AS line FROM base),
sm AS (
  SELECT gdx, gdy,
    CAST(floor(samp) AS BIGINT) AS sgx, CAST(floor(line) AS BIGINT) AS sgy
  FROM pxs),
v AS (
  SELECT gdx, gdy,
    CASE WHEN sgx >= 0 AND sgx < 1024 AND sgy >= 0 AND sgy < 512
      THEN ((sgx // 64)*131 + (sgy // 64)*173 + (sgx % 64)*7 + (sgy % 64)*11 + 3) % 256
      ELSE NULL END AS val
  FROM sm),
t AS (
  SELECT gdx // 64 AS tx, gdy // 64 AS ty,
    (gdy % 64) * 64 + gdx % 64 AS i, val
  FROM v)
SELECT CAST(tx AS BIGINT) AS tx, CAST(ty AS BIGINT) AS ty,
  CAST(sum(CAST(coalesce(val, 0) AS BIGINT) * (i % 49 + 1)) % 65535 AS INT) AS cks
FROM t GROUP BY 1, 2 HAVING count(val) > 0
"""
  }

  def q84Tps: String = {
    val m = graft.core.Tps.demo
    s"""
WITH px AS (
  SELECT dx.i AS gdx, dy.i AS gdy
  FROM generate_series(0, 1023) dx(i), generate_series(0, 511) dy(i)),
g AS (
  SELECT gdx, gdy, CAST(gdx AS DOUBLE) AS x, CAST(gdy AS DOUBLE) AS y
  FROM px),
r AS (
  SELECT gdx, gdy,
    (${graft.core.Tps.evalSql(m, "x", "y", 'x')}) AS samp,
    (${graft.core.Tps.evalSql(m, "x", "y", 'y')}) AS line
  FROM g),
sm AS (
  SELECT gdx, gdy,
    CAST(floor(samp) AS BIGINT) AS sgx, CAST(floor(line) AS BIGINT) AS sgy
  FROM r),
v AS (
  SELECT gdx, gdy,
    CASE WHEN sgx >= 0 AND sgx < 1024 AND sgy >= 0 AND sgy < 512
      THEN ((sgx // 64)*131 + (sgy // 64)*173 + (sgx % 64)*7 + (sgy % 64)*11 + 3) % 256
      ELSE NULL END AS val
  FROM sm),
t AS (
  SELECT gdx // 64 AS tx, gdy // 64 AS ty,
    (gdy % 64) * 64 + gdx % 64 AS i, val
  FROM v)
SELECT CAST(tx AS BIGINT) AS tx, CAST(ty AS BIGINT) AS ty,
  CAST(sum(CAST(coalesce(val, 0) AS BIGINT) * (i % 49 + 1)) % 65535 AS INT) AS cks
FROM t GROUP BY 1, 2 HAVING count(val) > 0
"""
  }

  /** q75: per-tile Floyd–Steinberg dither replicated as a list_reduce
    * recurrence. Accumulator layout (1-based): [1]=right carry,
    * [2..9]=current-row incoming errors, [10..17]=next-row errors,
    * [18]=position, [19..]=emitted bits. All-integer, truncating `//`
    * division (== Java `/`), so the 64-step recurrence matches
    * core/Dither.fsDither bit-for-bit. */
  def q75Dither: String = {
    ctr = 0
    def nn(k: String, xc: String, dl: String, dn: String, dr: String): String =
      s"(__a[10 + $k] + (CASE WHEN $k = $xc - 1 THEN $dl ELSE 0::BIGINT END)" +
        s" + (CASE WHEN $k = $xc THEN $dn ELSE 0::BIGINT END)" +
        s" + (CASE WHEN $k = $xc + 1 THEN $dr ELSE 0::BIGINT END))"
    val step =
      let("__a[18]") { pos =>
        let(s"$pos % 8") { xc =>
          let(s"__b[1] + __a[1] + __a[2 + $xc]") { vp =>
            let(s"(CASE WHEN $vp >= 128 THEN 255 ELSE 0 END)::BIGINT") { out =>
              let(s"$vp - $out") { e =>
                let(s"(7 * $e) // 16") { r =>
                  let(s"(3 * $e) // 16") { dl =>
                    let(s"(5 * $e) // 16") { dn =>
                      let(s"$e - $r - $dl - $dn") { dr =>
                        s"([(CASE WHEN $xc = 7 THEN 0::BIGINT ELSE $r END)] || " +
                          s"list_transform(range(0, 8), __k -> CASE WHEN $xc = 7 THEN ${nn("__k", xc, dl, dn, dr)} ELSE __a[2 + __k] END) || " +
                          s"list_transform(range(0, 8), __k -> CASE WHEN $xc = 7 THEN 0::BIGINT ELSE ${nn("__k", xc, dl, dn, dr)} END) || " +
                          s"[$pos + 1] || list_slice(__a, 19, len(__a)) || [$out])"
                      }
                    }
                  }
                }
              }
            }
          }
        }
      }
    s"""
WITH tiles AS (
  SELECT gx.x AS tx, gy.y AS ty FROM generate_series(0, 7) gx(x), generate_series(0, 3) gy(y)),
st AS (
  SELECT tx, ty,
    list_reduce(
      list_prepend(
        list_transform(range(0, 18), __z -> 0::BIGINT),
        list_transform(range(0, 64), __i ->
          [(((tx*131 + ty*173 + (__i % 8)*7 + (__i // 8)*11) % 16) * 17)::BIGINT])),
      (__a, __b) -> $step) AS fin
  FROM tiles),
outp AS (
  SELECT tx, ty, unnest(range(0, 64)) AS i, unnest(list_slice(fin, 19, 82)) AS bit
  FROM st)
SELECT CAST(tx AS BIGINT) AS tx, CAST(ty AS BIGINT) AS ty,
  CAST(i AS INT) AS i, CAST(bit AS DOUBLE) AS bit
FROM outp
"""
  }

  /** q19: warp-to-mercator bilinear checksum. Replicates the engine's
    * exact arithmetic sequence (TileMath.mercTileBoundsMeters /
    * mercYToLat, Resample.bilinear, Checksum) per destination pixel; the
    * only transcendental calls (atan, exp) agree with the JVM on this
    * corpus — any divergence would surface as a checksum mismatch in the
    * driver gate, never silently. */
  def q19WarpChecksum: String = {
    def srcval(x: String, y: String): String =
      s"CAST((($x) // 64) * 131 + (($y) // 64) * 173 + (($x) % 64) * 7 + (($y) % 64) * 11 + 3 AS BIGINT) % 256"
    s"""
WITH consts AS (SELECT 6378137.0 AS R, pi() * 6378137.0 AS OS),
tiles AS (
  SELECT gx.x AS tx, gy.y AS ty FROM generate_series(0,7) gx(x), generate_series(0,7) gy(y)),
geom AS (
  SELECT t.tx, t.ty, i.i AS i, (i.i % 64) AS px, (i.i // 64) AS py,
    -OS + t.tx * (2.0 * OS / 8.0) AS xm0,
    OS - t.ty * (2.0 * OS / 8.0) AS ym1, R, OS
  FROM tiles t, generate_series(0, 4095) i(i), consts),
coords AS (
  SELECT tx, ty, i,
    ((xm0 + (2.0*OS/8.0)) - xm0) / 64 AS dxm,
    (ym1 - (ym1 - (2.0*OS/8.0))) / 64 AS dym,
    xm0, ym1, R, OS, px, py
  FROM geom),
pxy AS (
  SELECT tx, ty, i,
    (( (xm0 + (px + 0.5) * dxm) / OS * 180.0) + 180.0) / (360.0/1024.0) AS gx,
    (90.0 - (180.0 / pi() * (2.0 * atan(exp((ym1 - (py + 0.5) * dym) / R)) - pi() / 2.0))) / (180.0/512.0) AS gy
  FROM coords),
bil AS (
  SELECT tx, ty, i, gx - 0.5 AS fx, gy - 0.5 AS fy,
    CAST(floor(gx - 0.5) AS BIGINT) AS x0, CAST(floor(gy - 0.5) AS BIGINT) AS y0, gx, gy
  FROM pxy),
v AS (
  SELECT tx, ty, i,
    CASE WHEN x0 >= 0 AND x0 + 1 < 1024 AND y0 >= 0 AND y0 + 1 < 512 THEN
      ((${srcval("x0", "y0")}) * (1 - (fx - floor(fx))) + (${srcval("x0 + 1", "y0")}) * (fx - floor(fx)))
        * (1 - (fy - floor(fy)))
      + ((${srcval("x0", "y0 + 1")}) * (1 - (fx - floor(fx))) + (${srcval("x0 + 1", "y0 + 1")}) * (fx - floor(fx)))
        * (fy - floor(fy))
    ELSE (${srcval("CAST(floor(gx) AS BIGINT)", "CAST(floor(gy) AS BIGINT)")})::DOUBLE END AS v
  FROM bil)
SELECT CAST(3 AS BIGINT) AS zoom, CAST(tx AS BIGINT) AS tx, CAST(ty AS BIGINT) AS ty,
  CAST(sum(CAST(trunc(v) AS BIGINT) * (i % 49 + 1)) % 65535 AS INT) AS cks
FROM v GROUP BY 2, 3
"""
  }

  /** BPE training levels (q215/q216): the corpus word dictionary with
    * wrapped symbol strings (".t..h..e."), then `k` unrolled merge
    * iterations — pair counts off the dictionary, argmax by (freq DESC,
    * lhs ASC, rhs ASC), merge applied via left-to-right non-overlapping
    * replace() (identical semantics in DuckDB and Spark; see
    * operators/Bpe.scala). Emits CTEs toks, s0 and p/g/t/s 1..k. */
  private def bpeLevels(k: Int): String = {
    val base = """toks AS (
  SELECT unnest(string_split(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
  FROM documents),
s0 AS (
  SELECT term, count(*) AS wcnt,
    array_to_string(list_transform(range(1, length(term) + 1),
      i -> '.' || substr(term, CAST(i AS INT), 1) || '.'), '') AS syms
  FROM toks WHERE term <> '' GROUP BY 1)"""
    val levels = (1 to k).map { j =>
      val p = j - 1
      s"""p$j AS (
  SELECT wcnt, ss, unnest(range(1, len(ss))) AS i
  FROM (SELECT wcnt, string_split(substr(syms, 2, length(syms) - 2), '..') AS ss
        FROM s$p)
  WHERE len(ss) >= 2),
g$j AS (
  SELECT ss[CAST(i AS INT)] AS lhs, ss[CAST(i AS INT) + 1] AS rhs,
    CAST(sum(wcnt) AS BIGINT) AS freq
  FROM p$j GROUP BY 1, 2),
t$j AS (SELECT $j AS it, lhs, rhs, freq FROM g$j
        ORDER BY freq DESC, lhs ASC, rhs ASC LIMIT 1),
s$j AS (
  SELECT term, wcnt,
    replace(syms, '.' || t$j.lhs || '..' || t$j.rhs || '.',
                  '.' || t$j.lhs || t$j.rhs || '.') AS syms
  FROM s$p CROSS JOIN t$j)"""
    }.mkString(",\n")
    base + ",\n" + levels
  }

  def q215BpeTrain: String = {
    val k = 6
    val union = (1 to k).map(j => s"SELECT * FROM t$j").mkString(" UNION ALL ")
    s"""WITH ${bpeLevels(k)}
SELECT CAST(it AS BIGINT) AS it, lhs, rhs, freq FROM ($union)"""
  }

  /** q211's polynomial-fingerprint replay over an arbitrary string expr:
    * fold (acc*257 + codepoint) mod 2305843009213693951 from 0. */
  private def fpReplay(s: String): String =
    s"""CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
      list_transform(range(1, length($s) + 1),
        i -> CAST(unicode(substr($s, CAST(i AS INT), 1)) AS HUGEINT))),
      (acc, x) -> (acc * 257 + x) % 2305843009213693951) AS BIGINT)"""

  /** q260: MERGE INTO law — base FULL OUTER JOIN batch on doc_id with
    * row-level source-wins, fingerprints via the fpReplay fold over the
    * normalize law (the engine normalizes INSIDE fingerprint64, so the
    * ' v2' suffix concatenates before normalization on both sides). */
  def q260MergeUpsert: String = {
    def norm(e: String) = s"trim(regexp_replace(lower($e), '\\s+', ' ', 'g'))"
    s"""
WITH base AS (
  SELECT doc_id, lang, ${fpReplay(norm("text"))} AS fp, CAST(1 AS BIGINT) AS version
  FROM documents),
upd AS (
  SELECT doc_id, lang, ${fpReplay(norm("text || ' v2'"))} AS fp, CAST(2 AS BIGINT) AS version
  FROM documents WHERE doc_id % 7 = 0),
ins AS (
  SELECT doc_id + 1000000 AS doc_id, lang, ${fpReplay(norm("text"))} AS fp,
    CAST(1 AS BIGINT) AS version
  FROM documents WHERE doc_id % 13 = 0),
batch AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
SELECT COALESCE(b.doc_id, t.doc_id) AS doc_id,
  CASE WHEN b.doc_id IS NOT NULL THEN b.lang ELSE t.lang END AS lang,
  CASE WHEN b.doc_id IS NOT NULL THEN b.fp ELSE t.fp END AS fp,
  CASE WHEN b.doc_id IS NOT NULL THEN b.version ELSE t.version END AS version
FROM base t FULL OUTER JOIN batch b ON b.doc_id = t.doc_id
"""
  }

  /** q218: ViT patchify — replay patch stats + Walsh-Hadamard projections
    * from the synth tile pixel law (the PNG codec legs are lossless,
    * q68/q186 precedent). px(x,y) = (tx·131 + ty·173 + x·7 + y·11 + 3)
    * % 256; patch p = 4×4 grid cell, j = row-major index inside it. */
  def q218VitPatchify: String = {
    val px = "(tx*131 + ty*173 + ((p % 4)*16 + (j % 16))*7 + ((p // 4)*16 + (j // 16))*11 + 3) % 256"
    s"""
WITH imgs AS (
  SELECT gx.x AS tx, gy.y AS ty, gy.y * 16 + gx.x AS img_id
  FROM generate_series(0, 15) gx(x), generate_series(0, 7) gy(y)),
pp AS (
  SELECT img_id, tx, ty, unnest(range(0, 16)) AS p FROM imgs),
st AS (
  SELECT img_id, p,
    CAST(list_sum(list_transform(range(0, 256), j -> $px)) AS BIGINT) AS psum,
    CAST(list_min(list_transform(range(0, 256), j -> $px)) AS BIGINT) AS pmin,
    CAST(list_max(list_transform(range(0, 256), j -> $px)) AS BIGINT) AS pmax,
    CAST(list_sum(list_transform(range(0, 256), j ->
      ($px) * (1 - 2 * ((j // 1) % 2)))) AS BIGINT) AS proj0,
    CAST(list_sum(list_transform(range(0, 256), j ->
      ($px) * (1 - 2 * ((j // 2) % 2)))) AS BIGINT) AS proj1,
    CAST(list_sum(list_transform(range(0, 256), j ->
      ($px) * (1 - 2 * ((j // 4) % 2)))) AS BIGINT) AS proj2,
    CAST(list_sum(list_transform(range(0, 256), j ->
      ($px) * (1 - 2 * ((j // 8) % 2)))) AS BIGINT) AS proj3
  FROM pp)
SELECT CAST(img_id AS BIGINT) AS img_id, CAST(p AS BIGINT) AS patch,
  psum, psum // 256 AS pmean, pmin, pmax, proj0, proj1, proj2, proj3
FROM st
"""
  }

  /** q217: ExactSubstr removal — disjoint char-32 span tiling, packed
    * (doc_id·2^20 + span_idx) first-occurrence keeper, cleaned-text
    * rebuild + fingerprint replay. Mirrors Dedup.substrDedup. */
  def q217SubstrDedup: String = {
    ctr = 0
    s"""
WITH d AS (
  SELECT doc_id,
    CASE WHEN doc_id % 10 = 0
    THEN 'call me ishmael some years ago never mind how long precisely ok '
    ELSE '' END ||
    trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
  FROM documents),
dn AS (SELECT doc_id, norm, length(norm) // 32 AS nsp FROM d),
g AS (
  SELECT doc_id, norm, unnest(range(0, nsp)) AS spi
  FROM dn WHERE nsp >= 1),
gh AS (
  SELECT doc_id, spi, doc_id * 1048576 + spi AS pk,
    ${hash64("substr(norm, CAST(spi*32 + 1 AS INT), 32)")} AS h
  FROM g),
keeper AS (
  SELECT h, min(pk) AS pk0 FROM gh GROUP BY 1 HAVING count(*) >= 2),
rmv AS (
  SELECT gh.doc_id, list_sort(list(gh.spi)) AS rm, count(*) AS n_removed
  FROM gh JOIN keeper k ON k.h = gh.h
  WHERE gh.pk <> k.pk0
  GROUP BY 1),
fin AS (
  SELECT dn.doc_id, dn.nsp, coalesce(r.n_removed, 0) AS n_removed,
    (CASE WHEN dn.nsp = 0 THEN '' ELSE
      array_to_string(list_transform(range(0, dn.nsp),
        i -> CASE WHEN list_contains(coalesce(r.rm, []), i) THEN ''
             ELSE substr(dn.norm, CAST(i*32 + 1 AS INT), 32) END), '') END)
      || substr(dn.norm, CAST(dn.nsp*32 + 1 AS INT)) AS clean
  FROM dn LEFT JOIN rmv r ON r.doc_id = dn.doc_id)
SELECT doc_id, CAST(nsp AS BIGINT) AS n_spans,
  CAST(n_removed AS BIGINT) AS n_removed,
  CAST(length(clean) AS BIGINT) AS kept_chars,
  CAST(${toSigned(hash64("clean"))} AS BIGINT) AS clean_fp
FROM fin
"""
  }

  def q216BpeEncode: String = {
    val k = 6
    s"""WITH ${bpeLevels(k)},
enc AS (
  SELECT term, length(term) AS nch,
    len(string_split(substr(syms, 2, length(syms) - 2), '..')) AS nsym,
    replace(substr(syms, 2, length(syms) - 2), '..', ' ') AS encsp
  FROM s$k),
d AS (
  SELECT doc_id,
    string_split(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS tk
  FROM documents),
tok AS (
  SELECT doc_id, u.pos AS pos, u.term AS term
  FROM (SELECT doc_id, unnest(list_transform(range(1, len(tk) + 1),
          i -> struct_pack(pos := i, term := tk[CAST(i AS INT)]))) AS u
        FROM d)
  WHERE u.term <> ''),
pd AS (
  SELECT t.doc_id, count(*) AS n_toks, CAST(sum(e.nch) AS BIGINT) AS n_chars,
    CAST(sum(e.nsym) AS BIGINT) AS n_sym,
    string_agg(e.encsp, ' ' ORDER BY t.pos) AS stream
  FROM tok t JOIN enc e ON t.term = e.term
  GROUP BY 1)
SELECT dd.doc_id,
  CAST(coalesce(p.n_toks, 0) AS BIGINT) AS n_toks,
  CAST(coalesce(p.n_chars, 0) AS BIGINT) AS n_chars,
  CAST(coalesce(p.n_sym, 0) AS BIGINT) AS n_sym,
  ${fpReplay("coalesce(p.stream, '')")} AS fp,
  CAST(CASE WHEN coalesce(p.n_sym, 0) = 0 THEN 0
       ELSE (1000 * coalesce(p.n_chars, 0)) // p.n_sym END AS BIGINT) AS ratio_milli
FROM documents dd LEFT JOIN pd p ON dd.doc_id = p.doc_id"""
  }

  /** q265: per-language fertility over the q216 encoded dictionary —
    * same bpeLevels chain, one lang aggregate, exact integer milli. */
  def q265BpeFertility: String = {
    val k = 6
    s"""WITH ${bpeLevels(k)},
enc AS (
  SELECT term, length(term) AS nch,
    len(string_split(substr(syms, 2, length(syms) - 2), '..')) AS nsym
  FROM s$k),
d AS (
  SELECT lang,
    string_split(trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS tk
  FROM documents),
ftok AS (SELECT lang, unnest(tk) AS term FROM d),
ftok2 AS (SELECT * FROM ftok WHERE term <> ''),
a AS (
  SELECT lang, count(*) AS n_words, CAST(sum(e.nsym) AS BIGINT) AS n_sym,
    CAST(sum(e.nch) AS BIGINT) AS n_chars
  FROM ftok2 t JOIN enc e ON e.term = t.term GROUP BY 1)
SELECT lang, CAST(n_words AS BIGINT) AS n_words, n_sym,
  CAST(n_sym * 1000 // n_words AS BIGINT) AS fertility_milli,
  CAST(CASE WHEN n_sym = 0 THEN 0 ELSE n_chars * 1000 // n_sym END AS BIGINT) AS cps_milli
FROM a"""
  }

  /** q227 shared unigram piece vocabulary (piece → integer centinat
    * cost): the 26 single letters at 300 plus multi-char pieces — a
    * literal pretrained-model stand-in (the q220 literal-weights
    * precedent). Max piece length 5; single-letter coverage makes every
    * word segmentable. */
  val unigramVocab: Seq[(String, Long)] =
    ('a' to 'z').map(c => c.toString -> 300L) ++ Seq(
      "er" -> 420L, "st" -> 425L, "an" -> 430L, "ow" -> 435L, "le" -> 440L,
      "ue" -> 445L, "ta" -> 450L, "ab" -> 455L, "sc" -> 460L, "or" -> 465L,
      "ar" -> 470L, "in" -> 475L, "ra" -> 480L, "al" -> 485L, "us" -> 490L,
      "om" -> 495L, "ch" -> 505L, "pa" -> 510L, "rt" -> 515L, "ha" -> 520L,
      "sh" -> 525L, "gr" -> 530L, "ey" -> 535L, "ig" -> 540L, "il" -> 545L,
      "lu" -> 550L, "ge" -> 560L, "up" -> 565L, "re" -> 570L, "ea" -> 575L,
      "am" -> 580L, "do" -> 585L, "wi" -> 590L, "nd" -> 595L,
      "val" -> 600L, "que" -> 605L, "row" -> 610L, "key" -> 615L,
      "tab" -> 620L, "ine" -> 625L, "ort" -> 630L, "dow" -> 635L,
      "lum" -> 640L, "eam" -> 645L, "oup" -> 650L, "ter" -> 655L,
      "ect" -> 660L, "sma" -> 665L,
      "scan" -> 700L, "fast" -> 705L, "merg" -> 710L, "sort" -> 715L,
      "part" -> 720L, "hash" -> 725L, "join" -> 730L, "data" -> 735L,
      "line" -> 740L,
      "table" -> 800L, "spark" -> 805L, "value" -> 810L, "batch" -> 815L,
      "query" -> 820L, "small" -> 825L, "group" -> 830L)

  /** q227: unigram-LM Viterbi tokenization — the DP is unrolled to the
    * corpus max word length (8; the q215 six-level-unroll precedent).
    * Level j computes the min packed key cost·16 + (8 − len) over piece
    * lengths 1..min(5,j) via LEFT JOINs against the vocab (least()
    * skips NULL candidates = absent pieces); backtrack is 8 more
    * unrolled steps collecting pieces rightmost-first, re-joined
    * leftmost-first by concat_ws's NULL skipping. */
  def q227UnigramViterbi: String = {
    val vvals = unigramVocab.map { case (p, c) => s"('$p', $c)" }.mkString(", ")
    def level(j: Int): String = {
      val ls = 1 to math.min(5, j)
      val joins = ls.map(l =>
        s"  LEFT JOIN v v${j}_$l ON v${j}_$l.piece = substr(b.term, ${j - l + 1}, $l)")
        .mkString("\n")
      val cands = ls.map(l => s"(b.c${j - l} + v${j}_$l.c) * 16 + ${8 - l}")
        .mkString(", ")
      val prev = ((0 until j).map(i => s"b.c$i") ++
        (1 until j).map(i => s"b.bl$i")).mkString(", ")
      s"""b$j AS (
  SELECT b.term, b.n_occ, b.len, $prev,
    least($cands) // 16 AS c$j,
    8 - (least($cands) % 16) AS bl$j
  FROM b${j - 1} b
$joins)"""
    }
    def blCase(p: String): String =
      "(CASE " + (1 to 8).map(j => s"WHEN $p = $j THEN bl$j").mkString(" ") +
        " END)"
    def step(k: Int): String =
      s"""s$k AS (
  SELECT *,
    CASE WHEN p${k - 1} > 0 THEN
      substr(term, p${k - 1} - ${blCase(s"p${k - 1}")} + 1,
        ${blCase(s"p${k - 1}")}) END AS piece$k,
    CASE WHEN p${k - 1} > 0 THEN p${k - 1} - ${blCase(s"p${k - 1}")}
         ELSE p${k - 1} END AS p$k
  FROM s${k - 1})"""
    val costCase =
      "CASE len " + (1 to 8).map(j => s"WHEN $j THEN c$j").mkString(" ") + " END"
    s"""
WITH toks AS (
  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
  FROM documents),
occ AS (SELECT term, count(*) AS n_occ FROM toks WHERE term <> '' GROUP BY 1),
v(piece, c) AS (VALUES $vvals),
b0 AS (SELECT term, n_occ, length(term) AS len, 0 AS c0 FROM occ),
${(1 to 8).map(level).mkString(",\n")},
s0 AS (SELECT *, len AS p0 FROM b8),
${(1 to 8).map(step).mkString(",\n")},
segd AS (SELECT *, concat_ws(' ', piece8, piece7, piece6, piece5,
  piece4, piece3, piece2, piece1) AS seg FROM s8)
SELECT term, CAST(n_occ AS BIGINT) AS n_occ,
  CAST(len(string_split(seg, ' ')) AS BIGINT) AS n_sym,
  CAST($costCase AS BIGINT) AS cost,
  seg
FROM segd
"""
  }

  /** q237: the GeoJSON text (q101 writer law) and KML text (q112 writer
    * law) rebuilt from the generating arithmetic for the q_id%3 family,
    * hashed; the end-to-end WKB identity is 1 by construction (both
    * parsers are bit-exact inverses on this family, q101/q112-pinned). */
  def q237FormatConvert: String = {
    def f(e: String): String =
      s"CASE WHEN ($e) = floor($e) THEN CAST(CAST(($e) AS BIGINT) AS VARCHAR) " +
        s"ELSE CAST(($e) AS VARCHAR) END"
    def jpt(x: String, y: String): String =
      s"'[' || ${f(x)} || ',' || ${f(y)} || ']'"
    def kpt(x: String, y: String): String =
      s"${f(x)} || ',' || ${f(y)}"
    s"""WITH sp AS (
  SELECT s_suppkey AS q_id,
    CAST((s_suppkey * 7919) % 1024 AS DOUBLE) / 4.0 AS ax,
    CAST((s_suppkey * 104729) % 512 AS DOUBLE) AS ay,
    1.0 + CAST(s_suppkey % 7 AS DOUBLE) / 2.0 AS w,
    2.0 + CAST(s_suppkey % 5 AS DOUBLE) AS h
  FROM supplier),
cc AS (
  SELECT q_id, ax, ay, ax + w AS x2, ay + h AS y2, ay + 2.0 * h AS y3 FROM sp),
tx AS (
  SELECT q_id,
    CASE WHEN q_id % 3 = 0 THEN
      '{"type":"Point","coordinates":' || ${jpt("ax", "ay")} || '}'
    WHEN q_id % 3 = 1 THEN
      '{"type":"LineString","coordinates":[' || ${jpt("ax", "ay")} || ',' ||
        ${jpt("x2", "y2")} || ',' || ${jpt("ax", "y3")} || ']}'
    ELSE
      '{"type":"Polygon","coordinates":[[' || ${jpt("ax", "ay")} || ',' ||
        ${jpt("x2", "ay")} || ',' || ${jpt("x2", "y2")} || ',' ||
        ${jpt("ax", "y2")} || ',' || ${jpt("ax", "ay")} || ']]}'
    END AS gj,
    CASE WHEN q_id % 3 = 0 THEN
      '<Point><coordinates>' || ${kpt("ax", "ay")} || '</coordinates></Point>'
    WHEN q_id % 3 = 1 THEN
      '<LineString><coordinates>' || ${kpt("ax", "ay")} || ' ' ||
        ${kpt("x2", "y2")} || ' ' || ${kpt("ax", "y3")} ||
        '</coordinates></LineString>'
    ELSE
      '<Polygon><outerBoundaryIs><LinearRing><coordinates>' ||
        ${kpt("ax", "ay")} || ' ' || ${kpt("x2", "ay")} || ' ' ||
        ${kpt("x2", "y2")} || ' ' || ${kpt("ax", "y2")} || ' ' ||
        ${kpt("ax", "ay")} ||
        '</coordinates></LinearRing></outerBoundaryIs></Polygon>'
    END AS kml
  FROM cc)
SELECT q_id,
  CAST(${toSigned(hash64("gj"))} AS BIGINT) AS gj_fp,
  CAST(${toSigned(hash64("kml"))} AS BIGINT) AS kml_fp,
  CAST(1 AS BIGINT) AS roundtrip_ok
FROM tx
"""
  }

  /** q240: FIM split replay — same deterministic span, list_slice ==
    * Spark's slice, both sentinel orderings hashed. */
  def q240Fim: String = {
    ctr = 0
    s"""
WITH d AS (
  SELECT doc_id,
    list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
      t -> t <> '') AS tk
  FROM documents),
sp AS (
  SELECT doc_id, tk, len(tk) AS n,
    CASE WHEN len(tk) >= 3 THEN CAST((doc_id * 7919) % (len(tk) - 1) AS INT) ELSE 0 END AS st
  FROM d),
sp2 AS (
  SELECT *, CASE WHEN n >= 3
    THEN CAST(least(greatest(n // 4, 1), n - st) AS INT) ELSE 0 END AS ln
  FROM sp),
r AS (
  SELECT doc_id, n, st, ln,
    -- list_slice returns NULL (not []) on an empty range; Spark's
    -- slice gives [] -> '' after join, so coalesce restores parity
    coalesce(array_to_string(list_slice(tk, 1, st), ' '), '') AS p,
    coalesce(array_to_string(list_slice(tk, st + 1, st + ln), ' '), '') AS m,
    coalesce(array_to_string(list_slice(tk, st + ln + 1, n), ' '), '') AS sf
  FROM sp2),
t AS (
  SELECT doc_id, n, st, ln,
    '<PRE>' || p || '<SUF>' || sf || '<MID>' || m AS psm,
    '<SUF>' || sf || '<PRE>' || p || '<MID>' || m AS spm
  FROM r)
SELECT doc_id, CAST(n AS BIGINT) AS n_toks,
  CAST(st AS BIGINT) AS m_start, CAST(ln AS BIGINT) AS m_len,
  CAST(${toSigned(hash64("psm"))} AS BIGINT) AS psm_fp,
  CAST(${toSigned(hash64("spm"))} AS BIGINT) AS spm_fp
FROM t
"""
  }

  /** q234: WKT1 render from the same two literal tables, string_agg in
    * ord order == the engine's array_sort fold; parse-back by the same
    * instr arithmetic; hash64(wkt) pins every byte. */
  def q234CrsWkt: String = s"""
WITH crs(epsg, name, geog, proj) AS (VALUES
  (2154, 'RGF93 / Lambert-93',
   'GEOGCS["RGF93",DATUM["RGF93",SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
   'Lambert_Conformal_Conic_2SP'),
  (3978, 'NAD83 / Canada Atlas Lambert',
   'GEOGCS["NAD83",DATUM["North_American_Datum_1983",SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
   'Lambert_Conformal_Conic_2SP'),
  (32633, 'WGS 84 / UTM zone 33N',
   'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
   'Transverse_Mercator'),
  (3031, 'WGS 84 / Antarctic Polar Stereographic',
   'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
   'Polar_Stereographic'),
  (27700, 'OSGB 1936 / British National Grid',
   'GEOGCS["OSGB 1936",DATUM["OSGB_1936",SPHEROID["Airy 1830",6377563.396,299.3249646]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]',
   'Transverse_Mercator')),
par(epsg, ord, k, v) AS (VALUES
  (2154, 1, 'standard_parallel_1', '49'), (2154, 2, 'standard_parallel_2', '44'),
  (2154, 3, 'latitude_of_origin', '46.5'), (2154, 4, 'central_meridian', '3'),
  (2154, 5, 'false_easting', '700000'), (2154, 6, 'false_northing', '6600000'),
  (3978, 1, 'standard_parallel_1', '49'), (3978, 2, 'standard_parallel_2', '77'),
  (3978, 3, 'latitude_of_origin', '49'), (3978, 4, 'central_meridian', '-95'),
  (3978, 5, 'false_easting', '0'), (3978, 6, 'false_northing', '0'),
  (32633, 1, 'latitude_of_origin', '0'), (32633, 2, 'central_meridian', '15'),
  (32633, 3, 'scale_factor', '0.9996'),
  (32633, 4, 'false_easting', '500000'), (32633, 5, 'false_northing', '0'),
  (3031, 1, 'latitude_of_origin', '-71'), (3031, 2, 'central_meridian', '0'),
  (3031, 3, 'false_easting', '0'), (3031, 4, 'false_northing', '0'),
  (27700, 1, 'latitude_of_origin', '49'), (27700, 2, 'central_meridian', '-2'),
  (27700, 3, 'scale_factor', '0.9996012717'),
  (27700, 4, 'false_easting', '400000'), (27700, 5, 'false_northing', '-100000')),
pstr AS (SELECT epsg,
    string_agg('PARAMETER["' || k || '",' || v || ']', ',' ORDER BY ord) AS pstr
  FROM par GROUP BY 1),
w AS (SELECT crs.epsg,
    'PROJCS["' || name || '",' || geog || ',PROJECTION["' || proj || '"],'
      || pstr.pstr || ',UNIT["metre",1],AUTHORITY["EPSG","'
      || CAST(crs.epsg AS VARCHAR) || '"]]' AS wkt
  FROM crs JOIN pstr ON pstr.epsg = crs.epsg),
x AS (SELECT par.epsg, par.k, w.wkt,
    'PARAMETER["' || par.k || '",' AS needle
  FROM par JOIN w ON w.epsg = par.epsg),
y AS (SELECT epsg, k, wkt,
    substring(wkt, CAST(instr(wkt, needle) + length(needle) AS INT)) AS tail
  FROM x)
SELECT CAST(epsg AS BIGINT) AS epsg, k,
  substring(tail, 1, CAST(instr(tail, ']') - 1 AS INT)) AS v_parsed,
  CAST(${toSigned(hash64("wkt"))} AS BIGINT) AS wkt_fp
FROM y
"""

  /** q225: 4-round Feistel epoch shuffle — each round rebuilds the
    * engine's keyed round-function input string 'fs<epoch>_<round>_<R>'
    * and replays hash64; low 16 bits via % 65536 on the non-negative
    * HUGEINT (== Java's `& 0xFFFF` on the signed long), rank compression
    * by the same (perm, doc_id) order. */
  def q225Feistel: String = {
    def round(i: Int, src: String, dst: String): String = {
      val h = hash64(s"'fs' || CAST(epoch AS VARCHAR) || '_${i}_' || CAST(r AS VARCHAR)")
      s"""$dst AS (
  SELECT epoch, doc_id, r AS l,
    xor(l, CAST(($h) % 65536 AS BIGINT)) AS r
  FROM $src)"""
    }
    s"""
WITH f0 AS (
  SELECT CAST(e.epoch AS BIGINT) AS epoch, d.doc_id,
    d.doc_id // 65536 AS l, d.doc_id % 65536 AS r
  FROM documents d, (VALUES (1), (2)) e(epoch)),
${round(1, "f0", "f1")},
${round(2, "f1", "f2")},
${round(3, "f2", "f3")},
${round(4, "f3", "f4")},
p AS (SELECT epoch, doc_id, l * 65536 + r AS perm FROM f4)
SELECT epoch, doc_id, CAST(perm AS BIGINT) AS perm,
  CAST(row_number() OVER (PARTITION BY epoch ORDER BY perm, doc_id) - 1
    AS BIGINT) AS new_pos
FROM p
"""
  }
}
