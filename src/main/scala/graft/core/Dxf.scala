package graft.core

import org.locationtech.jts.geom._

/** AutoCAD DXF entity writer + parser — the OGR DXF driver's ASCII half
  * (reference: ogr/ogrsf_frmts/dxf :: OGRDXFWriterLayer::WriteValue /
  * OGRDXFLayer::Translate*). DXF is a GROUP-CODE format: the file is a
  * stream of (code line, value line) pairs — a third text shape beside
  * the XML family and MIF's keyword/token lines. This driver pins the
  * minimal profile the reference's writer emits for 2-D vector data:
  *
  *  - Point                  → `POINT` (codes 10/20)
  *  - LineString, 2 vertices → `LINE` (10/20/11/21 — the reference's
  *    segment special form)
  *  - LineString, n > 2      → `LWPOLYLINE`, open (90=n, 70=0, n×10/20)
  *  - Polygon, shell only    → `LWPOLYLINE`, closed (70=1) carrying the
  *    ring WITHOUT its duplicate closing vertex (the DXF convention);
  *    holes would need HATCH boundary paths — out of the pinned profile,
  *    the writer fails loud on them.
  *
  * Every entity carries layer `8`/`0`. Group codes are written unpadded
  * (the reference right-aligns to 3 chars; parsers must trim either way
  * — documented divergence, byte-pinned for the oracle). The parser is
  * tolerant the way the reference's is: unknown group codes inside an
  * entity (colors, handles, extrusion vectors) are skipped, and code
  * lines are trimmed before matching. Number formatting is the shared
  * oracle-replayable contract (GeoJson.fmt). */
object Dxf {

  private def fmt(v: Double): String = GeoJson.fmt(v)

  private def pair(code: Int, value: String): String = s"$code\n$value"

  /** One entity block: `0\n<TYPE>\n8\n0\n...codes...` (no trailing
    * newline; blocks concatenate with "\n"). */
  def write(g: Geometry): String = g match {
    case p: Point =>
      val c = p.getCoordinate
      Seq(pair(0, "POINT"), pair(8, "0"),
        pair(10, fmt(c.x)), pair(20, fmt(c.y))).mkString("\n")
    case l: LineString if l.getNumPoints == 2 =>
      val a = l.getCoordinateN(0); val b = l.getCoordinateN(1)
      Seq(pair(0, "LINE"), pair(8, "0"),
        pair(10, fmt(a.x)), pair(20, fmt(a.y)),
        pair(11, fmt(b.x)), pair(21, fmt(b.y))).mkString("\n")
    case l: LineString =>
      val cs = l.getCoordinates
      (Seq(pair(0, "LWPOLYLINE"), pair(8, "0"),
        pair(90, cs.length.toString), pair(70, "0")) ++
        cs.map(c => pair(10, fmt(c.x)) + "\n" + pair(20, fmt(c.y)))).mkString("\n")
    case p: Polygon =>
      require(p.getNumInteriorRing == 0,
        "DXF profile: polygons with holes need HATCH — not in the pinned writer")
      val ring = p.getExteriorRing.getCoordinates
      val cs = ring.dropRight(1) // closed LWPOLYLINE omits the repeat vertex
      (Seq(pair(0, "LWPOLYLINE"), pair(8, "0"),
        pair(90, cs.length.toString), pair(70, "1")) ++
        cs.map(c => pair(10, fmt(c.x)) + "\n" + pair(20, fmt(c.y)))).mkString("\n")
    case other => sys.error(s"DXF profile cannot encode ${other.getGeometryType}")
  }

  /** Whole minimal file: ENTITIES section wrapper around the blocks
    * (reference writer's skeleton — no HEADER/TABLES needed to re-read). */
  def writeFile(gs: Seq[Geometry]): String =
    (Seq("0\nSECTION", "2\nENTITIES") ++ gs.map(write) ++
      Seq("0\nENDSEC", "0\nEOF")).mkString("\n")

  // ---- parser: (code, value) pair stream ----

  private final class Pairs(s: String) {
    private val ls = s.split("\n", -1)
    private var i = 0
    def hasNext: Boolean = i + 1 < ls.length ||
      (i < ls.length && ls(i).trim.nonEmpty)
    def peekCode: Int = ls(i).trim.toInt
    def next(): (Int, String) = {
      require(i + 1 < ls.length, s"DXF: dangling group code '${ls(i)}'")
      val c = ls(i).trim.toInt; val v = ls(i + 1).trim
      i += 2
      (c, v)
    }
  }

  /** Parse ONE entity block (as produced by [[write]], tolerating extra
    * group codes). */
  def parse(s: String): Geometry = {
    val gs = parseEntities(new Pairs(s), stopAtSection = false)
    require(gs.length == 1, s"DXF: expected one entity, got ${gs.length}")
    gs.head
  }

  /** Parse a whole minimal file (SECTION/ENTITIES wrapper tolerated and
    * not required; entities outside ENTITIES don't exist in our profile). */
  def parseFile(s: String): Seq[Geometry] =
    parseEntities(new Pairs(s), stopAtSection = true)

  private def parseEntities(p: Pairs, stopAtSection: Boolean): Seq[Geometry] = {
    val f = GeomIO.factory
    val out = Seq.newBuilder[Geometry]
    // state of the entity currently being read (flushed on the next 0-code)
    var etype: String = null
    var xs = Array.newBuilder[Double]; var ys = Array.newBuilder[Double]
    var x2 = 0.0; var y2 = 0.0; var has2 = false
    var flag70 = 0
    def flush(): Unit = {
      if (etype == null) return
      val xa = xs.result(); val ya = ys.result()
      require(xa.length == ya.length,
        s"DXF: unpaired 10/20 group codes in $etype (${xa.length} x vs ${ya.length} y)")
      val cs = xa.indices.map(i => new Coordinate(xa(i), ya(i))).toArray
      etype match {
        case "POINT" =>
          require(cs.length == 1, "DXF POINT needs exactly one 10/20 pair")
          out += f.createPoint(cs.head)
        case "LINE" =>
          require(cs.length == 1 && has2, "DXF LINE needs 10/20 and 11/21")
          out += f.createLineString(Array(cs.head, new Coordinate(x2, y2)))
        case "LWPOLYLINE" =>
          require(cs.length >= 2, "DXF LWPOLYLINE needs >= 2 vertices")
          if ((flag70 & 1) == 1) {
            // a closed polyline is a ring: JTS needs >= 3 distinct
            // vertices, so fail with a DXF-level message, not a raw
            // IllegalArgumentException from createLinearRing
            require(cs.length >= 3, "DXF closed LWPOLYLINE needs >= 3 vertices")
            out += f.createPolygon(f.createLinearRing(cs :+ cs.head.copy()))
          } else out += f.createLineString(cs)
        case other => sys.error(s"unsupported DXF entity '$other'")
      }
      etype = null; xs = Array.newBuilder; ys = Array.newBuilder
      has2 = false; flag70 = 0
    }
    var done = false
    while (!done && p.hasNext) {
      val (c, v) = p.next()
      c match {
        case 0 =>
          flush()
          v.toUpperCase match {
            case "SECTION" | "ENDSEC" if stopAtSection => // skeleton markers
            case "EOF" if stopAtSection => done = true
            case t => etype = t
          }
        case 10 if etype != null => xs += v.toDouble
        case 20 if etype != null => ys += v.toDouble
        case 11 if etype != null => x2 = v.toDouble; has2 = true
        case 21 if etype != null => y2 = v.toDouble
        case 70 if etype != null => flag70 = v.toInt
        case _ => // 8 layer, 90 count, 62 color, handles… — tolerated
      }
    }
    flush()
    out.result()
  }
}
