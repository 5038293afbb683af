package graft.core

import org.locationtech.jts.geom._

/** GeoJSON (RFC 7946) writer + parser over JTS — the OGR GeoJSON driver
  * analog (reference: ogr/ogrsf_frmts/geojson/ogrgeojsonwriter.cpp ::
  * OGRGeoJSONWriteGeometry, ogrgeojsonreader.cpp :: OGRGeoJSONReadGeometry).
  * Hand-rolled rather than a JSON library so the number formatting is an
  * explicit, oracle-replayable contract:
  *
  *  - integer-valued coordinates print WITHOUT a decimal point ("3", not
  *    "3.0") — the analog of the reference's OGRFormatDouble trimming
  *    trailing zeros, and exactly reproducible in SQL via
  *    CAST(CAST(x AS BIGINT) AS VARCHAR);
  *  - every other value prints as the JVM's shortest-round-trip decimal
  *    (Double.toString), which parses back bit-exactly.
  *
  * The parser accepts the seven RFC geometry types with arbitrary member
  * order and whitespace; foreign members (bbox, crs, …) are parsed and
  * ignored, matching the reader's tolerance in the reference. Coordinates
  * beyond (x, y) are ignored. Numbers round-trip through
  * Double.parseDouble — the exact inverse of the writer.
  */
object GeoJson {

  /** 2^53: below this every integer-valued double has an exact Long. */
  private final val IntExactBound = 9.007199254740992e15

  private[core] def fmt(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < IntExactBound) v.toLong.toString
    else java.lang.Double.toString(v)

  private def coord(c: Coordinate): String = s"[${fmt(c.x)},${fmt(c.y)}]"

  private def coords(cs: Array[Coordinate]): String =
    cs.map(coord).mkString("[", ",", "]")

  private def polyCoords(p: Polygon): String =
    (Seq(p.getExteriorRing) ++
      (0 until p.getNumInteriorRing).map(p.getInteriorRingN))
      .map(r => coords(r.getCoordinates)).mkString("[", ",", "]")

  def write(g: Geometry): String = g match {
    case p: Point =>
      s"""{"type":"Point","coordinates":${coord(p.getCoordinate)}}"""
    case l: LineString =>
      s"""{"type":"LineString","coordinates":${coords(l.getCoordinates)}}"""
    case p: Polygon =>
      s"""{"type":"Polygon","coordinates":${polyCoords(p)}}"""
    case m: MultiPoint =>
      val cs = (0 until m.getNumGeometries)
        .map(i => coord(m.getGeometryN(i).asInstanceOf[Point].getCoordinate))
        .mkString("[", ",", "]")
      s"""{"type":"MultiPoint","coordinates":$cs}"""
    case m: MultiLineString =>
      val cs = (0 until m.getNumGeometries)
        .map(i => coords(m.getGeometryN(i).getCoordinates))
        .mkString("[", ",", "]")
      s"""{"type":"MultiLineString","coordinates":$cs}"""
    case m: MultiPolygon =>
      val cs = (0 until m.getNumGeometries)
        .map(i => polyCoords(m.getGeometryN(i).asInstanceOf[Polygon]))
        .mkString("[", ",", "]")
      s"""{"type":"MultiPolygon","coordinates":$cs}"""
    case gc: GeometryCollection =>
      val gs = (0 until gc.getNumGeometries)
        .map(i => write(gc.getGeometryN(i))).mkString("[", ",", "]")
      s"""{"type":"GeometryCollection","geometries":$gs}"""
  }

  def parse(s: String): Geometry = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing characters at ${p.pos} in GeoJSON")
    build(v.asInstanceOf[Map[String, Any]])
  }

  private def num(v: Any): Double = v.asInstanceOf[Double]

  private def build(m: Map[String, Any]): Geometry = {
    val f = GeomIO.factory
    def pt(v: Any): Coordinate = {
      val a = v.asInstanceOf[Vector[Any]]
      require(a.length >= 2, "coordinate needs at least [x, y]")
      new Coordinate(num(a(0)), num(a(1)))
    }
    def pts(v: Any): Array[Coordinate] =
      v.asInstanceOf[Vector[Any]].map(pt).toArray
    def poly(v: Any): Polygon = {
      val rings = v.asInstanceOf[Vector[Any]].map(r => f.createLinearRing(pts(r)))
      require(rings.nonEmpty, "Polygon needs at least an exterior ring")
      f.createPolygon(rings.head, rings.tail.toArray)
    }
    val t = m.getOrElse("type", sys.error("GeoJSON object lacks \"type\""))
      .asInstanceOf[String]
    def cs: Any = m.getOrElse("coordinates",
      sys.error(s"""GeoJSON $t lacks "coordinates""""))
    t match {
      case "Point"      => f.createPoint(pt(cs))
      case "LineString" => f.createLineString(pts(cs))
      case "Polygon"    => poly(cs)
      case "MultiPoint" =>
        f.createMultiPoint(pts(cs).map(f.createPoint))
      case "MultiLineString" =>
        f.createMultiLineString(
          cs.asInstanceOf[Vector[Any]].map(l => f.createLineString(pts(l))).toArray)
      case "MultiPolygon" =>
        f.createMultiPolygon(cs.asInstanceOf[Vector[Any]].map(poly).toArray)
      case "GeometryCollection" =>
        val gs = m.getOrElse("geometries",
          sys.error("""GeometryCollection lacks "geometries""""))
        f.createGeometryCollection(gs.asInstanceOf[Vector[Any]]
          .map(g => build(g.asInstanceOf[Map[String, Any]])).toArray)
      case other => sys.error(s"unsupported GeoJSON type $other")
    }
  }

  /** Minimal recursive-descent JSON reader: objects → Map[String, Any],
    * arrays → Vector[Any], numbers → Double, strings → String, literals
    * → Boolean/null. Only what the GeoJSON grammar needs, but complete
    * for any well-formed JSON value so foreign members never trip it. */
  private final class P(s: String) {
    private var i = 0
    def pos: Int = i
    def eof: Boolean = i >= s.length

    def ws(): Unit =
      while (i < s.length && { val c = s.charAt(i)
        c == ' ' || c == '\t' || c == '\n' || c == '\r' }) i += 1

    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"GeoJSON parse error at $i: $msg")

    private def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }

    def value(): Any = {
      ws()
      if (i >= s.length) fail("unexpected end")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _   => number()
      }
    }

    private def lit(word: String, v: Any): Any = {
      if (!s.startsWith(word, i)) fail(s"expected $word")
      i += word.length; v
    }

    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      val b = Map.newBuilder[String, Any]
      if (i < s.length && s.charAt(i) == '}') { i += 1; return b.result() }
      var done = false
      while (!done) {
        ws()
        val k = str()
        ws(); expect(':')
        b += k -> value()
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      b.result()
    }

    private def arr(): Vector[Any] = {
      expect('['); ws()
      val b = Vector.newBuilder[Any]
      if (i < s.length && s.charAt(i) == ']') { i += 1; return b.result() }
      var done = false
      while (!done) {
        b += value()
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect(']'); done = true }
      }
      b.result()
    }

    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) fail("unterminated escape")
          s.charAt(i) match {
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case '/'  => sb.append('/')
            case 'n'  => sb.append('\n')
            case 't'  => sb.append('\t')
            case 'r'  => sb.append('\r')
            case 'b'  => sb.append('\b')
            case 'f'  => sb.append('\f')
            case 'u'  =>
              if (i + 4 >= s.length) fail("truncated \\u escape")
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case e => fail(s"bad escape \\$e")
          }
        } else sb.append(c)
        i += 1
      }
      expect('"')
      sb.toString
    }

    private def number(): Double = {
      val start = i
      if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
      while (i < s.length && { val c = s.charAt(i)
        (c >= '0' && c <= '9') || c == '.' || c == 'e' || c == 'E' ||
          c == '-' || c == '+' }) i += 1
      if (i == start) fail("expected a number")
      java.lang.Double.parseDouble(s.substring(start, i))
    }
  }
}
