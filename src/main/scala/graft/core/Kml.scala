package graft.core

import org.locationtech.jts.geom._

/** KML 2.2 geometry writer + parser over JTS — the OGR KML driver analog
  * (reference: ogr/ogrsf_frmts/kml/ogr2kmlgeometry.cpp ::
  * OGR2KMLGeometryAppend, kml/kmlnode.cpp :: KMLNode::Geometry2* readers).
  * Hand-rolled like core/GeoJson so the number formatting is the SAME
  * explicit oracle-replayable contract (GeoJson.fmt): integer-valued
  * coordinates print bare, everything else as the shortest-round-trip
  * decimal that parses back bit-exactly.
  *
  * Coordinate tuples are `x,y` joined by single spaces (the KML
  * <coordinates> grammar; a trailing `,alt` in input is parsed and
  * ignored — OGR's 2.5D tolerance). Polygons write
  * outerBoundaryIs/innerBoundaryIs LinearRings; every Multi* and
  * GeometryCollection writes a flat <MultiGeometry>. The parser accepts
  * arbitrary attribute content, XML comments, namespace prefixes
  * (stripped), surrounding <?xml?> prologs, and unknown sibling elements
  * (<extrude>, <altitudeMode>, <tessellate>… are skipped) — matching the
  * reader tolerance in the reference. A parsed <MultiGeometry> promotes
  * to MultiPoint/MultiLineString/MultiPolygon when homogeneous and falls
  * back to GeometryCollection when mixed (documented divergence:
  * single-type GeometryCollections don't round-trip as collections —
  * KML has no way to spell the difference).
  */
object Kml {

  private def fmt(v: Double): String = GeoJson.fmt(v)

  private def tuple(c: Coordinate): String = s"${fmt(c.x)},${fmt(c.y)}"

  private def coords(cs: Array[Coordinate]): String =
    cs.map(tuple).mkString(" ")

  private def ring(r: LineString, role: String): String =
    s"<$role><LinearRing><coordinates>${coords(r.getCoordinates)}</coordinates></LinearRing></$role>"

  def write(g: Geometry): String = g match {
    case p: Point =>
      s"<Point><coordinates>${tuple(p.getCoordinate)}</coordinates></Point>"
    case l: LineString =>
      s"<LineString><coordinates>${coords(l.getCoordinates)}</coordinates></LineString>"
    case p: Polygon =>
      val inner = (0 until p.getNumInteriorRing)
        .map(i => ring(p.getInteriorRingN(i), "innerBoundaryIs")).mkString
      s"<Polygon>${ring(p.getExteriorRing, "outerBoundaryIs")}$inner</Polygon>"
    case gc: GeometryCollection => // covers all Multi* subclasses too
      val gs = (0 until gc.getNumGeometries).map(i => write(gc.getGeometryN(i))).mkString
      s"<MultiGeometry>$gs</MultiGeometry>"
  }

  def parse(s: String): Geometry = {
    val p = new Xml.Reader(s, "KML")
    p.prolog()
    val n = p.element()
    p.wsAndComments()
    require(p.eof, s"trailing characters at ${p.pos} in KML")
    build(n)
  }

  private type Node = Xml.Node

  private def parseTuples(text: String): Array[Coordinate] =
    text.trim.split("\\s+").filter(_.nonEmpty).map { t =>
      val parts = t.split(",")
      require(parts.length >= 2, s"KML coordinate tuple needs x,y: '$t'")
      new Coordinate(java.lang.Double.parseDouble(parts(0)),
        java.lang.Double.parseDouble(parts(1)))
    }

  private def coordsOf(n: Node): Array[Coordinate] = {
    val c = n.children.find(_.name == "coordinates")
      .getOrElse(sys.error(s"KML ${n.name} lacks <coordinates>"))
    parseTuples(c.text)
  }

  private def ringOf(n: Node): LinearRing = {
    val lr = n.children.find(_.name == "LinearRing")
      .getOrElse(sys.error(s"KML ${n.name} lacks <LinearRing>"))
    GeomIO.factory.createLinearRing(coordsOf(lr))
  }

  private val GeomNames = Set("Point", "LineString", "LinearRing", "Polygon", "MultiGeometry")

  private def build(n: Node): Geometry = {
    val f = GeomIO.factory
    n.name match {
      case "Point" =>
        val cs = coordsOf(n)
        require(cs.length == 1, s"KML Point needs exactly one tuple, got ${cs.length}")
        f.createPoint(cs.head)
      case "LineString" => f.createLineString(coordsOf(n))
      case "LinearRing" => f.createLinearRing(coordsOf(n))
      case "Polygon" =>
        val outer = n.children.find(_.name == "outerBoundaryIs")
          .getOrElse(sys.error("KML Polygon lacks <outerBoundaryIs>"))
        val inner = n.children.filter(_.name == "innerBoundaryIs").map(ringOf)
        f.createPolygon(ringOf(outer), inner.toArray)
      case "MultiGeometry" =>
        val gs = n.children.filter(c => GeomNames.contains(c.name)).map(build)
        if (gs.isEmpty) f.createGeometryCollection(Array.empty)
        else if (gs.forall(_.isInstanceOf[Point]))
          f.createMultiPoint(gs.map(_.asInstanceOf[Point]).toArray)
        else if (gs.forall(_.isInstanceOf[LineString]))
          f.createMultiLineString(gs.map(_.asInstanceOf[LineString]).toArray)
        else if (gs.forall(_.isInstanceOf[Polygon]))
          f.createMultiPolygon(gs.map(_.asInstanceOf[Polygon]).toArray)
        else f.createGeometryCollection(gs.toArray)
      case other => sys.error(s"unsupported KML geometry element <$other>")
    }
  }

}
