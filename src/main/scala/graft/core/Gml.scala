package graft.core

import org.locationtech.jts.geom._

/** GML 2.1.2 geometry writer + parser over JTS — the OGR GML driver
  * analog (reference: ogr/ogrsf_frmts/gml/ + ogr/ogr2gmlgeometry.cpp ::
  * OGR_G_ExportToGML, ogr/gml2ogrgeometry.cpp :: GML2OGRGeometry_XMLNode).
  * The SVN-era writer emits GML 2 (coordinates-element syntax, not GML 3
  * posList), which is what this reproduces: `gml:`-prefixed elements,
  * tuples `x,y` space-joined inside <gml:coordinates>, Multi* through
  * the member-wrapper elements (pointMember / lineStringMember /
  * polygonMember / geometryMember). Number formatting is the shared
  * GeoJson.fmt oracle contract (integers bare, else shortest round-trip
  * decimal). The parser rides the same tolerant Xml.Reader as KML —
  * namespace prefixes strip, attributes (srsName etc.) skip, unknown
  * siblings skip — and accepts members with or without their wrapper
  * (both forms appear in the wild; the reference's reader does the
  * same). Heterogeneous <gml:MultiGeometry> falls back to a
  * GeometryCollection. */
object Gml {

  private def fmt(v: Double): String = GeoJson.fmt(v)

  private def tuple(c: Coordinate): String = s"${fmt(c.x)},${fmt(c.y)}"

  private def coords(cs: Array[Coordinate]): String =
    s"<gml:coordinates>${cs.map(tuple).mkString(" ")}</gml:coordinates>"

  private def ring(r: LineString, role: String): String =
    s"<gml:$role><gml:LinearRing>${coords(r.getCoordinates)}</gml:LinearRing></gml:$role>"

  def write(g: Geometry): String = g match {
    case p: Point =>
      s"<gml:Point>${coords(Array(p.getCoordinate))}</gml:Point>"
    case l: LineString =>
      s"<gml:LineString>${coords(l.getCoordinates)}</gml:LineString>"
    case p: Polygon =>
      val inner = (0 until p.getNumInteriorRing)
        .map(i => ring(p.getInteriorRingN(i), "innerBoundaryIs")).mkString
      s"<gml:Polygon>${ring(p.getExteriorRing, "outerBoundaryIs")}$inner</gml:Polygon>"
    case mp: MultiPoint =>
      val ms = (0 until mp.getNumGeometries)
        .map(i => s"<gml:pointMember>${write(mp.getGeometryN(i))}</gml:pointMember>").mkString
      s"<gml:MultiPoint>$ms</gml:MultiPoint>"
    case ml: MultiLineString =>
      val ms = (0 until ml.getNumGeometries)
        .map(i => s"<gml:lineStringMember>${write(ml.getGeometryN(i))}</gml:lineStringMember>").mkString
      s"<gml:MultiLineString>$ms</gml:MultiLineString>"
    case mp: MultiPolygon =>
      val ms = (0 until mp.getNumGeometries)
        .map(i => s"<gml:polygonMember>${write(mp.getGeometryN(i))}</gml:polygonMember>").mkString
      s"<gml:MultiPolygon>$ms</gml:MultiPolygon>"
    case gc: GeometryCollection =>
      val ms = (0 until gc.getNumGeometries)
        .map(i => s"<gml:geometryMember>${write(gc.getGeometryN(i))}</gml:geometryMember>").mkString
      s"<gml:MultiGeometry>$ms</gml:MultiGeometry>"
  }

  def parse(s: String): Geometry = {
    val p = new Xml.Reader(s, "GML")
    p.prolog()
    val n = p.element()
    p.wsAndComments()
    require(p.eof, s"trailing characters at ${p.pos} in GML")
    build(n)
  }

  private type Node = Xml.Node

  private def parseTuples(text: String): Array[Coordinate] =
    text.trim.split("\\s+").filter(_.nonEmpty).map { t =>
      val parts = t.split(",")
      require(parts.length >= 2, s"GML coordinate tuple needs x,y: '$t'")
      new Coordinate(java.lang.Double.parseDouble(parts(0)),
        java.lang.Double.parseDouble(parts(1)))
    }

  private def coordsOf(n: Node): Array[Coordinate] = {
    // GML 2 <coordinates>; a GML 3 <posList> (space-separated scalars,
    // dimension 2) is accepted on read — the reference's reader takes both
    n.children.find(_.name == "coordinates") match {
      case Some(c) => parseTuples(c.text)
      case None =>
        val pl = n.children.find(_.name == "posList")
          .getOrElse(sys.error(s"GML ${n.name} lacks <coordinates>/<posList>"))
        val xs = pl.text.trim.split("\\s+").filter(_.nonEmpty)
        require(xs.length % 2 == 0, "GML posList needs an even scalar count")
        xs.grouped(2).map(a => new Coordinate(
          java.lang.Double.parseDouble(a(0)), java.lang.Double.parseDouble(a(1)))).toArray
    }
  }

  private def ringOf(n: Node): LinearRing = {
    val lr = n.children.find(_.name == "LinearRing")
      .getOrElse(sys.error(s"GML ${n.name} lacks <LinearRing>"))
    GeomIO.factory.createLinearRing(coordsOf(lr))
  }

  private val GeomNames = Set("Point", "LineString", "LinearRing", "Polygon",
    "MultiPoint", "MultiLineString", "MultiPolygon", "MultiGeometry")

  /** A member wrapper's payload, or the node itself when the wrapper is
    * omitted (both appear in real GML). */
  private def unwrap(n: Node): Option[Node] =
    if (GeomNames.contains(n.name)) Some(n)
    else n.children.find(c => GeomNames.contains(c.name))

  private def build(n: Node): Geometry = {
    val f = GeomIO.factory
    n.name match {
      case "Point" =>
        val cs = coordsOf(n)
        require(cs.length == 1, s"GML Point needs exactly one tuple, got ${cs.length}")
        f.createPoint(cs.head)
      case "LineString" => f.createLineString(coordsOf(n))
      case "LinearRing" => f.createLinearRing(coordsOf(n))
      case "Polygon" =>
        val outer = n.children.find(_.name == "outerBoundaryIs")
          .orElse(n.children.find(_.name == "exterior")) // GML 3 synonym
          .getOrElse(sys.error("GML Polygon lacks <outerBoundaryIs>"))
        val inner = n.children
          .filter(c => c.name == "innerBoundaryIs" || c.name == "interior").map(ringOf)
        f.createPolygon(ringOf(outer), inner.toArray)
      case "MultiPoint" =>
        f.createMultiPoint(n.children.flatMap(unwrap).map(build)
          .map(_.asInstanceOf[Point]).toArray)
      case "MultiLineString" =>
        f.createMultiLineString(n.children.flatMap(unwrap).map(build)
          .map(_.asInstanceOf[LineString]).toArray)
      case "MultiPolygon" =>
        f.createMultiPolygon(n.children.flatMap(unwrap).map(build)
          .map(_.asInstanceOf[Polygon]).toArray)
      case "MultiGeometry" =>
        val gs = n.children.flatMap(unwrap).map(build)
        if (gs.isEmpty) f.createGeometryCollection(Array.empty)
        else if (gs.forall(_.isInstanceOf[Point]))
          f.createMultiPoint(gs.map(_.asInstanceOf[Point]).toArray)
        else if (gs.forall(_.isInstanceOf[LineString]))
          f.createMultiLineString(gs.map(_.asInstanceOf[LineString]).toArray)
        else if (gs.forall(_.isInstanceOf[Polygon]))
          f.createMultiPolygon(gs.map(_.asInstanceOf[Polygon]).toArray)
        else f.createGeometryCollection(gs.toArray)
      case other => sys.error(s"unsupported GML geometry element <$other>")
    }
  }
}
