package graft.core

import org.locationtech.jts.geom._

/** GPX 1.1 geometry writer + parser over JTS — the OGR GPX driver analog
  * (reference: ogr/ogrsf_frmts/gpx/ogrgpxlayer.cpp ::
  * OGRGPXLayer::ICreateFeature writer / startElement readers). Unlike
  * KML/GML — where coordinates live in element TEXT — GPX carries each
  * position as `lat`/`lon` ATTRIBUTES on `<wpt>`/`<trkpt>`/`<rtept>`,
  * which is why the shared Xml reader captures attribute values. The
  * number formatting is the same explicit oracle-replayable contract as
  * the other three text drivers (GeoJson.fmt): integer-valued
  * coordinates print bare, everything else as the shortest-round-trip
  * decimal. Writer attribute order is `lat` then `lon` (the GPX schema's
  * conventional order; lat = y, lon = x).
  *
  * Geometry mapping, mirroring the OGR driver's layer model:
  *  - Point           → `<wpt lat=".." lon=".."/>`
  *  - LineString      → `<trk><trkseg><trkpt/>…</trkseg></trk>`
  *  - MultiLineString → one `<trk>` with one `<trkseg>` per member
  *  - MultiPoint      → `<gpx><wpt/>…</gpx>` (the waypoint layer)
  * The parser additionally accepts `<rte><rtept/>…</rte>` (routes read
  * as LineStrings — OGR's mapping), `<trkseg>` fragments, `<ele>`,
  * `<name>`, `<time>` children (skipped — reader tolerance), namespace
  * prefixes, prologs and comments. A `<gpx>` root whose children are all
  * waypoints parses as MultiPoint (a single waypoint still promotes to
  * MultiPoint — GPX cannot spell the difference; documented divergence
  * like the KML MultiGeometry case); one non-wpt child unwraps to
  * itself; mixed content falls back to GeometryCollection.
  */
object Gpx {

  private def fmt(v: Double): String = GeoJson.fmt(v)

  private def pt(tag: String, c: Coordinate): String =
    s"""<$tag lat="${fmt(c.y)}" lon="${fmt(c.x)}"/>"""

  private def seg(l: LineString): String =
    s"<trkseg>${l.getCoordinates.map(pt("trkpt", _)).mkString}</trkseg>"

  def write(g: Geometry): String = g match {
    case p: Point => pt("wpt", p.getCoordinate)
    case l: LineString => s"<trk>${seg(l)}</trk>"
    case m: MultiLineString =>
      val segs = (0 until m.getNumGeometries)
        .map(i => seg(m.getGeometryN(i).asInstanceOf[LineString])).mkString
      s"<trk>$segs</trk>"
    case m: MultiPoint =>
      val wpts = (0 until m.getNumGeometries)
        .map(i => pt("wpt", m.getGeometryN(i).asInstanceOf[Point].getCoordinate)).mkString
      s"<gpx>$wpts</gpx>"
    case other => sys.error(s"GPX cannot encode ${other.getGeometryType}")
  }

  def parse(s: String): Geometry = {
    val p = new Xml.Reader(s, "GPX")
    p.prolog()
    val n = p.element()
    p.wsAndComments()
    require(p.eof, s"trailing characters at ${p.pos} in GPX")
    build(n)
  }

  private type Node = Xml.Node

  private def coord(n: Node): Coordinate = {
    val lat = n.attrs.getOrElse("lat", sys.error(s"GPX <${n.name}> lacks lat attribute"))
    val lon = n.attrs.getOrElse("lon", sys.error(s"GPX <${n.name}> lacks lon attribute"))
    new Coordinate(java.lang.Double.parseDouble(lon), java.lang.Double.parseDouble(lat))
  }

  private def lineOf(n: Node, ptName: String): LineString =
    GeomIO.factory.createLineString(
      n.children.filter(_.name == ptName).map(coord).toArray)

  private val GeomNames = Set("wpt", "trk", "rte", "trkseg")

  private def build(n: Node): Geometry = {
    val f = GeomIO.factory
    n.name match {
      case "wpt" => f.createPoint(coord(n))
      case "trkseg" => lineOf(n, "trkpt")
      case "rte" => lineOf(n, "rtept")
      case "trk" =>
        val segs = n.children.filter(_.name == "trkseg").map(lineOf(_, "trkpt"))
        require(segs.nonEmpty, "GPX <trk> lacks <trkseg>")
        if (segs.length == 1) segs.head
        else f.createMultiLineString(segs.toArray)
      case "gpx" =>
        val gs = n.children.filter(c => GeomNames.contains(c.name)).map(build)
        if (gs.isEmpty) f.createGeometryCollection(Array.empty)
        else if (gs.forall(_.isInstanceOf[Point]))
          f.createMultiPoint(gs.map(_.asInstanceOf[Point]).toArray)
        else if (gs.length == 1) gs.head
        else f.createGeometryCollection(gs.toArray)
      case other => sys.error(s"unsupported GPX element <$other>")
    }
  }

}
