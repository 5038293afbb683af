package graft.core

import org.locationtech.jts.geom.{Geometry, GeometryFactory, PrecisionModel, Coordinate}
import org.locationtech.jts.io.{WKTReader, WKTWriter, WKBReader, WKBWriter}
import org.locationtech.jts.geom.prep.{PreparedGeometry, PreparedGeometryFactory}

/** JTS bridge: WKT/WKB (de)serialization and a bounded prepared-geometry
  * cache.
  *
  * The reference's geometry engine is GEOS — the C++ port of JTS — so JTS
  * predicates are semantics-identical to the reference's
  * (reference: ogr/ogrgeometry.cpp :: OGRGeometry::Intersects/Contains/…,
  * ogr/ogrgeometryfactory.cpp :: createFromWkt/createFromWkb). Geometry
  * travels through Spark plans as WKB in a BinaryType column (no UDT,
  * SURVEY.md §2.2); these helpers run inside Catalyst expressions.
  */
object GeomIO {
  val factory = new GeometryFactory(new PrecisionModel(PrecisionModel.FLOATING), 4326)

  // JTS reader/writer classes are not thread-safe; Spark evaluates
  // expressions on many task threads in one JVM (local[32]).
  private val wktReader = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  private val wktWriter = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter())
  private val wkbReader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val wkbWriter = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter())

  def fromWkt(wkt: String): Geometry = wktReader.get.read(wkt)
  def toWkt(g: Geometry): String = wktWriter.get.write(g)
  def fromWkb(wkb: Array[Byte]): Geometry = wkbReader.get.read(wkb)
  def toWkb(g: Geometry): Array[Byte] = wkbWriter.get.write(g)

  def point(lon: Double, lat: Double): Geometry =
    factory.createPoint(new Coordinate(lon, lat))

  /** Axis-aligned box polygon (counter-clockwise shell). */
  def box(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Geometry =
    factory.createPolygon(Array(
      new Coordinate(xmin, ymin), new Coordinate(xmax, ymin),
      new Coordinate(xmax, ymax), new Coordinate(xmin, ymax),
      new Coordinate(xmin, ymin)))

  /** Per-thread LRU of PreparedGeometry keyed by WKB bytes (1k entries ×
    * 32 threads of small prepared polygons; env-tunable GRAFT_PREP_CACHE —
    * raise it when the broadcast dimension side is larger so refine probes
    * hit instead of re-preparing).
    * The spatial-join refine step evaluates the same (broadcast) polygon
    * against many candidate rows; preparing once per task thread turns the
    * O(vertices) point-in-polygon test into an indexed one — the analog of
    * the reference caching a prepared geometry inside its spatial filter
    * (ogr/ogrsf_frmts/generic/ogrlayer.cpp :: OGRLayer::FilterGeometry). */
  private final val CacheMax =
    sys.env.getOrElse("GRAFT_PREP_CACHE", "1024").toInt
  private val prepCache = ThreadLocal.withInitial[java.util.LinkedHashMap[java.nio.ByteBuffer, PreparedGeometry]](
    () => new java.util.LinkedHashMap[java.nio.ByteBuffer, PreparedGeometry](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[java.nio.ByteBuffer, PreparedGeometry]): Boolean =
        size() > CacheMax
    })

  def prepared(wkb: Array[Byte]): PreparedGeometry = {
    val key = java.nio.ByteBuffer.wrap(wkb)
    val cache = prepCache.get
    var p = cache.get(key)
    if (p == null) {
      p = PreparedGeometryFactory.prepare(fromWkb(wkb))
      cache.put(key, p)
    }
    p
  }
}
