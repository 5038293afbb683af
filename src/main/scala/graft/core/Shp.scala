package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import org.locationtech.jts.geom._

/** ESRI Shapefile writer + parser over JTS — the OGR Shapefile driver
  * analog (reference: ogr/ogrsf_frmts/shape/ :: OGRShapeLayer,
  * shapelib shpopen.c :: SHPWriteObject/SHPReadObject). The single
  * most-used OGR binary format; the wire layout is the public ESRI
  * Shapefile Technical Description:
  *
  *  - main header: 100 bytes — file code 9994 (BE), 5 unused BE ints,
  *    file length in 16-bit WORDS (BE), version 1000 (LE), shape type
  *    (LE), XY bbox as 4 LE doubles, Z/M ranges as 4 LE doubles (zero
  *    for 2-D shapes).
  *  - record: 8-byte BE header (1-based record number, content length
  *    in words) + little-endian content.
  *  - content: Point(1) = type + X + Y; PolyLine(3)/Polygon(5) = type +
  *    XY bbox + numParts + numPoints + part-start index array + points;
  *    MultiPoint(8) = type + bbox + numPoints + points; Null(0) = type.
  *  - Polygon ring convention: shells clockwise, holes counter-clockwise
  *    (shapelib's SHPRewindObject direction).
  *
  * The companion .shx is header + (offset words BE, content words BE)
  * per record; .dbf is handled by [[Dbf]]. Writer canonicalizes ring
  * orientation; the parser regroups type-5 rings into shells/holes by
  * orientation + containment, mirroring the reference's
  * OGRShapeLayer::FetchShape organizePolygons path. */
object Shp {

  val NullShape = 0
  val PointType = 1
  val PolyLineType = 3
  val PolygonType = 5
  val MultiPointType = 8

  def shapeType(g: Geometry): Int = g match {
    case _ if g.isEmpty        => NullShape
    case _: Point              => PointType
    case _: MultiPoint         => MultiPointType
    case _: LineString         => PolyLineType
    case _: MultiLineString    => PolyLineType
    case _: Polygon            => PolygonType
    case _: MultiPolygon       => PolygonType
    case other => sys.error(s"shapefile: unsupported geometry ${other.getGeometryType}")
  }

  /** Content length in BYTES for `g` (excludes the 8-byte record header). */
  def contentLength(g: Geometry): Int = shapeType(g) match {
    case NullShape  => 4
    case PointType  => 4 + 16
    case MultiPointType => 4 + 32 + 4 + 16 * g.getNumPoints
    case PolyLineType =>
      val parts = lineParts(g)
      4 + 32 + 8 + 4 * parts.length + 16 * parts.map(_.length).sum
    case PolygonType =>
      val rings = polyRings(g)
      4 + 32 + 8 + 4 * rings.length + 16 * rings.map(_.length).sum
  }

  private def lineParts(g: Geometry): Array[Array[Coordinate]] = g match {
    case l: LineString => Array(l.getCoordinates)
    case m: MultiLineString =>
      Array.tabulate(m.getNumGeometries)(i => m.getGeometryN(i).getCoordinates)
    case _ => sys.error("not a polyline geometry")
  }

  private def isCCW(cs: Array[Coordinate]): Boolean =
    org.locationtech.jts.algorithm.Orientation.isCCW(cs)

  /** Rings in write order and canonical orientation: shells CW, holes CCW
    * (per polygon: exterior first, then its holes). */
  private def polyRings(g: Geometry): Array[Array[Coordinate]] = {
    def one(p: Polygon): Array[Array[Coordinate]] = {
      val shell = {
        val cs = p.getExteriorRing.getCoordinates
        if (isCCW(cs)) cs.reverse else cs
      }
      val holes = Array.tabulate(p.getNumInteriorRing) { i =>
        val cs = p.getInteriorRingN(i).getCoordinates
        if (isCCW(cs)) cs else cs.reverse
      }
      shell +: holes
    }
    g match {
      case p: Polygon => one(p)
      case m: MultiPolygon =>
        (0 until m.getNumGeometries).toArray
          .flatMap(i => one(m.getGeometryN(i).asInstanceOf[Polygon]))
      case _ => sys.error("not a polygon geometry")
    }
  }

  /** One full record: 8-byte big-endian header + little-endian content. */
  def writeRecord(recNum: Int, g: Geometry): Array[Byte] = {
    val clen = contentLength(g)
    val buf = ByteBuffer.allocate(8 + clen)
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(recNum)
    buf.putInt(clen / 2)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    val t = shapeType(g)
    buf.putInt(t)
    def bbox(): Unit = {
      val e = g.getEnvelopeInternal
      buf.putDouble(e.getMinX); buf.putDouble(e.getMinY)
      buf.putDouble(e.getMaxX); buf.putDouble(e.getMaxY)
    }
    def pts(cs: Array[Coordinate]): Unit =
      cs.foreach { c => buf.putDouble(c.x); buf.putDouble(c.y) }
    t match {
      case NullShape =>
      case PointType =>
        val c = g.getCoordinate; buf.putDouble(c.x); buf.putDouble(c.y)
      case MultiPointType =>
        bbox(); buf.putInt(g.getNumPoints); pts(g.getCoordinates)
      case PolyLineType | PolygonType =>
        val parts = if (t == PolyLineType) lineParts(g) else polyRings(g)
        bbox()
        buf.putInt(parts.length)
        buf.putInt(parts.map(_.length).sum)
        var start = 0
        parts.foreach { p => buf.putInt(start); start += p.length }
        parts.foreach(pts)
    }
    buf.array()
  }

  /** Parse one record (header + content) back to (recordNumber, geometry). */
  def readRecord(bytes: Array[Byte]): (Int, Geometry) = {
    val f = GeomIO.factory
    val buf = ByteBuffer.wrap(bytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    val recNum = buf.getInt
    val words = buf.getInt
    require(bytes.length == 8 + words * 2,
      s"shp record: content is ${bytes.length - 8} bytes but header declares ${words * 2}")
    buf.order(ByteOrder.LITTLE_ENDIAN)
    val t = buf.getInt
    def readPts(n: Int): Array[Coordinate] =
      Array.fill(n)(new Coordinate(buf.getDouble, buf.getDouble))
    val g: Geometry = t match {
      case NullShape => f.createGeometryCollection(Array.empty)
      case PointType => f.createPoint(new Coordinate(buf.getDouble, buf.getDouble))
      case MultiPointType =>
        buf.position(buf.position() + 32) // bbox is derived data; skip
        f.createMultiPoint(readPts(buf.getInt).map(f.createPoint))
      case PolyLineType | PolygonType =>
        buf.position(buf.position() + 32)
        val nParts = buf.getInt
        val nPoints = buf.getInt
        val starts = Array.fill(nParts)(buf.getInt)
        val all = readPts(nPoints)
        val parts = Array.tabulate(nParts) { i =>
          val end = if (i == nParts - 1) nPoints else starts(i + 1)
          all.slice(starts(i), end)
        }
        if (t == PolyLineType) {
          val ls = parts.map(f.createLineString)
          if (ls.length == 1) ls.head else f.createMultiLineString(ls)
        } else {
          // shells = CW rings, holes = CCW rings assigned to the shell
          // whose envelope contains them (reference: organizePolygons'
          // containment pass; envelope test suffices for valid input)
          val rings = parts.map(f.createLinearRing)
          val (holes, shells) = rings.partition(r => isCCW(r.getCoordinates))
          if (shells.isEmpty)
            sys.error("shp polygon record with no clockwise ring")
          val polys = shells.map { sh =>
            val mine = holes.filter(h =>
              sh.getEnvelopeInternal.contains(h.getEnvelopeInternal))
            f.createPolygon(sh, mine)
          }
          if (polys.length == 1) polys.head else f.createMultiPolygon(polys)
        }
      case other => sys.error(s"shp: unsupported shape type $other")
    }
    (recNum, g)
  }

  private def put100Header(buf: ByteBuffer, fileWords: Int, shapeT: Int,
                           env: Envelope): Unit = {
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(9994)
    (0 until 5).foreach(_ => buf.putInt(0))
    buf.putInt(fileWords)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(1000)
    buf.putInt(shapeT)
    buf.putDouble(env.getMinX); buf.putDouble(env.getMinY)
    buf.putDouble(env.getMaxX); buf.putDouble(env.getMaxY)
    (0 until 4).foreach(_ => buf.putDouble(0.0))
  }

  /** Full .shp + .shx file images for a homogeneous geometry sequence
    * (records numbered 1..n in input order). */
  def writeFile(geoms: Seq[Geometry]): (Array[Byte], Array[Byte]) = {
    require(geoms.nonEmpty, "shapefile needs at least one record")
    val recs = geoms.zipWithIndex.map { case (g, i) => writeRecord(i + 1, g) }
    val t = shapeType(geoms.head)
    require(geoms.forall(g => shapeType(g) == t),
      "shapefile records must share one shape type")
    val env = new Envelope()
    geoms.foreach(g => env.expandToInclude(g.getEnvelopeInternal))
    val total = 100 + recs.map(_.length).sum
    val shp = ByteBuffer.allocate(total)
    put100Header(shp, total / 2, t, env)
    recs.foreach(shp.put)
    val shx = ByteBuffer.allocate(100 + 8 * recs.length)
    put100Header(shx, (100 + 8 * recs.length) / 2, t, env)
    shx.order(ByteOrder.BIG_ENDIAN)
    var off = 50
    recs.foreach { r =>
      shx.putInt(off); shx.putInt((r.length - 8) / 2); off += r.length / 2
    }
    (shp.array(), shx.array())
  }

  /** Parse a whole .shp image back to its (recordNumber, geometry) rows. */
  def readFile(shp: Array[Byte]): Seq[(Int, Geometry)] = {
    val buf = ByteBuffer.wrap(shp)
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt == 9994, "not a shapefile: bad file code")
    buf.position(24)
    val fileWords = buf.getInt
    require(fileWords * 2 == shp.length,
      s"shp header declares ${fileWords * 2} bytes, file is ${shp.length}")
    var pos = 100
    val out = Seq.newBuilder[(Int, Geometry)]
    while (pos < shp.length) {
      val words = ByteBuffer.wrap(shp, pos + 4, 4).order(ByteOrder.BIG_ENDIAN).getInt
      val rec = java.util.Arrays.copyOfRange(shp, pos, pos + 8 + words * 2)
      out += readRecord(rec)
      pos += 8 + words * 2
    }
    out.result()
  }
}

/** dBASE III (.dbf) attribute table codec — the OGR Shapefile driver's
  * attribute side (reference: ogr/ogrsf_frmts/shape/ :: shapelib
  * dbfopen.c :: DBFWriteAttribute/DBFReadAttribute). Records are
  * fixed-width ASCII: a one-byte deletion flag (space = live) then each
  * field padded to its declared width — 'C' text left-justified
  * (right-padded), 'N' numbers right-justified (left-padded), exactly
  * dbfopen.c's WriteAttribute layout. */
object Dbf {

  case class Field(name: String, typ: Char, len: Int) {
    require(typ == 'C' || typ == 'N', s"dbf: unsupported field type $typ")
    require(name.length <= 10, s"dbf: field name over 10 chars: $name")
    require(len >= 1 && len <= 254, s"dbf: bad field length $len")
  }

  /** Parse a compact spec like "N8,C16" (names auto-assigned F1..Fn) or
    * "id:N8,name:C16". */
  def spec(s: String): Seq[Field] =
    s.split(",").toIndexedSeq.zipWithIndex.map { case (part, i) =>
      val (nm, rest) = part.indexOf(':') match {
        case -1 => (s"F${i + 1}", part.trim)
        case c  => (part.substring(0, c).trim, part.substring(c + 1).trim)
      }
      Field(nm, rest.head, rest.tail.toInt)
    }

  /** One record string: ' ' + each value padded to its field width. */
  def record(values: Seq[String], fields: Seq[Field]): String = {
    require(values.length == fields.length,
      s"dbf: ${values.length} values for ${fields.length} fields")
    val sb = new StringBuilder(1 + fields.map(_.len).sum)
    sb.append(' ')
    values.zip(fields).foreach { case (v, f) =>
      require(v.length <= f.len, s"dbf: '$v' overflows ${f.typ}${f.len}")
      require(v.forall(c => c >= ' ' && c < 127), s"dbf: non-ASCII in '$v'")
      if (f.typ == 'N') { var i = v.length; while (i < f.len) { sb.append(' '); i += 1 }; sb.append(v) }
      else { sb.append(v); var i = v.length; while (i < f.len) { sb.append(' '); i += 1 } }
    }
    sb.toString
  }

  /** Parse a record back to trimmed field values ('N' left-trim, 'C'
    * right-trim — the dbfopen read path's trimming). */
  def fields(record: String, fs: Seq[Field]): Seq[String] = {
    require(record.length == 1 + fs.map(_.len).sum,
      s"dbf: record is ${record.length} bytes, schema wants ${1 + fs.map(_.len).sum}")
    require(record.head == ' ' || record.head == '*', "dbf: bad deletion flag")
    var pos = 1
    fs.map { f =>
      val raw = record.substring(pos, pos + f.len); pos += f.len
      if (f.typ == 'N') raw.dropWhile(_ == ' ')
      else raw.reverse.dropWhile(_ == ' ').reverse
    }
  }

  /** Full .dbf file image (version 0x03). `date` is the 3-byte header
    * update stamp (years since 1900, month, day) — fixed by default so
    * output is deterministic. */
  def writeFile(rows: Seq[Seq[String]], fs: Seq[Field],
                date: (Int, Int, Int) = (126, 1, 1)): Array[Byte] = {
    val headerSize = 32 + 32 * fs.length + 1
    val recordSize = 1 + fs.map(_.len).sum
    val buf = ByteBuffer.allocate(headerSize + recordSize * rows.length + 1)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0x03.toByte)
    buf.put(date._1.toByte); buf.put(date._2.toByte); buf.put(date._3.toByte)
    buf.putInt(rows.length)
    buf.putShort(headerSize.toShort)
    buf.putShort(recordSize.toShort)
    (0 until 20).foreach(_ => buf.put(0.toByte))
    fs.foreach { f =>
      val nm = f.name.getBytes("US-ASCII")
      buf.put(nm); (nm.length until 11).foreach(_ => buf.put(0.toByte))
      buf.put(f.typ.toByte)
      (0 until 4).foreach(_ => buf.put(0.toByte))
      buf.put(f.len.toByte)
      buf.put(0.toByte) // decimal count (integer N fields)
      (0 until 14).foreach(_ => buf.put(0.toByte))
    }
    buf.put(0x0D.toByte)
    rows.foreach(r => buf.put(record(r, fs).getBytes("US-ASCII")))
    buf.put(0x1A.toByte)
    buf.array()
  }

  /** Parse a whole .dbf image back to (fields, row values). */
  def readFile(bytes: Array[Byte]): (Seq[Field], Seq[Seq[String]]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require((buf.get() & 0x07) == 0x03, "dbf: unsupported version")
    buf.position(4)
    val nRec = buf.getInt
    val headerSize = buf.getShort.toInt
    val recordSize = buf.getShort.toInt
    val nFields = (headerSize - 33) / 32
    val fs = (0 until nFields).map { i =>
      val base = 32 + 32 * i
      val nameBytes = java.util.Arrays.copyOfRange(bytes, base, base + 11)
      val name = new String(nameBytes.takeWhile(_ != 0), "US-ASCII")
      Field(name, bytes(base + 11).toChar, bytes(base + 16) & 0xFF)
    }
    val rows = (0 until nRec).map { r =>
      val start = headerSize + r * recordSize
      fields(new String(bytes, start, recordSize, "US-ASCII"), fs)
    }
    (fs, rows)
  }
}
