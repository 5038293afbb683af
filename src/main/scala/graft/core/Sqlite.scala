package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import org.locationtech.jts.geom.Geometry

/** Minimal SQLite 3 database-file codec — writer + parser for the subset
  * the OGR GeoPackage driver exercises (reference:
  * ogr/ogrsf_frmts/gpkg/ :: OGRGeoPackageDataSource/OGRGeoPackageLayer,
  * which reads feature tables through SQLite's table b-trees; and
  * ogr/ogrsf_frmts/sqlite/ :: OGRSQLiteLayer). The wire layout is the
  * public SQLite file-format document (sqlite.org/fileformat2.html):
  *
  *  - 100-byte db header: magic "SQLite format 3\0", page size (BE u16 at
  *    offset 16), schema format 4, text encoding 1 (UTF-8), page count,
  *    application_id / user_version (BE u32 at offsets 68 / 60 — the two
  *    words the GPKG spec pins to 'GPKG' / 1.x.y).
  *  - table b-tree leaf page (flag 0x0D): 8-byte page header (first
  *    freeblock, cell count, content-area start, fragmented bytes) +
  *    2-byte cell-pointer array growing up; cells packed at the page end
  *    growing down. Page 1's b-tree header starts at byte 100.
  *  - table b-tree interior page (flag 0x05): 12-byte header whose last
  *    4 bytes are the right-most child; cells are (child page BE u32,
  *    max-rowid-in-child varint).
  *  - leaf cell: varint(payload length) + varint(rowid) + record. No
  *    overflow pages — payloads are required ≤ usable−35, the leaf
  *    local-payload maximum, so a record never spills.
  *  - record: varint(header length), then one serial type per column,
  *    then the column bodies. Serial types: 0 NULL, 1/2/3/4 big-endian
  *    two's-complement ints of 1/2/3/4 bytes (5/6 = 6/8 bytes), 7 IEEE
  *    float64 BE, 8/9 literal 0/1 (schema format 4), text 2n+13, blob
  *    2n+12. Integers take the minimal serial that holds the value —
  *    byte lengths are therefore closed-form in the row values, which is
  *    what lets the oracle grade cell images arithmetically.
  *
  * sqlite_master (root = page 1, columns type/name/tbl_name/rootpage/sql)
  * is written and parsed like any other table. The b-tree is at most two
  * levels (one interior + leaves) — enough for the spec-scale images;
  * a table that outgrows it fails loudly rather than mis-writing. */
object Sqlite {

  val PageSize = 4096
  /** Leaf-page local payload maximum (usable − 35): beyond this SQLite
    * spills to overflow pages, which this codec deliberately refuses. */
  val MaxPayload: Int = PageSize - 35

  // ---------------------------------------------------------------- varint
  /** SQLite varint: 1–9 bytes, big-endian 7-bit groups, bit 7 = continue;
    * a 9th byte carries 8 low bits. Values here never need byte 9. */
  def varintLen(v: Long): Int = {
    require(v >= 0, s"varint: negative $v unsupported")
    var n = 1; var x = v >>> 7
    while (x != 0) { n += 1; x >>>= 7 }
    require(n <= 8, s"varint: $v needs 9 bytes (unsupported here)")
    n
  }

  def putVarint(buf: ByteBuffer, v: Long): Unit = {
    val n = varintLen(v)
    var i = n - 1
    while (i >= 0) {
      val b = ((v >>> (7 * i)) & 0x7F).toInt
      buf.put((if (i == 0) b else b | 0x80).toByte)
      i -= 1
    }
  }

  /** Parse a varint at `pos`; returns (value, bytes consumed). */
  def getVarint(bytes: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L; var i = 0
    while (i < 8 && (bytes(pos + i) & 0x80) != 0) {
      v = (v << 7) | (bytes(pos + i) & 0x7F); i += 1
    }
    if (i == 8) { v = (v << 8) | (bytes(pos + i) & 0xFF); (v, 9) }
    else { v = (v << 7) | (bytes(pos + i) & 0x7F); (v, i + 1) }
  }

  // ---------------------------------------------------------------- values
  sealed trait Value
  case object VNull extends Value
  final case class VInt(v: Long) extends Value
  final case class VReal(v: Double) extends Value
  final case class VText(v: String) extends Value
  final case class VBlob(v: Array[Byte]) extends Value

  /** Minimal integer serial type (schema format 4: 0/1 use serials 8/9). */
  private def intSerial(v: Long): (Long, Int) = {
    if (v == 0L) (8L, 0)
    else if (v == 1L) (9L, 0)
    else if (v >= Byte.MinValue && v <= Byte.MaxValue) (1L, 1)
    else if (v >= Short.MinValue && v <= Short.MaxValue) (2L, 2)
    else if (v >= -(1L << 23) && v < (1L << 23)) (3L, 3)
    else if (v >= Int.MinValue && v <= Int.MaxValue) (4L, 4)
    else if (v >= -(1L << 47) && v < (1L << 47)) (5L, 6)
    else (6L, 8)
  }

  private def serialOf(v: Value): (Long, Int) = v match {
    case VNull     => (0L, 0)
    case VInt(i)   => intSerial(i)
    case VReal(_)  => (7L, 8)
    case VText(s)  => { val n = s.getBytes("UTF-8").length; (2L * n + 13, n) }
    case VBlob(b)  => (2L * b.length + 12, b.length)
  }

  /** Serialize one record (row payload) in SQLite record format. */
  def writeRecord(values: Seq[Value]): Array[Byte] = {
    val serials = values.map(serialOf)
    val stLen = serials.map { case (s, _) => varintLen(s) }.sum
    // header length includes its own varint; sizes here stay 1-byte
    val hdrLen = {
      val h0 = 1 + stLen
      require(varintLen(h0.toLong) == 1, s"record header over 127 bytes: $h0")
      h0
    }
    val bodyLen = serials.map(_._2).sum
    val buf = ByteBuffer.allocate(hdrLen + bodyLen).order(ByteOrder.BIG_ENDIAN)
    putVarint(buf, hdrLen.toLong)
    serials.foreach { case (s, _) => putVarint(buf, s) }
    values.foreach {
      case VNull | VInt(0L) | VInt(1L) => ()
      case VInt(i) =>
        val n = intSerial(i)._2
        var k = n - 1
        while (k >= 0) { buf.put(((i >> (8 * k)) & 0xFF).toByte); k -= 1 }
      case VReal(d) => buf.putDouble(d)
      case VText(s) => buf.put(s.getBytes("UTF-8"))
      case VBlob(b) => buf.put(b)
    }
    buf.array()
  }

  /** Parse a record back to values. */
  def readRecord(bytes: Array[Byte]): Seq[Value] = {
    val (hdrLen, h0) = getVarint(bytes, 0)
    var p = h0
    val serials = Seq.newBuilder[Long]
    while (p < hdrLen) { val (s, n) = getVarint(bytes, p); serials += s; p += n }
    require(p == hdrLen, s"record header overran: $p vs $hdrLen")
    var body = hdrLen.toInt
    serials.result().map { s =>
      def int(n: Int): Long = {
        var v = if ((bytes(body) & 0x80) != 0) -1L else 0L
        var k = 0
        while (k < n) { v = (v << 8) | (bytes(body + k) & 0xFF); k += 1 }
        body += n; v
      }
      s match {
        case 0 => VNull
        case 1 => VInt(int(1))
        case 2 => VInt(int(2))
        case 3 => VInt(int(3))
        case 4 => VInt(int(4))
        case 5 => VInt(int(6))
        case 6 => VInt(int(8))
        case 7 =>
          val d = ByteBuffer.wrap(bytes, body, 8).order(ByteOrder.BIG_ENDIAN).getDouble
          body += 8; VReal(d)
        case 8 => VInt(0L)
        case 9 => VInt(1L)
        case t if t >= 13 && t % 2 == 1 =>
          val n = ((t - 13) / 2).toInt
          val v = new String(bytes, body, n, "UTF-8"); body += n; VText(v)
        case t if t >= 12 && t % 2 == 0 =>
          val n = ((t - 12) / 2).toInt
          val v = java.util.Arrays.copyOfRange(bytes, body, body + n); body += n; VBlob(v)
        case t => sys.error(s"sqlite record: unsupported serial type $t")
      }
    }
  }

  /** One table-leaf CELL image: varint(payload) + varint(rowid) + record. */
  def writeCell(rowid: Long, record: Array[Byte]): Array[Byte] = {
    require(record.length <= MaxPayload,
      s"sqlite cell: payload ${record.length} exceeds no-overflow max $MaxPayload")
    val buf = ByteBuffer.allocate(
      varintLen(record.length.toLong) + varintLen(rowid) + record.length)
    putVarint(buf, record.length.toLong)
    putVarint(buf, rowid)
    buf.put(record)
    buf.array()
  }

  /** Parse a cell image back to (rowid, record values). */
  def readCell(bytes: Array[Byte]): (Long, Seq[Value]) = {
    val (plen, n0) = getVarint(bytes, 0)
    val (rowid, n1) = getVarint(bytes, n0)
    require(bytes.length == n0 + n1 + plen,
      s"sqlite cell: ${bytes.length} bytes but header declares ${n0 + n1 + plen}")
    (rowid, readRecord(java.util.Arrays.copyOfRange(bytes, n0 + n1, bytes.length)))
  }

  // ---------------------------------------------------------------- pages
  /** Pack cells (rowid-ascending) into leaf-page images; `first` marks the
    * db's page 1 (header begins at byte 100). Returns page images plus
    * each page's max rowid (for the interior level). */
  private def packLeaves(cells: Seq[(Long, Array[Byte])],
                         firstIsPage1: Boolean): Seq[(Array[Byte], Long)] = {
    val out = Seq.newBuilder[(Array[Byte], Long)]
    var pending = cells
    var isFirst = firstIsPage1
    while (pending.nonEmpty) {
      val hdrBase = if (isFirst) 100 else 0
      var free = PageSize - hdrBase - 8 // leaf header
      val take = Seq.newBuilder[(Long, Array[Byte])]
      var n = 0
      var stop = false
      pending.foreach { case (rid, c) =>
        if (!stop && c.length + 2 <= free) { take += ((rid, c)); free -= c.length + 2; n += 1 }
        else stop = true
      }
      require(n > 0, "sqlite: a single cell exceeds one page")
      val page = new Array[Byte](PageSize)
      val buf = ByteBuffer.wrap(page).order(ByteOrder.BIG_ENDIAN)
      buf.position(hdrBase)
      buf.put(0x0D.toByte); buf.putShort(0) // flag, first freeblock
      buf.putShort(n.toShort)
      val taken = take.result()
      var contentStart = PageSize
      taken.foreach { case (_, c) => contentStart -= c.length }
      buf.putShort(contentStart.toShort); buf.put(0.toByte)
      // pointer array in key order; cells packed at the end in the SAME
      // order (SQLite packs newest-first; any order is valid — pointers
      // are authoritative)
      var cpos = contentStart
      taken.foreach { case (_, c) =>
        buf.putShort(cpos.toShort)
        System.arraycopy(c, 0, page, cpos, c.length)
        cpos += c.length
      }
      out += ((page, taken.last._1))
      pending = pending.drop(n)
      isFirst = false
    }
    out.result()
  }

  /** Interior page over `children` = (pageNumber, maxRowid), in order. */
  private def interiorPage(children: Seq[(Int, Long)]): Array[Byte] = {
    val cells = children.init.map { case (pg, maxRid) =>
      val b = ByteBuffer.allocate(4 + varintLen(maxRid)).order(ByteOrder.BIG_ENDIAN)
      b.putInt(pg); putVarint(b, maxRid); b.array()
    }
    val need = 12 + cells.map(_.length + 2).sum
    require(need <= PageSize, s"sqlite: interior page overflow ($need bytes) — table too large for 2-level b-tree")
    val page = new Array[Byte](PageSize)
    val buf = ByteBuffer.wrap(page).order(ByteOrder.BIG_ENDIAN)
    buf.put(0x05.toByte); buf.putShort(0)
    buf.putShort(cells.length.toShort)
    var contentStart = PageSize
    cells.foreach(c => contentStart -= c.length)
    buf.putShort(contentStart.toShort); buf.put(0.toByte)
    buf.putInt(children.last._1) // right-most child
    var cpos = contentStart
    cells.foreach { c =>
      buf.putShort(cpos.toShort)
      System.arraycopy(c, 0, page, cpos, c.length)
      cpos += c.length
    }
    page
  }

  // ---------------------------------------------------------------- tables
  final case class Table(name: String, createSql: String, rows: Seq[(Long, Seq[Value])])

  /** Full database image: page 1 = sqlite_master (single leaf required);
    * each table gets its leaves (+ one interior root if multi-leaf),
    * root-first so sqlite_master's rootpage is assigned before layout. */
  def writeDb(tables: Seq[Table], applicationId: Int = 0, userVersion: Int = 0): Array[Byte] = {
    // pass 1: build each table's leaves to learn its page count
    val built = tables.map { t =>
      val cells = t.rows.sortBy(_._1).map { case (rid, vs) => (rid, writeCell(rid, writeRecord(vs))) }
      require(cells.nonEmpty, s"sqlite: empty table ${t.name} unsupported")
      (t, packLeaves(cells, firstIsPage1 = false))
    }
    // pass 2: assign page numbers — for each table: root page, then leaves
    var next = 2
    val placed = built.map { case (t, leaves) =>
      if (leaves.length == 1) { val root = next; next += 1; (t, root, Seq((root, leaves.head))) }
      else {
        val root = next
        val leafPages = leaves.zipWithIndex.map { case (l, i) => (next + 1 + i, l) }
        next += 1 + leaves.length
        (t, root, leafPages)
      }
    }
    val nPages = next - 1
    // sqlite_master rows: rowid 1..n, rootpage column = assigned root
    val masterRows = placed.zipWithIndex.map { case ((t, root, _), i) =>
      ((i + 1).toLong, Seq(VText("table"), VText(t.name), VText(t.name),
        VInt(root.toLong), VText(t.createSql)))
    }
    val masterCells = masterRows.map { case (rid, vs) => (rid, writeCell(rid, writeRecord(vs))) }
    val masterLeaves = packLeaves(masterCells, firstIsPage1 = true)
    require(masterLeaves.length == 1, "sqlite: sqlite_master spills past page 1 (unsupported)")

    val img = new Array[Byte]((nPages) * PageSize)
    // page 1: 100-byte header + master leaf (already offset by 100)
    System.arraycopy(masterLeaves.head._1, 0, img, 0, PageSize)
    val hdr = ByteBuffer.wrap(img).order(ByteOrder.BIG_ENDIAN)
    hdr.put("SQLite format 3".getBytes("US-ASCII")); hdr.put(0.toByte)
    hdr.putShort(PageSize.toShort)
    hdr.put(1.toByte); hdr.put(1.toByte)       // file format write/read
    hdr.put(0.toByte)                          // reserved space
    hdr.put(64.toByte); hdr.put(32.toByte); hdr.put(32.toByte) // payload fracs
    hdr.putInt(1)                              // change counter
    hdr.putInt(nPages)
    hdr.putInt(0); hdr.putInt(0)               // freelist trunk/count
    hdr.putInt(1)                              // schema cookie
    hdr.putInt(4)                              // schema format 4
    hdr.putInt(0)                              // default page cache
    hdr.putInt(0)                              // largest root (no autovacuum)
    hdr.putInt(1)                              // text encoding: UTF-8
    hdr.putInt(userVersion)
    hdr.putInt(0)                              // incremental vacuum
    hdr.putInt(applicationId)
    hdr.position(92)
    hdr.putInt(1)                              // version-valid-for
    hdr.putInt(3045001)                        // SQLITE_VERSION_NUMBER stamp
    placed.foreach { case (_, root, leafPages) =>
      if (leafPages.length == 1 && leafPages.head._1 == root)
        System.arraycopy(leafPages.head._2._1, 0, img, (root - 1) * PageSize, PageSize)
      else {
        val interior = interiorPage(leafPages.map { case (pg, (_, maxRid)) => (pg, maxRid) })
        System.arraycopy(interior, 0, img, (root - 1) * PageSize, PageSize)
        leafPages.foreach { case (pg, (page, _)) =>
          System.arraycopy(page, 0, img, (pg - 1) * PageSize, PageSize)
        }
      }
    }
    img
  }

  /** Walk a table b-tree from `rootPage`, yielding (rowid, values). */
  def readTable(img: Array[Byte], rootPage: Int): Seq[(Long, Seq[Value])] = {
    val out = Seq.newBuilder[(Long, Seq[Value])]
    def walk(pageNo: Int): Unit = {
      val base = (pageNo - 1) * PageSize
      val hdrBase = base + (if (pageNo == 1) 100 else 0)
      val flag = img(hdrBase) & 0xFF
      val nCells = ((img(hdrBase + 3) & 0xFF) << 8) | (img(hdrBase + 4) & 0xFF)
      flag match {
        case 0x0D =>
          val ptrBase = hdrBase + 8
          (0 until nCells).foreach { i =>
            val off = base + (((img(ptrBase + 2 * i) & 0xFF) << 8) | (img(ptrBase + 2 * i + 1) & 0xFF))
            val (plen, n0) = getVarint(img, off)
            val (rowid, n1) = getVarint(img, off + n0)
            val rec = java.util.Arrays.copyOfRange(img, off + n0 + n1, off + n0 + n1 + plen.toInt)
            out += ((rowid, readRecord(rec)))
          }
        case 0x05 =>
          val ptrBase = hdrBase + 12
          (0 until nCells).foreach { i =>
            val off = base + (((img(ptrBase + 2 * i) & 0xFF) << 8) | (img(ptrBase + 2 * i + 1) & 0xFF))
            val child = ByteBuffer.wrap(img, off, 4).order(ByteOrder.BIG_ENDIAN).getInt
            walk(child)
          }
          val rightMost = ByteBuffer.wrap(img, hdrBase + 8, 4).order(ByteOrder.BIG_ENDIAN).getInt
          walk(rightMost)
        case other => sys.error(s"sqlite: unsupported page flag 0x${other.toHexString} at page $pageNo")
      }
    }
    walk(rootPage)
    out.result()
  }

  final case class MasterRow(typ: String, name: String, tblName: String, rootPage: Int, sql: String)

  /** Parse the db header + sqlite_master. Returns (applicationId,
    * userVersion, pageCount, master rows). */
  def readDb(img: Array[Byte]): (Int, Int, Int, Seq[MasterRow]) = {
    require(new String(img, 0, 15, "US-ASCII") == "SQLite format 3" && img(15) == 0,
      "not a sqlite db: bad magic")
    val hdr = ByteBuffer.wrap(img).order(ByteOrder.BIG_ENDIAN)
    val pageSize = hdr.getShort(16) & 0xFFFF
    require(pageSize == PageSize, s"sqlite: page size $pageSize unsupported (writer uses $PageSize)")
    require(hdr.getInt(44) == 4, "sqlite: schema format != 4")
    require(hdr.getInt(56) == 1, "sqlite: text encoding != UTF-8")
    val nPages = hdr.getInt(28)
    require(img.length == nPages * PageSize,
      s"sqlite: header declares $nPages pages, file is ${img.length} bytes")
    val master = readTable(img, 1).map { case (_, vs) =>
      MasterRow(
        vs(0).asInstanceOf[VText].v, vs(1).asInstanceOf[VText].v,
        vs(2).asInstanceOf[VText].v, vs(3).asInstanceOf[VInt].v.toInt,
        vs(4).asInstanceOf[VText].v)
    }
    (hdr.getInt(68), hdr.getInt(60), nPages, master)
  }
}

/** GeoPackage layer over [[Sqlite]] — the OGR GPKG driver analog
  * (reference: ogr/ogrsf_frmts/gpkg/ :: GDALGeoPackageDataset +
  * ogr_geopackage.h's GeoPackageBinaryHeader). Geometry travels as the
  * GPKG binary blob: magic "GP", version 0, a flags byte (bit 0 = header
  * byte order, bits 1–3 = envelope indicator), srs_id, the XY envelope
  * as [minx, maxx, miny, maxy] (the spec's interleaved order), then
  * standard WKB. The required system tables (gpkg_spatial_ref_sys,
  * gpkg_contents, gpkg_geometry_columns) are composed as plain SQLite
  * tables; application_id = 'GPKG' (0x47504B47), user_version = 10300. */
object Gpkg {

  val ApplicationId = 0x47504B47 // "GPKG"
  val UserVersion = 10300        // GeoPackage 1.3.0

  /** GPKG geometry blob: 8-byte header + 32-byte XY envelope + WKB.
    * Little-endian header (flags bit 0 = 1), envelope indicator 1. */
  def geomBlob(srsId: Int, g: Geometry): Array[Byte] = {
    val wkb = GeomIO.toWkb(g)
    val env = g.getEnvelopeInternal
    val buf = ByteBuffer.allocate(40 + wkb.length)
    buf.put('G'.toByte); buf.put('P'.toByte)
    buf.put(0.toByte)            // version 0 = GPKG 1.x
    buf.put(0x03.toByte)         // LE header + XY envelope
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(srsId)
    buf.putDouble(env.getMinX); buf.putDouble(env.getMaxX)
    buf.putDouble(env.getMinY); buf.putDouble(env.getMaxY)
    buf.put(wkb)
    buf.array()
  }

  /** Parse a GPKG blob back to (srsId, geometry); envelope is derived
    * data and skipped per the flags' envelope indicator. */
  def parseBlob(blob: Array[Byte]): (Int, Geometry) = {
    require(blob(0) == 'G'.toByte && blob(1) == 'P'.toByte, "gpkg blob: bad magic")
    require(blob(2) == 0, s"gpkg blob: unsupported version ${blob(2)}")
    val flags = blob(3) & 0xFF
    require((flags & 0x20) == 0, "gpkg blob: extended geometry unsupported")
    val order = if ((flags & 1) == 1) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val srsId = ByteBuffer.wrap(blob, 4, 4).order(order).getInt
    val envBytes = ((flags >> 1) & 0x07) match {
      case 0 => 0
      case 1 => 32
      case 2 | 3 => 48
      case 4 => 64
      case other => sys.error(s"gpkg blob: invalid envelope indicator $other")
    }
    val wkb = java.util.Arrays.copyOfRange(blob, 8 + envBytes, blob.length)
    (srsId, GeomIO.fromWkb(wkb))
  }

  import Sqlite._

  /** Full .gpkg database image for one feature table: the three required
    * system tables + the feature table (fid INTEGER PRIMARY KEY,
    * name TEXT, geom BLOB), rows keyed by fid = rowid. */
  def writeFile(tableName: String, srsId: Int,
                features: Seq[(Long, String, Geometry)]): Array[Byte] = {
    val env = new org.locationtech.jts.geom.Envelope()
    features.foreach { case (_, _, g) => env.expandToInclude(g.getEnvelopeInternal) }
    val srs = Table("gpkg_spatial_ref_sys",
      "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, srs_id INTEGER NOT NULL PRIMARY KEY, organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL, description TEXT)",
      Seq(
        (1L, Seq(VText("WGS 84 geodetic"), VInt(4326), VText("EPSG"), VInt(4326), VText("GEOGCS[\"WGS 84\"]"), VNull)),
        (2L, Seq(VText("undefined cartesian"), VInt(-1), VText("NONE"), VInt(-1), VText("undefined"), VNull)),
        (3L, Seq(VText("undefined geographic"), VInt(0), VText("NONE"), VInt(0), VText("undefined"), VNull))))
    val contents = Table("gpkg_contents",
      "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL, identifier TEXT UNIQUE, description TEXT DEFAULT '', last_change DATETIME, min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)",
      Seq((1L, Seq(VText(tableName), VText("features"), VText(tableName), VText(""),
        VText("2026-01-01T00:00:00.000Z"), // deterministic stamp, not wall clock
        VReal(env.getMinX), VReal(env.getMinY), VReal(env.getMaxX), VReal(env.getMaxY),
        VInt(srsId.toLong)))))
    val geomCols = Table("gpkg_geometry_columns",
      "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL)",
      Seq((1L, Seq(VText(tableName), VText("geom"), VText("GEOMETRY"), VInt(srsId.toLong), VInt(0), VInt(0)))))
    val feat = Table(tableName,
      s"CREATE TABLE $tableName (fid INTEGER PRIMARY KEY AUTOINCREMENT, name TEXT, geom BLOB)",
      features.map { case (fid, name, g) =>
        (fid, Seq(VInt(fid), VText(name), VBlob(geomBlob(srsId, g))))
      })
    writeDb(Seq(srs, contents, geomCols, feat), ApplicationId, UserVersion)
  }

  /** Parse a .gpkg image back to its feature rows (fid, name, srsId,
    * geometry) by locating the features table through gpkg_contents. */
  def readFile(img: Array[Byte]): Seq[(Long, String, Int, Geometry)] = {
    val (appId, userVer, _, master) = readDb(img)
    require(appId == ApplicationId, f"gpkg: application_id 0x$appId%08X != GPKG")
    require(userVer >= 10200, s"gpkg: user_version $userVer below 1.2")
    val contentsRoot = master.find(_.name == "gpkg_contents")
      .getOrElse(sys.error("gpkg: no gpkg_contents table")).rootPage
    val featTables = readTable(img, contentsRoot).collect {
      case (_, vs) if vs(1).asInstanceOf[VText].v == "features" => vs.head.asInstanceOf[VText].v
    }
    require(featTables.length == 1, s"gpkg: expected one feature table, got $featTables")
    val root = master.find(_.name == featTables.head)
      .getOrElse(sys.error(s"gpkg: ${featTables.head} missing from sqlite_master")).rootPage
    readTable(img, root).map { case (rowid, vs) =>
      val fid = vs.head.asInstanceOf[VInt].v
      require(fid == rowid, s"gpkg: fid $fid != rowid $rowid")
      val name = vs(1).asInstanceOf[VText].v
      val (srs, g) = parseBlob(vs(2).asInstanceOf[VBlob].v)
      (fid, name, srs, g)
    }
  }
}
