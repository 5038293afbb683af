package graft.core

/** OGR VRT virtual-vector driver (reference: ogr/ogrsf_frmts/vrt/
  * ogrvrtdatasource.cpp + ogrvrtlayer.cpp :: OGRVRTLayer::FullInitialize):
  * the XML-configured layer that renames/retypes fields of an underlying
  * source and synthesizes geometry from columns — here the
  * `encoding="PointFromColumns" x=... y=...` path over a CSV source, the
  * classic VRT recipe from the reference's own driver docs. The config
  * parses ONCE through the shared tolerant XML reader (core/Xml —
  * comments, CDATA, namespace stripping); applying it to a record is
  * pure index shuffling, so the per-row hot path never touches XML.
  *
  * PointFromColumns carries the source field TEXT verbatim into the WKT
  * (the reference parses with CPLAtof and reformats; for the driver's
  * %.2f-printed sources the text round-trips identically, and keeping
  * the text keeps the law engine-exact with zero float formatting). */
object OgrVrt {
  final case class FieldMap(name: String, src: String, typ: String)
  final case class LayerCfg(name: String, srcDataSource: String,
      geometryType: String, encoding: String, xCol: String, yCol: String,
      fields: Vector[FieldMap], description: String)

  def parse(xml: String): LayerCfg = {
    val r = new Xml.Reader(xml, "VRT")
    r.prolog()
    val root = r.element()
    require(root.name == "OGRVRTDataSource",
      s"VRT root ${root.name} != OGRVRTDataSource")
    val layer = root.children.find(_.name == "OGRVRTLayer")
      .getOrElse(throw new IllegalArgumentException("VRT: no OGRVRTLayer"))
    def child(n: String) = layer.children.find(_.name == n)
    val gf = child("GeometryField")
    LayerCfg(
      name = layer.attrs.getOrElse("name", ""),
      srcDataSource = child("SrcDataSource").map(_.text.trim).getOrElse(""),
      geometryType = child("GeometryType").map(_.text.trim).getOrElse(""),
      encoding = gf.flatMap(_.attrs.get("encoding")).getOrElse(""),
      xCol = gf.flatMap(_.attrs.get("x")).getOrElse(""),
      yCol = gf.flatMap(_.attrs.get("y")).getOrElse(""),
      fields = layer.children.filter(_.name == "Field").map(f => FieldMap(
        f.attrs.getOrElse("name", ""),
        f.attrs.get("src").orElse(f.attrs.get("name")).getOrElse(""),
        f.attrs.getOrElse("type", "String"))),
      description = child("Description").map(_.text).getOrElse(""))
  }

  /** The CSV driver's quote-aware splitter (the csv_fields contract:
    * port/cpl_string.cpp :: CSLTokenizeString2 with CSLT_HONOURSTRINGS). */
  def csvSplit(s: String): Array[String] = {
    val out = Array.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < s.length && s.charAt(i + 1) == '"') { cur += '"'; i += 1 }
          else inQ = false
        } else cur += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += cur.result(); cur.clear()
        case ch  => cur += ch
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  /** Apply the layer config to one CSV record: [layerName, mapped field
    * values in config order..., synthesized WKT]. */
  def feature(cfg: LayerCfg, header: Array[String], rec: Array[String]): Array[String] = {
    def get(c: String): String = {
      var i = 0
      while (i < header.length && header(i) != c) i += 1
      require(i < header.length, s"VRT src column '$c' not in CSV header")
      if (i < rec.length) rec(i) else ""
    }
    val wkt =
      if (cfg.encoding == "PointFromColumns") s"POINT(${get(cfg.xCol)} ${get(cfg.yCol)})"
      else ""
    ((cfg.name +: cfg.fields.map(f => get(f.src))) :+ wkt).toArray
  }
}
