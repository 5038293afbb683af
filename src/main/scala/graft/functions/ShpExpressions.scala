package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.core.{Shp, Dbf, GeomIO}

/** Shapefile-driver expressions (reference: ogr/ogrsf_frmts/shape/ ::
  * OGRShapeLayer over shapelib shpopen.c/dbfopen.c). The writer/parser
  * pair operates per RECORD so the round-trip is data-parallel — each
  * row carries its own 8-byte-header + LE-content record image, exactly
  * the unit SHPWriteObject/SHPReadObject exchange; whole-file images
  * (100-byte headers, .shx) are composed by [[graft.core.Shp.writeFile]]
  * and exercised in the specs. */

/** shp_record(recnum, geom) → binary: one shapefile record (BE header +
  * LE content) for the geometry, ring orientation canonicalized
  * (shells CW, holes CCW — SHPRewindObject's convention). */
case class ShpRecord(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(rn: Any, g: Any): Any =
    Shp.writeRecord(rn.asInstanceOf[Int], GeomIO.fromWkb(g.asInstanceOf[Array[Byte]]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
  override def prettyName: String = "shp_record"
}

/** shp_recnum(record) → int: the 1-based record number from the BE
  * record header (SHPReadObject's nShapeId). */
case class ShpRecNum(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    Shp.readRecord(v.asInstanceOf[Array[Byte]])._1
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "shp_recnum"
}

/** shp_geom(record) → WKB: parse the record content back to a geometry
  * (type-5 rings regrouped into shells/holes by orientation+containment,
  * the organizePolygons path). */
case class ShpGeom(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    GeomIO.toWkb(Shp.readRecord(v.asInstanceOf[Array[Byte]])._2)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "shp_geom"
}

/** dbf_record(array<string>; spec fixed at plan time) → string: one
  * fixed-width dBASE record (deletion flag + padded fields,
  * DBFWriteAttribute's layout). */
case class DbfRecord(child: Expression, specStr: String)
    extends UnaryExpression with CodegenFallback {
  private lazy val fs = Dbf.spec(specStr)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val vals = (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    UTF8String.fromString(Dbf.record(vals, fs))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c, specStr)
  override def prettyName: String = "dbf_record"
}

/** dbf_fields(record; spec fixed at plan time) → array<string>: parse a
  * fixed-width record back to trimmed values (DBFReadAttribute). */
case class DbfFields(child: Expression, specStr: String)
    extends UnaryExpression with CodegenFallback {
  private lazy val fs = Dbf.spec(specStr)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val vals = Dbf.fields(v.asInstanceOf[UTF8String].toString, fs)
    new GenericArrayData(vals.map(UTF8String.fromString).toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c, specStr)
  override def prettyName: String = "dbf_fields"
}
