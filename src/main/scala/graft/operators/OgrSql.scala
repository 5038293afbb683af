package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.F

/** The OGR SQL dialect's per-layer SPECIAL FIELDS (reference:
  * ogr/ogrsf_frmts/generic/ogr_gensql.cpp :: OGRGenSQLResultsLayer +
  * ogr/swq.cpp SpecialFieldNames): every layer exposed to ExecuteSQL
  * carries FID, OGR_GEOMETRY (the geometry type name, upper-case),
  * OGR_GEOM_WKT and OGR_GEOM_AREA alongside its attribute columns, usable
  * in SELECT and WHERE alike. Here a layer is any DataFrame with a WKB
  * geometry column; registration adds the special fields as COMPUTED
  * columns of a temp view — they stay lazy plan nodes, so Catalyst's
  * column pruning drops any the query never references (a query not
  * touching OGR_GEOM_WKT never serializes a single WKT string). */
object OgrSql {

  /** Register `df` as an ExecuteSQL-able layer named `name`. `fidCol` is
    * the stable feature id (the reference reads FID from the source
    * driver; parquet layers carry it as a key column). */
  def registerLayer(df: DataFrame, name: String, geomCol: String,
                    fidCol: String): Unit = {
    F.ensureRegistered(df.sparkSession)
    df.withColumn("FID", col(fidCol).cast("long"))
      .withColumn("OGR_GEOMETRY", F.st_geometrytype(col(geomCol)))
      .withColumn("OGR_GEOM_WKT", F.st_astext(col(geomCol)))
      .withColumn("OGR_GEOM_AREA", F.st_area(col(geomCol)))
      .createOrReplaceTempView(name)
  }
}
