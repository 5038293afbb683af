package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OSM-style two-pass reader (reference: ogr/ogrsf_frmts/osm ::
  * osm_parser.cpp + ogrosmdatasource.cpp) — SURVEY.md §3.1 S10,
  * re-expressed Spark-first.
  *
  * The reference streams a .pbf twice: pass 1 spills every node's
  * coordinates into an on-disk "node DB" (custom B-tree or SQLite); pass 2
  * reads ways, looks each node ref up in that DB, and assembles
  * LineString/Polygon features, SKIPPING ways with any unresolvable ref.
  * A third phase assembles multipolygon relations by stitching member
  * ways into closed rings, reversing member direction as needed.
  *
  * Spark re-expression: the node DB is not a data structure but a JOIN —
  * `posexplode(refs)` ⋈ nodes on node_id is a plain shuffle equi-join that
  * Catalyst plans (broadcast if the node table is small, sort-merge at
  * planet scale; AQE decides). Order restoration is `sort_array` over
  * (pos, …) structs — no secondary-sort RDD machinery. At 10^12 nodes the
  * shuffle carries (way_id, pos, node_id) ≈ 24 B/ref, and the groupBy
  * reassembly is the same shuffle's reduce side — exactly two wide stages
  * for the whole pass-2, vs the reference's sequential single-node scan.
  *
  * Closed-way rule (OSM semantics, ogrosmlayer.cpp): first ref == last ref
  * and ≥ 4 refs ⇒ the way is an area ⇒ POLYGON; otherwise LINESTRING.
  * Coordinates are integer grid units (the synth uses 1/1024°), printed
  * as integers so a DuckDB oracle reproduces the WKT byte-for-byte.
  */
object Osm {

  /** Resolved ordered point path per complete way:
    * (way_id, n_refs, path: array<struct<pos,ix,iy>>). Ways with < 2 refs
    * or any missing node are dropped (the reference's skip rule). */
  def wayPaths(nodes: DataFrame, ways: DataFrame): DataFrame = {
    val refs = ways
      .withColumn("n_refs", size(col("refs")))
      .where(col("n_refs") >= 2)
      .select(col("way_id"), col("n_refs"),
        posexplode(col("refs")).as(Seq("pos", "node_id")))
    // the "node DB lookup" — inner join drops refs to missing nodes, and
    // the HAVING-style count check below then drops the whole way
    refs.join(nodes, "node_id")
      .groupBy("way_id")
      .agg(max(col("n_refs")).as("n_refs"),
        count(lit(1)).as("n_resolved"),
        sort_array(collect_list(struct(col("pos"), col("ix"), col("iy")))).as("path"))
      .where(col("n_resolved") === col("n_refs"))
      .select(col("way_id"), col("n_refs"), col("path"))
  }

  /** Pass-2 feature assembly: (way_id, n_pts, closed, wkt). */
  def assembleWays(nodes: DataFrame, ways: DataFrame): DataFrame = {
    val body = expr(
      "array_join(transform(path, p -> concat(cast(p.ix as string), ' ', cast(p.iy as string))), ',')")
    wayPaths(nodes, ways)
      .withColumn("closed",
        col("n_refs") >= 4 &&
          col("path").getItem(0).getField("ix") === element_at(col("path"), -1).getField("ix") &&
          col("path").getItem(0).getField("iy") === element_at(col("path"), -1).getField("iy"))
      .select(col("way_id"), col("n_refs").cast("long").as("n_pts"), col("closed"),
        when(col("closed"), concat(lit("POLYGON(("), body, lit("))")))
          .otherwise(concat(lit("LINESTRING("), body, lit(")"))).as("wkt"))
  }

  /** Relation → ring assembly (reference: ogrosmdatasource.cpp multipolygon
    * path): member ways are stitched end-to-end into closed rings, each
    * member traversed forward or reversed so its first point matches the
    * chain's current endpoint. Emits one row per assembled ring:
    * (rel_id, ring_idx, role, n_pts, closed, wkt) with a CANONICAL
    * orientation — the ring starts at its lexicographically smallest
    * (ix,iy) point and proceeds toward the smaller of its two neighbors —
    * so output is independent of member order and direction. Per-task
    * memory is one relation's members (bounded: OSM relations have
    * hundreds of members, not millions); relations assemble in parallel.
    * Hole-assignment of inner rings to their containing outer (a
    * point-in-polygon test in the reference) composes with
    * SpatialJoin.pointInPolygon downstream and is not re-done here. */
  def assembleRelations(nodes: DataFrame, memberWays: DataFrame,
                        relations: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val paths = wayPaths(nodes, memberWays)
    val members = relations
      .select(col("rel_id"), posexplode(col("members")).as(Seq("m_idx", "m")))
      .select(col("rel_id"), col("m_idx"), col("m.way_id").as("way_id"),
        col("m.role").as("role"))
      .join(paths, "way_id")
      .select(col("rel_id"), col("m_idx"), col("role"),
        expr("transform(path, p -> struct(p.ix as ix, p.iy as iy))").as("pts"))
    members
      .as[(Long, Int, String, Seq[(Long, Long)])]
      .groupByKey(_._1)
      .mapGroups { (relId, rows) =>
        type Pt = (Long, Long)
        // deterministic member order, grouped by role (outer rings first)
        val ms = rows.toArray.sortBy(m => (m._3 != "outer", m._2))
        val byRole = ms.groupBy(_._3)
        val rings = scala.collection.mutable.ArrayBuffer.empty[(String, Vector[Pt])]
        for (role <- byRole.keys.toSeq.sorted.sortBy(_ != "outer")) {
          val arcs = byRole(role).map(_._4.toVector)
          val used = new Array[Boolean](arcs.length)
          var remaining = arcs.length
          while (remaining > 0) {
            // start a new chain from the first unused member
            val s = used.indexWhere(!_)
            used(s) = true; remaining -= 1
            var chain = arcs(s)
            var open = chain.head != chain.last
            while (open) {
              // find an unused arc sharing the chain's tail endpoint
              val tail = chain.last
              var found = -1; var rev = false
              var i = 0
              while (found < 0 && i < arcs.length) {
                if (!used(i)) {
                  if (arcs(i).head == tail) { found = i; rev = false }
                  else if (arcs(i).last == tail) { found = i; rev = true }
                }
                i += 1
              }
              if (found < 0) open = false // unclosable: emit as-is (ref warns)
              else {
                used(found) = true; remaining -= 1
                val next = if (rev) arcs(found).reverse else arcs(found)
                chain = chain ++ next.drop(1)
                open = chain.head != chain.last
              }
            }
            rings += ((role, chain))
          }
        }
        rings.toSeq.zipWithIndex.map { case ((role, ring), idx) =>
          val closed = ring.length > 1 && ring.head == ring.last
          val canon =
            if (!closed) ring
            else {
              val cyc = ring.dropRight(1) // distinct cycle points
              val k = cyc.indices.minBy(cyc(_))
              val rot = cyc.drop(k) ++ cyc.take(k)
              // orient toward the smaller neighbor of the start point
              val fwd = rot(1)
              val bwd = rot.last
              val dir = if (implicitly[Ordering[Pt]].lteq(fwd, bwd)) rot else rot.head +: rot.tail.reverse
              dir :+ dir.head
            }
          val body = canon.map { case (x, y) => s"$x $y" }.mkString(",")
          val wkt = if (closed) s"POLYGON(($body))" else s"LINESTRING($body)"
          (relId, idx.toLong, role, (canon.length - (if (closed) 1 else 0)).toLong, closed, wkt)
        }
      }
      .flatMap(identity)
      .toDF("rel_id", "ring_idx", "role", "n_pts", "closed", "wkt")
  }
}
