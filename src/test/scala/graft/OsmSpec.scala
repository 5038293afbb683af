package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Osm
import graft.synth.Synth

/** OSM two-pass reader (SURVEY §3.1 S10) behavior pins: the reference's
  * skip-incomplete-ways rule, the closed-way→area rule, and relation ring
  * stitching with member reversal and multiple rings per relation — the
  * cases the synthetic q64/q65 corpus does not isolate. */
class OsmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def nodesDf(ns: (Long, Long, Long)*) =
    ns.toDF("node_id", "ix", "iy")
  private def waysDf(ws: (Long, Seq[Long])*) =
    ws.toDF("way_id", "refs")

  private val squareNodes = nodesDf(
    (1L, 0L, 0L), (2L, 10L, 0L), (3L, 10L, 10L), (4L, 0L, 10L), (9L, 99L, 99L))

  test("way with a missing node ref is skipped; complete ways assemble in ref order") {
    val ways = waysDf(
      (100L, Seq(1L, 2L, 3L)),       // complete, open
      (101L, Seq(1L, 777L, 3L)),     // 777 absent -> skipped
      (102L, Seq(4L)))               // < 2 refs -> skipped
    val out = Osm.assembleWays(squareNodes, ways).collect()
    assert(out.toSeq == Seq(Row(100L, 3L, false, "LINESTRING(0 0,10 0,10 10)")))
  }

  test("closed way (first ref == last, >= 4 refs) emits POLYGON; 3-ref pseudo-closed stays a line") {
    val ways = waysDf(
      (200L, Seq(1L, 2L, 3L, 4L, 1L)),
      (201L, Seq(1L, 2L, 1L)))       // first==last but only 3 refs
    val out = Osm.assembleWays(squareNodes, ways).collect().sortBy(_.getLong(0))
    assert(out(0) == Row(200L, 5L, true, "POLYGON((0 0,10 0,10 10,0 10,0 0))"))
    assert(out(1) == Row(201L, 3L, false, "LINESTRING(0 0,10 0,0 0)"))
  }

  test("relation stitching: member reversal, canonical orientation, two rings in one relation") {
    // ring 1 = unit square split into two arcs, second arc stored REVERSED
    // (stitch must flip it); ring 2 = a triangle far away, as one closed way
    val nodes = nodesDf(
      (1L, 0L, 0L), (2L, 10L, 0L), (3L, 10L, 10L), (4L, 0L, 10L),
      (5L, 50L, 50L), (6L, 60L, 50L), (7L, 55L, 60L))
    val arcs = waysDf(
      (11L, Seq(2L, 3L, 4L)),        // arc A: 2->3->4
      (12L, Seq(2L, 1L, 4L)),        // arc B reversed: tail 4 matches via .last
      (13L, Seq(5L, 6L, 7L, 5L)))    // self-closed triangle member
    val rels = Seq(
      (900L, Seq((11L, "outer"), (12L, "outer"), (13L, "outer"))))
      .toDF("rel_id", "members_raw")
      .select(col("rel_id"), expr(
        "transform(members_raw, m -> struct(m._1 as way_id, m._2 as role))").as("members"))
    val out = Osm.assembleRelations(nodes, arcs, rels).collect()
      .sortBy(_.getLong(1)).toSeq
    // canonical: start at smallest (ix,iy), toward the smaller neighbor
    assert(out == Seq(
      Row(900L, 0L, "outer", 4L, true, "POLYGON((0 0,0 10,10 10,10 0,0 0))"),
      Row(900L, 1L, "outer", 3L, true, "POLYGON((50 50,55 60,60 50,50 50))")))
  }

  test("unclosable member chain is emitted open (reference warns + keeps)") {
    val nodes = nodesDf((1L, 0L, 0L), (2L, 10L, 0L), (3L, 10L, 10L))
    val arcs = waysDf((21L, Seq(1L, 2L, 3L)))
    val rels = Seq((901L, Seq((21L, "outer"))))
      .toDF("rel_id", "members_raw")
      .select(col("rel_id"), expr(
        "transform(members_raw, m -> struct(m._1 as way_id, m._2 as role))").as("members"))
    val out = Osm.assembleRelations(nodes, arcs, rels).collect().toSeq
    assert(out == Seq(Row(901L, 0L, "outer", 3L, false, "LINESTRING(0 0,10 0,10 10)")))
  }

  test("synth relations round-trip: every stitched ring carries its source way's cycle point set") {
    val dir = TestSpark.SfSmall
    val rings = Osm.assembleRelations(
      Synth.osmNodes(spark, dir), Synth.osmRelArcs(spark, dir),
      Synth.osmRelations(spark, dir))
    val fromWays = Osm.assembleWays(Synth.osmNodes(spark, dir), Synth.osmWays(spark, dir))
      .where(col("closed"))
    // same relation ids as closed qualifying ways; each ring closed with
    // n_pts = source way's cycle length (n_pts_way - 1 for the append)
    val joined = rings.join(fromWays, rings("rel_id") === fromWays("way_id"))
      .select(rings("n_pts").as("ring_n"), (fromWays("n_pts") - 1).as("cyc_n"))
      .collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r => r.getLong(0) == r.getLong(1)))
    assert(rings.where(!col("closed")).count() == 0)
  }
}
