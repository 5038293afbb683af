package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic network model analysis — single-source shortest path
  * (reference: gnm/gnmgraph.cpp :: GNMGraph::DijkstraShortestPath, the
  * `[late-SVN]` generic-network-model module behind gnmanalyse
  * --dijkstra). The reference runs driver-side Dijkstra over an
  * in-memory graph; the Spark re-expression is distributed
  * label-correcting relaxation (Bellman-Ford rounds): each round relaxes
  * EVERY edge with one equi-join + one min hash-agg, converging in
  * max-shortest-path-edge-count rounds — the standard BSP/Pregel SSSP.
  *
  * 100-TB shape: the frontier table is (node, dist) LONG pairs; each
  * round is one key-bounded equi-join (edges side partitioned by src,
  * reusable across rounds) + one hash agg. Lineage truncates every round
  * through a RELIABLE checkpoint (io/Checkpoints — the q33/q169 loop
  * contract), so the iteration survives executor loss and resumes
  * idempotently. Convergence = the (count, sum) signature of the dist
  * table reaching a fixpoint — two driver scalars per round, never the
  * table. Positive weights make the signature strictly monotone until
  * the fixpoint, so the test is exact. */
object Network {

  /** Scale-adaptive shuffle width for the BSP rounds (guide §2.2): each
    * round shuffles only the (node, dist/mass) frontier — ~16 B rows —
    * yet inherits the session's shuffle-partition constant, so at local
    * graph sizes every round pays 32 task launches per stage for
    * thousand-row tables. Derive partitions from the EDGE count (~1M
    * edge-rows per partition, floor 4): a 4k-edge lattice gets 4, a
    * 100-TB web graph gets thousands. Scoped to the loop, restored
    * after; results are partition-count invariant. */
  private def withGraphParts[T](df: DataFrame, edgeCount: Long)(body: => T): T = {
    val s = df.sparkSession
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions",
      math.max(4L, edgeCount / 1000000L).toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Exact-INTEGER PageRank (public: Brin & Page 1998 — the link-quality
    * prior CommonCrawl-era corpus pipelines carry as a document-quality
    * signal): damping 0.85 in integer micro-mass with floor division —
    * m_{t+1}(v) = 150000 + Σ_{u→v} ((m_t(u)·85 div 100) div outdeg(u)),
    * all BIGINT, so the sum is ORDER-INDEPENDENT (float PageRank sums
    * neighbor contributions in nondeterministic shuffle order — ULP
    * drift per run; integer mass is bit-stable and oracle-replayable).
    * Floor losses and dangling mass simply leak (documented, still a
    * fixed-point family; ranking order is what consumers read). Each of
    * the fixed `iters` rounds is one equi-join + one hash agg with
    * reliable-checkpoint lineage truncation.
    *
    * nodes: (node: long); edges: (src, dst) — weights ignored. */
  def pagerankInt(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    val outd = edges.groupBy("src").agg(count(lit(1)).as("od"))
    val e = edges.select("src", "dst").join(outd, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ec = e.count()
    withGraphParts(e, ec) {
    var m = nodes.select(col("node")).withColumn("m", lit(1000000L))
    // RoundCache: one materialization per round into a plan-truncating
    // cached RDD, reliable checkpoint every 8th round (guide §5; see
    // io/Checkpoints for the measured pathologies of the alternatives)
    val rc = new graft.io.Checkpoints.RoundCache()
    var it = 0
    while (it < iters) {
      val contrib = e.join(m, m("node") === e("src"))
        .select(col("dst").as("node"), expr("((m * 85L) div 100L) div od").as("c"))
        .groupBy("node").agg(sum(col("c")).as("cs"))
      m = rc.cut(
        nodes.select(col("node")).join(contrib, Seq("node"), "left")
          .select(col("node"), (lit(150000L) + coalesce(col("cs"), lit(0L))).as("m")))
      it += 1
    }
    e.unpersist(false)
    m.select(col("node"), col("m").as("rank_micro"))
    }
  }

  /** edges: (src: long, dst: long, w: long), positive weights. Returns
    * (node, dist) for every node reachable from `source`. */
  def shortestPaths(edges: DataFrame, source: Long, maxRounds: Int = 200): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src"), col("dst"), col("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ec = e.count()
    withGraphParts(e, ec) {
    var dist = Seq((source, 0L)).toDF("node", "d")
    var prev = (-1L, -1L)
    val rc = new graft.io.Checkpoints.RoundCache()
    var rounds = 0
    var done = false
    while (!done) {
      require(rounds < maxRounds, s"SSSP did not converge in $maxRounds rounds")
      // OPTIMIZATION r6 (guide §1.2): TWO relaxation rounds per
      // convergence probe. The lazy RoundCache cuts chain, so the probe
      // action computes both rounds in ONE job — halving the driver
      // round-trips the old probe-every-round loop paid. Detection is
      // still exact: the (count, sum) signature is strictly monotone
      // until the fixpoint, so equality across the 2-round stride occurs
      // iff both rounds were identities; relaxation at the fixpoint is
      // idempotent, so the result table is unchanged.
      var inner = 0
      while (inner < 2) {
        val relaxed = dist.join(e, dist("node") === e("src"))
          .select(col("dst").as("node"), (col("d") + col("w")).as("d"))
        val next = dist.unionByName(relaxed)
          .groupBy("node").agg(min(col("d")).as("d"))
        // RoundCache: plan-truncating cached round, reliable cut every 8th
        dist = rc.cut(next)
        rounds += 1
        inner += 1
      }
      val st = dist.agg(count(lit(1)), coalesce(sum(col("d")), lit(0L))).collect()(0)
      val sig = (st.getLong(0), st.getLong(1))
      done = sig == prev
      prev = sig
    }
    e.unpersist(false)
    dist.select(col("node"), col("d").as("dist"))
    }
  }
}
