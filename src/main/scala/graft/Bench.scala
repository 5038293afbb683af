package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val keepCache = sys.env.contains("SPARK_GRAFT_BENCH_KEEPCACHE")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JIT + codegen + function registration, so the first measured
    // query doesn't absorb one-time costs
    try SparkEntry.entry(spark).queryExecution.toRdd.count()
    catch { case _: Throwable => }
    val results = SparkEntry.selectedQueries
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // toRdd.count() materializes every output row in full — plain
      // count() would let Catalyst prune the computed columns away and
      // benchmark a skeleton of the query
      val ok =
        try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      val secs = (System.nanoTime() - t0) / 1e9
      // per-query isolation: operator-internal persists (covers, hot-cell
      // sets, q65's arcs) must not accumulate across 70 queries or leak
      // one query's cache into the next query's timing. KEEPCACHE is a
      // diagnostic replica of the pre-isolation protocol (regression
      // adjudication only — never the reported number)
      if (keepCache) () else spark.sharedState.cacheManager.clearCache()
      // a failed query must not masquerade as a fast success: negate it
      name -> (if (ok) secs else -secs)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // the protocol is part of the result: a KEEPCACHE (diagnostic) run must
    // be distinguishable from the honest per-query-isolated protocol, or a
    // leftover exported env var silently taints every later number
    val protocol = if (keepCache) "KEEPCACHE-diagnostic" else "clear-per-query"
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","protocol":"$protocol"}"""
    // The driver captures only the TAIL of stdout, so the full ~2.5 KB
    // per-query line truncates mid-JSON and never parses (three rounds of
    // BENCH_r{N}.json "parsed": null). Print a compact (<300 B) summary as
    // the final stdout line and keep the complete per-query map in
    // BENCH/RESULT.json ("queries" in the summary is a pointer to it).
    val shortLine =
      s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"failed":$failed,"sf":"$sfDir","protocol":"$protocol","queries":"BENCH/RESULT.json"}"""
    if (!SparkEntry.subsetActive) try {
      val dir = java.nio.file.Paths.get("BENCH")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("RESULT.json"), line)
    } catch { case _: Throwable => }
    // sole stdout line (build.sbt sets run/outputStrategy=StdoutOutput so
    // sbt does not [info]-prefix it); subset runs print the full map since
    // it is small and there is no RESULT.json copy for them
    println(if (SparkEntry.subsetActive) line else shortLine)
    spark.stop()
  }
}
