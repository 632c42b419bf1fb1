package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession

import graft.model.Direction
import graft.sources.GraphLoader

/** Dev tool: multi-session concurrent-throughput measurement — the shape
  * of the reference's multi-client benchmark driver
  * (`MeasurementClient.java:289-535`: N clients over one store, ops/s
  * vs client count) with the reference's per-op-class latency report
  * shape (`OpTester.java:175-226`: min/max/mean/p25/p50/p75/p90/p95/p99
  * per op). Here each "client" is a `spark.newSession()` sharing the one
  * local cluster (sessions share executors the way the reference's
  * clients share RAMCloud servers), running a fixed point-op mix: point
  * lookup by id (O4) and a seeded single-vertex 1-hop expansion (O9).
  * Ops are deterministic per thread (seeded LCG), so runs are
  * comparable.
  *
  * `sbt "runMain graft.Throughput [sfDir]"` — prints one JSON line per
  * session count (1, 2, 4, 8) with total ops/s, plus one line per
  * (session count, op class) with the latency percentiles over every
  * op of that class across all sessions. Point-lookup jobs are
  * scheduler-bound in local mode (each op is one tiny Spark job), so
  * the expected curve is ops/s RISING with sessions until the scheduler
  * saturates — the analogue of the reference's client-scaling sweep,
  * not a data-plane benchmark. Default 200 ops/session (100 per class)
  * so the p99 over the aggregated sample is a real tail statistic, not
  * the max of a handful of points.
  */
object Throughput {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val opsPerSession = sys.env.getOrElse("SPARK_GRAFT_OPS", "200").toInt
    // warm-up: build + run both op shapes once
    runOps(spark, sfDir, seed = 0, nOps = 4, new AtomicLong, new ConcurrentLinkedQueue)

    for (n <- Seq(1, 2, 4, 8)) {
      val done = new AtomicLong
      // (opClass, latencySecs) per completed op, across every session
      val lats = new ConcurrentLinkedQueue[(String, Double)]
      val threads = (0 until n).map { t =>
        new Thread(() => runOps(spark, sfDir, seed = 42 + t, opsPerSession, done, lats))
      }
      val t0 = System.nanoTime()
      threads.foreach(_.start())
      threads.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      // report the ops that actually COMPLETED (the counter), not the
      // assumption — a client thread dying mid-run must not inflate the
      // throughput number
      val totalOps = done.get()
      if (totalOps != n.toLong * opsPerSession)
        System.err.println(s"[throughput] WARNING: ${n.toLong * opsPerSession - totalOps} ops did not complete")
      // Locale.ROOT: a comma-decimal default locale (de_DE) would emit
      // 1,23 and break the JSON artifact (ADVICE round 7)
      def d3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      def d1(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
      println(s"""{"probe":"throughput","sessions":$n,"ops":$totalOps,"secs":${d3(secs)},"ops_per_sec":${d1(totalOps / secs)}}""")
      import scala.jdk.CollectionConverters._
      lats.asScala.toSeq.groupBy(_._1).toSeq.sortBy(_._1).foreach {
        case (opClass, rows) => println(percentileLine(n, opClass, rows.map(_._2)))
      }
    }
    spark.stop()
  }

  /** One JSON line of per-op-class latency stats, the OpTester report
    * shape: min/max/mean plus p25/p50/p75/p90/p95/p99 (nearest-rank on
    * the sorted sample — percentiles of the empirical distribution, no
    * interpolation, matching the reference's index-into-sorted-vector
    * convention). Latencies in milliseconds. */
  private def percentileLine(sessions: Int, opClass: String, raw: Seq[Double]): String = {
    val t = raw.sorted
    def pct(p: Int): Double =
      t(math.min(t.size - 1, math.max(0, math.ceil(p / 100.0 * t.size).toInt - 1)))
    def ms(d: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(d * 1000))
    val stats = Seq(
      "\"n\":" + t.size,
      "\"min_ms\":" + ms(t.head),
      "\"max_ms\":" + ms(t.last),
      "\"mean_ms\":" + ms(t.sum / t.size)) ++
      Seq(25, 50, 75, 90, 95, 99).map(p => "\"p" + p + "_ms\":" + ms(pct(p)))
    s"""{"probe":"op_latency","sessions":$sessions,"op":"$opClass",${stats.mkString(",")}}"""
  }

  /** One client: a fresh session over the shared cluster, alternating
    * point lookups and single-vertex expansions on seeded ids, recording
    * each op's latency under its op class. */
  private def runOps(root: SparkSession, sfDir: String, seed: Long,
      nOps: Int, done: AtomicLong, lats: ConcurrentLinkedQueue[(String, Double)]): Unit = {
    val sess = root.newSession()
    val g = GraphLoader.tpch(sess, sfDir)
    val rnd = new java.util.Random(seed)
    var i = 0
    while (i < nOps) {
      val t0 = System.nanoTime()
      // floorMod, not abs+%: abs(Long.MinValue) is negative and would
      // yield an id that can never match (ADVICE round 6)
      val opClass = if (i % 2 == 0) {
        val id = Math.floorMod(rnd.nextLong(), 1000L)
        g.verticesById("Customer", Seq(id)).collect()
        "point_lookup"
      } else {
        val nid = Math.floorMod(rnd.nextLong(), 25L)
        g.traverse(g.verticesById("Nation", Seq(nid)).select(g.vertices("Nation")("_vid")),
          "Nation", "IN_NATION", Direction.In, fillEdge = false, Seq("Customer"))
          .df.count()
        "expand_1hop"
      }
      lats.add((opClass, (System.nanoTime() - t0) / 1e9))
      done.incrementAndGet()
      i += 1
    }
  }
}
