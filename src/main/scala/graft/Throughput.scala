package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession

import graft.model.Direction
import graft.sources.GraphLoader

/** Dev tool: multi-session concurrent-throughput measurement — the shape
  * of the reference's multi-client benchmark driver
  * (`MeasurementClient.java:289-535`: N clients over one store, ops/s
  * vs client count). Here each "client" is a `spark.newSession()`
  * sharing the one local cluster (sessions share executors the way the
  * reference's clients share RAMCloud servers), running a fixed
  * point-op mix: point lookup by id (O4) and a seeded single-vertex
  * 1-hop expansion (O9). Ops are deterministic per thread (seeded LCG),
  * so runs are comparable.
  *
  * `sbt "runMain graft.Throughput [sfDir]"` — prints one JSON line per
  * session count (1, 2, 4, 8): total ops/s and per-op mean latency.
  * Point-lookup jobs are scheduler-bound in local mode (each op is one
  * tiny Spark job), so the expected curve is ops/s RISING with sessions
  * until the scheduler saturates — the analogue of the reference's
  * client-scaling sweep, not a data-plane benchmark.
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

    val opsPerSession = sys.env.getOrElse("SPARK_GRAFT_OPS", "40").toInt
    // warm-up: build + run both op shapes once
    runOps(spark, sfDir, seed = 0, nOps = 4, new AtomicLong)

    for (n <- Seq(1, 2, 4, 8)) {
      val done = new AtomicLong
      val threads = (0 until n).map { t =>
        new Thread(() => runOps(spark, sfDir, seed = 42 + t, opsPerSession, done))
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
      println(f"""{"probe":"throughput","sessions":$n,"ops":$totalOps,"secs":$secs%.3f,"ops_per_sec":${totalOps / secs}%.1f,"mean_op_ms":${secs * 1000 * n / totalOps}%.1f}""")
    }
    spark.stop()
  }

  /** One client: a fresh session over the shared cluster, alternating
    * point lookups and single-vertex expansions on seeded ids. */
  private def runOps(root: SparkSession, sfDir: String, seed: Long,
      nOps: Int, done: AtomicLong): Unit = {
    val sess = root.newSession()
    val g = GraphLoader.tpch(sess, sfDir)
    val rnd = new java.util.Random(seed)
    var i = 0
    while (i < nOps) {
      if (i % 2 == 0) {
        val id = math.abs(rnd.nextLong()) % 1000
        g.verticesById("Customer", Seq(id)).collect()
      } else {
        val nid = math.abs(rnd.nextLong()) % 25
        g.traverse(g.verticesById("Nation", Seq(nid)).select(g.vertices("Nation")("_vid")),
          "Nation", "IN_NATION", Direction.In, fillEdge = false, Seq("Customer"))
          .df.count()
      }
      done.incrementAndGet()
      i += 1
    }
  }
}
