package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch dev probe (not part of the driver contract): times the
  * phases of a superstep round on a tiny state frame to localize the
  * per-round driver overhead. Delete when done. */
object LoopProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = 2000
    val edges = (0 until 3 * n).map(i => ((i * 7919) % n).toLong -> ((i * 104729) % n).toLong)
      .toDF("_s", "_d").localCheckpoint()
    var labels = (0 until n).map(i => (i.toLong, i.toLong)).toDF("_v", "_lbl")
      .localCheckpoint()
    labels = org.apache.spark.sql.GraftSqlShims.statsFreeLogicalRddCopy(labels).get

    def round(tag: String): Unit = {
      val t0 = System.nanoTime()
      val nbrMin = edges.join(labels, edges("_d") === labels("_v"))
        .groupBy(col("_s")).agg(min(col("_lbl")).as("_nl"))
      val stepped = labels.join(nbrMin, labels("_v") === nbrMin("_s"), "left")
        .select(labels("_v"),
          least(col("_lbl"), coalesce(col("_nl"), col("_lbl"))).as("_lbl"))
      val t1 = System.nanoTime()
      val obs = new org.apache.spark.sql.Observation(s"probe_$tag")
      val observed = stepped.observe(obs, sum(col("_lbl")).as("s"))
      val next = graft.plans.Supersteps.cut(observed, Seq(labels))
      val t2 = System.nanoTime()
      val got = obs.get("s")
      val t3 = System.nanoTime()
      labels = next
      val t4 = System.nanoTime()
      val cg = org.apache.spark.metrics.source.CodegenMetrics
      println(f"$tag%8s build=${(t1 - t0) / 1e6}%7.1f ck=${(t2 - t1) / 1e6}%7.1f obs=${(t3 - t2) / 1e6}%7.1f wrap=${(t4 - t3) / 1e6}%7.1f total=${(t4 - t0) / 1e6}%7.1f ms cgN=${cg.METRIC_COMPILATION_TIME.getCount} cgMs=${cg.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum / 1e6}%.0f")
    }
    for (i <- 1 to 10) round(s"r$i")
    def sweep(tag: String, aqe: String, parts: String): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      println(s"--- $tag (aqe=$aqe parts=$parts) ---")
      for (i <- 1 to 8) round(s"$tag$i")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    sweep("noaqe1", "false", "1")
    sweep("noaqe4", "false", "4")
    sweep("noaqe32", "false", "32")
    sweep("aqe1", "true", "1")
    sweep("base2", "true", "32")
    spark.stop()
  }
}
