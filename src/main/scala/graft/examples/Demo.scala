package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.analytics.GraphXBridge
import graft.dsl.G
import graft.operators.Skew
import graft.sources.GraphLoader

/** End-to-end sample of the library surface beyond the query inventory:
  * DSL chain, GraphX analytics, CSV bulk-load round trip, salted join.
  * `sbt "runMain graft.examples.Demo [sfDir]"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val g = GraphLoader.tpch(spark, sfDir)

    // 1. DSL chain
    val asiaCustomers = G(g).V("Region").has("r_name", "ASIA")
      .in("IN_REGION", "Nation").in("IN_NATION", "Customer").dedup().count()
    println(s"DEMO dsl_asia_customers=$asiaCustomers")

    // 2. GraphX connected components + PageRank
    val cc = GraphXBridge.connectedComponents(g)
    println(s"DEMO graphx_components=${cc.select("component").distinct().count()}")
    val topRank = GraphXBridge.pageRank(g).orderBy(desc("rank")).limit(1)
      .collect().head
    println(s"DEMO graphx_top_rank_label=${topRank.getLong(0)} rank=${"%.3f".format(topRank.getDouble(2))}")

    // 3. CSV bulk-load round trip
    val tmp = java.nio.file.Files.createTempDirectory("graft_demo_csv").toString
    GraphLoader.persistCsv(g, tmp)
    val back = GraphLoader.openCsv(spark, tmp)
    println(s"DEMO csv_roundtrip_customers=${back.vertices("Customer").count()}")

    // 4. Salted join vs plain join parity
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
    val plain = li.join(parts, li("l_partkey") === parts("p_partkey")).count()
    val salted = Skew.saltedEquiJoin(li, parts, "l_partkey", "p_partkey", 8).count()
    println(s"DEMO salted_join_parity=${plain == salted} rows=$salted")

    spark.stop()
  }
}
