package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions

class GraphCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val g = GraphLoader.tpch(spark, sf0001)

  test("registered views expose the graph to spark.sql") {
    GraphCatalog.registerViews(g)
    val viaSql = spark.sql(
      """SELECT e._dst AS n_nationkey, count(*) AS n_customers
        |FROM e_in_nation_customer_nation e
        |GROUP BY e._dst ORDER BY n_nationkey""".stripMargin)
      .as[(Long, Long)].collect().toSeq
    val viaApi = g.traverseAll("Nation", "IN_NATION", graft.model.Direction.In,
        fillEdge = false, Seq("Customer"))
      .df.groupBy(col("_src").as("n")).agg(count(lit(1)))
      .orderBy("n").as[(Long, Long)].collect().toSeq
    assert(viaSql == viaApi && viaSql.nonEmpty)
    assert(spark.sql("SELECT count(*) FROM graft_vertices").as[Long].head() ==
      g.vertexLabels.map(l => g.vertices(l).count()).sum)
  }

  test("native expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT rolling_hash64('abc def ghi')").as[Long].head()
    val viaCol = Seq("abc def ghi").toDF("s")
      .select(graft.functions.rollingHash64(col("s"))).as[Long].head()
    assert(viaSql == viaCol)
    val dotSql = spark.sql(
      "SELECT dot_product(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F))")
      .as[Double].head()
    assert(dotSql == 32.0)
    // wrapping multiply-add: ANSI would throw on this overflow
    val wrapSql = spark.sql(
      s"SELECT mul_add_wrap(${Long.MaxValue}L, 3L, 1L)").as[Long].head()
    assert(wrapSql == Long.MaxValue * 3L + 1L)
  }
}
