package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.PropertyGraph
import graft.model.{EdgeSpec, GraphColumns => GC}

/** Bulk load: source tables -> property graph.
  *
  * Plays the role of the reference's image-file bulk loader
  * (`loadVertex`/`loadEdges`, TorcGraph.java:756-820, and the
  * segment-packing writer TorcEdgeList.java:487-675): here it is a pure
  * DataFrame projection — lazy, columnar, and partition-prunable — plus an
  * optional Parquet persist partitioned the same way the reference keys
  * its adjacency lists (SURVEY.md §1.3).
  */
object GraphLoader {

  /** Graph projection of the driver's TPC-H-ish fixture tables
    * (TESTDATA.md). Vertex labels: Region, Nation, Customer, Supplier,
    * Part, Order. Edge specs:
    *   Nation   -[IN_REGION]->  Region
    *   Customer -[IN_NATION]->  Nation
    *   Supplier -[IN_NATION]->  Nation
    *   Order    -[PLACED_BY]->  Customer
    *   Order    -[CONTAINS]->   Part      (props from lineitem)
    *   Order    -[SUPPLIED_BY]-> Supplier (props from lineitem)
    *
    * Note: the reference enforces at most one edge per (v1, v2, label)
    * (TorcGraph.java:75-80); lineitem can contain repeated
    * (order, part) pairs, which we keep distinguishable via the
    * `l_linenumber` property rather than collapsing — the inventory
    * queries treat line number as part of the edge identity.
    */
  def tpch(spark: SparkSession, dir: String): PropertyGraph = {
    // Memoized fixture reads (Tables.read): a tpch build re-ran file
    // listing + footer schema inference six times per call — ~450 ms of
    // pure driver metadata work per query construction.
    def tbl(name: String): DataFrame = Tables.read(spark, s"$dir/$name.parquet")

    def vertex(df: DataFrame, key: String): DataFrame =
      df.withColumn(GC.Id, col(key).cast("bigint"))

    def edge(df: DataFrame, src: String, dst: String, props: Seq[String] = Nil): DataFrame =
      df.select(
        (col(src).cast("bigint").as(GC.Src) ::
         col(dst).cast("bigint").as(GC.Dst) ::
         props.map(col).toList): _*)

    val nation = tbl("nation")
    val customer = tbl("customer")
    val supplier = tbl("supplier")
    val orders = tbl("orders")
    val lineitem = tbl("lineitem")

    val vertices = Map(
      "Region"   -> vertex(tbl("region"), "r_regionkey"),
      "Nation"   -> vertex(nation, "n_nationkey"),
      "Customer" -> vertex(customer, "c_custkey"),
      "Supplier" -> vertex(supplier, "s_suppkey"),
      "Part"     -> vertex(tbl("part"), "p_partkey"),
      "Order"    -> vertex(orders, "o_orderkey"))

    val lineitemProps = Seq("l_linenumber", "l_quantity", "l_extendedprice",
      "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")

    val edges = Map(
      EdgeSpec("IN_REGION", "Nation", "Region") -> edge(nation, "n_nationkey", "n_regionkey"),
      EdgeSpec("IN_NATION", "Customer", "Nation") -> edge(customer, "c_custkey", "c_nationkey"),
      EdgeSpec("IN_NATION", "Supplier", "Nation") -> edge(supplier, "s_suppkey", "s_nationkey"),
      EdgeSpec("PLACED_BY", "Order", "Customer") -> edge(orders, "o_orderkey", "o_custkey"),
      EdgeSpec("CONTAINS", "Order", "Part") -> edge(lineitem, "l_orderkey", "l_partkey", lineitemProps),
      EdgeSpec("SUPPLIED_BY", "Order", "Supplier") -> edge(lineitem, "l_orderkey", "l_suppkey",
        Seq("l_linenumber", "l_quantity")))

    new PropertyGraph(spark, vertices, edges)
  }

  /** Install [[graft.plans.RiJoinElimination]] on the session and declare
    * the referential-integrity contracts [[tpch]]'s layout guarantees:
    * every edge-frame key column is a projection of a source-table FK
    * whose values all exist non-null in the target vertex frame's id
    * column (the generator writes them that way), plus each table's own
    * key over itself (for src-side frontier joins). With these declared,
    * `traverse(frontier(label), ...)` — the plain, optimizer-visible
    * form — plans exactly like the hand-routed `traverseAll` fast path:
    * the frontier join is eliminated instead of shuffling the fact-side
    * edge table. Idempotent; session-scoped. */
  def declareTpchRi(spark: SparkSession, dir: String): Unit = {
    import graft.plans.RiJoinElimination.{declareForeignKey, install}
    install(spark)
    val fks = Seq(
      // edge-frame FK -> neighbor vertex id
      ("customer", "c_nationkey", "nation", "n_nationkey"),
      ("supplier", "s_nationkey", "nation", "n_nationkey"),
      ("nation", "n_regionkey", "region", "r_regionkey"),
      ("orders", "o_custkey", "customer", "c_custkey"),
      ("lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      // self keys: the src side of each edge frame IS the table's key
      ("customer", "c_custkey", "customer", "c_custkey"),
      ("supplier", "s_suppkey", "supplier", "s_suppkey"),
      ("nation", "n_nationkey", "nation", "n_nationkey"),
      ("orders", "o_orderkey", "orders", "o_orderkey"))
    fks.foreach { case (et, ek, vt, vk) =>
      declareForeignKey(spark, s"$dir/$et.parquet", ek, s"$dir/$vt.parquet", vk)
    }
  }

  /** Deterministic LDBC-SNB-style social graph — the person–knows–person
    * (+ posts + comment reply trees) shape of the reference's actual
    * benchmarked workload (`/root/reference/README.md:69-147`: LDBC SNB
    * Interactive over a `knows` graph with supernode skew, message
    * threads unrolled by the IC handlers). Derived purely from the
    * fixture tables with arithmetic a SQL oracle replays exactly:
    *
    *  - Person: one per customer row (`_vid` = c_custkey, 0-based
    *    contiguous), properties name/acctbal/segment/city.
    *  - Post: one per orders row, HAS_CREATOR → its o_custkey Person.
    *  - KNOWS (Person→Person, `since` property): person p emits
    *    deg(p) = 40 if p % 97 == 0 else 1 + (13p + 7) % 5
    *    directed edges to (53p + 911k) % N for k = 1..deg(p), self-loops
    *    dropped, (src, dst) deduplicated. The 1-percent degree-40
    *    supernodes give the skew an SNB `knows` expansion stresses;
    *    911 is coprime to every fixture N, so a supernode's targets are
    *    40 DISTINCT persons. since = (7·src + 3·dst) % 1000.
    *  - Comment: one per DISTINCT (l_orderkey, l_linenumber) pair —
    *    the fixture repeats pairs, so comment identity is the distinct
    *    pair, id = 8·orderkey + linenumber (linenumber ≤ 7, so ids are
    *    unique), properties length/created.
    *  - REPLY_OF (Comment→Post and Comment→Comment): within each
    *    order's comment set, rank r = row_number by linenumber. The
    *    rank-1 comment replies to the order's Post; comment with rank
    *    r ≥ 2 replies to the comment at rank
    *    1 + (orderkey + 13r) % (r − 1) — a deterministic prior rank, so
    *    every order's comments form a random recursive TREE rooted at
    *    its post (uniform attachment ⇒ both chain-deep and bushy
    *    threads appear; ranks are contiguous, so no reply dangles).
    *  - HAS_CREATOR (Comment→Person): creator = (31·cid + 7) % N —
    *    the same lazy-N arithmetic as KNOWS.
    *
    * Everything stays lazy: N rides a ONE-ROW count aggregate joined in
    * by a constant equi-key. Catalyst constant-folds that key away and
    * plans a broadcast nested-loop join — with a single broadcast row
    * that is the optimal plan (the probe side streams through
    * untouched), and PlanAuditSpec whitelists these queries' NLJ as
    * intended. The edge fan-out is a row-local explode, the reply-tree
    * rank a per-order window, and the parent resolution an equi
    * self-join on (order, rank) — all partition-parallel; the generator
    * itself would scale to any N.
    *
    * @param materializeComments when true, the ranked comment frame
    *   (lineitem distinct + rank window) is `localCheckpoint`ed once, so
    *   the four frames derived from it (Comment, both REPLY_OF specs,
    *   the comment HAS_CREATOR) are cheap projections/joins of the
    *   materialized rank instead of each re-running the window —
    *   the right mode for thread-unroll workloads that traverse
    *   REPLY_OF repeatedly (q33); the default stays fully lazy. */
  def snb(spark: SparkSession, dir: String,
      materializeComments: Boolean = false): PropertyGraph =
    snbFromTables(spark,
      Tables.read(spark, s"$dir/customer.parquet"),
      Tables.read(spark, s"$dir/orders.parquet"),
      Tables.read(spark, s"$dir/lineitem.parquet"),
      materializeComments)

  /** Contiguous-keyspace k-times replica of the SNB source frames — the
    * scale-tier twin of Bench.replicate's shifted-key scheme, which the
    * generated graph cannot use: the knows and comment-creator frames
    * compute their targets as `key % count`, so person ids must stay
    * contiguous in [0, n) or most generated edges dangle. Replica
    * persons therefore take ids `i*n0 + key` (the ScaleProbe FoF
    * discipline, BASELINE.md round 6), posts shift by 1e8 per replica
    * with their creator re-pointed into the replica person space, and
    * lineitem follows its order so each replica post carries its own
    * reply tree. Supernode population (`p % 97 == 0`) and the degree mix
    * grow WITH the graph. One count action (n0) per call — replica
    * construction is a bench/dev tier, not a query path. */
  def snbReplicaTables(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame, k: Int): (DataFrame, DataFrame, DataFrame) = {
    require(k >= 1, s"replica factor must be >= 1, got $k")
    if (k == 1) (customer, orders, lineitem) else {
      val n0 = customer.count()
      val S = 100000000L
      def rep(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
        (0 until k).map(i => f(df, i)).reduce(_.unionByName(_))
      (rep(customer)((d, i) =>
          d.withColumn("c_custkey", col("c_custkey") + lit(i * n0))),
        rep(orders)((d, i) => d
          .withColumn("o_orderkey", col("o_orderkey") + lit(i * S))
          .withColumn("o_custkey", col("o_custkey") + lit(i * n0))),
        rep(lineitem)((d, i) =>
          d.withColumn("l_orderkey", col("l_orderkey") + lit(i * S))))
    }
  }

  /** [[snb]] over explicit source frames — the ScaleProbe hook: scaling
    * probes replicate orders/lineitem (k-times posts + reply trees per
    * person) while keeping the person set fixed, which a directory-based
    * loader cannot express. `replicas > 1` applies [[snbReplicaTables]]
    * first — the contiguous-keyspace growth mode for whole-graph scale
    * runs. */
  def snbFromTables(spark: SparkSession, customer0: DataFrame,
      orders0: DataFrame, lineitem0: DataFrame,
      materializeComments: Boolean = false, replicas: Int = 1): PropertyGraph = {
    val (customer, orders, lineitem) =
      snbReplicaTables(customer0, orders0, lineitem0, replicas)

    val person = customer.select(
      col("c_custkey").cast("bigint").as(GC.Id),
      col("c_name").as("name"),
      col("c_acctbal").as("acctbal"),
      col("c_mktsegment").as("segment"),
      col("c_nationkey").as("city"))
    val post = orders.select(
      col("o_orderkey").cast("bigint").as(GC.Id),
      col("o_orderdate").as("created"),
      col("o_totalprice").as("score"))

    // Person count feeding the `% _n` generator frames. Lazy mode
    // broadcasts the 1-row aggregate — a bounded NLJ, whitelisted per
    // consuming query (PlanAuditSpec). Materialized mode folds it to a
    // literal instead: the construction already pays checkpoint actions,
    // and a literal keeps every generator frame NLJ-free so the thread
    // queries (q33/q36) plan pure projections of the checkpointed rank.
    val addN: DataFrame => DataFrame =
      if (materializeComments) {
        val n = customer.count()
        df => df.withColumn("_n", lit(n))
      } else {
        val nRow = broadcast(
          customer.agg(count(lit(1)).as("_n")).withColumn("_one", lit(1)))
        df => df.withColumn("_one", lit(1)).join(nRow, "_one")
      }
    val knows = addN(customer.select(col("c_custkey").cast("bigint").as("p")))
      .withColumn("d",
        when(col("p") % 97 === 0, lit(40L)).otherwise((col("p") * 13 + 7) % 5 + 1))
      .withColumn("k", explode(sequence(lit(1L), col("d"))))
      .select(col("p").as(GC.Src),
        ((col("p") * 53 + col("k") * 911) % col("_n")).as(GC.Dst))
      .where(col(GC.Dst) =!= col(GC.Src))
      .distinct()
      .withColumn("since", (col(GC.Src) * 7 + col(GC.Dst) * 3) % 1000)

    val creator = orders.select(
      col("o_orderkey").cast("bigint").as(GC.Src),
      col("o_custkey").cast("bigint").as(GC.Dst))

    // Comment reply trees: rank comments within their order (window,
    // partition-parallel), then resolve each rank-r≥2 comment's parent
    // rank with an equi self-join on (order, rank).
    val rankedLazy = lineitem
      .select(col("l_orderkey").cast("bigint").as("_ok"),
        col("l_linenumber").cast("bigint").as("_ln"))
      .distinct()
      .withColumn("_r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("_ok").orderBy("_ln")).cast("bigint"))
      .withColumn("_cid", col("_ok") * 8 + col("_ln"))
    val ranked = if (materializeComments) rankedLazy.localCheckpoint() else rankedLazy

    val comment = ranked.select(
      col("_cid").as(GC.Id),
      (col("_cid") * 37 % 190 + 10).as("length"),
      (col("_cid") * 11 % 1000).as("created"))

    val replyOfPost = ranked.where(col("_r") === 1)
      .select(col("_cid").as(GC.Src), col("_ok").as(GC.Dst))

    val parents = ranked.select(col("_ok").as("_pok"), col("_r").as("_pr"),
      col("_cid").as("_pcid"))
    val replyOfCommentLazy = ranked.where(col("_r") >= 2)
      .withColumn("_want", (col("_ok") + col("_r") * 13) % (col("_r") - 1) + 1)
      .join(parents, col("_ok") === col("_pok") && col("_want") === col("_pr"))
      .select(col("_cid").as(GC.Src), col("_pcid").as(GC.Dst))
    // materialized mode also pins the parent-resolution self-join: a
    // repeated thread unroll joins this frame once PER DEPTH, and each
    // of those joins would otherwise re-execute the self-join above the
    // reused exchange
    val replyOfComment =
      if (materializeComments) replyOfCommentLazy.localCheckpoint()
      else replyOfCommentLazy

    val commentCreator = addN(ranked)
      .select(col("_cid").as(GC.Src),
        ((col("_cid") * 31 + 7) % col("_n")).as(GC.Dst))

    new PropertyGraph(spark,
      Map("Person" -> person, "Post" -> post, "Comment" -> comment),
      Map(
        EdgeSpec("KNOWS", "Person", "Person") -> knows,
        EdgeSpec("HAS_CREATOR", "Post", "Person") -> creator,
        EdgeSpec("HAS_CREATOR", "Comment", "Person") -> commentCreator,
        EdgeSpec("REPLY_OF", "Comment", "Post") -> replyOfPost,
        EdgeSpec("REPLY_OF", "Comment", "Comment") -> replyOfComment))
  }

  /** Persist a graph as partitioned Parquet: one directory per vertex
    * label, edges under `(label, src_label, dst_label)` partition columns
    * so scans prune exactly the adjacency partitions a traversal names —
    * the physical analogue of the reference's adjacency keying
    * (TorcHelper.java:352-370). At cluster scale, additionally bucketing
    * edges by `_src`/`_dst` would co-locate repeated hop joins
    * (SURVEY.md §4). */
  def persist(g: PropertyGraph, path: String): Unit = {
    // Each frame writes to its OWN directory, so the per-frame write
    // jobs are independent — submit them from driver threads and let
    // later jobs back-fill executors freed by the current job's tail
    // (optimization-guide §2.6) instead of paying ~a dozen serial
    // write-job launches. Output is byte-identical (no cross-frame
    // ordering contract; commit protocol is per-directory).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration.Inf
    val writes =
      g.vertexFrames.toSeq.map { case (label, df) => Future {
        df.write.mode("overwrite").parquet(s"$path/vertices/label=$label")
      }} ++
      g.edgeFrames.toSeq.map { case (spec, df) => Future {
        df.write.mode("overwrite").parquet(
          s"$path/edges/label=${spec.label}/src_label=${spec.srcLabel}/dst_label=${spec.dstLabel}")
      }}
    Await.result(Future.sequence(writes), Inf)
    writeVariables(g, path)
  }

  /** Persist `graph.variables()` as a one-line-per-entry sidecar
    * (tab-separated, values JSON-string-escaped — no JSON parser needed
    * on read). Written even when empty so `open` on a fresh persist
    * never probes a missing file path twice. */
  private[sources] def writeVariables(g: PropertyGraph, path: String): Unit = {
    def esc(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c => c.toString
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), g.spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, "_variables.tsv"), true)
    val body = g.variables.toMap.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${esc(k)}\t${esc(v)}" }.mkString("", "\n", "\n")
    out.write(body.getBytes("UTF-8")); out.close()
  }

  private[sources] def readVariables(g: PropertyGraph, path: String): Unit = {
    def unesc(s: String): String = {
      val b = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s(i) == '\\' && i + 1 < s.length) {
          s(i + 1) match {
            case '\\' => b += '\\'
            case 'n' => b += '\n'
            case 't' => b += '\t'
            case 'r' => b += '\r'
            case c => b += c
          }
          i += 2
        } else { b += s(i); i += 1 }
      }
      b.result()
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), g.spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path, "_variables.tsv")
    if (fs.exists(p)) {
      val in = fs.open(p)
      val body = new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      in.close()
      body.split("\n").filter(_.nonEmpty).foreach { line =>
        val cut = line.indexOf('\t')
        if (cut > 0) g.variables.set(unesc(line.take(cut)), unesc(line.drop(cut + 1)))
      }
    }
  }

  /** Persist with bucketing for co-located hop joins: each edge frame is
    * written `bucketBy(n, _src)` (sorted within buckets) and each vertex
    * frame `bucketBy(n, _vid)` as catalog tables. Two frames bucketed on
    * the join key with the same bucket count join WITHOUT a shuffle —
    * the structural answer to "repeated hop joins re-shuffle the edge
    * table every query" at 100 TB (SURVEY §4's bucketing note). Table
    * names: `<prefix>_v_<label>` / `<prefix>_e_<label>_<src>_<dst>`.
    */
  def persistBucketed(g: PropertyGraph, path: String, prefix: String,
      buckets: Int = 32): Unit = {
    g.vertexFrames.foreach { case (label, df) =>
      df.write.mode("overwrite").format("parquet")
        .bucketBy(buckets, GC.Id).sortBy(GC.Id)
        .option("path", s"$path/v_$label")
        .saveAsTable(s"${prefix}_v_$label")
    }
    g.edgeFrames.foreach { case (spec, df) =>
      df.write.mode("overwrite").format("parquet")
        .bucketBy(buckets, GC.Src).sortBy(GC.Src)
        .option("path", s"$path/e_${spec.label}_${spec.srcLabel}_${spec.dstLabel}")
        .saveAsTable(s"${prefix}_e_${spec.label}_${spec.srcLabel}_${spec.dstLabel}")
    }
    // Graph variables ride the catalog (no directory to sidecar into).
    import g.spark.implicits._
    g.variables.toMap.toSeq.toDF("key", "value")
      .write.mode("overwrite").format("parquet")
      .option("path", s"$path/variables")
      .saveAsTable(s"${prefix}_variables")
  }

  /** Re-open a bucketed graph from the catalog. */
  def openBucketed(spark: SparkSession, g: PropertyGraph, prefix: String): PropertyGraph = {
    val vertices = g.vertexFrames.keys.map { label =>
      label -> spark.table(s"${prefix}_v_$label")
    }.toMap
    val edges = g.edgeFrames.keys.map { spec =>
      spec -> spark.table(s"${prefix}_e_${spec.label}_${spec.srcLabel}_${spec.dstLabel}")
    }.toMap
    val out = new PropertyGraph(spark, vertices, edges)
    if (spark.catalog.tableExists(s"${prefix}_variables"))
      spark.table(s"${prefix}_variables").collect().foreach { r =>
        out.variables.set(r.getString(0), r.getString(1))
      }
    out
  }

  /** Persist as CSV (the reference bulk-loads from LDBC CSVs,
    * README.md:83-117) with a DDL schema sidecar per frame — CSV carries
    * no types, so the sidecar makes the round trip lossless. */
  def persistCsv(g: PropertyGraph, path: String): Unit = {
    def writeOne(df: DataFrame, dir: String): Unit = {
      df.write.mode("overwrite").option("header", "true").csv(dir)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(dir), g.spark.sparkContext.hadoopConfiguration)
      val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_schema.ddl"), true)
      out.write(df.schema.toDDL.getBytes("UTF-8")); out.close()
    }
    g.vertexFrames.foreach { case (label, df) =>
      writeOne(df, s"$path/vertices/label=$label") }
    g.edgeFrames.foreach { case (spec, df) =>
      writeOne(df,
        s"$path/edges/label=${spec.label}/src_label=${spec.srcLabel}/dst_label=${spec.dstLabel}") }
    writeVariables(g, path)
  }

  /** Re-open a CSV graph persisted by [[persistCsv]]. */
  def openCsv(spark: SparkSession, path: String): PropertyGraph = {
    val conf = spark.sparkContext.hadoopConfiguration
    def readOne(dir: String): DataFrame = {
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir), conf)
      val in = fs.open(new org.apache.hadoop.fs.Path(dir, "_schema.ddl"))
      val ddl = new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      in.close()
      spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
        .option("header", "true").csv(dir)
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path), conf)
    def children(p: String): Seq[String] = {
      val qp = new org.apache.hadoop.fs.Path(p)
      if (!fs.exists(qp)) Nil
      else fs.listStatus(qp).toSeq.filter(_.isDirectory).map(_.getPath.getName)
    }
    val vertices = children(s"$path/vertices").map { d =>
      d.stripPrefix("label=") -> readOne(s"$path/vertices/$d")
    }.toMap
    val edges = (for {
      ld <- children(s"$path/edges"); label = ld.stripPrefix("label=")
      sd <- children(s"$path/edges/$ld"); srcLabel = sd.stripPrefix("src_label=")
      dd <- children(s"$path/edges/$ld/$sd"); dstLabel = dd.stripPrefix("dst_label=")
    } yield EdgeSpec(label, srcLabel, dstLabel) ->
        readOne(s"$path/edges/$ld/$sd/$dd")).toMap
    val out = new PropertyGraph(spark, vertices, edges)
    readVariables(out, path)
    out
  }

  /** Re-open a graph persisted by [[persist]] (bulk-load round trip). */
  def open(spark: SparkSession, path: String): PropertyGraph = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    def children(p: String): Seq[String] = {
      val qualified = new org.apache.hadoop.fs.Path(p)
      if (!fs.exists(qualified)) Nil
      else fs.listStatus(qualified).toSeq.filter(_.isDirectory).map(_.getPath.getName)
    }
    val vertices = children(s"$path/vertices").map { d =>
      val label = d.stripPrefix("label=")
      label -> spark.read.parquet(s"$path/vertices/$d")
    }.toMap
    val edges = (for {
      ld <- children(s"$path/edges")
      label = ld.stripPrefix("label=")
      sd <- children(s"$path/edges/$ld")
      srcLabel = sd.stripPrefix("src_label=")
      dd <- children(s"$path/edges/$ld/$sd")
      dstLabel = dd.stripPrefix("dst_label=")
    } yield EdgeSpec(label, srcLabel, dstLabel) ->
        spark.read.parquet(s"$path/edges/$ld/$sd/$dd")).toMap
    val g = new PropertyGraph(spark, vertices, edges)
    readVariables(g, path)
    g
  }
}
