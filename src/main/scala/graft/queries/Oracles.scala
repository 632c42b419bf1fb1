package graft.queries

/** DuckDB oracle SQL twins for [[Inventory]]. Column names, types and a
  * total ORDER BY match the Spark side exactly (the driver's compare
  * sorts columns by name before hashing values). Tables are the driver's
  * fixture parquet tables registered under their bare names.
  */
object Oracles {

  val q01_one_hop: String =
    """SELECT n_nationkey, c_custkey
      |FROM nation JOIN customer ON c_nationkey = n_nationkey
      |ORDER BY n_nationkey, c_custkey""".stripMargin

  val q02_two_hop_fuse: String =
    """SELECT r_name, c_custkey
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |WHERE r_name = 'ASIA'
      |ORDER BY r_name, c_custkey""".stripMargin

  val q03_intersect: String =
    """SELECT s_suppkey FROM supplier
      |WHERE s_nationkey IN (SELECT c_nationkey FROM customer)
      |ORDER BY s_suppkey""".stripMargin

  val q04_subtract: String =
    """SELECT c_custkey FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  val q05_edge_filter: String =
    """SELECT l_orderkey AS o_orderkey, l_partkey AS p_partkey, l_linenumber
      |FROM lineitem WHERE l_quantity > 45
      |ORDER BY o_orderkey, p_partkey, l_linenumber""".stripMargin

  val q06_hydrate: String =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer WHERE c_nationkey = 0
      |ORDER BY c_custkey""".stripMargin

  val q07_distinct_reach: String =
    """SELECT DISTINCT l_partkey AS p_partkey
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |ORDER BY p_partkey""".stripMargin

  val q08_degree: String =
    """SELECT o_custkey AS c_custkey, count(*) AS order_count
      |FROM orders GROUP BY o_custkey
      |ORDER BY c_custkey""".stripMargin

  val q09_topk: String =
    """SELECT n_name, count(*) AS cnt
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY cnt DESC, n_name
      |LIMIT 10""".stripMargin

  val q10_point_lookup: String = {
    val ids = Inventory.q10Ids.mkString(", ")
    s"""SELECT c_custkey FROM customer
       |WHERE c_custkey IN ($ids)
       |ORDER BY c_custkey""".stripMargin
  }

  val q11_both_direction: String =
    """SELECT 'Customer' AS neighbor_label, c_custkey AS neighbor_id
      |FROM customer WHERE c_nationkey = 5
      |UNION ALL
      |SELECT 'Supplier' AS neighbor_label, s_suppkey AS neighbor_id
      |FROM supplier WHERE s_nationkey = 5
      |ORDER BY neighbor_label, neighbor_id""".stripMargin

  val q12_multi_label: String =
    """SELECT n_nationkey, 'Customer' AS label, c_custkey AS id
      |FROM nation JOIN customer ON c_nationkey = n_nationkey
      |UNION ALL
      |SELECT n_nationkey, 'Supplier' AS label, s_suppkey AS id
      |FROM nation JOIN supplier ON s_nationkey = n_nationkey
      |ORDER BY n_nationkey, label, id""".stripMargin

  val q13_path_multiplicity: String =
    """SELECT c_custkey, r_regionkey, count(*) AS path_count
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY c_custkey, r_regionkey
      |ORDER BY c_custkey, r_regionkey""".stripMargin

  val q14_bulk_load: String =
    """SELECT * FROM (
      |  SELECT 'Customer' AS label, count(*) AS cnt FROM customer
      |  UNION ALL SELECT 'Nation', count(*) FROM nation
      |  UNION ALL SELECT 'Order', count(*) FROM orders
      |  UNION ALL SELECT 'Part', count(*) FROM part
      |  UNION ALL SELECT 'Region', count(*) FROM region
      |  UNION ALL SELECT 'Supplier', count(*) FROM supplier
      |  UNION ALL SELECT 'E:CONTAINS:Order:Part', count(*) FROM lineitem
      |  UNION ALL SELECT 'E:IN_NATION:Customer:Nation', count(*) FROM customer
      |  UNION ALL SELECT 'E:IN_NATION:Supplier:Nation', count(*) FROM supplier
      |  UNION ALL SELECT 'E:IN_REGION:Nation:Region', count(*) FROM nation
      |  UNION ALL SELECT 'E:PLACED_BY:Order:Customer', count(*) FROM orders
      |  UNION ALL SELECT 'E:SUPPLIED_BY:Order:Supplier', count(*) FROM lineitem
      |) ORDER BY label""".stripMargin

  val q15_pricing_summary: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)))
      |    AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val q16_dsl_chain: String =
    """SELECT l_partkey AS p_partkey, count(*) AS cnt
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING' AND l_quantity > 45
      |GROUP BY l_partkey
      |ORDER BY p_partkey""".stripMargin

  val q17_rollup: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Label-space ids = 1-based index of the sorted label set:
    * Customer=1, Nation=2, Order=3, Part=4, Region=5, Supplier=6. */
  val q18_unified_ids: String =
    """SELECT * FROM (
      |  SELECT CAST(1 AS BIGINT) AS hi, CAST(c_custkey AS BIGINT) AS lo, 'Customer' AS label FROM customer
      |  UNION ALL SELECT 2, n_nationkey, 'Nation' FROM nation
      |  UNION ALL SELECT 3, o_orderkey, 'Order' FROM orders
      |  UNION ALL SELECT 4, p_partkey, 'Part' FROM part
      |  UNION ALL SELECT 5, r_regionkey, 'Region' FROM region
      |  UNION ALL SELECT 6, s_suppkey, 'Supplier' FROM supplier
      |) ORDER BY hi, lo""".stripMargin

  /** Components of the geography subgraph are exactly the region trees;
    * the representative is the min packed id (labelId << 48 | key) with
    * subgraph label ids Customer=1, Nation=2, Region=3, Supplier=4. */
  val q19_connected_components: String =
    """WITH v AS (
      |  SELECT 'Customer' AS label, CAST(c_custkey AS BIGINT) AS id,
      |         (CAST(1 AS BIGINT) << 48) + c_custkey AS packed,
      |         n_regionkey AS rk
      |    FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  UNION ALL
      |  SELECT 'Nation', CAST(n_nationkey AS BIGINT),
      |         (CAST(2 AS BIGINT) << 48) + n_nationkey, n_regionkey
      |    FROM nation
      |  UNION ALL
      |  SELECT 'Region', CAST(r_regionkey AS BIGINT),
      |         (CAST(3 AS BIGINT) << 48) + r_regionkey, r_regionkey
      |    FROM region
      |  UNION ALL
      |  SELECT 'Supplier', CAST(s_suppkey AS BIGINT),
      |         (CAST(4 AS BIGINT) << 48) + s_suppkey, n_regionkey
      |    FROM supplier JOIN nation ON s_nationkey = n_nationkey)
      |SELECT label, id, min(packed) OVER (PARTITION BY rk) AS component
      |FROM v ORDER BY label, id""".stripMargin

  /** Undirected hop distances from Customer 0 in the region forest:
    * within the source's region, Customer = 0/2/4 (self / same nation /
    * other nation), Nation = 1/3, Region = 2, Supplier = 2/4; every
    * other region is unreachable and absent. */
  val q20_shortest_path: String =
    """WITH src AS (
      |  SELECT c.c_nationkey AS n, nt.n_regionkey AS r
      |  FROM customer c JOIN nation nt ON c.c_nationkey = nt.n_nationkey
      |  WHERE c.c_custkey = 0)
      |SELECT * FROM (
      |  SELECT 'Customer' AS label, CAST(c_custkey AS BIGINT) AS id,
      |    CAST(CASE WHEN c_custkey = 0 THEN 0
      |              WHEN c_nationkey = src.n THEN 2 ELSE 4 END AS BIGINT) AS dist
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey, src
      |  WHERE n_regionkey = src.r
      |  UNION ALL
      |  SELECT 'Nation', CAST(n_nationkey AS BIGINT),
      |    CASE WHEN n_nationkey = src.n THEN 1 ELSE 3 END
      |  FROM nation, src WHERE n_regionkey = src.r
      |  UNION ALL
      |  SELECT 'Region', CAST(r_regionkey AS BIGINT), 2
      |  FROM region, src WHERE r_regionkey = src.r
      |  UNION ALL
      |  SELECT 'Supplier', CAST(s_suppkey AS BIGINT),
      |    CASE WHEN s_nationkey = src.n THEN 2 ELSE 4 END
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey, src
      |  WHERE n_regionkey = src.r)
      |ORDER BY label, id""".stripMargin

  /** LIFO adjacency read order: descending sequence column reproduces
    * the reference's newest-first segmented-list reads. */
  val q21_edge_list_order: String =
    """SELECT l_orderkey AS o_orderkey,
      |  row_number() OVER (PARTITION BY l_orderkey
      |                     ORDER BY l_linenumber DESC, l_partkey) AS read_rank,
      |  l_partkey AS p_partkey, l_linenumber
      |FROM lineitem WHERE l_orderkey < 1000
      |ORDER BY o_orderkey, read_rank""".stripMargin

  /** Gremlin coalesce as SQL: suppliers of supplier-having nations,
    * UNION the regions of supplier-less nations, counted per element. */
  val q22_branch_coalesce: String =
    """WITH with_s AS (SELECT DISTINCT s_nationkey FROM supplier),
      |br1 AS (SELECT 'Supplier' AS vlabel, s_suppkey AS vid FROM supplier),
      |br2 AS (SELECT 'Region' AS vlabel, n_regionkey AS vid FROM nation
      |        WHERE n_nationkey NOT IN (SELECT s_nationkey FROM with_s))
      |SELECT vlabel, vid, count(*) AS cnt
      |FROM (SELECT * FROM br1 UNION ALL SELECT * FROM br2)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** repeat().emit() as SQL: each emitted depth is one CTE, counted with
    * multiplicity (depth 2 counts lineitem EDGES, not distinct parts).
    * `cnt > 0` drops the zero-count row a count(*) over an empty CTE
    * still emits — the Spark side's groupBy produces NO row for an
    * empty depth, so both sides must drop empty depths for the oracle
    * to stay robust on degenerate fixtures. */
  val q23_repeat_emit: String =
    """WITH bc AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      |bo AS (SELECT o_orderkey FROM orders
      |       WHERE o_custkey IN (SELECT c_custkey FROM bc))
      |SELECT * FROM (
      |  SELECT CAST(0 AS INT) AS depth, 'Customer' AS vlabel, count(*) AS cnt FROM bc
      |  UNION ALL SELECT 1, 'Order', count(*) FROM bo
      |  UNION ALL SELECT 2, 'Part', count(*) FROM lineitem
      |    WHERE l_orderkey IN (SELECT o_orderkey FROM bo)
      |) WHERE cnt > 0 ORDER BY depth""".stripMargin

  /** The LDBC-SNB Interactive composite (3 hops + edge filter + top-k). */
  val q24_snb_composite: String =
    """SELECT l_partkey AS p_partkey, count(DISTINCT c_custkey) AS n_customers
      |FROM customer
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING' AND l_quantity > 45
      |GROUP BY l_partkey
      |ORDER BY n_customers DESC, p_partkey
      |LIMIT 20""".stripMargin

  /** Shared CTE block re-deriving [[graft.sources.GraphLoader.snb]]'s
    * KNOWS edge set in pure SQL (same arithmetic, same dedup), plus the
    * undirected view `uk`. Prepended to every SNB-query oracle. */
  private val snbKnowsCtes: String =
    """n AS (SELECT count(*) AS n FROM customer),
      |deg AS (SELECT c_custkey AS p,
      |        CASE WHEN c_custkey % 97 = 0 THEN 40
      |             ELSE 1 + (c_custkey * 13 + 7) % 5 END AS d
      |        FROM customer),
      |raw AS (SELECT p AS src, (p * 53 + k * 911) % n.n AS dst
      |        FROM deg, n, generate_series(1, 40) t(k) WHERE k <= d),
      |knows AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
      |uk AS (SELECT src, dst FROM knows UNION SELECT dst, src FROM knows)""".stripMargin

  /** Friends-of-friends of Person 0: undirected 2-hop, minus self and
    * direct friends, scored by distinct common friends. */
  val q25_snb_fof: String =
    s"""WITH $snbKnowsCtes,
       |direct AS (SELECT DISTINCT dst AS f FROM uk WHERE src = 0),
       |fof AS (SELECT u.dst AS x, d.f FROM direct d JOIN uk u ON u.src = d.f),
       |scored AS (SELECT x, count(DISTINCT f) AS n_common FROM fof
       |           WHERE x <> 0 AND x NOT IN (SELECT f FROM direct)
       |           GROUP BY x)
       |SELECT s.x AS person_id, s.n_common, c.c_acctbal AS acctbal
       |FROM scored s JOIN customer c ON c.c_custkey = s.x
       |WHERE c.c_acctbal > 0
       |ORDER BY n_common DESC, person_id
       |LIMIT 20""".stripMargin

  /** BFS distances from Person 1, exact to depth 4: the recursive CTE
    * dedups (id, depth) pairs, so min(d) per id is the true distance
    * for every shortest path of length <= 4. */
  val q26_snb_path: String =
    s"""WITH RECURSIVE $snbKnowsCtes,
       |bfs AS (
       |  SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS d
       |  UNION
       |  SELECT u.dst, b.d + 1 FROM bfs b JOIN uk u ON u.src = b.id
       |  WHERE b.d < 4)
       |SELECT id AS person_id, min(d) AS dist FROM bfs
       |GROUP BY id ORDER BY person_id""".stripMargin

  /** bothE from Person 0: one row per STORED direction (no undirected
    * dedup — the Spark side unions the out and in expansions). */
  val q27_bothe: String =
    s"""WITH $snbKnowsCtes
       |SELECT * FROM (
       |  SELECT dst AS neighbor_id, (src * 7 + dst * 3) % 1000 AS since
       |  FROM knows WHERE src = 0
       |  UNION ALL
       |  SELECT src, (src * 7 + dst * 3) % 1000 FROM knows WHERE dst = 0
       |) ORDER BY neighbor_id, since""".stripMargin

  /** until(r_name IS NOT NULL): every BUILDING customer's traverser
    * exits exactly at its region — counts per region. */
  val q28_until: String =
    """SELECT 'Region' AS vlabel, CAST(n_regionkey AS BIGINT) AS vid,
      |  count(*) AS cnt
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY n_regionkey
      |ORDER BY vlabel, vid""".stripMargin

  /** Posts of Person 0's undirected friends, scored by o_totalprice. */
  val q29_snb_posts: String =
    s"""WITH $snbKnowsCtes,
       |direct AS (SELECT DISTINCT dst AS f FROM uk WHERE src = 0)
       |SELECT o.o_orderkey AS post_id, d.f AS creator_id,
       |       o.o_totalprice AS score
       |FROM direct d JOIN orders o ON o.o_custkey = d.f
       |ORDER BY score DESC, post_id
       |LIMIT 20""".stripMargin

  /** not(branch) as SQL: anti-join against the branch's covered set. */
  val q30_not_step: String =
    """SELECT c_custkey FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT o_custkey FROM orders
      |   WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  /** choose as SQL: the two predicate-routed branches unioned, counted
    * per landing element. */
  val q31_choose: String =
    """SELECT vlabel, vid, count(*) AS cnt FROM (
      |  SELECT 'Order' AS vlabel, o_orderkey AS vid
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment = 'BUILDING'
      |  UNION ALL
      |  SELECT 'Nation', CAST(c_nationkey AS BIGINT)
      |  FROM customer WHERE c_mktsegment <> 'BUILDING'
      |) GROUP BY vlabel, vid
      |ORDER BY vlabel, vid""".stripMargin

  /** Shared CTE block re-deriving the SNB Comment reply-tree edges
    * ([[graft.sources.GraphLoader.snb]]): comment identity is the
    * distinct (orderkey, linenumber) pair, rank r = row_number by
    * linenumber within the order, rank 1 replies to the order's post,
    * rank r ≥ 2 to the comment at rank 1 + (ok + 13r) % (r − 1). */
  private val snbCommentCtes: String =
    """lns AS (SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS ok,
      |               CAST(l_linenumber AS BIGINT) AS ln FROM lineitem),
      |ranked AS (SELECT ok, ln, ok * 8 + ln AS cid,
      |           CAST(row_number() OVER (PARTITION BY ok ORDER BY ln) AS BIGINT) AS r
      |           FROM lns),
      |reply_post AS (SELECT cid, ok FROM ranked WHERE r = 1),
      |children AS (SELECT ok, cid, (ok + r * 13) % (r - 1) + 1 AS pr
      |             FROM ranked WHERE r >= 2),
      |reply_comment AS (SELECT c.cid AS src, p.cid AS dst
      |  FROM children c JOIN ranked p ON p.ok = c.ok AND p.r = c.pr)""".stripMargin

  /** IC-style thread unroll: friends' posts' reply trees via a recursive
    * CTE (the Spark side's depth-tagged repeatEmit), counted + max-depth
    * per post. Posts without replies are absent on both sides. */
  val q33_snb_thread: String =
    s"""WITH RECURSIVE $snbKnowsCtes,
       |direct AS (SELECT DISTINCT dst AS f FROM uk WHERE src = 0),
       |fposts AS (SELECT CAST(o_orderkey AS BIGINT) AS post_id FROM orders
       |           WHERE o_custkey IN (SELECT f FROM direct)),
       |$snbCommentCtes,
       |tree AS (
       |  SELECT fp.post_id, rp.cid, CAST(1 AS INT) AS depth
       |  FROM fposts fp JOIN reply_post rp ON rp.ok = fp.post_id
       |  UNION ALL
       |  SELECT t.post_id, rc.src, t.depth + 1
       |  FROM tree t JOIN reply_comment rc ON rc.dst = t.cid)
       |SELECT post_id, count(*) AS n_replies, max(depth) AS max_depth
       |FROM tree GROUP BY post_id
       |ORDER BY n_replies DESC, max_depth DESC, post_id
       |LIMIT 20""".stripMargin

  /** IC8-style replies: direct comments on Person 0's posts, replier
    * re-derived from the generator arithmetic (creator = (31·cid+7) % N,
    * created = 11·cid % 1000). */
  val q36_snb_replies: String =
    s"""WITH n AS (SELECT count(*) AS n FROM customer),
       |$snbCommentCtes,
       |myposts AS (SELECT CAST(o_orderkey AS BIGINT) AS post_id FROM orders
       |            WHERE o_custkey = 0),
       |direct AS (SELECT rp.cid FROM reply_post rp
       |           JOIN myposts p ON rp.ok = p.post_id)
       |SELECT d.cid AS comment_id, (31 * d.cid + 7) % n.n AS replier_id,
       |       (d.cid * 11) % 1000 AS created
       |FROM direct d, n
       |ORDER BY created DESC, comment_id
       |LIMIT 20""".stripMargin

  /** sack accumulation as SQL: each traverser is one lineitem row of a
    * BUILDING customer's orders; sack sum per customer = quantity sum. */
  val q37_sack: String =
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
      |  count(*) AS n_lines
      |FROM customer
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin

  /** project(count, value) as SQL: a grouped left join for the count
    * scalar, a dimension join for the value scalar. */
  val q34_project: String =
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
      |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS order_count,
      |  n_name AS nation_name
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_mktsegment = 'BUILDING'
      |ORDER BY order_count DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** where(traversal) as SQL: semi-join against the branch's covered
    * set — the complement of q30's NOT IN. */
  val q35_where_step: String =
    """SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM customer
      |WHERE c_custkey IN
      |  (SELECT o_custkey FROM orders
      |   WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  /** match() as SQL: the two pattern binding frames are the knows CTE
    * (seeded at person 0) and the creator join; the natural join on the
    * shared variable b is the DISTINCT friend set joined to orders. */
  val q38_match: String =
    s"""WITH $snbKnowsCtes,
       |direct AS (SELECT DISTINCT dst AS f FROM uk WHERE src = 0)
       |SELECT d.f AS person_id, count(*) AS n_posts
       |FROM direct d JOIN orders o ON o.o_custkey = d.f
       |GROUP BY d.f
       |ORDER BY n_posts DESC, person_id
       |LIMIT 20""".stripMargin

  /** aggregate() + where(within()) as SQL: the side-effect set is the
    * IN-subquery, the membership filter a semi-join. */
  val q39_aggregate: String =
    """SELECT s_suppkey FROM supplier
      |WHERE s_nationkey IN
      |  (SELECT c_nationkey FROM customer
      |   WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9900)
      |ORDER BY s_suppkey""".stripMargin

  /** subgraph() as SQL: the induced edge set (both endpoints in the
    * BUILDING∪their-nations set) is just the BUILDING filter. */
  val q40_subgraph: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS n_nationkey,
      |  count(*) AS n_customers
      |FROM customer WHERE c_mktsegment = 'BUILDING'
      |GROUP BY c_nationkey
      |ORDER BY n_nationkey""".stripMargin

  /** range(100, 120) as SQL: ORDER BY + OFFSET/LIMIT on the same key. */
  val q32_range: String =
    """SELECT c_custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  ORDER BY c_custkey LIMIT 20 OFFSET 100)
      |ORDER BY c_custkey""".stripMargin

  /** All-shortest-path counts as SQL: minimal-length WALKS over the
    * stored-direction multiset (UNION ALL — parallel mutual edges count
    * separately, matching `both`); a walk of minimal length cannot
    * revisit a vertex, so walk counts at the min depth ARE simple
    * shortest-path counts. */
  val q41_snb_allpaths: String =
    s"""WITH RECURSIVE $snbKnowsCtes,
       |uka AS (SELECT src, dst FROM knows UNION ALL SELECT dst, src FROM knows),
       |walk AS (
       |  SELECT CAST(1 AS BIGINT) AS id, 0 AS d
       |  UNION ALL
       |  SELECT u.dst, w.d + 1 FROM walk w JOIN uka u ON u.src = w.id
       |  WHERE w.d < 4),
       |agg AS (SELECT id, d, count(*) AS n FROM walk GROUP BY id, d),
       |dist AS (SELECT id, min(d) AS dist FROM agg GROUP BY id)
       |SELECT a.id AS person_id, CAST(a.d AS BIGINT) AS dist,
       |  CAST(a.n AS BIGINT) AS n_shortest
       |FROM agg a JOIN dist t ON a.id = t.id AND a.d = t.dist
       |ORDER BY person_id""".stripMargin

  /** Components as SQL: the reachability closure via recursive CTE
    * (UNION dedups (id, best) pairs, so it terminates at the
    * transitive closure), min reachable id per person == component
    * representative on an undirected graph. */
  val q42_snb_components: String =
    s"""WITH RECURSIVE $snbKnowsCtes,
       |comp AS (
       |  SELECT CAST(c_custkey AS BIGINT) AS id,
       |    CAST(c_custkey AS BIGINT) AS best FROM customer
       |  UNION
       |  SELECT CAST(u.dst AS BIGINT), c.best
       |  FROM comp c JOIN uk u ON u.src = c.id)
       |SELECT id AS person_id, min(best) AS component FROM comp
       |GROUP BY id ORDER BY person_id""".stripMargin

  /** Hop-bounded weighted shortest path as SQL: min walk cost within
    * <=4 hops over the stored-direction multiset, each direction
    * carrying the STORED orientation's weight (since = (src*7+dst*3) %
    * 1000 computed before reversal, exactly as the loader stores it).
    * No visited pruning on either side — identical walk semantics. */
  val q43_snb_weighted: String =
    s"""WITH RECURSIVE $snbKnowsCtes,
       |uka AS (
       |  SELECT src, dst, (src * 7 + dst * 3) % 1000 AS w FROM knows
       |  UNION ALL
       |  SELECT dst, src, (src * 7 + dst * 3) % 1000 AS w FROM knows),
       |walk AS (
       |  SELECT CAST(1 AS BIGINT) AS id, 0 AS d, CAST(0 AS BIGINT) AS cost
       |  UNION ALL
       |  SELECT CAST(u.dst AS BIGINT), k.d + 1, k.cost + u.w
       |  FROM walk k JOIN uka u ON u.src = k.id WHERE k.d < 4)
       |SELECT id AS person_id, min(cost) AS cost FROM walk
       |GROUP BY id ORDER BY person_id""".stripMargin

  /** Triangle counts as SQL: canonical a<b edges, one wedge join
    * closed by a third edge (x<y<z found exactly once), every corner
    * credited. */
  val q44_snb_triangles: String =
    s"""WITH $snbKnowsCtes,
       |ec AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       |       FROM knows WHERE src <> dst),
       |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |        FROM ec e1 JOIN ec e2 ON e2.a = e1.b
       |        JOIN ec e3 ON e3.a = e1.a AND e3.b = e2.b),
       |corners AS (SELECT x AS v FROM tri UNION ALL
       |            SELECT y FROM tri UNION ALL SELECT z FROM tri),
       |cnt AS (SELECT v, count(*) AS n FROM corners GROUP BY v)
       |SELECT CAST(c_custkey AS BIGINT) AS person_id,
       |  CAST(coalesce(n, 0) AS BIGINT) AS triangles
       |FROM customer LEFT JOIN cnt ON v = c_custkey
       |ORDER BY person_id""".stripMargin

  /** Five unrolled LPA rounds as SQL: per round, neighbor-label
    * frequency over the stored-direction multiset (UNION ALL, matching
    * the engine's undirected edge view), argmax with the same
    * (count DESC, label ASC) total tie-break, isolated vertices keep
    * their label. */
  val q45_snb_communities: String = {
    val round = (k: Int) => {
      val p = k - 1
      s"""f$k AS (SELECT u.src AS v, l.lbl AS lbl, count(*) AS n
         |        FROM uka u JOIN l$p l ON l.v = u.dst GROUP BY 1, 2),
         |b$k AS (SELECT v, lbl FROM (
         |          SELECT v, lbl, row_number() OVER
         |            (PARTITION BY v ORDER BY n DESC, lbl) AS rn FROM f$k)
         |        WHERE rn = 1),
         |l$k AS (SELECT l$p.v, coalesce(b$k.lbl, l$p.lbl) AS lbl
         |        FROM l$p LEFT JOIN b$k ON b$k.v = l$p.v)""".stripMargin
    }
    s"""WITH $snbKnowsCtes,
       |uka AS (SELECT src, dst FROM knows UNION ALL SELECT dst, src FROM knows),
       |l0 AS (SELECT CAST(c_custkey AS BIGINT) AS v,
       |       CAST(c_custkey AS BIGINT) AS lbl FROM customer),
       |${(1 to 5).map(round).mkString(",\n")}
       |SELECT v AS person_id, lbl AS community FROM l5
       |ORDER BY person_id""".stripMargin
  }

  /** Four unrolled peel rounds as SQL: per round, degree over the
    * surviving stored-direction multiset (both endpoints must survive),
    * keep >= 3; the final degree is measured within the last surviving
    * set. Identical bounded semantics to the engine's kCore. */
  val q46_snb_kcore: String = {
    val round = (r: Int) => {
      val p = r - 1
      s"""d$r AS (SELECT u.src AS v, count(*) AS n FROM uka u
         |        JOIN s$p a ON a.v = u.src JOIN s$p b ON b.v = u.dst
         |        GROUP BY 1),
         |s$r AS (SELECT v FROM d$r WHERE n >= 5)""".stripMargin
    }
    s"""WITH $snbKnowsCtes,
       |uka AS (SELECT src, dst FROM knows UNION ALL SELECT dst, src FROM knows),
       |s0 AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer),
       |${(1 to 4).map(round).mkString(",\n")},
       |fd AS (SELECT u.src AS v, count(*) AS n FROM uka u
       |       JOIN s4 a ON a.v = u.src JOIN s4 b ON b.v = u.dst GROUP BY 1)
       |SELECT s4.v AS person_id, CAST(coalesce(fd.n, 0) AS BIGINT) AS degree
       |FROM s4 LEFT JOIN fd ON fd.v = s4.v
       |ORDER BY person_id""".stripMargin
  }

  /** Multi-source bounded BFS as SQL: one recursive CTE seeded with
    * all five origins (dedup per (seed, id, d)), min depth per pair,
    * aggregated per seed. DuckDB sums BIGINT into HUGEINT — cast
    * back. */
  val q47_snb_closeness: String =
    s"""WITH RECURSIVE $snbKnowsCtes,
       |seeds AS (SELECT CAST(v AS BIGINT) AS s
       |          FROM (VALUES (0), (1), (2), (3), (4)) t(v)),
       |bfs AS (
       |  SELECT s.s AS seed, s.s AS id, CAST(0 AS BIGINT) AS d FROM seeds s
       |  UNION
       |  SELECT b.seed, u.dst, b.d + 1 FROM bfs b JOIN uk u ON u.src = b.id
       |  WHERE b.d < 4),
       |md AS (SELECT seed, id, min(d) AS dist FROM bfs GROUP BY 1, 2)
       |SELECT seed AS person_id, count(*) AS n_reached,
       |  CAST(sum(dist) AS BIGINT) AS dist_sum
       |FROM md WHERE dist > 0 GROUP BY seed ORDER BY person_id""".stripMargin

  /** Stress centrality as SQL: the q41 walk CTE from five seeds with
    * the path carried as a list (minimal-length walks ARE the simple
    * shortest paths), restricted to walks landing on ANOTHER seed at
    * its first-reach depth; interiors via list_slice(p, 2, -2) (empty
    * for 1-hop paths), counted per vertex. */
  val q48_snb_stress: String =
    s"""WITH RECURSIVE $snbKnowsCtes,
       |uka AS (SELECT src, dst FROM knows UNION ALL SELECT dst, src FROM knows),
       |seeds AS (SELECT CAST(v AS BIGINT) AS s
       |          FROM (VALUES (0), (1), (2), (3), (4)) t(v)),
       |walk AS (
       |  SELECT s.s AS seed, s.s AS id, 0 AS d, [s.s] AS p FROM seeds s
       |  UNION ALL
       |  SELECT w.seed, u.dst, w.d + 1, list_append(w.p, u.dst)
       |  FROM walk w JOIN uka u ON u.src = w.id WHERE w.d < 4),
       |dist AS (SELECT seed, id, min(d) AS dist FROM walk GROUP BY 1, 2),
       |sp AS (SELECT w.p FROM walk w
       |       JOIN dist t ON w.seed = t.seed AND w.id = t.id AND w.d = t.dist
       |       WHERE w.id IN (SELECT s FROM seeds) AND w.d > 0),
       |interior AS (SELECT unnest(list_slice(p, 2, -2)) AS v FROM sp)
       |SELECT v AS person_id, count(*) AS stress FROM interior
       |GROUP BY v ORDER BY person_id""".stripMargin

  /** Fixed-point PageRank unrolled: 10 iteration CTEs over the stored
    * KNOWS directions, every step an integer floor-division (`//`) or
    * an exact BIGINT sum — pageRankFixedPoint's arithmetic verbatim
    * (scale 1e12, reset term (15 * scale) // 100 folded to a literal). */
  val q50_snb_pagerank: String = {
    val scale = 1000000000000L
    val reset = 15L * scale / 100L
    val iters = (1 to 10).map { i =>
      // MATERIALIZED: each round references the previous one twice, so
      // DuckDB's default CTE inlining would expand the chain 2^10-fold
      s"""r$i AS MATERIALIZED (
         |  SELECT p.v,
         |    CAST($reset + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS r
         |  FROM r${i - 1} p LEFT JOIN (
         |    -- sum(BIGINT) promotes to HUGEINT; pin the exact value back
         |    SELECT e.dst AS v, CAST(sum(r.r // e.d) AS BIGINT) AS m
         |    FROM ke e JOIN r${i - 1} r ON r.v = e.src GROUP BY e.dst) s
         |  ON s.v = p.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH $snbKnowsCtes,
       |odeg AS (SELECT src, count(*) AS d FROM knows GROUP BY src),
       |ke AS MATERIALIZED (
       |  SELECT k.src, k.dst, o.d FROM knows k JOIN odeg o ON o.src = k.src),
       |r0 AS MATERIALIZED (
       |  SELECT CAST(c_custkey AS BIGINT) AS v, CAST($scale AS BIGINT) AS r
       |  FROM customer),
       |$iters
       |SELECT v AS person_id, r AS rank_fp FROM r10
       |ORDER BY person_id""".stripMargin
  }

  /** Fixed-point HITS unrolled: 5 rounds, each an authority gather +
    * L1 renormalization then a hub gather + renormalization —
    * hitsFixedPoint's integer arithmetic verbatim (scale 1e6, floor
    * division, greatest(total, 1) guard). Rounds MATERIALIZED for the
    * same CTE-inlining reason as q50. */
  val q51_snb_hits: String = {
    val scale = 1000000L
    val rounds = (1 to 5).map { i =>
      s"""ar$i AS MATERIALIZED (
         |  SELECT p.v, CAST(COALESCE(s.m, 0) AS BIGINT) AS raw
         |  FROM base p LEFT JOIN (
         |    SELECT k.dst AS v, CAST(sum(h.x) AS BIGINT) AS m
         |    FROM knows k JOIN h${i - 1} h ON h.v = k.src GROUP BY k.dst) s
         |  ON s.v = p.v),
         |at$i AS (SELECT greatest(CAST(sum(raw) AS BIGINT), 1) AS t FROM ar$i),
         |a$i AS MATERIALIZED (
         |  SELECT v, CAST(raw * $scale // t AS BIGINT) AS x FROM ar$i, at$i),
         |hr$i AS MATERIALIZED (
         |  SELECT p.v, CAST(COALESCE(s.m, 0) AS BIGINT) AS raw
         |  FROM base p LEFT JOIN (
         |    SELECT k.src AS v, CAST(sum(a.x) AS BIGINT) AS m
         |    FROM knows k JOIN a$i a ON a.v = k.dst GROUP BY k.src) s
         |  ON s.v = p.v),
         |ht$i AS (SELECT greatest(CAST(sum(raw) AS BIGINT), 1) AS t FROM hr$i),
         |h$i AS MATERIALIZED (
         |  SELECT v, CAST(raw * $scale // t AS BIGINT) AS x FROM hr$i, ht$i)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $snbKnowsCtes,
       |base AS (SELECT CAST(c_custkey AS BIGINT) AS v FROM customer),
       |h0 AS MATERIALIZED (SELECT v, CAST($scale AS BIGINT) AS x FROM base),
       |$rounds
       |SELECT b.v AS person_id, h5.x AS hub_fp, a5.x AS auth_fp
       |FROM base b JOIN h5 ON h5.v = b.v JOIN a5 ON a5.v = b.v
       |ORDER BY person_id""".stripMargin
  }

  /** Personalized PageRank unrolled: the q50 iteration with the reset
    * column seeded on persons 0-4 — `((15 * scale) // 100 * n) // 5`
    * per seed, 0 elsewhere (left-associative floor chain matches the
    * Scala constant exactly); r0 = the reset vector. Only reached
    * vertices (r > 0) are emitted. */
  val q52_snb_ppr: String = {
    val scale = 1000000000000L
    val iters = (1 to 10).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT p.v, p.reset,
         |    CAST(p.reset + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS r
         |  FROM r${i - 1} p LEFT JOIN (
         |    SELECT e.dst AS v, CAST(sum(r.r // e.d) AS BIGINT) AS m
         |    FROM ke e JOIN r${i - 1} r ON r.v = e.src GROUP BY e.dst) s
         |  ON s.v = p.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH $snbKnowsCtes,
       |odeg AS (SELECT src, count(*) AS d FROM knows GROUP BY src),
       |ke AS MATERIALIZED (
       |  SELECT k.src, k.dst, o.d FROM knows k JOIN odeg o ON o.src = k.src),
       |r0 AS MATERIALIZED (
       |  SELECT CAST(c_custkey AS BIGINT) AS v,
       |    CAST(CASE WHEN c_custkey IN (0, 1, 2, 3, 4)
       |         THEN (15 * $scale) // 100 * n.n // 5
       |         ELSE 0 END AS BIGINT) AS reset,
       |    CAST(CASE WHEN c_custkey IN (0, 1, 2, 3, 4)
       |         THEN (15 * $scale) // 100 * n.n // 5
       |         ELSE 0 END AS BIGINT) AS r
       |  FROM customer, n),
       |$iters
       |SELECT v AS person_id, r AS rank_fp FROM r10
       |WHERE r > 0 ORDER BY person_id""".stripMargin
  }

  /** Deterministic 4-step DeepWalk replay: the rank-ordered undirected
    * adjacency (row_number + degree per source), then each step joins
    * the previous frontier on `rank = 1 + md5(walk ":" step) % degree`
    * — the exact transition arithmetic of
    * `Iterative.deterministicWalks`. */
  val q53_snb_walks: String = {
    val steps = (1 to 4).map { s =>
      val p = s - 1
      s"""s$s AS (SELECT s$p.walk_id, a.dst AS v FROM s$p JOIN adj a
         |  ON a.src = s$p.v AND a.rk = 1 +
         |    (CAST(('0x' || substr(md5(CAST(s$p.walk_id AS VARCHAR) || ':$s'), 1, 15))
         |      AS BIGINT) % a.deg))""".stripMargin
    }.mkString(",\n")
    val union = (0 to 4).map(s => s"SELECT walk_id, $s AS step, v FROM s$s")
      .mkString("\n UNION ALL ")
    s"""WITH $snbKnowsCtes,
       |adj AS (SELECT src, dst,
       |          row_number() OVER (PARTITION BY src ORDER BY dst) AS rk,
       |          count(*) OVER (PARTITION BY src) AS deg
       |        FROM uk),
       |s0 AS (SELECT c_custkey AS walk_id, CAST(c_custkey AS BIGINT) AS v
       |       FROM customer WHERE c_custkey % 20 = 3),
       |$steps
       |SELECT walk_id, step, v AS person_id FROM (
       | $union)
       |ORDER BY walk_id, step""".stripMargin
  }

  /** SCC by definition over the THINNED knows subgraph (the q54 query
    * doc): the reachability closure (recursive CTE with UNION dedup —
    * cycle-safe), self-pairs added so singletons resolve, then
    * scc_id(v) = min u with reach(v,u) AND reach(u,v). */
  private val thinnedKnowsCte: String =
    """tk AS (SELECT src, dst FROM knows
      |       WHERE (src * 7 + dst * 13) % 5 < 3)""".stripMargin

  val q54_snb_scc: String =
    s"""WITH RECURSIVE $snbKnowsCtes,
       |$thinnedKnowsCte,
       |r AS (SELECT src AS a, dst AS b FROM tk
       |      UNION
       |      SELECT r.a, k.dst FROM r JOIN tk k ON k.src = r.b),
       |rs AS (SELECT p AS a, CAST(p AS BIGINT) AS b FROM deg
       |       UNION SELECT a, b FROM r)
       |SELECT x.a AS person_id, min(x.b) AS scc_id
       |FROM rs x JOIN rs y ON y.a = x.b AND y.b = x.a
       |GROUP BY x.a ORDER BY person_id""".stripMargin

  /** node2vec replay: uniform first hop, then per-step neighborhood
    * classification (return / common-neighbor / far), cumulative-weight
    * intervals in dst order, and the hash-mod-total pick — the exact
    * `Iterative.node2vecWalks` arithmetic with weights (1, 2, 1). */
  val q55_snb_node2vec: String = {
    def h(s: Int) =
      s"CAST(('0x' || substr(md5(CAST(walk_id AS VARCHAR) || ':$s'), 1, 15)) AS BIGINT)"
    val biased = (2 to 3).map { s =>
      val p = s - 1
      s"""n$s AS (SELECT s$p.walk_id, s$p.prev, s$p.v, a.dst AS x,
         |    CASE WHEN a.dst = s$p.prev THEN 1
         |         WHEN m.src IS NOT NULL THEN 2
         |         ELSE 1 END AS w
         |  FROM s$p JOIN adj a ON a.src = s$p.v
         |  LEFT JOIN uk m ON m.src = s$p.prev AND m.dst = a.dst),
         |w$s AS (SELECT *,
         |    sum(w) OVER (PARTITION BY walk_id ORDER BY x
         |                 ROWS UNBOUNDED PRECEDING) AS cum,
         |    sum(w) OVER (PARTITION BY walk_id) AS tot FROM n$s),
         |s$s AS (SELECT walk_id, v AS prev, x AS v FROM w$s
         |  WHERE (${h(s)} % tot) >= cum - w AND (${h(s)} % tot) < cum)""".stripMargin
    }.mkString(",\n")
    s"""WITH $snbKnowsCtes,
       |adj AS (SELECT src, dst,
       |          row_number() OVER (PARTITION BY src ORDER BY dst) AS rk,
       |          count(*) OVER (PARTITION BY src) AS deg
       |        FROM uk),
       |s0 AS (SELECT c_custkey AS walk_id, CAST(c_custkey AS BIGINT) AS v
       |       FROM customer WHERE c_custkey % 20 = 7),
       |s1 AS (SELECT s0.walk_id, s0.v AS prev, a.dst AS v FROM s0 JOIN adj a
       |       ON a.src = s0.v AND a.rk = 1 + (${h(1)} % a.deg)),
       |$biased
       |SELECT walk_id, step, v AS person_id FROM (
       | SELECT walk_id, 0 AS step, v FROM s0
       | UNION ALL SELECT walk_id, 1, v FROM s1
       | UNION ALL SELECT walk_id, 2, v FROM s2
       | UNION ALL SELECT walk_id, 3, v FROM s3)
       |ORDER BY walk_id, step""".stripMargin
  }

  /** Person vertices pack as `labelId << 48 | key` with labelId from
    * the sorted snb label registry (Comment=1, Person=2, Post=3 — the
    * q18 sorted-label rule), so the MIS priority hash input replays as
    * `round ":" (PersonPack + key)`. */
  private val PersonPack = 2L << 48

  /** Luby-MIS replay: 15 unrolled rounds (the engine's maxRounds bound)
    * of draw-priorities / pick-unbeaten / peel-winners-and-neighbors,
    * with the identical md5 priority arithmetic. Converged rounds are
    * no-ops (empty actives), so over-unrolling is harmless. */
  val q56_snb_mis: String = {
    def h(r: Int, v: String) =
      s"CAST(('0x' || substr(md5('$r:' || CAST($PersonPack + $v AS VARCHAR)), 1, 15)) AS BIGINT)"
    val rounds = (1 to 15).map { r =>
      val p = r - 1
      s"""l$r AS MATERIALIZED (SELECT DISTINCT e.src AS v FROM e$p e
         |  WHERE ${h(r, "e.dst")} < ${h(r, "e.src")}
         |     OR (${h(r, "e.dst")} = ${h(r, "e.src")} AND e.dst < e.src)),
         |w$r AS MATERIALIZED (SELECT v FROM a$p
         |  WHERE v NOT IN (SELECT v FROM l$r)),
         |rm$r AS MATERIALIZED (SELECT v FROM w$r UNION
         |  SELECT e.dst FROM e$p e JOIN w$r w ON w.v = e.src),
         |a$r AS MATERIALIZED (SELECT v FROM a$p
         |  WHERE v NOT IN (SELECT v FROM rm$r)),
         |e$r AS MATERIALIZED (SELECT e.src, e.dst FROM e$p e
         |  JOIN a$r x ON x.v = e.src JOIN a$r y ON y.v = e.dst)""".stripMargin
    }.mkString(",\n")
    val union = (1 to 15).map(r =>
      s"SELECT v, $r AS mis_round FROM w$r").mkString("\n UNION ALL ")
    s"""WITH $snbKnowsCtes,
       |a0 AS MATERIALIZED (SELECT CAST(p AS BIGINT) AS v FROM deg),
       |e0 AS MATERIALIZED (SELECT src, dst FROM uk),
       |$rounds
       |SELECT v AS person_id, mis_round FROM (
       | $union)
       |ORDER BY person_id""".stripMargin
  }

  /** Adamic-Adar replay: wedges from the seed set over the undirected
    * distinct adjacency, existing edges anti-joined away, the
    * eighth-bit integer-log weight per common neighbor, top-10 per
    * seed. */
  val q57_snb_linkpred: String =
    s"""WITH $snbKnowsCtes,
       |deg2 AS (SELECT src AS z, count(*) AS d FROM uk GROUP BY src),
       |s AS (SELECT CAST(c_custkey AS BIGINT) AS u FROM customer
       |      WHERE c_custkey % 25 = 11),
       |wedge AS (SELECT s.u, a.dst AS z, b.dst AS v
       |          FROM s JOIN uk a ON a.src = s.u
       |          JOIN uk b ON b.src = a.dst
       |          WHERE b.dst <> s.u),
       |cand AS (SELECT w.u, w.z, w.v FROM wedge w
       |         WHERE NOT EXISTS (SELECT 1 FROM uk e
       |                           WHERE e.src = w.u AND e.dst = w.v)),
       |aa AS (SELECT c.u, c.v,
       |         sum((${1L << 20} * 8) // (8 * (length(bin(d)) - 1)
       |           + ((d * 8) >> (length(bin(d)) - 1)) - 8)) AS score_fp
       |       FROM cand c JOIN deg2 ON deg2.z = c.z
       |       GROUP BY c.u, c.v),
       |rk AS (SELECT u, v, CAST(score_fp AS BIGINT) AS score_fp,
       |         row_number() OVER (PARTITION BY u
       |                            ORDER BY score_fp DESC, v) AS rank
       |       FROM aa)
       |SELECT u AS person_id, rank, v AS cand_id, score_fp FROM rk
       |WHERE rank <= 10 ORDER BY person_id, rank""".stripMargin

  /** Clustering-coefficient replay: the q44 canonical triangle chain
    * plus undirected degrees and the fixed-point transitivity ratio
    * (degree < 2 scores 0). */
  val q58_snb_clustering: String =
    s"""WITH $snbKnowsCtes,
       |ec AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       |       FROM knows WHERE src <> dst),
       |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |        FROM ec e1 JOIN ec e2 ON e2.a = e1.b
       |        JOIN ec e3 ON e3.a = e1.a AND e3.b = e2.b),
       |corners AS (SELECT x AS v FROM tri UNION ALL
       |            SELECT y FROM tri UNION ALL SELECT z FROM tri),
       |cnt AS (SELECT v, count(*) AS n FROM corners GROUP BY v),
       |udeg AS (SELECT src AS v, count(*) AS d FROM uk GROUP BY src)
       |SELECT CAST(c_custkey AS BIGINT) AS person_id,
       |  CAST(coalesce(n, 0) AS BIGINT) AS triangles,
       |  CAST(coalesce(d, 0) AS BIGINT) AS degree,
       |  CAST(CASE WHEN coalesce(d, 0) >= 2
       |    THEN 2 * coalesce(n, 0) * ${1L << 20} // (d * (d - 1))
       |    ELSE 0 END AS BIGINT) AS coeff_fp
       |FROM customer
       |LEFT JOIN cnt ON cnt.v = c_custkey
       |LEFT JOIN udeg ON udeg.v = c_custkey
       |ORDER BY person_id""".stripMargin

  /** Condensation replay: the q54 SCC map applied to both endpoints of
    * every directed KNOWS edge, self-component edges dropped. */
  val q59_snb_condensation: String =
    s"""WITH RECURSIVE $snbKnowsCtes,
       |$thinnedKnowsCte,
       |r AS (SELECT src AS a, dst AS b FROM tk
       |      UNION
       |      SELECT r.a, k.dst FROM r JOIN tk k ON k.src = r.b),
       |rs AS (SELECT p AS a, CAST(p AS BIGINT) AS b FROM deg
       |       UNION SELECT a, b FROM r),
       |sccmap AS (SELECT x.a AS v, min(x.b) AS scc
       |           FROM rs x JOIN rs y ON y.a = x.b AND y.b = x.a
       |           GROUP BY x.a)
       |SELECT DISTINCT sa.scc AS src_scc_id, sb.scc AS dst_scc_id
       |FROM tk k
       |JOIN sccmap sa ON sa.v = k.src
       |JOIN sccmap sb ON sb.v = k.dst
       |WHERE sa.scc <> sb.scc
       |ORDER BY src_scc_id, dst_scc_id""".stripMargin

  /** Layering replay: the q59 condensation edges, then the longest
    * incoming path per component by recursive path enumeration (every
    * path in the DAG is finite, so the recursion terminates; max(lvl)
    * per component = the longest one). */
  val q60_snb_layers: String =
    s"""WITH RECURSIVE $snbKnowsCtes,
       |$thinnedKnowsCte,
       |r AS (SELECT src AS a, dst AS b FROM tk
       |      UNION
       |      SELECT r.a, k.dst FROM r JOIN tk k ON k.src = r.b),
       |rs AS (SELECT p AS a, CAST(p AS BIGINT) AS b FROM deg
       |       UNION SELECT a, b FROM r),
       |sccmap AS (SELECT x.a AS v, min(x.b) AS scc
       |           FROM rs x JOIN rs y ON y.a = x.b AND y.b = x.a
       |           GROUP BY x.a),
       |ce AS (SELECT DISTINCT sa.scc AS src, sb.scc AS dst
       |       FROM tk k
       |       JOIN sccmap sa ON sa.v = k.src
       |       JOIN sccmap sb ON sb.v = k.dst
       |       WHERE sa.scc <> sb.scc),
       |lp AS (SELECT DISTINCT scc AS c, 0 AS lvl FROM sccmap
       |       UNION ALL
       |       SELECT e.dst, lp.lvl + 1 FROM lp JOIN ce e ON e.src = lp.c)
       |SELECT c AS scc_id, CAST(max(lvl) AS BIGINT) AS layer
       |FROM lp GROUP BY c ORDER BY scc_id""".stripMargin

  /** Reachability replay: the q59 condensation edges closed by a
    * recursive CTE (UNION dedups, the DAG guarantees termination). */
  val q61_snb_reachability: String =
    s"""WITH RECURSIVE $snbKnowsCtes,
       |$thinnedKnowsCte,
       |r AS (SELECT src AS a, dst AS b FROM tk
       |      UNION
       |      SELECT r.a, k.dst FROM r JOIN tk k ON k.src = r.b),
       |rs AS (SELECT p AS a, CAST(p AS BIGINT) AS b FROM deg
       |       UNION SELECT a, b FROM r),
       |sccmap AS (SELECT x.a AS v, min(x.b) AS scc
       |           FROM rs x JOIN rs y ON y.a = x.b AND y.b = x.a
       |           GROUP BY x.a),
       |ce AS (SELECT DISTINCT sa.scc AS src, sb.scc AS dst
       |       FROM tk k
       |       JOIN sccmap sa ON sa.v = k.src
       |       JOIN sccmap sb ON sb.v = k.dst
       |       WHERE sa.scc <> sb.scc),
       |reach AS (SELECT src, dst FROM ce
       |          UNION
       |          SELECT r.src, e.dst FROM reach r JOIN ce e ON e.src = r.dst)
       |SELECT src AS src_scc_id, dst AS dst_scc_id
       |FROM reach ORDER BY src_scc_id, dst_scc_id""".stripMargin

  val all: Map[String, String] = Map(
    "q58_snb_clustering" -> q58_snb_clustering,
    "q59_snb_condensation" -> q59_snb_condensation,
    "q60_snb_layers" -> q60_snb_layers,
    "q61_snb_reachability" -> q61_snb_reachability,
    "q53_snb_walks" -> q53_snb_walks,
    "q54_snb_scc" -> q54_snb_scc,
    "q55_snb_node2vec" -> q55_snb_node2vec,
    "q56_snb_mis" -> q56_snb_mis,
    "q57_snb_linkpred" -> q57_snb_linkpred,
    // q49 folds the same edge set incrementally, so the whole-graph
    // components SQL is its oracle VERBATIM — that equality is the test
    "q49_snb_components_inc" -> q42_snb_components,
    "q50_snb_pagerank" -> q50_snb_pagerank,
    "q51_snb_hits" -> q51_snb_hits,
    "q52_snb_ppr" -> q52_snb_ppr,
    "q48_snb_stress" -> q48_snb_stress,
    "q47_snb_closeness" -> q47_snb_closeness,
    "q46_snb_kcore" -> q46_snb_kcore,
    "q45_snb_communities" -> q45_snb_communities,
    "q44_snb_triangles" -> q44_snb_triangles,
    "q43_snb_weighted" -> q43_snb_weighted,
    "q42_snb_components" -> q42_snb_components,
    "q41_snb_allpaths" -> q41_snb_allpaths,
    "q40_subgraph" -> q40_subgraph,
    "q39_aggregate" -> q39_aggregate,
    "q38_match" -> q38_match,
    "q37_sack" -> q37_sack,
    "q36_snb_replies" -> q36_snb_replies,
    "q35_where_step" -> q35_where_step,
    "q34_project" -> q34_project,
    "q33_snb_thread" -> q33_snb_thread,
    "q32_range" -> q32_range,
    "q31_choose" -> q31_choose,
    "q30_not_step" -> q30_not_step,
    "q29_snb_posts" -> q29_snb_posts,
    "q28_until" -> q28_until,
    "q25_snb_fof" -> q25_snb_fof,
    "q26_snb_path" -> q26_snb_path,
    "q27_bothe" -> q27_bothe,
    "q23_repeat_emit" -> q23_repeat_emit,
    "q24_snb_composite" -> q24_snb_composite,
    "q22_branch_coalesce" -> q22_branch_coalesce,
    "q19_connected_components" -> q19_connected_components,
    "q20_shortest_path" -> q20_shortest_path,
    "q21_edge_list_order" -> q21_edge_list_order,
    "q16_dsl_chain" -> q16_dsl_chain,
    "q17_rollup" -> q17_rollup,
    "q18_unified_ids" -> q18_unified_ids,
    "q01_one_hop" -> q01_one_hop,
    "q02_two_hop_fuse" -> q02_two_hop_fuse,
    "q03_intersect" -> q03_intersect,
    "q04_subtract" -> q04_subtract,
    "q05_edge_filter" -> q05_edge_filter,
    "q06_hydrate" -> q06_hydrate,
    "q07_distinct_reach" -> q07_distinct_reach,
    "q08_degree" -> q08_degree,
    "q09_topk" -> q09_topk,
    "q10_point_lookup" -> q10_point_lookup,
    "q11_both_direction" -> q11_both_direction,
    "q12_multi_label" -> q12_multi_label,
    "q13_path_multiplicity" -> q13_path_multiplicity,
    "q14_bulk_load" -> q14_bulk_load,
    "q15_pricing_summary" -> q15_pricing_summary)
}
