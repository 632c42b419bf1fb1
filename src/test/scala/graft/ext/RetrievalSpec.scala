package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  private def queriesFrom(pred: org.apache.spark.sql.Column) =
    docs.where(pred).select(col("doc_id").as("query_id"),
      concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("q_text"))

  test("bm25TopK: k bound, rank contiguity, self-exclusion, determinism") {
    val qs = queriesFrom(col("doc_id") % 17 === 3)
    val top = Retrieval.bm25TopK(docs, qs, k = 5, excludeSelf = true)
      .collect()
    assert(top.nonEmpty)
    val byQ = top.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rows) =>
      assert(rows.length <= 5)
      // ranks are 1..n and ordered by (score desc, doc_id)
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rows.length))
      val pairs = sorted.map(r => (r.getLong(3), r.getLong(2)))
      assert(pairs.sameElements(pairs.sortBy { case (s, id) => (-s, id) }))
      assert(!rows.exists(_.getLong(2) == qid), "self hit not excluded")
    }
    // partitioning-independent: identical result from a repartitioned corpus
    val again = Retrieval.bm25TopK(docs.repartition(13), qs, k = 5,
      excludeSelf = true).collect()
    assert(top.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("hardNegatives: positives excluded, next candidate fills the slot, qrels respected") {
    // doc 2 is a near-copy of the query doc 1 — BM25's natural #1 hit
    // and exactly what must NOT be served as a negative; 3/4 share
    // fewer terms, 5 shares none.
    val corpus = Seq(
      (1L, "solar panels convert sunlight into electricity efficiently"),
      (2L, "solar panels convert sunlight into electricity very efficiently"),
      (3L, "solar panels on rooftops gather sunlight"),
      (4L, "wind turbines convert motion into electricity"),
      (5L, "completely unrelated gardening soil compost text")
    ).toDF("doc_id", "text")
    val qs = Seq((1L, "solar panels convert sunlight into electricity"))
      .toDF("query_id", "q_text")
    val baseline = Retrieval.bm25TopK(corpus, qs, k = 2, excludeSelf = true)
      .select("doc_id").as[Long].collect().toSeq
    assert(baseline.head == 2L, s"fixture expectation: dup ranks first, got $baseline")
    val pos = Seq((1L, 2L)).toDF("query_id", "doc_id")
    val negs = Retrieval.hardNegatives(corpus, qs, pos, k = 2)
      .orderBy("rank").select("neg_id").as[Long].collect().toSeq
    // filter-then-rank: 2 is gone AND the freed slot is refilled
    assert(!negs.contains(2L) && negs.length == 2)
    assert(negs == baseline.filterNot(_ == 2L) ++
      Retrieval.bm25TopK(corpus, qs, k = 3, excludeSelf = true)
        .where(col("rank") === 3).select("doc_id").as[Long].collect().toSeq)
    // empty qrels degenerates to plain bm25 top-k minus self
    val none = Retrieval.hardNegatives(corpus, qs,
        Seq.empty[(Long, Long)].toDF("query_id", "doc_id"), k = 2)
      .orderBy("rank").select("neg_id").as[Long].collect().toSeq
    assert(none == baseline)
  }

  test("bm25TopKFromIndex over the built index equals bm25TopK (serving-path law)") {
    val qs = queriesFrom(col("doc_id") % 17 === 3)
    val direct = Retrieval.bm25TopK(docs, qs, k = 5, excludeSelf = true)
      .as[(Long, Int, Long, Long)].collect().toSet
    val viaIndex = Retrieval.bm25TopKFromIndex(
      Retrieval.buildBm25Index(docs), qs, k = 5, excludeSelf = true)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(viaIndex == direct && viaIndex.nonEmpty)
  }

  test("bm25TopK ranks an exact-phrase match first") {
    // A query that IS a document's own text must retrieve a doc sharing
    // all its terms above docs sharing none; take a doc's first 6 tokens
    // and check every top hit shares at least one query term.
    val qs = queriesFrom(col("doc_id") === 7)
    val qTerms = qs.select(explode(split(col("q_text"), " "))).as[String]
      .collect().toSet
    val hits = Retrieval.bm25TopK(docs, qs, k = 3)
      .join(docs, "doc_id").select("text").as[String].collect()
    assert(hits.nonEmpty)
    hits.foreach { t =>
      assert(t.split(" ").exists(qTerms.contains), s"hit shares no term: $t")
    }
  }

  test("idf is monotone: a rarer term outscores a common one at equal tf") {
    // Two synthetic docs of equal length; query hits a term that appears
    // in 1 doc vs a term in most docs -> the rare-term doc ranks first.
    val corpus = (0L until 20L).map { i =>
      val filler = if (i == 0) "rare" else "common"
      (i, s"$filler common pad$i x y")
    }.toDF("doc_id", "text")
    val qs = Seq((100L, "rare common")).toDF("query_id", "q_text")
    val top = Retrieval.bm25TopK(corpus, qs, k = 2).collect()
    assert(top.head.getLong(2) == 0L, s"rare-term doc should rank 1: ${top.toSeq}")
  }

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("denseRanks agrees with bruteForceTopK on the same query set") {
    val ids = Seq(0L, 3L, 7L)
    val viaFrame = Retrieval.denseRanks(emb,
      ids.toDF("query_id"), k = 5).collect()
    val viaList = Similarity.bruteForceTopK(emb, ids, 5)
      .select(col("query_id"), col("neighbor_id").as("doc_id")).collect()
    // same (query, neighbor) set; denseRanks adds contiguous ranks
    assert(viaFrame.map(r => (r.getLong(0), r.getLong(2))).toSet ==
      viaList.map(r => (r.getLong(0), r.getLong(1))).toSet)
    viaFrame.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
    }
    assert(!viaFrame.exists(r => r.getLong(0) == r.getLong(2)),
      "self hit not excluded")
  }

  test("denseRanksAgg returns exactly denseRanks' rows, ranks included") {
    val ids = Seq(0L, 3L, 7L, 11L).toDF("query_id")
    val win = Retrieval.denseRanks(emb, ids, k = 6).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val agg = Retrieval.denseRanksAgg(emb, ids, k = 6).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(win == agg && win.nonEmpty)
  }

  test("scoreboard: hand-exact hits, precision/recall@k, MRR, zero-hit row") {
    val S = Retrieval.Scale
    val lex = Seq((1L, 1, 10L), (1L, 2, 11L), (2L, 1, 20L))
      .toDF("query_id", "rank", "doc_id")
    val den = Seq((1L, 1, 11L), (2L, 1, 99L))
      .toDF("query_id", "rank", "doc_id")
    val truth = Seq((1L, 11L), (1L, 12L), (2L, 20L)).toDF("query_id", "doc_id")
    val qids = Seq(1L, 2L).toDF("query_id")
    val sb = Retrieval.scoreboard(Seq("lex" -> lex, "den" -> den),
        truth, qids, k = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val l = sb("lex")
    assert(l.getLong(2) == 2L && l.getLong(3) == 3L) // n_queries, n_relevant
    assert(l.getLong(4) == 2L)                       // (1,11)@2 + (2,20)@1
    assert(l.getLong(5) == S / 2 + S)                // MRR numerator, fixed point
    assert(l.getDouble(6) == 2.0 / 4.0)              // precision@2 = hits/(|Q|*k)
    assert(l.getDouble(7) == 2.0 / 3.0)              // recall = hits/n_relevant
    assert(l.getDouble(8) == (S / 2 + S).toDouble / (2L * S).toDouble)
    val dn = sb("den")
    assert(dn.getLong(4) == 1L && dn.getLong(5) == S) // one hit at rank 1
    // a method with zero hits still reports an exact row of zeros
    val none = Seq((1L, 1, 99L)).toDF("query_id", "rank", "doc_id")
    val z = Retrieval.scoreboard(Seq("none" -> none), truth, qids, k = 2)
      .collect()(0)
    assert(z.getLong(4) == 0L && z.getLong(5) == 0L && z.getDouble(8) == 0.0)
  }

  test("rrfFuse: hand-computed fusion, both-lists beats single-list") {
    val S = Retrieval.Scale
    val lex = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L))
      .toDF("query_id", "rank", "doc_id")
    val dense = Seq((1L, 1, 11L), (1L, 2, 20L))
      .toDF("query_id", "rank", "doc_id")
    val out = Retrieval.rrfFuse(lex, dense, k = 10).collect()
      .map(r => (r.getLong(2), r.getInt(1), r.getLong(3))).sortBy(_._2)
    // doc 11: lex rank 2 + dense rank 1; doc 10: lex rank 1 only;
    // doc 20: dense rank 2 only; doc 12: lex rank 3 only.
    val expected = Map(
      11L -> (S / 62 + S / 61), 10L -> S / 61,
      20L -> S / 62, 12L -> S / 63)
    assert(out.map(r => r._1 -> r._3).toMap == expected)
    assert(out.map(_._1).toSeq == Seq(11L, 10L, 20L, 12L),
      "both-lists doc must outrank every single-list doc here")
    assert(out.map(_._2).toSeq == Seq(1, 2, 3, 4))
  }

  test("rrfFuse on fixture rankings: k bound, contiguity, score replay") {
    val qs = queriesFrom(col("doc_id") % 17 === 3)
    val lex = Retrieval.bm25TopK(docs, qs, k = 5, excludeSelf = true)
    val dense = Retrieval.denseRanks(emb, qs.select(col("query_id")), k = 5)
    val fused = Retrieval.rrfFuse(lex, dense, k = 5).collect()
    assert(fused.nonEmpty)
    val lexC = lex.collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val denC = dense.collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(1)).toMap
    val S = Retrieval.Scale
    fused.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      val want = lexC.get(key).map(rk => S / (60 + rk)).getOrElse(0L) +
        denC.get(key).map(rk => S / (60 + rk)).getOrElse(0L)
      assert(r.getLong(3) == want, s"score mismatch at $key")
    }
    fused.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
    }
  }
}
