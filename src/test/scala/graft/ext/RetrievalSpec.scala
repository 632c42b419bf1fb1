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
}
