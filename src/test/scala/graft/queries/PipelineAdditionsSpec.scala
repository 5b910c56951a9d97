package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}
import graft.operators.{Corpus, Similarity}

/** Behavioral pins for the round-11 third-batch additions: DSIR importance
  * weights must separate target-like from pool-like documents, RRF fusion
  * must produce well-formed bounded rankings that reward dual-list
  * membership, and the streaming CMS heavy-hitter estimate must keep the
  * count-min one-sided error guarantee per (day, probe). */
class PipelineAdditionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("dsirLogWeights: target-vocabulary pool docs score above pool-vocabulary ones") {
    // Target exemplars (doc_id % 7 == 0) speak {alpha beta}; pool doc 1
    // speaks the target vocabulary, pool doc 2 a disjoint one. DSIR must
    // rank doc 1 strictly above doc 2, with the signs matching the add-1
    // log-ratio direction.
    val docs = Seq(
      (0L, "alpha beta alpha beta alpha beta"),
      (7L, "alpha beta beta alpha alpha beta"),
      (14L, "beta alpha beta alpha beta alpha"),
      (1L, "alpha beta alpha beta"),
      (2L, "zulu yankee zulu yankee")
    ).toDF("doc_id", "text")
    val w = Corpus.dsirLogWeights(docs, buckets = 128,
        isTarget = col("doc_id") % 7 === 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.keySet === Set(1L, 2L), "only pool docs are scored")
    assert(w(1L) > w(2L), s"target-like must outscore pool-like: $w")
    assert(w(1L) > 0.0, s"target-vocabulary doc must score positive: ${w(1L)}")
    assert(w(2L) < 0.0, s"disjoint-vocabulary doc must score negative: ${w(2L)}")
  }

  test("sim_hybrid_rrf: rankings are dense, bounded, and score-monotone") {
    val out = SparkEntry.queries("sim_hybrid_rrf")(spark, sf)
      .select(col("qid").cast("long"), col("rank").cast("long"), col("rrf"))
      .collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (qid, rows) =>
      val ranks = rows.map(_.getLong(1)).sorted.toSeq
      assert(ranks.size <= 10, s"qid $qid returned ${ranks.size} rows")
      assert(ranks === (1L to ranks.size).toSeq, s"qid $qid ranks not dense: $ranks")
      val scores = rows.sortBy(_.getLong(1)).map(_.getDouble(2)).toSeq
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"qid $qid rrf not non-increasing: $scores")
      // Max attainable fused score is rank-1 membership in BOTH lists.
      assert(scores.head <= 2.0 / 61.0 + 1e-9)
    }
  }

  test("mmrRerank: an exact-duplicate top hit is demoted below a diverse result") {
    // q = e1; a and b are identical (rel 0.9); c is diverse (rel 0.85,
    // sim-to-a ~0.535). Round 1 picks a (or b — nid tie-break: a=10);
    // round 2 must pick c (0.7*0.85 - 0.3*0.535 = 0.434) over the exact
    // duplicate b (0.7*0.9 - 0.3*1.0 = 0.33).
    val emb = Seq(
      (0L, Seq(1.0, 0.0, 0.0)),
      (10L, Seq(0.9, 0.43589, 0.0)),
      (11L, Seq(0.9, 0.43589, 0.0)),
      (12L, Seq(0.85, -0.5268, 0.0))
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(emb, emb.filter(col("vec_id") === 0L),
        shortlist = 3, k = 3, lamTenths = 7, muTenths = 3)
      .orderBy(col("it")).collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(10L, 12L, 11L),
      s"expected dup demoted: ${out.mkString(", ")}")
  }

  test("sim_mmr_rerank: picks are distinct shortlist members with non-increasing scores") {
    val out = SparkEntry.queries("sim_mmr_rerank")(spark, sf)
      .select(col("qid").cast("long"), col("it").cast("long"),
        col("nid").cast("long"), col("mmr"))
      .collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val byIt = rows.sortBy(_.getLong(1))
      assert(byIt.map(_.getLong(1)).toSeq === (1L to byIt.size).toSeq)
      val nids = byIt.map(_.getLong(2))
      assert(nids.distinct.length === nids.length, s"qid $qid repeated a pick")
      // Greedy argmax over a shrinking candidate set with growing
      // penalties: the selected score can never increase.
      val scores = byIt.map(_.getDouble(3)).toSeq
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"qid $qid mmr increased: $scores")
    }
  }

  test("pipeline_rag_pack: budget respected, rank-order prefix, exact running sum") {
    val rows = SparkEntry.queries("pipeline_rag_pack")(spark, sf)
      .select(col("qid").cast("long"), col("rank").cast("long"),
        col("n_tokens").cast("long"), col("cum_tokens").cast("long"))
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      assert(byRank.last.getLong(3) <= 256L, s"qid $qid over budget")
      // Kept rows are the contiguous rank prefix (cum is monotone, so no
      // later hit can re-enter once the budget is crossed).
      assert(byRank.map(_.getLong(1)).toSeq === (1L to byRank.size).toSeq,
        s"qid $qid not a rank prefix: ${byRank.map(_.getLong(1)).toSeq}")
      val cums = byRank.scanLeft(0L)(_ + _.getLong(2)).tail
      assert(byRank.map(_.getLong(3)).toSeq === cums.toSeq,
        s"qid $qid cum mismatch")
    }
  }

  test("stream_heavy_hitters: CMS estimates never undercount (per day x probe)") {
    val rows = SparkEntry.queries("stream_heavy_hitters")(spark, sf)
      .select(col("cms_count").cast("long"), col("exact_count").cast("long"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) >= r.getLong(1),
        s"count-min undercounted: est ${r.getLong(0)} < exact ${r.getLong(1)}")
    }
  }

  test("provenanceFate: first-drop-wins fates partition the corpus") {
    // Hand-built corpus hitting every funnel stage. long20/long20b: same
    // 20-token text (exact dups) passing both gates; doc 40 is a bench
    // holdout; doc 3 shares long20's text but fails nothing earlier than
    // exact-dup; doc 5 is too short (quality) AND an exact dup of doc 9 —
    // first-drop-wins must say 'quality'.
    val long20 = (1 to 20).map(i => s"the t$i").mkString(" ") // 40 tokens, 'the' ratio 0.5
    val short = "the a"
    val docs = Seq(
      (1L, long20), (3L, long20), // kept + exact_dup
      (5L, short), (9L, short),   // both fail quality (2 tokens); 5 also dup of 9
      // Bench holdout (40 % 20 == 0): passes both gates but shares no
      // 4-gram with any train doc, so nothing upstream is contaminated.
      (40L, (1 to 20).map(i => s"the b$i").mkString(" ")),
      (7L, (1 to 25).map(i => s"w$i").mkString(" ")) // 25 tokens, no markers -> lang
    ).toDF("doc_id", "text")
    val fates = Corpus.provenanceFate(docs)
      .select(col("doc_id"), col("fate")).as[(Long, String)].collect().toMap
    assert(fates.size == 6, "fates must partition the corpus (one row per doc)")
    assert(fates(1L) == "kept")
    assert(fates(3L) == "exact_dup")
    assert(fates(5L) == "quality")
    assert(fates(9L) == "quality")
    assert(fates(40L) == "bench")
    assert(fates(7L) == "lang")
  }

  test("pipeline_retention: funnel counts reconcile with the fate table") {
    val fates = SparkEntry.queries("pipeline_provenance")(spark, sf)
    val funnel = SparkEntry.queries("pipeline_retention")(spark, sf).collect()
    val total = fates.count()
    // Drops + kept sum to the corpus, and each stage's n_in is the
    // corpus minus everything dropped before it.
    assert(funnel.map(_.getLong(2)).sum == total)
    var remaining = total
    funnel.foreach { r =>
      assert(r.getLong(3) == remaining,
        s"stage ${r.getString(1)}: n_in ${r.getLong(3)} != $remaining")
      remaining -= r.getLong(2)
    }
    assert(remaining == 0L)
  }
}
