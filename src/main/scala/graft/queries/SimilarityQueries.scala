package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.operators.Similarity
import graft.sources.Tables

/** Similarity search over the `embeddings` table: exact brute-force cosine
  * top-k (baseline) and sign-bucket LSH top-k (the scale path). Oracles
  * mirror the arithmetic exactly (double-widened dot products, round-6
  * cosine, id tie-break).
  */
object SimilarityQueries {

  private val normsCte =
    "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      "n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(range(1, len(v) + 1), " +
      "i -> v[i] * v[i]))) AS nrm FROM e)"

  val all: Seq[Q] = Seq(

    // Exact top-5 cosine neighbors for query vectors vec_id < 10.
    Q("sim_topk_bruteforce",
      s"WITH $normsCte, " +
        "q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < 10), " +
        "scored AS (SELECT qid, c.vec_id AS nid, " +
        "ROUND(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * c.v[i])) " +
        "/ (qn * c.nrm), 6) AS cosine FROM q, n c WHERE c.vec_id != qid), " +
        "r AS (SELECT qid, nid, cosine, ROW_NUMBER() OVER " +
        "(PARTITION BY qid ORDER BY cosine DESC, nid) AS rank FROM scored) " +
        "SELECT qid, rank, nid, cosine FROM r WHERE rank <= 5 ORDER BY qid, rank") {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
          .orderBy(col("qid"), col("rank"))
    },

    // LSH-bucketed top-3: candidates restricted to the query's sign bucket.
    Q("sim_lsh_topk", {
      val bucket = (1 to 4).map(i =>
        s"(CASE WHEN v[$i] >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
      s"WITH $normsCte, " +
        s"nb AS (SELECT vec_id, v, nrm, $bucket AS bucket FROM n), " +
        "q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, bucket FROM nb WHERE vec_id < 10), " +
        "scored AS (SELECT qid, c.vec_id AS nid, " +
        "ROUND(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * c.v[i])) " +
        "/ (qn * c.nrm), 6) AS cosine FROM q JOIN nb c USING (bucket) WHERE c.vec_id != qid), " +
        "r AS (SELECT qid, nid, cosine, ROW_NUMBER() OVER " +
        "(PARTITION BY qid ORDER BY cosine DESC, nid) AS rank FROM scored) " +
        "SELECT qid, rank, nid, cosine FROM r WHERE rank <= 3 ORDER BY qid, rank"
    }) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.lshBucketTopK(emb, emb.filter(col("vec_id") < 10), k = 3,
          bucketBits = 4)
        .orderBy(col("qid"), col("rank"))
    },

    // Multi-probe LSH top-3: query bucket + all 1-bit-flip neighbors.
    Q("sim_lsh_multiprobe", {
      val bucket = (1 to 4).map(i =>
        s"(CASE WHEN v[$i] >= 0 THEN '1' ELSE '0' END)").mkString(" || ")
      // Probe i=0 keeps the bucket; i=1..4 flips bit i.
      val probes = "list_transform(range(0, 5), i -> CASE WHEN i = 0 THEN bucket " +
        "ELSE substr(bucket, 1, CAST(i - 1 AS INT)) || " +
        "(CASE WHEN substr(bucket, CAST(i AS INT), 1) = '1' THEN '0' ELSE '1' END) || " +
        "substr(bucket, CAST(i + 1 AS INT), CAST(4 - i AS INT)) END)"
      s"WITH $normsCte, " +
        s"nb AS (SELECT vec_id, v, nrm, $bucket AS bucket FROM n), " +
        s"q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, unnest($probes) AS bucket " +
        "FROM nb WHERE vec_id < 10), " +
        "scored AS (SELECT DISTINCT qid, c.vec_id AS nid, " +
        "ROUND(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * c.v[i])) " +
        "/ (qn * c.nrm), 6) AS cosine FROM q JOIN nb c USING (bucket) WHERE c.vec_id != qid), " +
        "r AS (SELECT qid, nid, cosine, ROW_NUMBER() OVER " +
        "(PARTITION BY qid ORDER BY cosine DESC, nid) AS rank FROM scored) " +
        "SELECT qid, rank, nid, cosine FROM r WHERE rank <= 3 ORDER BY qid, rank"
    }) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.lshMultiProbeTopK(emb, emb.filter(col("vec_id") < 10), k = 3,
          bucketBits = 4)
        .orderBy(col("qid"), col("rank"))
    },

    // IVF top-3 with k-means-trained centroids: 3 seeded Lloyd iterations
    // (deterministic — 6-dp distance/centroid grids + cid tie-break), then
    // nearest-cell assignment and a 2-cell probe. The oracle replays the
    // ENTIRE training loop in SQL (one CTE chain per iteration), so a
    // divergence anywhere in assign → average → re-assign breaks the hash.
    Q("sim_ivf_topk", ivfKmeansSql(nCells = 16, iters = 3, k = 3, nProbe = 2,
      nQueries = 10)) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), k = 3,
          nCells = 16, nProbe = 2, trainIters = 3)
        .orderBy(col("qid"), col("rank"))
    }
  )

  /** DuckDB replay of [[Similarity.trainIvfCentroids]] + the IVF probe:
    * cent0 = first-`nCells` seeds; each iteration ranks the sequential
    * (v[i]-cv[i])² distance (rounded to the 6-dp grid, cid tie-break) and
    * re-averages per (cell, dimension) onto the same grid — exactly the
    * Spark arithmetic, so assignments match bit-for-bit. */
  private def ivfKmeansSql(nCells: Int, iters: Int, k: Int, nProbe: Int,
                           nQueries: Int): String = {
    def distCte(name: String, cent: String) =
      s"$name AS (SELECT e.vec_id, c.cid, ROUND(list_sum(list_transform(" +
        "range(1, len(e.v) + 1), i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), 6) " +
        s"AS dist FROM e, $cent c)"
    val train = (1 to iters).map { t =>
      distCte(s"d$t", s"cent${t - 1}") + ", " +
        s"a$t AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, ROW_NUMBER() OVER " +
        s"(PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d$t) WHERE rn = 1), " +
        s"s$t AS (SELECT a.cid, u.pos, ROUND(AVG(u.val), 6) AS val " +
        s"FROM a$t a JOIN u USING (vec_id) GROUP BY a.cid, u.pos), " +
        s"cent$t AS (SELECT cid, list(val ORDER BY pos) AS cv FROM s$t GROUP BY cid)"
    }.mkString(", ")
    s"WITH $normsCte, " +
      "u AS (SELECT vec_id, unnest(v) AS val, unnest(range(1, len(v) + 1)) AS pos FROM e), " +
      s"cent0 AS (SELECT CAST(vec_id AS BIGINT) AS cid, v AS cv FROM e WHERE vec_id < $nCells), " +
      s"$train, " +
      distCte("df", s"cent$iters") + ", " +
      "rf AS (SELECT vec_id, cid, ROW_NUMBER() OVER " +
      "(PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM df), " +
      "cell AS (SELECT r.vec_id AS nid, r.cid, n.v AS nv, n.nrm AS nn " +
      "FROM rf r JOIN n ON n.vec_id = r.vec_id WHERE r.rn = 1), " +
      "probe AS (SELECT r.vec_id AS qid, r.cid, n.v AS qv, n.nrm AS qn " +
      s"FROM rf r JOIN n ON n.vec_id = r.vec_id WHERE r.rn <= $nProbe AND r.vec_id < $nQueries), " +
      "scored AS (SELECT qid, nid, ROUND(list_sum(list_transform(" +
      "range(1, len(qv) + 1), i -> qv[i] * nv[i])) / (qn * nn), 6) AS cosine " +
      "FROM probe JOIN cell USING (cid) WHERE nid != qid), " +
      "r2 AS (SELECT qid, nid, cosine, ROW_NUMBER() OVER " +
      s"(PARTITION BY qid ORDER BY cosine DESC, nid) AS rank FROM scored) " +
      s"SELECT qid, rank, nid, cosine FROM r2 WHERE rank <= $k ORDER BY qid, rank"
  }
}
