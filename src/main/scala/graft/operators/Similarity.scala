package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths, per the scale plan:
  *  - [[bruteForceTopK]]: exact cosine top-k — the query side is broadcast
  *    (it is tiny), candidates stream through in one pass: correct baseline
  *    at any scale where queries fit in memory, O(|queries|·n) work.
  *  - [[lshBucketTopK]]: sign-bucket (random-hyperplane) LSH — candidates
  *    are equi-joined on the bucket key, so the pair space collapses from
  *    n² to per-bucket; the 100-TB shape (bucket = shuffle/partition key).
  *    An IVF variant would swap the bucket fn for nearest-centroid; the
  *    plumbing is identical.
  *
  * Ranking is deterministic: order by rounded cosine desc, then vec_id —
  * ties cannot reorder across engines.
  */
object Similarity {

  private def prep(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v"))) // once per vector, not per pair

  /** Deterministic rank-and-keep over scored (qid, nid, cosine) rows. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cosine"))
  }

  /** Exact top-k neighbors (by cosine) for each query vector. */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = prep(queries).select(col("vec_id").as("qid"), col("v").as("qv"),
      col("nrm").as("qn"))
    val c = prep(emb)
    val scored = c.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cosine"))
    rankTopK(scored, k)
  }

  /** The query bucket plus every bucket at Hamming distance 1 (one sign
    * plane flipped) — multi-probe LSH's probe set. Vectors near a
    * hyperplane land on either side; probing the flipped buckets recovers
    * them at bits+1 × the candidate cost instead of halving the bits. */
  def multiProbeBuckets(bucket: Column, bits: Int): Column =
    array(bucket +: (1 to bits).map { i =>
      val flipped = when(substring(bucket, i, 1) === "1", "0").otherwise("1")
      concat(substring(bucket, 1, i - 1), flipped,
        substring(bucket, i + 1, bits - i))
    }: _*)

  /** Multi-probe LSH top-k: like [[lshBucketTopK]] but each query fans out
    * to its bucket and all 1-bit neighbors before scoring. */
  def lshMultiProbeTopK(emb: DataFrame, queries: DataFrame, k: Int,
                        bucketBits: Int = 4): DataFrame = {
    val q = prep(queries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        explode(multiProbeBuckets(signBucket(col("v"), bucketBits), bucketBits))
          .as("bucket"))
    val c = prep(emb)
      .withColumn("bucket", signBucket(col("v"), bucketBits))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cosine"))
      .distinct() // a candidate can only match one bucket, but stay safe
    rankTopK(scored, k)
  }

  /** IVF (inverted-file) top-k: vectors are assigned to their nearest
    * centroid's cell; a query probes only its `nProbe` nearest cells. The
    * cell id is the shuffle key — the IVF counterpart of [[lshBucketTopK]]'s
    * sign bucket, with better-balanced cells on clustered data.
    *
    * Centroids here are the first `nCells` vectors (deterministic, so the
    * DuckDB oracle can replay the assignment bit-for-bit); production would
    * k-means-train them — the plumbing (assign → invert → probe → rescore)
    * is identical and that is what this operator exercises.
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int, nCells: Int = 16,
              nProbe: Int = 2): DataFrame = {
    val n = prep(emb).withColumn("n2", dot(col("v"), col("v")))
    val cents = n.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("n2").as("cn2"))
    // Squared L2 distance to each centroid; rank 1 = home cell, <= nProbe =
    // probe set. Ties break on centroid id (distances are bit-identical
    // across engines, so the tie-break is portable).
    def cellRank(vs: DataFrame) = vs.crossJoin(broadcast(cents))
      .withColumn("dist",
        col("n2") + col("cn2") - lit(2) * dot(col("v"), col("cv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))))
    val cells = cellRank(n).where(col("rn") === 1)
      .select(col("vec_id").as("nid"), col("cid"), col("v").as("nv"),
        sqrt(col("n2")).as("nn"))
    val probes = cellRank(n.join(queries.select(col("vec_id")), "vec_id"))
      .where(col("rn") <= nProbe)
      .select(col("vec_id").as("qid"), col("cid"), col("v").as("qv"),
        sqrt(col("n2")).as("qn"))
    val scored = probes.join(cells, "cid")
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6).as("cosine"))
    rankTopK(scored, k)
  }

  /** LSH-bucketed top-k: only candidates sharing the query's sign bucket are
    * scored. Recall < 1 by construction; bucketBits trades recall for cost. */
  def lshBucketTopK(emb: DataFrame, queries: DataFrame, k: Int,
                    bucketBits: Int = 4): DataFrame = {
    val q = prep(queries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        signBucket(col("v"), bucketBits).as("bucket"))
    val c = prep(emb)
      .withColumn("bucket", signBucket(col("v"), bucketBits))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cosine"))
    rankTopK(scored, k)
  }
}
