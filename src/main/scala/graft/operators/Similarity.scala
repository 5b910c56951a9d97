package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Exact top-k neighbors (by cosine) for each query vector. */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = prep(queries).select(col("vec_id").as("qid"), col("v").as("qv"),
      col("nrm").as("qn"))
    val c = prep(emb)
    val scored = c.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cosine"))
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
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cosine"))
  }
}
