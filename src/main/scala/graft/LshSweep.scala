package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import graft.functions.VectorFunctions
import graft.operators.Similarity
import graft.sources.Tables

/** Sign-LSH bucket-bits sweep: for each bucket width, measures
  *  - candidate-pair space of the near-dup self-join
  *    (sum over buckets of c·(c−1)/2 — the work the bucket key saves
  *    relative to all-pairs n·(n−1)/2), and
  *  - recall@k of single-probe and multi-probe top-k vs the brute-force
  *    ground truth.
  * This is the evidence behind [[Similarity.lshBitsFor]]'s derived default:
  * pair cost ~halves per added bit while multi-probe recovers most of the
  * recall the narrower buckets lose.
  * Usage: runMain graft.LshSweep [sfDir] [maxBits]
  */
object LshSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val maxBits = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = GraftSession.local("lsh-sweep")
    import spark.implicits._

    val emb = Tables.embeddings(spark, sfDir).cache()
    val n = emb.count()
    val k = 3
    val queries = emb.filter(col("vec_id") < 10)

    // Ground truth: brute-force top-k neighbor sets per query.
    val truth = Similarity.bruteForceTopK(emb, queries, k)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet

    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"qid", $"nid").as[(Long, Long)].collect().toSet
      (got & truth).size.toDouble / truth.size
    }

    println(f"n=$n  allPairs=${n * (n - 1) / 2}  derivedBits=${Similarity.lshBitsFor(n)}")
    println("bits  pairSpace  pairs/allPairs  recall@3(single)  recall@3(multi)")
    for (bits <- 2 to maxBits) {
      val pairSpace = emb
        .select(VectorFunctions.signBucket(
          VectorFunctions.asDouble(col("embedding")), bits).as("bucket"))
        .groupBy("bucket").count()
        .agg(sum(col("count") * (col("count") - 1) / 2)).as[Double].head()
      val rs = recall(Similarity.lshBucketTopK(emb, queries, k, bits))
      val rm = recall(Similarity.lshMultiProbeTopK(emb, queries, k, bits))
      val frac = pairSpace / (n.toDouble * (n - 1) / 2)
      println(f"$bits%4d  ${pairSpace.toLong}%9d  $frac%14.4f  $rs%16.2f  $rm%15.2f")
    }
    spark.stop()
  }
}
