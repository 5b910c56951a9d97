package graft

import org.apache.spark.sql.functions._

/** Throwaway stage-level profiler for hotspot queries (not part of the
  * driver contract; run by hand while optimizing). Current target: the
  * PQ serve path (round-7 verdict item 2).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("profile")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    import graft.sources.Tables

    val emb = Tables.embeddings(spark, sfDir)
    emb.count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    val q = emb.filter(col("vec_id") < 10)
    // Warm the model caches (training measured separately by forensics).
    Similarity.pqTopK(emb, q, 3).count()
    Similarity.ivfTopK(emb, q, 3, trainIters = 3).count()

    for (round <- 1 to 3) {
      println(s"-- round $round")
      time("fingerprint")(
        emb.select(xxhash64(col("vec_id"), col("embedding")).as("h"))
          .agg(expr("bit_xor(h)"), count(lit(1))).count())
      val e = emb.select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
      val sv = e.select(col("vec_id"),
          explode(sequence(lit(0), lit(7))).as("sub"), col("v"))
        .select(col("vec_id"), col("sub"),
          slice(col("v"), col("sub") * 8 + 1, lit(8)).as("sv"))
      time("sv scan")(sv.count())
      time("pq_topk serve")(Similarity.pqTopK(emb, q, 3).count())
      time("pq_rerank serve")(Similarity.pqRerankTopK(emb, q, 3, 50).count())
      time("ivf serve")(Similarity.ivfTopK(emb, q, 3, trainIters = 3).count())
      time("ivf untrained")(Similarity.ivfTopK(emb, q, 3, trainIters = 0).count())
      time("brute serve")(Similarity.bruteForceTopK(emb, q, 3).count())
    }
    spark.stop()
  }
}
