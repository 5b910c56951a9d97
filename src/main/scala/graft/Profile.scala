package graft

import org.apache.spark.sql.functions._

/** Throwaway stage-level profiler for hotspot queries (not part of the
  * driver contract; run by hand while optimizing). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.local("profile")
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._

    val docs = sources.Tables.documents(spark, sfDir)
    docs.count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    time("norm only") {
      docs.select(normText(col("text")).as("n")).agg(sum(length(col("n")))).count()
    }
    time("charShingles size") {
      docs.select(charShingles(col("text"), 8).as("sh"))
        .agg(sum(size(col("sh")))).count()
    }
    time("charShingles size x2") {
      docs.select(charShingles(col("text"), 8).as("sh"))
        .agg(sum(size(col("sh")))).count()
    }
    time("charJaccardPairs") {
      operators.Dedup.charJaccardPairs(docs, k = 8, maxDiff = 10,
        threshold = 0.4).count()
    }
    time("charJaccardPairs x2") {
      operators.Dedup.charJaccardPairs(docs, k = 8, maxDiff = 10,
        threshold = 0.4).count()
    }
    time("ngramJaccardPairs") {
      operators.Dedup.ngramJaccardPairs(docs, maxDiff = 10,
        threshold = 0.3).count()
    }
    time("minhashLshPairs") {
      operators.Dedup.minhashLshPairs(docs).count()
    }
    time("simhash signatures") {
      operators.Dedup.simhashSignatures(spark, docs).count()
    }
    spark.stop()
  }
}
