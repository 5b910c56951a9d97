package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, VectorFunctions}
import graft.sources.Tables

/** Micro-benchmark: the native codegen'd `vec_dot` expression vs the
  * interpreted higher-order-function fold, on an all-pairs cosine workload
  * over the embeddings table. Usage: runMain graft.MicroBench [sfDir] */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)

    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
      .cache()
    e.count() // materialize

    def allPairsSum(dotFn: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)
        => org.apache.spark.sql.Column): Double = {
      e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(dotFn(col("a.v"), col("b.v")).as("d"))
        .agg(sum(col("d"))).collect()(0).getDouble(0)
    }

    def time(label: String, f: => Double): Double = {
      f // warm
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-10s $sec%8.2f s  (checksum $r%.6f)")
      sec
    }

    val native = time("vec_dot", allPairsSum(VectorFunctions.dot))
    val hof    = time("hof_fold", allPairsSum(VectorFunctions.dotHof))
    println(f"speedup: ${hof / native}%.1fx")
    spark.stop()
  }
}
