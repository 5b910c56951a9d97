package graft

import org.apache.spark.sql.functions._

/** Throwaway stage-level profiler for hotspot queries (not part of the
  * driver contract; run by hand while optimizing). Current target: the
  * char-jaccard prefix path at the 10× smoke scale.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_scale_x10")
    val spark = GraftSession.local("profile")
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions._
    import graft.sources.Tables

    val docs = Tables.documents(spark, sfDir)
    println(s"docs = ${docs.count()}")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    val threshold = 0.4
    val b = docs
      .where(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("n_chars"),
        array_sort(array_distinct(transform(charShingles(normText(col("text")), 8),
          x => xxhash64(x)))).as("sh64"))
      .localCheckpoint()

    time("shingle+checkpoint (cached)")(b.count())

    val post = b.select(col("doc_id"), explode(col("sh64")).as("h"))
    time("postings")(post.count())
    val dfreq = post.groupBy(col("h")).agg(count(lit(1)).as("df"))
    time("dfreq")(dfreq.count())
    val prefixes = post.join(dfreq, "h")
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("rs"))
      .select(col("doc_id"), size(col("rs")).as("sz"),
        posexplode(slice(col("rs"), lit(1),
          (size(col("rs")) - ceil(size(col("rs")) * threshold - 1e-7) + 1).cast("int")))
          .as(Seq("pos0", "p")))
      .select(col("doc_id"), col("sz"), (col("pos0") + 1).as("pos"), col("p.h").as("h"))
      .join(b.select(col("doc_id"), col("n_chars")), "doc_id")
    time("prefix build")(prefixes.count())
    val pch = prefixes.localCheckpoint()
    val c = threshold / (1 + threshold)
    val joined = pch.as("a").join(pch.as("b"),
      col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
        abs(col("a.n_chars") - col("b.n_chars")) <= 10 &&
        col("b.sz") >= ceil(col("a.sz") * threshold - 1e-7) &&
        col("a.sz") >= ceil(col("b.sz") * threshold - 1e-7))
    time("prefix join, NO pos filter")(joined.count())
    val joinedPos = pch.as("a").join(pch.as("b"),
      col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
        abs(col("a.n_chars") - col("b.n_chars")) <= 10 &&
        col("b.sz") >= ceil(col("a.sz") * threshold - 1e-7) &&
        col("a.sz") >= ceil(col("b.sz") * threshold - 1e-7) &&
        lit(1) + least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos")) >=
          ceil((col("a.sz") + col("b.sz")) * c - 1e-7))
    time("prefix join, pos filter")(joinedPos.count())
    time("pos-filter candidates distinct")(
      joinedPos.select(col("a.doc_id"), col("b.doc_id")).distinct().count())
    spark.stop()
  }
}
