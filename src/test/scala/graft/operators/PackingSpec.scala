package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.SparkEntry
import graft.functions.TextFunctions
import graft.sources.Tables

/** Round-7 packing refactor: the bounded-shard two-pass prefix sum used
  * by `pipeline_pack_sequences`/`pipeline_pack_spans` must equal the
  * single-window per-lang cumsum formulation exactly (range sub-shards
  * preserve doc order, so the composition is lossless), and span rows
  * must tile each sequence disjointly.
  */
class PackingSpec extends AnyFunSuite with SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("two-pass packing equals the single-window formulation") {
    val budget = 2048L
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = Tables.documents(spark, dir)
      .where(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("lang"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("before", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("seq_id", (col("before") / budget).cast("long"))
      .groupBy(col("lang"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("seq_tokens"))
      .orderBy(col("lang"), col("seq_id"))
      .collect().toSeq
    val twoPass = SparkEntry.queries("pipeline_pack_sequences")(spark, dir)
      .collect().toSeq
    assert(twoPass.nonEmpty)
    assert(twoPass == naive)
  }

  test("span rows tile every sequence disjointly and sum to its tokens") {
    val spans = SparkEntry.queries("pipeline_pack_spans")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(spans.nonEmpty)
    spans.groupBy(t => (t._1, t._2)).foreach { case ((_, _), ss) =>
      val sorted = ss.map(s => (s._3, s._4)).sortBy(_._1)
      // Within a sequence: spans are non-empty, start at the previous
      // span's end (disjoint tiling from offset 0), and stay in budget.
      assert(sorted.head._1 == 0L)
      assert(sorted.forall { case (a, b) => a < b && b <= 2048L })
      sorted.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(s2 == e1)
        case _ => ()
      }
    }
  }
}
