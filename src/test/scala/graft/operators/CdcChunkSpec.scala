package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Content-defined chunking: the boundary gate depends only on window
  * content, so an insertion near the front of a document perturbs chunks
  * only until the next surviving boundary — every later chunk digest is
  * IDENTICAL. Fixed-size chunking loses all alignment after the same
  * edit. This re-synchronization is the entire point of CDC (rsync /
  * FastCDC); the spec plants the edit and measures both behaviors.
  */
class CdcChunkSpec extends AnyFunSuite with SparkSpec {

  /** Deterministic ~200-token document (varied words, no RNG). */
  private def words(n: Int): Seq[String] =
    (0 until n).map(i => s"w${(i * 7919) % 997}x${i % 13}")

  private def chunkDigests(texts: Seq[(Long, String)]): Map[Long, Seq[String]] = {
    import spark.implicits._
    Corpus.cdcChunks(texts.toDF("doc_id", "text"))
      .orderBy(col("doc_id"), col("chunk_id"))
      .select(col("doc_id"), col("chunk_md5")).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSeq).toMap
  }

  test("boundaries re-synchronize after a front insertion; fixed-size does not") {
    val base = words(200)
    val edited = Seq("INSERTED") ++ base
    val ds = chunkDigests(Seq(1L -> base.mkString(" "), 2L -> edited.mkString(" ")))
    val (a, b) = (ds(1L), ds(2L))
    assert(a.size >= 5, s"degenerate chunking: only ${a.size} chunks")
    // CDC: all but a bounded prefix of chunks survive the edit verbatim.
    val shared = a.toSet intersect b.toSet
    assert(shared.size >= a.size - 2,
      s"CDC failed to re-synchronize: ${shared.size} of ${a.size} chunks survived")
    // Fixed-size 16-token chunking over the same edit shares (almost) no
    // chunk content: every window is shifted by one token. Allow <= 1
    // accidental collision (a window of identical tokens could align).
    def fixed(ts: Seq[String]) = ts.grouped(16).map(_.mkString(" ")).toSet
    assert((fixed(base) intersect fixed(edited)).size <= 1,
      "fixed-size chunking unexpectedly survived the shift — test fixture degenerate")
  }

  test("chunk spans partition the token stream exactly") {
    val text = words(150).mkString(" ")
    import spark.implicits._
    val ch = Corpus.cdcChunks(Seq(9L -> text).toDF("doc_id", "text"))
      .orderBy(col("chunk_id"))
      .select(col("start_tok"), col("end_tok"), col("n_tokens")).collect()
    assert(ch.head.getLong(0) == 1L)
    assert(ch.last.getLong(1) == 150L)
    // Contiguous, gap-free, and n_tokens consistent with the span.
    ch.sliding(2).foreach {
      case Array(p, n) => assert(n.getLong(0) == p.getLong(1) + 1)
      case _           => ()
    }
    assert(ch.forall(r => r.getLong(2) == r.getLong(1) - r.getLong(0) + 1))
  }
}
