package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Degenerate-document behavior: docs with < 3 tokens have EMPTY shingle
  * sets, so every minhash row is null and all such docs collide into the
  * md5("") band bucket — the verify stage must still reject them (their
  * jaccard is 0/0 → NaN, which fails any threshold) rather than emit
  * false-positive pairs or crash. */
class DedupEdgeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, Long)*) =
    rows.toDF("doc_id", "text", "n_chars")

  test("short and empty docs produce no minhash pairs and no crash") {
    val d = docs(
      (1L, "one two", 7L),          // 2 tokens -> no shingles
      (2L, "tiny", 4L),             // 1 token
      (3L, "", 0L),                 // empty
      (4L, "a b c d e f g h", 15L)) // real shingles, but unique
    assert(Dedup.minhashLshPairs(d).count() == 0)
  }

  test("identical real docs still pair at jaccard 1.0 alongside degenerate ones") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val d = docs(
      (1L, text, text.length.toLong),
      (2L, text, text.length.toLong),
      (3L, "x", 1L))
    val pairs = Dedup.minhashLshPairs(d)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 1.0)))
  }

  test("ngram jaccard is likewise immune to empty shingle sets") {
    val d = docs((1L, "one two", 7L), (2L, "uno dos", 7L))
    assert(Dedup.ngramJaccardPairs(d).count() == 0)
  }
}
