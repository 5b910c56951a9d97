package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Unigram-LM tokenizer (Corpus.unigramTrain/unigramEncode): pins the
  * greedy longest-match segmentation semantics, the coverage floor, the
  * hard-EM prune, and train→encode determinism. The cross-ENGINE value
  * parity (DuckDB replays both EM rounds) is pinned by the
  * text_unigram_train / text_unigram_encode oracle rows; this spec pins
  * the properties a hash can't articulate.
  */
class UnigramSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // A corpus where "abab" dominates: the piece "abab"/"ab" must be
  // learned, and segmentation of ababab... must prefer the longest piece.
  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("a dominant repeated substring becomes a kept multi-char piece") {
    val d = docs((1L to 20L).map(i => i -> "abab abab cdcd"): _*)
    val model = Corpus.unigramTrain(d, maxPieceLen = 4, nCandidates = 8,
      keepPieces = 4, rounds = 2).collect()
    val pieces = model.map(_.getString(0)).toSet
    assert(pieces.contains("abab"), s"expected 'abab' in $pieces")
    // Coverage floor: every single char of the corpus alphabet survives,
    // even when a longer piece absorbs all its usage.
    assert(Set("a", "b", "c", "d").subsetOf(pieces))
    val byPiece = model.map(r => r.getString(0) -> r.getLong(1)).toMap
    // Greedy longest-match: "abab" is consumed as ONE piece per word
    // occurrence (2 words x 20 docs = 40), so chars a/b see zero usage.
    assert(byPiece("abab") == 40L)
    assert(byPiece("a") == 0L && byPiece("b") == 0L)
  }

  test("p_e6 is the exact integer grid of cnt/total") {
    val d = docs((1L to 5L).map(i => i -> "xy xy z"): _*)
    val model = Corpus.unigramTrain(d, maxPieceLen = 4, nCandidates = 4,
      keepPieces = 2, rounds = 2).collect()
    val total = model.map(_.getLong(1)).sum
    model.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) * 1000000L / total,
        s"p_e6 mismatch for ${r.getString(0)}")
    }
  }

  test("encode counts pieces per word type and is deterministic") {
    val d = docs(1L -> "abab abab", 2L -> "ab cd", 3L -> "zzzz")
    val e1 = Corpus.unigramEncode(d, maxPieceLen = 4, nCandidates = 8,
      keepPieces = 4, rounds = 2).orderBy("doc_id").collect()
    val e2 = Corpus.unigramEncode(d, maxPieceLen = 4, nCandidates = 8,
      keepPieces = 4, rounds = 2).orderBy("doc_id").collect()
    assert(e1.map(_.toString).toSeq == e2.map(_.toString).toSeq)
    e1.foreach { r =>
      // n_pieces never exceeds n_chars (chars are the floor) and every
      // word yields at least one piece.
      assert(r.getLong(3) <= r.getLong(2))
      assert(r.getLong(3) >= r.getLong(1))
    }
  }
}
