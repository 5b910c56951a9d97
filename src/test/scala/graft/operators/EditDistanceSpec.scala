package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the edit-distance dedup's two contracts: the length-bucket block
  * join is LOSSLESS for the banded definition (any pair within the length
  * band survives blocking — verified against a naive all-pairs sweep), and
  * the banded-Levenshtein verify matches exact Levenshtein on kept pairs.
  */
class EditDistanceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("blocking is lossless vs naive all-pairs within the length band") {
    // Texts straddling bucket boundaries (bucketWidth=32): lengths chosen
    // so pairs sit in the same bucket, adjacent buckets, and out of band.
    val base = "aaaa bbbb cccc dddd eeee ffff gggg hhhh" // 39 chars
    val d = docs(
      (1L, base),
      (2L, base + " x"),                       // 2 edits away, same region
      (3L, base + " " + base.take(24)),        // +25 chars: next bucket, in band? (Δ=25 > 16 → out)
      (4L, ("z" * 30) + " " + base),           // way longer, out of band
      (5L, base.replace("cccc", "ccdc")))      // 1 edit
    val got = Dedup.editDistancePairs(d)
      .select("d1", "d2").as[(Long, Long)].collect().toSet

    // Naive oracle: all pairs, same normalization/prefix/band/threshold.
    val n = d.select(col("doc_id"),
      substring(graft.functions.TextFunctions.normText(col("text")), 1, 120).as("p"),
      length(graft.functions.TextFunctions.normText(col("text"))).cast("long").as("ln"))
    val naive = n.as("a").crossJoin(n.as("b"))
      .where(col("a.doc_id") < col("b.doc_id") &&
        abs(col("a.ln") - col("b.ln")) <= 16 &&
        levenshtein(col("a.p"), col("b.p")) <= 12)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got.contains((1L, 2L)) && got.contains((1L, 5L)) && got.contains((2L, 5L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("PassJoin path: long docs (>=117-char prefix) pair across indel shifts") {
    // base is > 117 chars, so these route through the segment/window
    // (PassJoin) candidate path, not the short-pool fallback. The edits
    // include an INSERTION near the front — every later grid segment of
    // one side is shifted, so the match must come from a ±shift window.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val d = docs(
      (1L, base),
      (2L, "x " + base),                         // 2 inserts at front: global shift
      (3L, base.replace("sigma", "sigmb")),      // 1 substitution mid-string
      (4L, base.reverse))                        // same length, totally different
    val got = Dedup.editDistancePairs(d)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val n = d.select(col("doc_id"),
      substring(graft.functions.TextFunctions.normText(col("text")), 1, 120).as("p"),
      length(graft.functions.TextFunctions.normText(col("text"))).cast("long").as("ln"))
    val naive = n.as("a").crossJoin(n.as("b"))
      .where(col("a.doc_id") < col("b.doc_id") &&
        abs(col("a.ln") - col("b.ln")) <= 16 &&
        levenshtein(col("a.p"), col("b.p")) <= 12)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("banded levenshtein reports the exact distance on kept pairs") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumped over the lazy dog"))
    val rows = Dedup.editDistancePairs(d)
      .as[(Long, Long, Int)].collect().toSeq
    assert(rows == Seq((1L, 2L, 2))) // "jumps" -> "jumped" is exactly 2 edits
  }

  test("randomized: every in-threshold edited pair is found (pigeonhole holds)") {
    // Seeded random base strings (long enough for the PassJoin path) with
    // 1..12 random single-char edits applied — substitutions, inserts,
    // deletes at random positions. The pigeonhole theorem says EVERY such
    // pair must survive blocking; the verify then keeps those whose banded
    // distance is <= 12 (edits can also cancel, so we assert against the
    // naive all-pairs truth, not against the edit count).
    val rng = new scala.util.Random(1234)
    val alpha = "abcdefghij "
    def randStr(len: Int) = (1 to len).map(_ => alpha(rng.nextInt(alpha.length))).mkString
    def edit(s: String): String = {
      val i = rng.nextInt(s.length)
      rng.nextInt(3) match {
        case 0 => s.updated(i, alpha(rng.nextInt(alpha.length)))          // sub
        case 1 => s.substring(0, i) + alpha(rng.nextInt(alpha.length)) + s.substring(i) // ins
        case 2 => s.substring(0, i) + s.substring(i + 1)                  // del
      }
    }
    val rows = (0 until 20).flatMap { g =>
      val base = randStr(130 + rng.nextInt(100))
      val edited = (1 to (1 + rng.nextInt(12))).foldLeft(base)((s, _) => edit(s))
      Seq((g * 2L, base), (g * 2L + 1, edited))
    }
    val d = rows.toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(d)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val n = d.select(col("doc_id"),
      substring(graft.functions.TextFunctions.normText(col("text")), 1, 120).as("p"),
      length(graft.functions.TextFunctions.normText(col("text"))).cast("long").as("ln"))
    val naive = n.as("a").crossJoin(n.as("b"))
      .where(col("a.doc_id") < col("b.doc_id") &&
        abs(col("a.ln") - col("b.ln")) <= 16 &&
        levenshtein(col("a.p"), col("b.p")) <= 12)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(naive.size >= 15, s"sanity: most edited pairs should be in threshold, got ${naive.size}")
  }

  test("degenerate docs: empty, one-char, and identical shorts don't crash") {
    val d = docs(
      (1L, ""),
      (2L, "x"),
      (3L, "x"),
      (4L, "!!"), // normalizes to empty
      (5L, "completely different words entirely here"))
    val got = Dedup.editDistancePairs(d)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // Empty/1-char norms are within band+threshold of each other: the
    // short pool must still pair them (ed over tiny strings), never throw.
    assert(got.contains((2L, 3L))) // identical one-char docs
    assert(got.contains((1L, 4L))) // both normalize to empty: ed 0
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }
}
