package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the two tokenizer hot loops — the
  * expression rung of the extension ladder applied to the training folds
  * that the round-13 decomposition flagged as interpreted-HOF-bound
  * (guide §4: a higher-order `aggregate` lambda is evaluated through the
  * Catalyst interpreter per STEP; the unigram fold additionally re-split
  * its string accumulator twice per character).
  *
  * Both expressions replicate the SQL folds they replace EXACTLY — same
  * greedy control flow, same null semantics on the paths our data can
  * reach — so the DuckDB oracle (which replays the original fold as a
  * `list_reduce`) continues to hash-match. `TokenizerFoldsSpec` pins
  * native-vs-HOF equality on generated words plus the live corpus.
  */
object TokenizerFolds {

  /** Greedy longest-match segmentation of an ASCII word against per-length
    * vocab arrays — native replacement for `Corpus.greedyFoldExpr`.
    *
    * `children = w +: Seq(v2, …, vMaxLen)`: piece arrays for lengths
    * 2..maxLen in order (each a `sort_array(collect_list(...))` of the
    * pieces of exactly that length; only membership is used). At each
    * position the longest matching piece wins; single characters are the
    * always-available floor. Returns the pieces as array<string> (the
    * original fold's trim+split, without materializing the accumulator
    * string). Null/empty word ⇒ empty array (unreachable via
    * regexp_extract_all('[a-z]+') inputs, defined for safety).
    */
  case class GreedySegment(children: Seq[Expression])
      extends Expression with CodegenFallback {

    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = children.nonEmpty && children.head.dataType == StringType &&
        children.tail.forall(_.dataType match {
          case ArrayType(StringType, _) => true
          case _                        => false
        })
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "greedy_segment expects (word string, v2 array<string>, ..., " +
          s"vN array<string>), got ${children.map(_.dataType.simpleString)}")
    }

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = false

    override def eval(input: InternalRow): Any = {
      val w = children.head.eval(input).asInstanceOf[UTF8String]
      if (w == null) return new GenericArrayData(Array.empty[Any])
      val bytes = w.getBytes // ASCII by construction ([a-z]+ words)
      val n = bytes.length
      val maxLen = children.length // 1 word arg + (maxLen-1) arrays = lengths 2..maxLen
      // Piece tables for lengths 2..maxLen (index l-2); a null array (no
      // 1-row vocab aggregate can produce one, but stay safe) = no pieces.
      val tables = new Array[ArrayData](maxLen - 1)
      var t = 0
      while (t < maxLen - 1) {
        tables(t) = children(t + 1).eval(input).asInstanceOf[ArrayData]
        t += 1
      }
      val out = new java.util.ArrayList[Any](n)
      var pos = 0 // 0-based; the SQL fold is 1-based
      while (pos < n) {
        var matched = -1
        var l = maxLen
        while (l >= 2 && matched < 0) {
          if (n - pos >= l) {
            val tab = tables(l - 2)
            if (tab != null) {
              val m = tab.numElements()
              var i = 0
              while (i < m && matched < 0) {
                if (!tab.isNullAt(i)) {
                  val p = tab.getUTF8String(i)
                  if (p.numBytes() == l && matchesAt(bytes, pos, p)) matched = l
                }
                i += 1
              }
            }
          }
          l -= 1
        }
        val take = if (matched > 0) matched else 1
        out.add(UTF8String.fromBytes(bytes, pos, take))
        pos += take
      }
      new GenericArrayData(out.toArray)
    }

    private def matchesAt(bytes: Array[Byte], pos: Int, p: UTF8String): Boolean = {
      val pb = p.getBytes
      var i = 0
      while (i < pb.length) {
        if (bytes(pos + i) != pb(i)) return false
        i += 1
      }
      true
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): GreedySegment =
      copy(children = newChildren)

    override def prettyName: String = "greedy_segment"
  }

  /** Greedy left-to-right non-overlapping BPE merge rewrite — native
    * replacement for the `aggregate(syms, [], (acc, x) -> CASE WHEN
    * last(acc) = a AND x = b THEN replace-last ELSE append END)` fold:
    * walk the symbol array once, merging each adjacent (a, b) into a||b;
    * a freshly merged token can never re-match `a` (it is longer), which
    * is the same non-overlap guarantee the SQL fold encodes.
    *
    * Null semantics match the SQL CASE: a null element never matches
    * (NULL = x is not TRUE) and is appended as-is; null a/b (impossible
    * from a 1-row argmax) merge nothing. Null syms ⇒ null, like
    * aggregate(). */
  case class BpeMergeFold(child: Expression, mergeA: Expression,
                          mergeB: Expression)
      extends Expression with CodegenFallback {

    override def children: Seq[Expression] = Seq(child, mergeA, mergeB)

    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = (child.dataType match {
        case ArrayType(StringType, _) => true
        case _                        => false
      }) && mergeA.dataType == StringType && mergeB.dataType == StringType
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "bpe_merge_fold expects (syms array<string>, a string, b string), " +
          s"got ${children.map(_.dataType.simpleString)}")
    }

    override def dataType: DataType = ArrayType(StringType, containsNull = true)
    override def nullable: Boolean = child.nullable

    override def eval(input: InternalRow): Any = {
      val arr = child.eval(input).asInstanceOf[ArrayData]
      if (arr == null) return null
      val a = mergeA.eval(input).asInstanceOf[UTF8String]
      val b = mergeB.eval(input).asInstanceOf[UTF8String]
      val n = arr.numElements()
      val out = new java.util.ArrayList[Any](n)
      var i = 0
      while (i < n) {
        val x = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
        val last =
          if (out.isEmpty) null else out.get(out.size - 1).asInstanceOf[UTF8String]
        if (last != null && a != null && b != null && x != null &&
            last.equals(a) && x.equals(b)) {
          out.set(out.size - 1, UTF8String.concat(a, b))
        } else {
          out.add(x)
        }
        i += 1
      }
      new GenericArrayData(out.toArray)
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): BpeMergeFold =
      copy(child = newChildren(0), mergeA = newChildren(1),
        mergeB = newChildren(2))

    override def prettyName: String = "bpe_merge_fold"
  }
}
