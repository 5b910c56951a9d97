package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Connected components must collapse chained duplicate pairs into one
  * component — the case the naive drop-id_b rule gets wrong — and must do
  * it in rounds logarithmic in the chain length (large-star/small-star),
  * not proportional to it (min-label propagation). */
class ConnectedComponentsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("chained pairs collapse to one component; disjoint pairs stay apart") {
    // 1~2, 2~3, 3~4 form one cluster {1,2,3,4}; 10~11 another; 20~21 a third.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comp(_) == 1L))
    assert(comp(10L) == 10L && comp(11L) == 10L)
    assert(comp(20L) == 20L && comp(21L) == 20L)
  }

  test("a long path converges within the iteration budget") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(comp.values.toSet == Set(1L))
  }

  test("a 500-node chain resolves in O(log n) rounds, not O(diameter)") {
    // Min-label propagation needs ~499 rounds here; large-star/small-star
    // must finish inside a 12-round budget.
    val pairs = (1L until 500L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs, maxIters = 12)
      .as[(Long, Long)].collect().toMap
    assert(comp.size == 500)
    assert(comp.values.toSet == Set(1L))
  }

  test("self-pairs and reversed duplicate edges are harmless") {
    val pairs = Seq((5L, 5L), (2L, 1L), (1L, 2L), (3L, 2L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(comp(5L) == 5L)
    assert(Seq(1L, 2L, 3L).forall(comp(_) == 1L))
  }
}
