package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Min-label propagation must collapse chained duplicate pairs into one
  * component — the case the naive drop-id_b rule gets wrong. */
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
}
