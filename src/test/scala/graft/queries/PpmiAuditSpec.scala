package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}
import graft.functions.TextFunctions.tokens
import graft.sources.Tables

/** Behavioral pins for the round-11 closing additions: the PPMI in-row
  * pair generation must equal the positional self-join it replaces, and
  * the k-anonymity census must be internally consistent (risk mass
  * monotone in k, singleton accounting).
  */
class PpmiAuditSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("text_ppmi_topk: in-row pair expansion == positional self-join") {
    // The query generates directed window pairs (t[i], t[i+o]), o in 1..3,
    // via nested in-row transforms (never a positional self-join). Pin the
    // equivalence against the naive formulation: posexplode to (doc_id,
    // pos, tok), self-join on doc_id with 1 <= Δpos <= 3.
    val docs = Tables.documents(spark, sf)
      .where(length(trim(col("text"))) > 0)
      .limit(200)
      .select(monotonically_increasing_id().as("rid"), tokens(col("text")).as("t"))
      .localCheckpoint()

    val inRow = docs
      .select(explode(expr(
        "flatten(transform(t, (x, i) -> " +
          "transform(slice(t, i + 2, 3), y -> struct(x AS w, y AS c))))")).as("p"))
      .groupBy(col("p.w").as("w"), col("p.c").as("c"))
      .agg(count(lit(1)).as("n"))

    val positional = docs
      .select(col("rid"), posexplode(col("t")).as(Seq("pos", "tok")))
    val selfJoin = positional.as("a")
      .join(positional.as("b"),
        col("a.rid") === col("b.rid") &&
          col("b.pos") - col("a.pos") >= 1 && col("b.pos") - col("a.pos") <= 3)
      .groupBy(col("a.tok").as("w"), col("b.tok").as("c"))
      .agg(count(lit(1)).as("n"))

    assert(inRow.join(selfJoin, Seq("w", "c"), "full_outer")
      .where(inRow("n") =!= selfJoin("n")
        || inRow("n").isNull || selfJoin("n").isNull)
      .count() === 0L, "in-row window pairs must equal the positional self-join")
  }

  test("q_k_anonymity: risk mass is monotone in k and singletons are consistent") {
    val rows = SparkEntry.queries("q_k_anonymity")(spark, sf)
      .select("k", "n_groups", "groups_at_risk", "rows_at_risk",
        "singleton_user_groups", "min_group_n", "min_group_u")
      .collect()
      .sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq === Seq(2, 5, 10))
    // Same census on every row (k-independent columns identical).
    assert(rows.map(_.getLong(1)).distinct.length === 1)
    assert(rows.map(_.getLong(4)).distinct.length === 1)
    // A group smaller than k is also smaller than k' > k: both risk
    // counters are monotone non-decreasing in k.
    val gar = rows.map(_.getLong(2)).toSeq
    val rar = rows.map(_.getLong(3)).toSeq
    assert(gar === gar.sorted, s"groups_at_risk not monotone: $gar")
    assert(rar === rar.sorted, s"rows_at_risk not monotone: $rar")
    // Groups whose rows all carry one user have size >= 1; if any exist,
    // the k=2 sweep must see at least the size-1 ones among its at-risk
    // groups, and the floors must be coherent.
    val r0 = rows.head
    assert(r0.getLong(5) >= 1L && r0.getLong(6) >= 1L)
    if (r0.getLong(5) === 1L) // a size-1 group exists => it is at risk at k=2
      assert(r0.getLong(2) >= 1L)
  }
}
