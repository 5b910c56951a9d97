package graft.queries

import org.apache.spark.sql.SparkSession

/** Per-query LOCAL execution profile.
  *
  * AQE executes every query stage as its own job to re-plan between
  * stages; at the bench's tiny scale that per-stage materialization
  * (~25–40 ms/job, ~4.9 jobs/query sweep-wide — PERF.md round 13/15) IS
  * the cost of the sub-half-second tail, while the re-planning buys
  * nothing on plans that are static and k-bounded (broadcast-only joins,
  * single-digit-row artifact serves, pinned sketch reads). For the
  * queries listed here, a measured full-sweep A/B (PERF.md round 16)
  * showed AQE-off strictly faster with identical oracle results, so the
  * drivers ([[graft.Bench]], [[graft.Verify]]) run them with
  * `spark.sql.adaptive.enabled=false`.
  *
  * SCALE HONESTY: this is a property of (query, data scale), not of the
  * query alone — the production session ([[graft.GraftSession]]) keeps
  * AQE ON unconditionally, because at cluster scale the same shapes grow
  * real exchanges where coalescing/skew handling is load-bearing. The
  * profile is the local analog of a workload manager pinning execution
  * properties per recurring query, re-measured when the data moves.
  * Queries where the A/B showed AQE load-bearing (or any stream topology)
  * are deliberately absent.
  */
object QueryTuning {

  /** Queries two full-sweep draws agreed are faster without AQE
    * (PERF.md round 16): candidates from a global on/off A/B (≥ 10% and
    * ≥ 20 ms win, off-draw warmer so the bias is AGAINST finding wins),
    * kept only if a mixed-profile confirmation draw still showed them at
    * or under its uniform host-heat ratio. Candidates the confirmation
    * could not reproduce (the ANN serve family, containment, sketch
    * difference) were reverted per the "AQE might be load-bearing" rule.
    * All survivors are static single-exchange or exchange-free plans AQE
    * can only re-materialize, never improve. */
  val noAqe: Set[String] = Set(
    "q_replay_agg_pushdown", "text_cdc_chunks", "dedup_char_jaccard",
    "q_triangle_count", "q_session_window", "sim_fusion_lift",
    "q_xml_source", "pipeline_span_corruption")

  /** Round-17 default: OFF. The profile is a local[32]-only measurement
    * aid (per-query config fork in the harness, not an engine
    * optimization), so the DEFAULT bench/verify path now times the
    * production configuration — draws are comparable across rounds with
    * no forks. Opt back in for local tail-profiling only via
    * `SPARK_GRAFT_LOCAL_PROFILE=1`. Measured cost of retiring it:
    * ~+0.5–0.8 s of ~110 s (round-16 A/B), accepted. */
  private lazy val enabled: Boolean =
    sys.env.get("SPARK_GRAFT_LOCAL_PROFILE").contains("1")

  /** Run `body` under `name`'s profile, restoring session conf after. */
  def withProfile[T](spark: SparkSession, name: String)(body: => T): T =
    if (!enabled || !noAqe.contains(name)) body
    else {
      val key = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "false")
      try body finally spark.conf.set(key, prev)
    }
}
