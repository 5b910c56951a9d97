package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths, per the scale plan:
  *  - [[bruteForceTopK]]: exact cosine top-k — the query side is broadcast
  *    (it is tiny), candidates stream through in one pass: correct baseline
  *    at any scale where queries fit in memory, O(|queries|·n) work.
  *  - [[lshBucketTopK]]: sign-bucket (random-hyperplane) LSH — candidates
  *    are equi-joined on the bucket key, so the pair space collapses from
  *    n² to per-bucket; the 100-TB shape (bucket = shuffle/partition key).
  *    An IVF variant would swap the bucket fn for nearest-centroid; the
  *    plumbing is identical.
  *
  * Ranking is deterministic: order by rounded cosine desc, then vec_id —
  * ties cannot reorder across engines.
  */
object Similarity {

  /** Data-size-derived sign-LSH width: the smallest `bits` whose 2^bits
    * buckets hold ≤ `targetBucketRows` vectors each in expectation, so the
    * per-bucket candidate-pair space (~bucketRows²/2) stays bounded as the
    * corpus grows — pair cost halves per added bit (measured sweep in
    * PERF.md) while multi-probe recovers the recall the narrower buckets
    * would lose. Clamped to [2, 24] (4 buckets minimum; 16M buckets is
    * past any realistic executor count).
    */
  def lshBitsFor(nRows: Long, targetBucketRows: Long = 32): Int = {
    val raw = math.ceil(math.log(math.max(1L, nRows).toDouble / targetBucketRows)
      / math.log(2)).toInt
    math.max(2, math.min(24, raw))
  }

  /** Resolve an explicit bits parameter: 0 = derive from the corpus size
    * (one count — metadata-cheap on parquet sources). */
  private def resolveBits(emb: DataFrame, bucketBits: Int): Int =
    if (bucketBits > 0) bucketBits else lshBitsFor(emb.count())

  private def prep(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v"))) // once per vector, not per pair

  /** Deterministic rank-and-keep over scored (qid, nid, cosine) rows. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("cosine"))
  }

  /** Exact top-k neighbors (by cosine) for each query vector. */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = prep(queries).select(col("vec_id").as("qid"), col("v").as("qv"),
      col("nrm").as("qn"))
    val c = prep(emb)
    val scored = c.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cosine"))
    rankTopK(scored, k)
  }

  /** The query bucket plus every bucket at Hamming distance 1 (one sign
    * plane flipped) — multi-probe LSH's probe set. Vectors near a
    * hyperplane land on either side; probing the flipped buckets recovers
    * them at bits+1 × the candidate cost instead of halving the bits. */
  def multiProbeBuckets(bucket: Column, bits: Int): Column =
    array(bucket +: (1 to bits).map { i =>
      val flipped = when(substring(bucket, i, 1) === "1", "0").otherwise("1")
      concat(substring(bucket, 1, i - 1), flipped,
        substring(bucket, i + 1, bits - i))
    }: _*)

  /** Multi-probe LSH top-k: like [[lshBucketTopK]] but each query fans out
    * to its bucket and all 1-bit neighbors before scoring. */
  def lshMultiProbeTopK(emb: DataFrame, queries: DataFrame, k: Int,
                        bucketBits: Int = 0): DataFrame = {
    val bits = resolveBits(emb, bucketBits)
    val q = prep(queries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        explode(multiProbeBuckets(signBucket(col("v"), bits), bits))
          .as("bucket"))
    val c = prep(emb)
      .withColumn("bucket", signBucket(col("v"), bits))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cosine"))
      .distinct() // a candidate can only match one bucket, but stay safe
    rankTopK(scored, k)
  }

  /** Fixed-iteration, seeded Lloyd k-means over the embedding column —
    * the IVF centroid trainer. Deterministic and oracle-replayable by
    * construction: seeds are the first `nCells` vectors by id, each
    * iteration's assignment ranks the codegen'd left-to-right
    * [[graft.plans.L2Dist2]] distance rounded to a 6-dp grid with a
    * centroid-id tie-break, and new centroid components are per-dimension
    * means rounded onto the same grid — so a DuckDB replay of the same
    * arithmetic reproduces every assignment bit-for-bit.
    *
    * Scale shape: the canonical distributed k-means — per-iteration work is
    * one broadcast of k·d doubles, one codegen'd assignment pass over the
    * vectors, and one partial-aggregated per-(cell, dim) mean; nothing
    * driver-side grows with n. `localCheckpoint` bounds plan depth across
    * iterations (fixed, small count).
    */
  def trainIvfCentroids(emb: DataFrame, nCells: Int, iters: Int): DataFrame = {
    // Trained-model reuse: k-means is a BUILD step, not a query step — a
    // production IVF index trains once and serves many probes. Training is
    // deterministic (seeded, fixed iterations, grid-rounded), so replaying
    // it per invocation only re-derives the identical k·d-double table;
    // cache it keyed by a content fingerprint (one cheap aggregate pass —
    // order-insensitive xor of per-row hashes — vs `iters` full k-means
    // passes) + hyperparameters. The payload is tiny (nCells × dim
    // doubles) and lives on the driver, exactly like a broadcast model
    // artifact.
    val fp = emb.select(xxhash64(col("vec_id"), col("embedding")).as("h"))
      .agg(expr("bit_xor(h)").as("x"), count(lit(1)).as("n")).first()
    val key = s"${fp.getLong(0)}|${fp.getLong(1)}|$nCells|$iters"
    val spark = emb.sparkSession
    val cached = trainedCentroids.get(key)
    if (cached != null) {
      import scala.jdk.CollectionConverters._
      return spark.createDataFrame(cached.toSeq.asJava, centroidSchema)
    }
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    var cents = e.filter(col("vec_id") < nCells)
      .select(col("vec_id").cast("long").as("cid"), col("v").as("cv"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("dist", round(dist2(col("v"), col("cv")), 6))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("cid"))
      cents = assigned.join(e, "vec_id")
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "val")))
        .groupBy(col("cid"), col("pos"))
        .agg(round(avg(col("val")), 6).as("val"))
        .groupBy(col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, val))), s -> s.val)")
          .as("cv"))
        .localCheckpoint()
    }
    trainedCentroids.put(key, cents.collect())
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(trainedCentroids.get(key).toSeq.asJava, centroidSchema)
  }

  /** PQ codebook training — the same seeded, grid-rounded Lloyd as
    * [[trainIvfCentroids]] run once per subspace (`sub` is just another
    * grouping key), with the same content-fingerprint cache: codebooks are
    * a BUILD artifact (m·nCodes·(d/m) doubles, driver-resident like a
    * broadcast model), trained once and served to every subsequent probe.
    * Deterministic, so a cache miss only re-derives the identical table. */
  private def trainPqCodebooks(emb: DataFrame, sv: DataFrame, m: Int,
                               nCodes: Int, iters: Int): DataFrame = {
    val fp = emb.select(xxhash64(col("vec_id"), col("embedding")).as("h"))
      .agg(expr("bit_xor(h)").as("x"), count(lit(1)).as("n")).first()
    val key = s"pq|${fp.getLong(0)}|${fp.getLong(1)}|$m|$nCodes|$iters"
    val spark = emb.sparkSession
    val cached = trainedCentroids.get(key)
    if (cached != null) {
      import scala.jdk.CollectionConverters._
      return spark.createDataFrame(cached.toSeq.asJava, pqCodebookSchema)
    }
    var cents = sv.where(col("vec_id") < nCodes)
      .select(col("sub"), col("vec_id").cast("long").as("cid"), col("sv").as("cv"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val a = sv.join(broadcast(cents), "sub")
        .withColumn("dist", round(dist2(col("sv"), col("cv")), 6))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("vec_id"), col("sub"))
            .orderBy(col("dist"), col("cid"))))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("sub"), col("cid"))
      cents = a.join(sv, Seq("vec_id", "sub"))
        .select(col("sub"), col("cid"), posexplode(col("sv")).as(Seq("pos", "val")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(round(avg(col("val")), 6).as("val"))
        .groupBy(col("sub"), col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, val))), s -> s.val)")
          .as("cv"))
        .localCheckpoint()
    }
    trainedCentroids.put(key, cents.select(col("sub"), col("cid"), col("cv")).collect())
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(trainedCentroids.get(key).toSeq.asJava, pqCodebookSchema)
  }

  private val pqCodebookSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("sub",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("cid",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("cv",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType), nullable = false)))

  private val centroidSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("cid",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("cv",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType), nullable = false)))

  /** Trained-model cache: bounded LRU (a JVM serves a handful of live IVF
    * indexes, not an unbounded history), keyed by a CONTENT fingerprint —
    * not the plan string — so re-written files at the same path can never
    * serve stale centroids. */
  private val MaxCachedModels = 8
  private val trainedCentroids: java.util.Map[String, Array[org.apache.spark.sql.Row]] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Array[org.apache.spark.sql.Row]](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[org.apache.spark.sql.Row]]): Boolean =
          size() > MaxCachedModels
      })

  /** IVF (inverted-file) top-k: vectors are assigned to their nearest
    * centroid's cell; a query probes only its `nProbe` nearest cells. The
    * cell id is the shuffle key — the IVF counterpart of [[lshBucketTopK]]'s
    * sign bucket, with better-balanced cells on clustered data.
    *
    * `trainIters` > 0 k-means-trains the centroids ([[trainIvfCentroids]]);
    * 0 keeps the untrained first-`nCells` seeds (the plumbing baseline).
    * Assignment distance is the rounded [[graft.plans.L2Dist2]] with a cid
    * tie-break in both modes, so the DuckDB oracle replays it exactly.
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int, nCells: Int = 16,
              nProbe: Int = 2, trainIters: Int = 0): DataFrame = {
    val n = prep(emb)
    val cents =
      if (trainIters > 0) trainIvfCentroids(emb, nCells, trainIters)
      else n.select(col("vec_id").cast("long").as("cid"), col("v").as("cv"))
        .filter(col("cid") < nCells)
    def cellRank(vs: DataFrame) = vs.crossJoin(broadcast(cents))
      .withColumn("dist", round(dist2(col("v"), col("cv")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))))
    val cells = cellRank(n).where(col("rn") === 1)
      .select(col("vec_id").as("nid"), col("cid"), col("v").as("nv"),
        col("nrm").as("nn"))
    val probes = cellRank(n.join(queries.select(col("vec_id")), "vec_id"))
      .where(col("rn") <= nProbe)
      .select(col("vec_id").as("qid"), col("cid"), col("v").as("qv"),
        col("nrm").as("qn"))
    val scored = probes.join(cells, "cid")
      .where(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6).as("cosine"))
    rankTopK(scored, k)
  }

  /** Product-quantization (PQ) top-k with asymmetric distance (ADC) — the
    * memory-compression path for 100-TB vector corpora: each vector is
    * stored as `m` codebook ids (64 float dims → 8 bytes at m=8/nCodes=16,
    * a 32× compression), and query-to-vector distance is approximated as
    * the sum of per-subspace query-to-centroid distances, i.e. `m` table
    * lookups instead of a full d-dim kernel.
    *
    * Training is the same seeded, grid-rounded Lloyd as
    * [[trainIvfCentroids]], run once per subspace — the subspace index is
    * just another grouping key, so one codebook DataFrame (m·nCodes rows,
    * tiny, broadcast) carries all `m` codebooks and the DuckDB oracle
    * replays the whole build bit-for-bit. Scale shape: codes are built in
    * one assignment pass and repartitioned by vector id so ADC scoring
    * combines the m per-subspace partial sums map-side; the per-query
    * distance table (|q|·m·nCodes rows) is broadcast.
    */
  def pqTopK(emb: DataFrame, queries: DataFrame, k: Int, m: Int = 8,
             nCodes: Int = 16, iters: Int = 2): DataFrame = {
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val subLen = (size(col("v")) / m).cast("int")
    val sv = e.select(col("vec_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("v"))
      .select(col("vec_id"), col("sub"),
        slice(col("v"), col("sub") * subLen + 1, subLen).as("sv"))
    val cents = trainPqCodebooks(emb, sv, m, nCodes, iters)
    // Distance of every subvector to every centroid of its subspace, with
    // the nearest-code rank (rounded dist + cid tie-break, as in IVF).
    def assign(rows: DataFrame) = rows.join(broadcast(cents), "sub")
      .withColumn("dist", round(dist2(col("sv"), col("cv")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"), col("sub"))
          .orderBy(col("dist"), col("cid"))))
    val asg = assign(sv)
    // The PQ index: m small ints per vector — the only per-vector state ADC
    // reads. Repartitioned by id so the final sum combines map-side.
    val codes = asg.where(col("rn") === 1)
      .select(col("vec_id").as("nid"), col("sub"), col("cid"))
      .repartition(col("nid"))
    // Per-query ADC table: distance from each query subvector to every code.
    val dtab = assign(sv.join(queries.select(col("vec_id")), "vec_id"))
      .select(col("vec_id").as("qid"), col("sub"), col("cid"), col("dist").as("d"))
    val scored = codes.join(broadcast(dtab), Seq("sub", "cid"))
      .where(col("nid") =!= col("qid"))
      .groupBy(col("qid"), col("nid"))
      // Sum of m grid-rounded doubles: true value is ON the 1e-6 grid, FP
      // error << half-grid, so round(6) is engine-portable.
      .agg(round(sum(col("d")), 6).as("adist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adist"), col("nid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("adist"))
  }

  /** PQ shortlist + exact re-rank — how PQ is actually served: the
    * compressed ADC pass produces a `shortlist`-deep candidate set (cheap,
    * reads only the 8-byte codes), then ONLY those candidates' full
    * vectors are fetched and exactly re-scored. The candidate set is tiny
    * (|q|·shortlist ids), so it is broadcast against the full vector table
    * — the 100-TB side is never shuffled. Measured on the uniform-random
    * sf0.01 corpus (the adversarial case for any quantizer): shortlist=50
    * of n=500 recovers 25/30 of the exact top-3 vs 7/30 for pure ADC
    * ranking (PERF.md). */
  def pqRerankTopK(emb: DataFrame, queries: DataFrame, k: Int, shortlist: Int,
                   m: Int = 8, nCodes: Int = 16, iters: Int = 2): DataFrame = {
    val cand = pqTopK(emb, queries, shortlist, m, nCodes, iters)
      .select(col("qid"), col("nid"))
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = e.join(queries.select(col("vec_id")), "vec_id")
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = broadcast(cand.join(broadcast(q), "qid"))
      .join(e.select(col("vec_id").as("nid"), col("v").as("nv")), "nid")
      .select(col("qid"), col("nid"),
        round(dist2(col("qv"), col("nv")), 6).as("dist"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("nid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("dist"))
  }

  /** LSH-bucketed top-k: only candidates sharing the query's sign bucket are
    * scored. Recall < 1 by construction; bucketBits trades recall for cost. */
  def lshBucketTopK(emb: DataFrame, queries: DataFrame, k: Int,
                    bucketBits: Int = 0): DataFrame = {
    val bits = resolveBits(emb, bucketBits)
    val q = prep(queries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"),
        signBucket(col("v"), bits).as("bucket"))
    val c = prep(emb)
      .withColumn("bucket", signBucket(col("v"), bits))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cosine"))
    rankTopK(scored, k)
  }
}
