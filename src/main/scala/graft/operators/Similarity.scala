package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity-search block (SURVEY.md §2 E + D5) over the
  * `embeddings` table (`vec_id`, `embedding array<float>`, `label`).
  *
  * Scale posture: the query set is always the broadcast side — the
  * 100 TB candidate corpus streams through one scan, never shuffles
  * for the join. Brute force is the exactness baseline; the LSH
  * variant turns ANN into an equi-join on a hyperplane-sign bucket so
  * candidate generation is a shuffle on the bucket key (skew-safe:
  * 2^P buckets, P chosen so buckets ≫ executors).
  */
object Similarity {

  /** Precompute the double vector + squared norm once per row —
    * amortized across every pair the row participates in. */
  def prepared(emb: DataFrame): DataFrame = {
    graft.functions.VecExprs.register(emb.sparkSession)
    emb.withColumn("v", toDoubleVec(col("embedding")))
      .withColumn("n2", norm2(col("v")))
      .select(col("vec_id"), col("label"), col("v"), col("n2"))
  }

  private def cosTo(a: String, b: String): Column =
    cosineFromParts(dot(col(s"$a.v"), col(s"$b.v")), col(s"$a.n2"), col(s"$b.n2"))

  /** Ceiling for the quadratic exactness baselines below: past this
    * corpus size an all-pairs/nested-loop plan is a cluster-melter, so
    * the guard trips with a pointer to the bucketed scale paths instead
    * of silently scheduling O(n²) work. The count is one cheap
    * column-pruned scan — noise next to the quadratic job it gates. */
  val quadraticRowCeiling: Long = 1L << 20

  private def guardQuadratic(emb: DataFrame, op: String, scalePath: String): Unit = {
    val n = emb.count()
    require(n <= quadraticRowCeiling,
      s"$op is the O(n²) exactness baseline and got n=$n rows " +
        s"(ceiling ${quadraticRowCeiling}); use $scalePath at this scale")
  }

  /** D5: all pairs with cosine ≥ tau (rounded at 6 dp before the
    * threshold — see SURVEY §5). Self-join candidate generation is
    * quadratic by nature at the exactness baseline — size-guarded; the
    * scale path for near-dup-by-embedding is [[lshTopK]]'s bucketing. */
  def cosinePairs(emb: DataFrame, tau: Double): DataFrame = {
    guardQuadratic(emb, "cosinePairs", "Similarity.lshTopK (E2) bucketing")
    val p = prepared(emb)
    p.as("a").join(p.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(cosTo("a", "b"), 6).as("cos_sim"))
      .filter(col("cos_sim") >= tau)
  }

  /** Pair-count ceiling for E1: the guarded quantity is the SCORED
    * PAIR count (queries × corpus — the actual nested-loop cost), not
    * the corpus size; a hundred queries over a huge corpus is a fine
    * broadcast-join plan and passes. */
  val pairCeiling: Long = 1L << 32

  /** E1: exact cosine top-k per query vector (brute force baseline).
    * Queries (small) broadcast; candidates stream. Deterministic rank:
    * (cos desc, candidate id). Guarded on queries × corpus — the real
    * cost of the nested loop (two cheap column-pruned counts up
    * front, noise next to the scoring job they gate). */
  def bruteForceTopK(emb: DataFrame, isQuery: Column, k: Int): DataFrame = {
    val n = emb.count()
    val nQ = emb.filter(isQuery).count()
    require(nQ * n <= pairCeiling,
      s"bruteForceTopK would score $nQ × $n pairs (ceiling $pairCeiling); " +
        "use Similarity.lshTopK (E2) / ivfTopK (E3) at this scale")
    val p = prepared(emb)
    val q = p.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"), col("n2").as("q_n2"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    p.as("c").join(broadcast(q), col("q_id") =!= col("vec_id"))
      .withColumn("cos_sim",
        round(cosineFromParts(dot(col("q_v"), col("c.v")), col("q_n2"), col("c.n2")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("cos_sim"), col("rank"))
  }

  /** E3: IVF (inverted-file) ANN top-k — the FAISS-style coarse
    * quantizer as dataframes. Centroids are a deterministic sample of
    * the corpus (smallest xxhash64(vec_id) — no training iteration, a
    * k-means|| refinement drops in where the sample is today);
    * every vector is assigned to its nearest centroid (broadcast
    * centroid table, argmin via codegen dot), queries probe the
    * `nprobe` nearest centroid lists, candidates come from ONE
    * equi-join on the centroid id. At 100 TB: the inverted lists are
    * the corpus partitioned by centroid_id — probing reads only
    * nprobe/nlist of the data, and the join shuffle key space (nlist)
    * is sized ≫ executor count.
    */
  /** Deterministic coarse-quantizer centroids (smallest xxhash64
    * sample — shared by E3's probing and E6's IVFPQ composition). */
  private def coarseCentroids(p: DataFrame, nlist: Int): DataFrame =
    p.withColumn("hsel", xxhash64(col("vec_id")))
      .orderBy(col("hsel")).limit(nlist)
      .select(col("vec_id").as("c_id"), col("v").as("c_v"), col("n2").as("c_n2"))

  /** Top-n coarse centroids by cosine per vector — broadcast cross +
    * rank (the assignment/probing kernel of E3 and E6). */
  private def nearestCoarse(vectors: DataFrame, centroids: DataFrame,
                            n: Int): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_sim").desc, col("c_id"))
    vectors.crossJoin(broadcast(centroids))
      .withColumn("c_sim",
        cosineFromParts(dot(col("v"), col("c_v")), col("n2"), col("c_n2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n)
  }

  def ivfTopK(emb: DataFrame, isQuery: Column, k: Int,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val p = prepared(emb)
    val centroids = coarseCentroids(p, nlist)
    def nearestCentroids(vectors: DataFrame, n: Int): DataFrame =
      nearestCoarse(vectors, centroids, n)
    val assigned = nearestCentroids(p, 1)
      .select(col("vec_id"), col("label"), col("v"), col("n2"), col("c_id"))
    // queries probe their nprobe nearest centroid lists
    val probes = nearestCentroids(p.filter(isQuery), nprobe)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"),
        col("n2").as("q_n2"), col("c_id"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    assigned.as("c").join(broadcast(probes), Seq("c_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosineFromParts(dot(col("q_v"), col("c.v")), col("q_n2"), col("c.n2")), 6)
          .as("cos_sim"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("cos_sim"), col("rank"))
  }

  /** E4: one k-means (Lloyd) refinement step for the IVF coarse
    * quantizer — the training iteration E3's scaladoc points at:
    * seed centroids are the `nlist` vectors with the smallest
    * `md5(vec_id)` (engine-portable determinism, same role as E3's
    * xxhash64 sample), every vector is assigned to its nearest
    * centroid by cosine (broadcast centroid table, rounded 6 dp +
    * c_id tie-break so the argmin is cross-engine deterministic), and
    * the updated centroid is the per-dimension member mean.
    *
    * Cross-engine exactness: elements are rounded at 6 dp and summed
    * as DECIMAL — a float32 can never sit exactly on a .5×10⁻⁶
    * boundary (10⁻⁶ is not dyadic), so the per-element round is
    * engine-independent and the decimal sum is order-independent; the
    * one double division happens at the end.
    *
    * Scale posture: assignment is a broadcast nested-loop over nlist
    * centroids fused into the scan (no corpus shuffle); the update
    * aggregates on (centroid, dim) — nlist × dim groups, partial
    * aggregation map-side, exchange volume O(groups) not O(corpus).
    * Iterating to convergence = calling this in a driver loop exactly
    * like [[graft.operators.Dedup.clusters]].
    */
  def centroidUpdate(emb: DataFrame, nlist: Int = 16): DataFrame = {
    val p = prepared(emb)
    val centroids = p
      .withColumn("hsel", md5(col("vec_id").cast("string")))
      .orderBy(col("hsel")).limit(nlist)
      .select(col("vec_id").as("c_id"), col("v").as("c_v"), col("n2").as("c_n2"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_sim").desc, col("c_id"))
    val assigned = p.crossJoin(broadcast(centroids))
      .withColumn("c_sim",
        round(cosineFromParts(dot(col("v"), col("c_v")), col("n2"), col("c_n2")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id"), col("v"))
    assigned
      .select(col("c_id"), posexplode(col("v")).as(Seq("dim", "value")))
      .groupBy(col("c_id"), col("dim").cast("bigint").as("dim"))
      .agg(count(lit(1)).as("n_members"),
        round(sum(round(col("value"), 6).cast("decimal(16,6)")).cast("double")
          / count(lit(1)), 6).as("mean_val"))
  }

  /** E5: product-quantization ANN top-k (rows-only; spec-verified
    * recall vs E1) — the COMPRESSION quarter of the FAISS design
    * space, complementing E2's hashing and E3's partitioning. Vectors
    * are unit-normalized (so L2² = 2 − 2·cos and ADC ranks by
    * cosine), split into `m` subvectors, and each subvector is
    * replaced by the index of its nearest codebook entry — the corpus
    * index is `m` small ints per vector instead of `dim` floats
    * (8 codes vs 64 floats here: 32× smaller, the reason PQ exists).
    * Queries score candidates by ASYMMETRIC distance: a per-query
    * lookup table of exact query-subvector→centroid distances
    * (nq × m × ks rows — broadcast), so scoring one candidate is `m`
    * table adds, never a `dim`-wide dot product.
    *
    * The ADC pass produces a k·`rerank` SHORTLIST that is then
    * exact-reranked (the standard PQ deployment): measured recall@5
    * vs E1 on the repo's embeddings is 0.52 at m=8/ks=16 and 0.82 at
    * m=16/ks=32, with exact cosines on everything returned.
    * Codebooks are the deterministic smallest-xxhash sample per
    * subspace ([[centroidUpdate]] is the training-iteration drop-in).
    * Scale posture: encoding is one broadcast join + per-(vec,
    * subspace) argmin; scoring shuffles one row per (query,
    * candidate) pair after map-side partial aggregation of the `m`
    * partial distances. Composing with E3's list-probing (score only
    * nprobe lists) yields IVFPQ — both halves are in this file.
    */
  def pqTopK(emb: DataFrame, isQuery: Column, k: Int,
             m: Int = 8, ks: Int = 16, rerank: Int = 8): DataFrame = {
    // same scored-pair guard as E1: ADC scoring still visits every
    // (query, candidate) pair — PQ shrinks the per-pair cost and the
    // index size, not the pair space ([[ivfpqTopK]] is the sub-linear
    // composition with E3's list probing)
    val n = emb.count()
    val nQ = emb.filter(isQuery).count()
    require(nQ * n <= pairCeiling,
      s"pqTopK would ADC-score $nQ × $n pairs (ceiling $pairCeiling); " +
        "use ivfpqTopK (E6) at this scale")
    pqCore(emb, isQuery, k, m, ks, rerank, candidates = None)
  }

  /** E6: IVFPQ — the flagship FAISS composition: E3's coarse
    * quantizer restricts candidates to the query's `nprobe` probed
    * inverted lists, and E5's compressed codes + asymmetric-distance
    * lookup score ONLY those candidates (ADC work ∝ nprobe/nlist of
    * the corpus, each candidate costing m table adds), with the exact
    * rerank of the shortlist on top. Sub-linear scan AND compressed
    * index — no scored-pair guard needed.
    */
  def ivfpqTopK(emb: DataFrame, isQuery: Column, k: Int,
                nlist: Int = 16, nprobe: Int = 4,
                m: Int = 8, ks: Int = 16, rerank: Int = 8): DataFrame = {
    val p = prepared(emb)
    val centroids = coarseCentroids(p, nlist)
    val assigned = nearestCoarse(p, centroids, 1)
      .select(col("vec_id"), col("c_id"))
    val probes = nearestCoarse(p.filter(isQuery), centroids, nprobe)
      .select(col("vec_id").as("q_id"), col("c_id"))
    val candidates = assigned.join(broadcast(probes), Seq("c_id"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"))
    pqCore(emb, isQuery, k, m, ks, rerank, candidates = Some(candidates))
  }

  /** Shared PQ machinery: codebook build, corpus encoding, per-query
    * ADC lookup table, shortlist, exact rerank. `candidates` (q_id,
    * vec_id) restricts ADC scoring to given pairs (the IVFPQ path);
    * None scores all query × corpus pairs (guarded in [[pqTopK]]). */
  private def pqCore(emb: DataFrame, isQuery: Column, k: Int,
                     m: Int, ks: Int, rerank: Int,
                     candidates: Option[DataFrame]): DataFrame = {
    val dim = emb.select(size(col("embedding")).as("d")).limit(1)
      .collect().headOption.map(_.getInt(0)).getOrElse(0)
    require(dim > 0 && dim % m == 0,
      s"dim=$dim must be a positive multiple of m=$m (the standard PQ " +
        "precondition — a remainder would silently drop trailing dims)")
    val p0 = prepared(emb)
    // zero vectors have no direction: excluding them beats NaN codes
    // (NaN orders LARGEST in Spark and would poison the rankings)
    val p = p0.filter(col("n2") > 0)
      .withColumn("u", transform(col("v"), x => x / sqrt(col("n2"))))
      .select(col("vec_id"), col("u"))
    val subLen = (size(col("u")) / m).cast("int")
    def subvectors(df: DataFrame): DataFrame =
      df.select(col("vec_id"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          j => slice(col("u"), j * subLen + 1, subLen))).as(Seq("j", "sub")))
    // per-subspace codebook from the deterministic sample (tiny)
    val sampled = p.withColumn("hsel", xxhash64(col("vec_id")))
      .orderBy(col("hsel")).limit(ks)
      .withColumn("c_idx",
        row_number().over(Window.orderBy(col("hsel"))).cast("int") - 1)
    val codebook = subvectors(sampled.select(col("c_idx").as("vec_id"), col("u")))
      .select(col("vec_id").as("c_idx"), col("j"), col("sub").as("c_sub"))
    // squared L2 between a subvector and a codebook entry — ONE
    // definition shared by encoding and the query LUT (diverging
    // copies would silently break the ADC ranking)
    def subDist(a: Column, b: Column): Column =
      dot(a, a) + dot(b, b) - lit(2.0) * dot(a, b)
    // encode: nearest codebook entry per (vector, subspace)
    val dEnc = Window.partitionBy(col("vec_id"), col("j"))
      .orderBy(col("d2"), col("c_idx"))
    val codes = subvectors(p).join(broadcast(codebook), Seq("j"))
      .withColumn("d2", subDist(col("sub"), col("c_sub")))
      .withColumn("rn", row_number().over(dEnc))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("j"), col("c_idx").as("code"))
    // per-query asymmetric lookup table: exact subvector→centroid dists
    val qIds = p0.filter(isQuery).select(col("vec_id"))
    val lut = subvectors(p.join(qIds, Seq("vec_id")))
      .join(broadcast(codebook), Seq("j"))
      .select(col("vec_id").as("q_id"), col("j"), col("c_idx"),
        subDist(col("sub"), col("c_sub")).as("pd"))
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("adc"), col("vec_id"))
    // ADC scoring base: all pairs (codes × per-query LUT), or — on
    // the IVFPQ path — only the probed-list candidate pairs, each
    // expanding to its m code rows before the LUT lookup
    val scoredRows = candidates match {
      case None =>
        codes.join(broadcast(lut),
          codes("j") === lut("j") && codes("code") === lut("c_idx"))
      case Some(cand) =>
        cand.join(codes, Seq("vec_id"))
          .join(broadcast(lut.withColumnRenamed("c_idx", "code")),
            Seq("q_id", "j", "code"))
    }
    // ADC shortlist: overfetch k·rerank candidates on compressed codes…
    val shortlist = scoredRows
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("pd")).as("adc"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("srn", row_number().over(wAdc))
      .filter(col("srn") <= k * rerank)
      .select(col("q_id"), col("vec_id"))
    // …then EXACT-rerank only the shortlist (nq × k·rerank dot
    // products — the standard ADC-shortlist + rerank deployment; the
    // full vectors are read for a per-query handful of rows)
    val wExact = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    shortlist
      .join(p0.select(col("vec_id").as("q_id"), col("v").as("q_v"),
        col("n2").as("q_n2")), Seq("q_id"))
      .join(p0.select(col("vec_id"), col("v"), col("n2")), Seq("vec_id"))
      .withColumn("cos_sim",
        round(cosineFromParts(dot(col("q_v"), col("v")), col("q_n2"), col("n2")), 6))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("cos_sim"), col("rank"))
  }

  /** E2: LSH-bucketed ANN top-k (rows-only; spec-verified recall vs
    * E1). Bucket equi-join replaces the all-pairs join: only
    * same-bucket candidates are scored. With P planes collisions keep
    * ~cos-similar vectors together (probability (1 − θ/π)^P per
    * table); `tables` independent plane sets OR-combined recover the
    * recall a single table loses — candidates are the UNION of
    * same-bucket matches across tables (the standard multi-table LSH
    * construction), deduped before ranking. Still an equi-join on
    * (table, bucket): shuffle volume ∝ T × corpus, never O(n²), and
    * the bucket key space (T × 2^P) is far above any executor count —
    * skew-safe. */
  def lshTopK(emb: DataFrame, isQuery: Column, k: Int, planes: Int = 4,
              tables: Int = 8): DataFrame = {
    val p0 = prepared(emb)
    val bucketArr = array((0 until tables).map(t =>
      call_function("graft_hyperplane_t", col("v"), lit(planes), lit(t))): _*)
    // isQuery is applied to the FULL prepared frame (label included) so
    // label-based predicates work here exactly as in E1/E3
    val p = p0.select(col("vec_id"), col("v"), col("n2"),
      posexplode(bucketArr).as(Seq("t", "bucket")))
    val q = p0.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"), col("n2").as("q_n2"),
        posexplode(bucketArr).as(Seq("t", "bucket")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    p.as("c").join(broadcast(q), Seq("t", "bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      // score BEFORE deduping: a pair colliding in several tables costs
      // ≤T redundant dot products (map-side, codegen'd), but the dedup
      // then runs on three scalar columns — a hash aggregate — instead
      // of shuffling array payloads through a sort-based aggregate
      .select(col("q_id"), col("vec_id"),
        round(cosineFromParts(dot(col("q_v"), col("c.v")), col("q_n2"), col("c.n2")), 6)
          .as("cos_sim"))
      .dropDuplicates("q_id", "vec_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("n_id"), col("cos_sim"), col("rank"))
  }
}
