package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication block (SURVEY.md §2 D) — the LLM-training-pipeline
  * operators, on the `documents` table.
  *
  * Scale posture (the part that matters at 100 TB):
  *  - Candidate generation is ALWAYS an equi-join on a derived key
  *    (content hash, shared shingle, LSH band bucket, simhash band) —
  *    never an O(n²) cross join. The shuffle key is the bucket, so
  *    work distributes by key and pair blow-up is bounded by bucket
  *    size, not corpus size.
  *  - Exact verification (Jaccard / hamming) runs only on candidates.
  *  - Everything is built-in expressions (md5/xxhash64/higher-order
  *    fns) — codegen'd, no UDF, map-side partial aggregation free.
  */
object Dedup {

  /** D1: exact dedup — group by content hash, keep the lowest doc_id
    * (the canonical survivor), count members. Singleton groups kept so
    * the output doubles as the canonical-id mapping. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))

  /** D3: exact n-gram Jaccard over word 3-gram shingle sets.
    * Shingle-explode equi-join generates candidates (docs sharing ≥1
    * gram); Jaccard = |A∩B| / (|A|+|B|−|A∩B|) computed from exact
    * counts, threshold applied after. Counts are integers, the final
    * division is one double op — cross-engine exact. */
  def ngramJaccard(docs: DataFrame, tau: Double): DataFrame = {
    val g = docs
      .select(col("doc_id"), explode(grams3(tokens(col("text")))).as("gram"))
      .distinct()
    val sizes = g.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val inter = g.as("a").join(g.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
                 .withColumnRenamed("n_grams", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
                 .withColumnRenamed("n_grams", "n_b"), "doc_b")
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "inter", "n_a", "n_b", "jaccard")
  }

  /** D2: MinHash + LSH candidate pairs (rows-only — banding is not
    * SQL-expressible for the DuckDB oracle; verified by spec against
    * the exact-Jaccard ground truth instead).
    *
    * k minhashes h_i = min over shingles of xxhash64(i, gram); bands of
    * r consecutive slots combine into a bucket via an order-insensitive
    * XOR of xxhash64(i, minh_i) (each slot's value is already bound to
    * its index i, so commutative XOR is a safe combiner — no
    * collect_list ordering hazard, and unlike a sum it cannot hit the
    * ANSI long-overflow check). Pairs sharing any (band, bucket)
    * are candidates. The self-join is an equi-join on the bucket: at
    * 100 TB the shuffle key is the band bucket and true near-dups
    * concentrate in small buckets.
    */
  def minhashLsh(docs: DataFrame, numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val rowsPerBand = numHashes / bands
    val g = docs
      .select(col("doc_id"), explode(grams3(tokens(col("text")))).as("gram"))
      .distinct()
    val sigs = g
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(numHashes - 1)),
          i => xxhash64(i, col("gram")))).as(Seq("i", "h")))
      .groupBy(col("doc_id"), col("i"))
      .agg(min(col("h")).as("minh"))
    val buckets = sigs
      .withColumn("band", expr(s"i div $rowsPerBand"))
      .groupBy(col("doc_id"), col("band"))
      .agg(expr("bit_xor(xxhash64(i, minh))").as("bucket"))
    require(rowsPerBand > 0, s"numHashes=$numHashes must be >= bands=$bands")
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** D4: SimHash near-dup pairs (rows-only).
    *
    * 64-bit simhash per doc: bit j is set when the majority of token
    * hashes have bit j set. Candidate pairs must share one of four
    * 16-bit bands (pigeonhole: hamming ≤ 3 ⟹ ≥1 identical band);
    * exact hamming ≤ maxHamming verified on candidates via
    * bit_count(xor). Entirely per-row expression work + one equi-join
    * on (band, band_val).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val withSim = docs
      .withColumn("hs", transform(tokens(col("text")), t => xxhash64(t)))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), cast(0 as bigint), (acc, j) ->
          |  acc + CASE WHEN 2 * size(filter(hs, h -> (h >> j) & 1 = 1)) > size(hs)
          |            THEN shiftleft(cast(1 as bigint), j)
          |            ELSE cast(0 as bigint) END)""".stripMargin))
      .select(col("doc_id"), col("simhash"))
    val banded = withSim.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> shiftright(simhash, 16 * b) & cast(65535 as bigint))"))
        .as(Seq("band", "band_val")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** D5: embedding near-dup pairs — cosine ≥ tau over the `embeddings`
    * table. Implemented in [[Similarity.cosinePairs]]; kept in the D
    * inventory as the semantic "near-dup by embedding" entry. */
  def embeddingCosine(emb: DataFrame, tau: Double): DataFrame =
    Similarity.cosinePairs(emb, tau)

  /** Keep-one view over any pair list: survivors are docs never named
    * as the larger id of a duplicate pair (min-id canonicalization). */
  def survivors(docs: DataFrame, pairs: DataFrame): DataFrame =
    docs.join(pairs.select(col("doc_b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
}
