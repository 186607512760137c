package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Cached signature tables, one live slot per operator (shared
    * [[CacheSlots]] lifecycle). */
  private val liveCaches = new CacheSlots

  private def cachedAs(key: String, df: DataFrame): DataFrame =
    liveCaches(key, df)

  /** Drop every cache this object holds (end-of-job cleanup). */
  def releaseCaches(): Unit = liveCaches.release()

  /** D1: exact dedup — group by content hash, keep the lowest doc_id
    * (the canonical survivor), count members. Singleton groups kept so
    * the output doubles as the canonical-id mapping. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Per-row distinct 3-gram shingle hashes (codegen'd
    * [[graft.functions.VecExprs.Grams3Hashes]]) — the signature input
    * every dedup flavor shares. Joining on the 64-bit hash instead of
    * the gram string shrinks the shuffle ~5× and makes the join key a
    * fixed-width long (collision odds over a corpus of G distinct
    * grams ≈ G²/2⁶⁵ — negligible at any real G). Caller must
    * VecExprs.register first. */
  private def gramHashes(text: Column): Column =
    call_function("graft_grams3h", tokens(text))

  /** The exploded signature input every Jaccard flavor shares:
    * `(doc_id, n_grams, gh)` — one spelling so every flavor lives in
    * the same gram space as the signature tables it joins against. */
  private def explodedGrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), gramHashes(col("text")).as("ghs"))
      .select(col("doc_id"), size(col("ghs")).as("n_grams"),
        explode(col("ghs")).as("gh"))

  /** The shared Jaccard finalize: intersection counts grouped per
    * pair → |A∩B| / (|A|+|B|−|A∩B|) ≥ tau. One spelling so the
    * in-memory, bucketed-table, and incremental flavors can never
    * diverge on threshold semantics. */
  private def jaccardFinalize(joined: DataFrame, tau: Double): DataFrame =
    joined
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"),
        first(col("a.n_grams")).as("n_a"), first(col("b.n_grams")).as("n_b"))
      .withColumn("jaccard", col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "inter", "n_a", "n_b", "jaccard")

  /** Gram document frequency — how many documents contain each 3-gram
    * hash. The tuning probe for [[ngramJaccard]]'s `maxDf` cap (pick a
    * threshold off this distribution's tail before a 100 TB run). One
    * aggregation with map-side partials; exchange volume = distinct
    * grams, not corpus rows. */
  def gramDocFrequencies(docs: DataFrame): DataFrame = {
    graft.functions.VecExprs.register(docs.sparkSession)
    docs.select(col("doc_id"), explode(gramHashes(col("text"))).as("gh"))
      .groupBy(col("gh")).agg(count(lit(1)).as("df"))
  }

  /** The hot-gram cap that makes the candidate self-join safe at
    * 100 TB: drop every gram whose document frequency exceeds `maxDf`
    * and recompute each doc's set size over the KEPT grams.
    *
    * Why: one boilerplate 3-gram in 10⁶ documents puts ~10¹² candidate
    * pairs in a single join key — the classic dedup scale-killer, and a
    * gram that common carries ~zero Jaccard signal anyway. Dropping it
    * from BOTH the join and the denominators keeps the result an exact
    * Jaccard — over the informative (df ≤ maxDf) gram subspace; with
    * `maxDf = Long.MaxValue` this is the identity and the plan is
    * untouched. The hot-gram list is tiny by Zipf (the df aggregate's
    * own output bounds it at distinct-grams/maxDf), so it broadcasts
    * and the drop is an exchange-free broadcast anti-join. Per-key
    * join fan-out is then ≤ maxDf² pairs by construction. */
  /** The grams whose document frequency exceeds the cap (tiny by
    * Zipf — bounded by distinct-grams/maxDf). */
  private def hotGrams(g: DataFrame, maxDf: Long): DataFrame =
    g.groupBy(col("gh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("gh")

  /** Drop a hot-gram list from an exploded `(doc_id, n_grams, gh)`
    * table and recompute each doc's set size over the kept grams —
    * the one shared spelling of the cap (in-memory flow, bucketed
    * write, incremental batches). */
  private def dropHotAndResize(g: DataFrame, hot: DataFrame): DataFrame = {
    val kept = g.join(broadcast(hot), Seq("gh"), "left_anti")
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_kept"))
    kept.drop("n_grams").join(sizes, Seq("doc_id"))
      .select(col("doc_id"), col("n_kept").as("n_grams"), col("gh"))
  }

  private def capGramDf(g: DataFrame, maxDf: Long): DataFrame =
    if (maxDf == Long.MaxValue) g
    else dropHotAndResize(g, hotGrams(g, maxDf))

  /** D3: exact n-gram Jaccard over word 3-gram shingle sets.
    * Shingle-explode equi-join generates candidates (docs sharing ≥1
    * gram); Jaccard = |A∩B| / (|A|+|B|−|A∩B|) computed from exact
    * counts, threshold applied after. Counts are integers, the final
    * division is one double op — cross-engine exact. Set sizes come
    * free per row (`size(ghs)`) — no extra groupBy.
    *
    * `maxDf` (default off) applies the [[capGramDf]] hot-gram cap —
    * the setting that bounds per-key join fan-out at corpus scale. */
  def ngramJaccard(docs: DataFrame, tau: Double,
                   maxDf: Long = Long.MaxValue): DataFrame = {
    graft.functions.VecExprs.register(docs.sparkSession)
    // cachedAs(): the exploded gram table feeds BOTH sides of the
    // candidate self-join — without it each branch re-scans and
    // re-shingles the corpus (and projection collapse re-evaluates the
    // shingle chain per exploded row). At scale this is the materialize-
    // the-signature-table step of every dedup pipeline. The raw table
    // is cached FIRST so the cap's df aggregate and anti-join don't
    // re-shingle, then the capped result is cached for the self-join.
    val raw = cachedAs("ngramJaccard_raw", explodedGrams(docs))
    val g = cachedAs("ngramJaccard", capGramDf(raw, maxDf))
    jaccardOverGrams(g, tau)
  }

  /** D3 over a batch with a FROZEN hot-gram list (a signature table's
    * `<table>_hot` side table) instead of a batch-local df threshold:
    * the within-batch flavor [[graft.streaming.EventStream
    * .streamingDedup]] needs so batch-vs-batch pairs live in the SAME
    * capped gram subspace (same denominators) as the batch-vs-corpus
    * pairs from [[incrementalJaccard]] — a batch-local cap would
    * disagree with the table's frozen one and skew the union's
    * Jaccards. */
  def ngramJaccardWithHotList(docs: DataFrame, tau: Double,
                              hot: DataFrame): DataFrame = {
    graft.functions.VecExprs.register(docs.sparkSession)
    // two-slot caching as in ngramJaccard: raw FIRST (dropHotAndResize
    // reads its input twice — uncached, the batch re-tokenizes and
    // re-shingles once per branch, every micro-batch), then the capped
    // table for the candidate self-join's two sides
    val raw = cachedAs("ngramJaccardHot_raw", explodedGrams(docs))
    val g = cachedAs("ngramJaccardHot", dropHotAndResize(raw, hot))
    jaccardOverGrams(g, tau)
  }

  /** Candidate equi-join + exact Jaccard over an exploded gram table
    * `(doc_id, n_grams, gh)` — shared by the cached in-memory flow
    * (ngramJaccard) and the bucketed materialized flow
    * ([[ngramJaccardFromTable]]). */
  private def jaccardOverGrams(g: DataFrame, tau: Double): DataFrame =
    jaccardFinalize(g.as("a").join(g.as("b"),
      col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id")), tau)

  /** Materialize the exploded gram table BUCKETED on the gram hash —
    * the deploy-time version of ngramJaccard's cache. At 100 TB the
    * signature table is written once (one shuffle into `buckets`
    * files per partition-set) and every subsequent candidate
    * self-join — today's run, tomorrow's incremental — reads the
    * co-located buckets with ZERO exchange on the join key
    * (proved plan-level in the spec, like BucketedJoinSpec). */
  /** With a finite `maxDf`, the hot-gram cap is applied BEFORE the
    * write (the signature table is born capped, so every later join —
    * including tomorrow's increments — inherits the per-key bound),
    * and the dropped gram hashes land in a side table `<table>_hot`
    * (at `<path>_hot`) that [[incrementalJaccard]] uses to cap new
    * batches symmetrically. */
  def writeSignatureTable(docs: DataFrame, table: String, path: String,
                          buckets: Int = 64,
                          maxDf: Long = Long.MaxValue): Unit = {
    graft.functions.VecExprs.register(docs.sparkSession)
    val raw = explodedGrams(docs)
    // partitioned by ingest batch (base = −1) AND bucketed on the gram
    // hash: partitioning gives appendToSignatureTable its per-batch
    // replay idempotence (dynamic overwrite of one batch partition),
    // bucketing keeps every candidate join exchange-free — a bucketed
    // scan merges each bucket's files across partitions, so the join
    // co-location survives any number of ingest batches (spec-proved)
    def writeMain(g: DataFrame): Unit =
      g.withColumn("ingest_batch", lit(-1L))
        .write.format("parquet").partitionBy("ingest_batch")
        .bucketBy(buckets, "gh").sortBy("gh")
        .option("path", path).mode("overwrite").saveAsTable(table)
    if (maxDf == Long.MaxValue) {
      // an earlier CAPPED build of this table left a `_hot` companion;
      // callers pair the two ("pass its <table>_hot side table"), so a
      // stale hot list must not survive an uncapped rebuild — batches
      // would keep dropping grams against a cap the corpus side no
      // longer applies, silently deflating Jaccards
      val spark = docs.sparkSession
      spark.sql(s"DROP TABLE IF EXISTS ${table}_hot")
      val hp = new org.apache.hadoop.fs.Path(s"${path}_hot")
      hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true)
      writeMain(raw)
    } else {
      // cache the shingled table: the hot-table write, the sizes
      // aggregate, and the anti-join otherwise each re-tokenize and
      // re-shingle the whole corpus (three full passes at 100 TB)
      val cached = raw.cache()
      try {
        hotGrams(cached, maxDf)
          .write.format("parquet").option("path", s"${path}_hot")
          .mode("overwrite").saveAsTable(s"${table}_hot")
        writeMain(dropHotAndResize(cached,
          docs.sparkSession.table(s"${table}_hot")))
      } finally cached.unpersist(false)
    }
  }

  /** D3 over a materialized signature table: identical semantics to
    * [[ngramJaccard]], but the candidate self-join reads the bucketed
    * table — no re-shingling, no shuffle on `gh`. */
  def ngramJaccardFromTable(spark: org.apache.spark.sql.SparkSession,
                            table: String, tau: Double): DataFrame =
    jaccardOverGrams(spark.table(table).hint("merge"), tau)

  /** Incremental dedup — the arrival-time flow: candidate pairs
    * between a NEW document batch and the materialized corpus
    * signature table, without touching corpus text. The batch's grams
    * (small) shuffle into the table's bucketing; the corpus side reads
    * its co-located buckets in place — per-batch cost is
    * O(batch × bucket density), independent of corpus size. Pairs come
    * back as (corpus doc_a, new doc_b); new-vs-new pairs within the
    * batch are [[ngramJaccard]] on the batch alone, and appending the
    * batch's grams to the table makes the next increment see it.
    *
    * `hotTable`: when the signature table was written with a `maxDf`
    * cap, pass its `<table>_hot` side table so the batch's grams are
    * capped symmetrically (same gram subspace, same denominators) —
    * otherwise a boilerplate gram the table dropped would silently
    * deflate the batch side's Jaccard.
    */
  /** `excludeIngestBatch`: drop that `ingest_batch` partition from
    * the corpus side (partition-pruned). The streaming flow passes
    * its CURRENT batch id: under crash-replay the batch's own grams
    * are already in the table, and without the exclusion every
    * within-batch duplicate pair would come back tripled — once from
    * the within-batch join and twice (both orderings, the join is
    * =!= not <) from the table side. */
  def incrementalJaccard(spark: org.apache.spark.sql.SparkSession,
                         table: String, newDocs: DataFrame,
                         tau: Double,
                         hotTable: Option[String] = None,
                         excludeIngestBatch: Option[Long] = None): DataFrame = {
    graft.functions.VecExprs.register(spark)
    // cachedAs() only on the capped path: dropHotAndResize reads its
    // input twice there — uncached, every micro-batch would
    // re-tokenize and re-shingle the batch once per branch (the
    // ngramJaccardWithHotList rationale). Uncapped, the grams feed ONE
    // join and a cache is pure materialization overhead.
    val newG = hotTable.fold(explodedGrams(newDocs))(h =>
      dropHotAndResize(cachedAs("incrementalJaccard_raw",
        explodedGrams(newDocs)), spark.table(h)))
    incrementalOverGrams(spark, table, newG, tau, excludeIngestBatch)
  }

  /** The corpus-vs-batch join over an already-shingled batch gram
    * table — the shared tail of [[incrementalJaccard]] and
    * [[dedupBatch]]. */
  private def incrementalOverGrams(spark: org.apache.spark.sql.SparkSession,
                                   table: String, newG: DataFrame, tau: Double,
                                   excludeIngestBatch: Option[Long]): DataFrame = {
    val corpus = excludeIngestBatch.fold(spark.table(table))(b =>
      spark.table(table).filter(col("ingest_batch") =!= lit(b)))
    jaccardFinalize(corpus.hint("merge").as("a")
      .join(newG.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") =!= col("b.doc_id")), tau)
  }

  /** One micro-batch of the arrival-time dedup flow, shingled ONCE:
    * (a) pairs vs the corpus signature table — excluding this batch's
    * own replayed grams, (b) within-batch pairs in the SAME capped
    * gram subspace, (c) the replay-safe append. Returns (a) ∪ (b) for
    * the caller's onPairs hook. The per-doc-batch entry points
    * ([[incrementalJaccard]] + [[ngramJaccard]] +
    * [[appendToSignatureTable]]) spell the same flow but each
    * re-shingle the batch — three tokenize+shingle passes on the
    * always-on streaming hot path, which this single-shingle spelling
    * avoids. */
  private[graft] def dedupBatch(spark: org.apache.spark.sql.SparkSession,
                                table: String, batch: DataFrame, tau: Double,
                                hotTable: Option[String],
                                ingestBatch: Long): DataFrame = {
    graft.functions.VecExprs.register(spark)
    val raw = cachedAs("dedupBatch_raw", explodedGrams(batch))
    // the capped table gets its own slot only when a cap exists —
    // slotting `raw` twice would let one slot's replacement unpersist
    // the other's blocks mid-batch
    val g = hotTable.fold(raw)(h =>
      cachedAs("dedupBatch_capped", dropHotAndResize(raw, spark.table(h))))
    val vsCorpus = incrementalOverGrams(spark, table, g, tau, Some(ingestBatch))
    val withinBatch = jaccardOverGrams(g, tau)
    appendGrams(g, table, ingestBatch)
    vsCorpus.unionByName(withinBatch)
  }

  /** Append a document batch's grams to the materialized signature
    * table (the arrival-time flow's state update: after this, the
    * next [[incrementalJaccard]] — or the next micro-batch of
    * [[graft.streaming.EventStream.streamingDedup]] — sees these
    * docs). `insertInto` writes through the table's OWN partition +
    * bucket spec, so appended files stay co-located on the gram hash;
    * `hotTable` applies the same frozen df cap the table was born
    * with.
    *
    * `ingestBatch` keys the write into the table's `ingest_batch`
    * partition via a STATIC partition-spec overwrite: re-running the
    * same id REPLACES that batch's grams instead of duplicating them — under
    * foreachBatch's at-least-once replay a plain append would double
    * the replayed docs' (doc_id, gh) rows and corrupt every later
    * intersection count. Distinct batches use distinct ids; the base
    * corpus is batch −1. */
  def appendToSignatureTable(docs: DataFrame, table: String,
                             ingestBatch: Long,
                             hotTable: Option[String] = None): Unit = {
    val spark = docs.sparkSession
    graft.functions.VecExprs.register(spark)
    // cachedAs() only on the capped path (see incrementalJaccard);
    // the batch-id guard lives in appendGrams, the single write path
    val g = hotTable.fold(explodedGrams(docs))(h =>
      dropHotAndResize(cachedAs("appendSignature_raw",
        explodedGrams(docs)), spark.table(h)))
    appendGrams(g, table, ingestBatch)
  }

  /** The append tail over an already-shingled (and already-capped)
    * gram table — shared by [[appendToSignatureTable]] and
    * [[dedupBatch]]. */
  private def appendGrams(g: DataFrame, table: String,
                          ingestBatch: Long): Unit =
    partitionOverwrite(g, table, ingestBatch, Seq("doc_id", "n_grams", "gh"))

  /** The replay-safe append every materialized dedup table shares
    * (gram signature, minhash bucket, winnowing fingerprint — ONE
    * helper so the replay-safety pattern can never diverge between
    * families). STATIC partition spec: the overwrite names its one
    * partition up front, so only that batch's files are ever
    * replaced — no dynamic-overwrite session conf to toggle (a
    * set/restore racing a concurrent append could run the other
    * insert in static mode over EVERY partition, truncating the whole
    * table). `cols` resolves the insert BY NAME from the view, then
    * positionally against the stored table order. */
  private def partitionOverwrite(df: DataFrame, table: String,
                                 ingestBatch: Long,
                                 cols: Seq[String]): Unit = {
    require(ingestBatch >= 0L,
      s"ingestBatch=$ingestBatch — negative ids are reserved (the base " +
        "corpus lives at -1; overwriting it would destroy the table)")
    val spark = df.sparkSession
    val view = s"graft_append_${java.lang.Long.toHexString(ingestBatch)}" +
      s"_${java.util.UUID.randomUUID().toString.takeWhile(_ != '-')}"
    df.createOrReplaceTempView(view)
    try
      spark.sql(
        s"""INSERT OVERWRITE TABLE $table
           |PARTITION (ingest_batch = ${ingestBatch}L)
           |SELECT ${cols.mkString(", ")} FROM $view""".stripMargin)
    finally spark.catalog.dropTempView(view)
  }

  /** D2: MinHash + LSH candidate pairs (rows-only — banding is not
    * SQL-expressible for the DuckDB oracle; verified by spec against
    * the exact-Jaccard ground truth instead).
    *
    * k minhashes h_i = min over shingles of xxhash64(i, gram),
    * computed whole-signature-per-row by the codegen'd
    * `graft_minhash32` expression (no explode/groupBy, so no
    * collect_list ordering hazard exists in the first place); each
    * band's bucket is xxhash64(band, slice(sig)) over its r
    * consecutive slots — the slice order is the fixed signature
    * order, deterministic by construction. Pairs sharing any
    * (band, bucket) are candidates. The self-join is an equi-join on the bucket: at
    * 100 TB the shuffle key is the band bucket and true near-dups
    * concentrate in small buckets.
    *
    * `maxBucket` caps the (band, bucket) group size — a bucket with
    * more members than that is a boilerplate mega-cluster whose pair
    * fan-out (size²) would dominate the join. Such a bucket is NOT
    * dropped (its members often share every band, so no other band
    * would rediscover them): it collapses to a STAR — each member
    * paired with the bucket's min doc_id — so per-bucket output is
    * O(size), connectivity survives for D8's transitive clustering
    * (the component still merges through the hub), and only the
    * size² full pair enumeration is given up. Kept buckets self-join
    * exactly as before; `maxBucket = 0` (default) auto-sizes the cap
    * from measured bucket density ([[resolvedMaxBucket]]) — the
    * identity at test scale and a hard per-key bound at 100 TB.
    */
  /** `failOnHot = true` (the GATED-run mode, r10 ADVICE): instead of
    * star-collapsing a bucket past the cap, THROW. The D2/D7 DuckDB
    * mirrors brute-force every band bucket — their parity with the
    * Spark side rests on the invariant that no gate-corpus bucket
    * exceeds the resolved cap (so the collapse never fires). A corpus
    * regen that plants >cap near-identical docs now fails loudly at
    * verify time instead of flipping the hash gate red with no code
    * change. Deploy flows keep the default (collapse, never throw). */
  def minhashLsh(docs: DataFrame, numHashes: Int = 32, bands: Int = 8,
                 maxBucket: Long = 0L,
                 failOnHot: Boolean = false): DataFrame = {
    val raw = cachedAs("minhashLsh_raw", // both join sides read this (see ngramJaccard)
      minhashBands(docs, numHashes, bands))
    bandedPairs(raw, resolvedMaxBucket(raw, "bucket", maxBucket),
      failOnHot = failOnHot)
  }

  /** `maxBucket = 0` (the default) auto-sizes the hot-bucket cap from
    * MEASURED bucket density — the E2/E3 auto-size posture (r8: fixed
    * ANN configs degraded at ×10 corpus; a fixed cap has the twin
    * failure): cap = max(1024, 64 × mean occupancy). "Hot" thereby
    * means "64× denser than this corpus' typical bucket" — degenerate
    * boilerplate clusters star-collapse, while buckets that are dense
    * merely because the CORPUS is dense (simhash's fixed 2^16
    * band-value space makes mean occupancy grow linearly with docs)
    * keep their exact self-join instead of silently losing recall the
    * way a fixed 1024 would once mean occupancy crosses it. One cheap
    * aggregate on the (already cached) banded table, driver-side
    * scalar — and the explicit escape hatch stays for callers that
    * know their density. The FROZEN flows (mhOverwrite's bucketed
    * table, minhashBatch's incremental appends) keep explicit caps:
    * a per-batch density measurement would drift the collapse
    * semantics between appends of one materialized table. */
  private def resolvedMaxBucket(banded: DataFrame, bucketCol: String,
                                maxBucket: Long,
                                floor: Long = 1024L, k: Long = 64L): Long =
    if (maxBucket != 0L) maxBucket
    else {
      val r = banded.agg(count(lit(1)).as("n"),
        countDistinct(col("band"), col(bucketCol)).as("d")).head()
      val (n, d) = (r.getLong(0), r.getLong(1))
      if (d == 0L) floor else math.max(floor, k * (n / d))
    }

  /** The capped candidate self-join over banded rows `(doc_id, band,
    * bucket)` — shared by [[minhashLsh]] and [[minhashBatch]]'s
    * within-batch path so collapse semantics can never diverge. */
  private def bandedPairs(raw: DataFrame, maxBucket: Long,
                          failOnHot: Boolean = false): DataFrame = {
    val (buckets, hotStar) =
      if (maxBucket == Long.MaxValue) (raw, None)
      else {
        val hotSized = raw.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("sz")).filter(col("sz") > maxBucket)
        if (failOnHot) {
          // gated-run invariant (see minhashLsh scaladoc): one small
          // job over the grouped frame; when it passes, `hot` below is
          // empty and the anti-join is the identity
          val h = hotSized.limit(1).collect()
          // named accessors: column drift in the grouped frame must
          // surface as the intended diagnostic, not a ClassCastException
          // thrown while rendering it — and the bucket id is the datum
          // an operator needs to inspect the hot key
          require(h.isEmpty, h.headOption.map(r =>
            s"minhashLsh gated run: bucket (band=${r.get(r.fieldIndex("band"))}, " +
              s"bucket=${r.get(r.fieldIndex("bucket"))}) holds " +
              s"${r.get(r.fieldIndex("sz"))} docs > cap $maxBucket — the DuckDB " +
              "mirror brute-forces all pairs and would diverge from the " +
              "star-collapse").getOrElse(""))
        }
        val hot = hotSized.select("band", "bucket")
        val kept = raw.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
        // hot buckets → star candidates around the min member (doc_a
        // is the min, so doc_a < doc_b holds by construction)
        val members = raw.join(broadcast(hot), Seq("band", "bucket"))
        (kept, Some(bandStar(members)))
      }
    val keptPairs = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    hotStar.fold(keptPairs)(keptPairs.unionByName(_)).distinct()
  }

  /** The banded (doc_id, band, bucket) rows every D2 flavor shares —
    * in-memory self-join, bucketed table write, and incremental
    * batches all live in the same bucket space (the
    * [[winnowFingerprints]] role for minhash). Whole signature per row
    * in one codegen'd pass — no explode/groupBy shuffle for signature
    * construction at all; docs with no grams (<3 tokens) are excluded.
    * Slot hashes are md5-DERIVED ([[graft.functions.VecExprs
    * .MinHashSigMd5]] — the D4 move applied to minhash in r10) so the
    * DuckDB oracle recomputes the EXACT signature matrix and
    * brute-forces the band buckets: D2 is hash-green, not rows-only.
    * Band bucket = hash of the band's signature slice (+ band index so
    * identical slices in different bands can't collide) — the band is
    * FOLDED INTO the 64-bit bucket value, which is what lets the
    * materialized flow join on `bucket` alone (the mirror joins on
    * the raw slice instead — same pair set modulo 2⁻⁶⁴ xxhash64
    * collisions, the D4 oracle argument). */
  private def minhashBands(docs: DataFrame, numHashes: Int,
                           bands: Int): DataFrame = {
    require(numHashes == 32, "registered signature variant is 32-slot")
    require(numHashes % bands == 0,
      s"bands=$bands must divide numHashes=$numHashes (trailing slots would " +
        "silently drop out of every bucket)")
    val rowsPerBand = numHashes / bands
    graft.functions.VecExprs.register(docs.sparkSession)
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3) // < 3 tokens = no grams = no signature
      .select(col("doc_id"),
        call_function("graft_minhash32_md5", col("toks")).as("sig"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))
          .as(Seq("band", "bucket")))
  }

  /** Star pairs over a hot-bucket member frame `(band, bucket,
    * doc_id)`: each member paired with its bucket's min doc_id (the
    * hub), per-bucket output O(size) — shared by [[minhashLsh]] and
    * the materialized flow so collapse semantics can never diverge. */
  private def bandStar(members: DataFrame): DataFrame =
    members
      .groupBy(col("band"), col("bucket")).agg(min(col("doc_id")).as("doc_a"))
      .join(members, Seq("band", "bucket"))
      .filter(col("doc_id") =!= col("doc_a"))
      .select(col("doc_a"), col("doc_id").as("doc_b"))

  /** Materialize the banded minhash bucket rows BUCKETED on the band
    * bucket — D2's deploy-time flow, completing the dedup family's
    * table story ([[writeSignatureTable]] for D3, [[writeFingerprintTable]]
    * for D11): at 100 TB the corpus is signed once (one shuffle into
    * `buckets` file-sets) and every later candidate self-join or
    * incremental batch reads co-located buckets with ZERO exchange on
    * the join key (plan-proved in MinhashTableSpec). Partitioned by
    * `ingest_batch` (base = −1) for [[appendToMinhashTable]]'s replay
    * idempotence.
    *
    * The `maxBucket` star-collapse is a SPLIT here, not a drop (unlike
    * D3's df cap, collapsed buckets still emit O(size) hub pairs): the
    * main table holds the kept rows; the hot buckets' MEMBER rows land
    * in `<table>_hot` (at `<path>_hot`, same partition + bucket spec)
    * so [[minhashFromTable]] can rebuild the stars losslessly and
    * [[incrementalMinhash]] can hub-attach new arrivals — the hot-key
    * list is frozen at build time exactly like D3's `_hot` gram list
    * (a bucket turning hot only post-build is re-capped at the next
    * rebuild, not silently mid-stream). */
  def writeMinhashTable(docs: DataFrame, table: String, path: String,
                        buckets: Int = 64,
                        numHashes: Int = 32, bands: Int = 8,
                        maxBucket: Long = 1024L): Unit = {
    val spark = docs.sparkSession
    // pin (doc_id, band, bucket) order: a USING-join moves its keys
    // first, and [[appendToMinhashTable]]'s INSERT resolves columns
    // POSITIONALLY against the stored order — without this select the
    // capped tables would be born (band, bucket, doc_id) and every
    // later append would write doc_ids into the band column
    def writeOne(df: DataFrame, t: String, p: String): Unit =
      df.select(col("doc_id"), col("band"), col("bucket"))
        .withColumn("ingest_batch", lit(-1L))
        .write.format("parquet").partitionBy("ingest_batch")
        .bucketBy(buckets, "bucket").sortBy("bucket")
        .option("path", p).mode("overwrite").saveAsTable(t)
    val raw = minhashBands(docs, numHashes, bands)
    if (maxBucket == Long.MaxValue) {
      // a stale `_hot` companion from an earlier capped build must not
      // survive an uncapped rebuild (the writeSignatureTable rationale)
      spark.sql(s"DROP TABLE IF EXISTS ${table}_hot")
      val hp = new org.apache.hadoop.fs.Path(s"${path}_hot")
      hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true)
      writeOne(raw, table, path)
    } else {
      // cache the banded rows: the hot-key aggregate, the anti-join,
      // and the member semi-join otherwise each re-shingle and re-sign
      // the whole corpus (three full passes at 100 TB)
      val cached = raw.cache()
      try {
        val hotKeys = cached.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("sz")).filter(col("sz") > maxBucket)
          .select("band", "bucket")
        writeOne(cached.join(broadcast(hotKeys), Seq("band", "bucket")),
          s"${table}_hot", s"${path}_hot")
        // anti-join against the SAME in-memory key frame — re-reading
        // the just-written member table would rescan every mega-bucket
        // row just to re-derive a provably identical key list
        writeOne(cached.join(broadcast(hotKeys),
          Seq("band", "bucket"), "left_anti"), table, path)
      } finally cached.unpersist(false)
    }
  }

  /** D2 over a materialized bucket table: identical pair semantics to
    * [[minhashLsh]], but the candidate self-join reads the bucketed
    * table — no re-signing, no shuffle on the bucket key. The join is
    * on `bucket` alone (the band index is folded into the 64-bit hash,
    * see [[minhashBands]]), which is what makes the table's bucketing
    * spec cover the whole join key; stars are rebuilt from the
    * `<table>_hot` member rows when that companion exists. */
  def minhashFromTable(spark: org.apache.spark.sql.SparkSession,
                       table: String): DataFrame = {
    val kept = spark.table(table).hint("merge")
    val keptPairs = kept.as("a").join(kept.as("b"),
        col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val all =
      if (spark.catalog.tableExists(s"${table}_hot"))
        keptPairs.unionByName(bandStar(spark.table(s"${table}_hot")))
      else keptPairs
    all.distinct()
  }

  /** Incremental D2 — candidate pairs between a NEW document batch and
    * the materialized bucket table, without re-signing the corpus (the
    * [[incrementalJaccard]] shape: batch rows, small, shuffle into the
    * table's bucketing; the corpus side reads its co-located buckets
    * in place). Pairs come back as (corpus doc_a, new doc_b); batch
    * rows landing in a FROZEN hot bucket are hub-attached — paired
    * with that bucket's min stored member — instead of joining the
    * main table (the bucket's size² fan-out stays given up, but the
    * new doc still connects to the duplicate cluster through the hub
    * for D8's transitive clustering). New-vs-new pairs are
    * [[minhashLsh]] on the batch alone; `excludeIngestBatch` drops
    * that partition from the corpus side (partition-pruned) so a
    * crash-replayed batch's own rows don't double its pairs. */
  def incrementalMinhash(spark: org.apache.spark.sql.SparkSession,
                         table: String, newDocs: DataFrame,
                         numHashes: Int = 32, bands: Int = 8,
                         hotTable: Option[String] = None,
                         excludeIngestBatch: Option[Long] = None): DataFrame = {
    def drop(df: DataFrame, b: Option[Long]): DataFrame =
      b.fold(df)(x => df.filter(col("ingest_batch") =!= lit(x)))
    val newRaw = cachedAs("incrementalMinhash_raw",
      minhashBands(newDocs, numHashes, bands))
    val corpus = drop(spark.table(table), excludeIngestBatch).hint("merge")
    val (keptNew, star) = hotTable.fold((newRaw, None: Option[DataFrame])) { h =>
      val hotKeys = spark.table(h).select("band", "bucket").distinct()
      val members = drop(spark.table(h), excludeIngestBatch)
      val hubs = members.groupBy(col("band"), col("bucket"))
        .agg(min(col("doc_id")).as("doc_a"))
      val hubbed = newRaw.join(broadcast(hotKeys), Seq("band", "bucket"))
        .join(hubs, Seq("band", "bucket"))
        .filter(col("doc_id") =!= col("doc_a"))
        .select(col("doc_a"), col("doc_id").as("doc_b"))
      (newRaw.join(broadcast(hotKeys), Seq("band", "bucket"), "left_anti"),
        Some(hubbed))
    }
    val cross = corpus.as("a")
      .join(keptNew.as("b"), col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    star.fold(cross)(cross.unionByName(_)).distinct()
  }

  /** Append a batch's banded rows to the materialized bucket table
    * (the arrival-time state update — next [[incrementalMinhash]] sees
    * these docs). Same replay-safe STATIC partition overwrite as
    * [[appendToSignatureTable]]; rows in frozen hot buckets divert to
    * the `<table>_hot` member partition (keeping the main table's
    * per-bucket bound) when `hotTable` is passed. */
  def appendToMinhashTable(docs: DataFrame, table: String,
                           ingestBatch: Long,
                           hotTable: Option[String] = None,
                           numHashes: Int = 32, bands: Int = 8): Unit = {
    require(ingestBatch >= 0L,
      s"ingestBatch=$ingestBatch — negative ids are reserved (the base " +
        "corpus lives at -1; overwriting it would destroy the table)")
    val spark = docs.sparkSession
    hotTable match {
      case None => mhOverwrite(minhashBands(docs, numHashes, bands), table,
        ingestBatch)
      case Some(h) =>
        // both destinations read the banded rows — sign the batch once
        val raw = cachedAs("appendMinhash_raw",
          minhashBands(docs, numHashes, bands))
        // the hot-key list must be SNAPSHOTTED off the table lineage:
        // the diverted insert overwrites `h` while its plan would
        // otherwise still read `h` (UNSUPPORTED_OVERWRITE). The list is
        // tiny by construction (distinct frozen hot buckets), so the
        // checkpoint is one small cached frame, freed right after.
        val (hotKeys, pins) = checkpointPinned(
          spark.table(h).select("band", "bucket").distinct())
        try {
          mhOverwrite(raw.join(broadcast(hotKeys), Seq("band", "bucket"),
            "left_anti"), table, ingestBatch)
          mhOverwrite(raw.join(broadcast(hotKeys), Seq("band", "bucket"))
            .select(col("doc_id"), col("band"), col("bucket")), h, ingestBatch)
        } finally pins.foreach(_.unpersist(blocking = false))
    }
  }

  private def mhOverwrite(df: DataFrame, t: String, ingestBatch: Long): Unit =
    partitionOverwrite(df, t, ingestBatch, Seq("doc_id", "band", "bucket"))

  /** One micro-batch of the arrival-time D2 flow, signed ONCE (the
    * [[dedupBatch]] shape for minhash): (a) cross pairs vs the corpus
    * bucket table — excluding this batch's own replayed rows, (b)
    * within-batch pairs over the SAME frozen hot-key subspace, with
    * `maxBucket` star-collapsing batch-LOCAL mega buckets too (a
    * catch-up batch after downtime can carry a whole new template
    * cluster the frozen list has never seen — without the cap its
    * within-batch self-join would be the size² melt the family
    * forbids; frozen-hot arrivals hub-attach to the STORED hub
    * instead, so they connect to the corpus cluster and, through it,
    * to each other), (c) the replay-safe split append. Returns (a) ∪
    * (b) ∪ the hub-attach pairs for the caller's onPairs hook.
    *
    * Both `_hot` reads prune to the BASE partition (`ingest_batch =
    * −1`): the hot-KEY set is frozen at build time by construction,
    * and the base hub (min build-time member) is stable across
    * batches — so per-batch cost stays independent of how many member
    * rows streaming appends have diverted to `_hot` since, and a
    * replayed batch's own diverted rows can't perturb its hubs. */
  private[graft] def minhashBatch(spark: org.apache.spark.sql.SparkSession,
                                  table: String, batch: DataFrame,
                                  hotTable: Option[String],
                                  ingestBatch: Long,
                                  numHashes: Int = 32,
                                  bands: Int = 8,
                                  maxBucket: Long = 1024L): DataFrame = {
    require(ingestBatch >= 0L,
      s"ingestBatch=$ingestBatch — negative ids are reserved (the base " +
        "corpus lives at -1; overwriting it would destroy the table)")
    val raw = cachedAs("minhashBatch_raw",
      minhashBands(batch, numHashes, bands))
    // frozen hot-key snapshot COLLECTED to the driver: bounded
    // metadata (distinct build-time hot buckets — the trained-centroid
    // class of collect), and the local frame keeps the hot table out
    // of every later plan — the split append below overwrites `h`
    // (UNSUPPORTED_OVERWRITE on a live read), and a lazy checkpoint
    // would pin its blocks for as long as the caller holds the
    // returned pair frame (a per-micro-batch leak on an always-on
    // stream).
    val hotKeys: Option[DataFrame] = hotTable.map { h =>
      val rows = spark.table(h).filter(col("ingest_batch") === lit(-1L))
        .select(col("band"), col("bucket")).distinct().collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSeq
      import spark.implicits._
      rows.toDF("band", "bucket")
    }
    val kept = hotKeys.fold(raw)(hk =>
      raw.join(broadcast(hk), Seq("band", "bucket"), "left_anti"))
    val hubbed = hotKeys.map { hk =>
      val hubs = spark.table(hotTable.get)
        .filter(col("ingest_batch") === lit(-1L))
        .groupBy(col("band"), col("bucket"))
        .agg(min(col("doc_id")).as("doc_a"))
      raw.join(broadcast(hk), Seq("band", "bucket"))
        .join(hubs, Seq("band", "bucket"))
        .filter(col("doc_id") =!= col("doc_a"))
        .select(col("doc_a"), col("doc_id").as("doc_b"))
    }
    val corpus = spark.table(table)
      .filter(col("ingest_batch") =!= lit(ingestBatch)).hint("merge")
    val vsCorpus = corpus.as("a")
      .join(kept.as("b"), col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val within = bandedPairs(kept, maxBucket)
    mhOverwrite(kept, table, ingestBatch)
    for (h <- hotTable; hk <- hotKeys)
      mhOverwrite(raw.join(broadcast(hk), Seq("band", "bucket"))
        .select(col("doc_id"), col("band"), col("bucket")), h, ingestBatch)
    hubbed.fold(vsCorpus.unionByName(within))(
      vsCorpus.unionByName(within).unionByName(_)).distinct()
  }

  /** md5-derived 64-bit token hash: the signed long whose bits are the
    * first 16 hex chars of `md5(token)`. Chosen over xxhash64 for the
    * simhash bit matrix so the DuckDB oracle can recompute the EXACT
    * same bits (DuckDB ships md5; Spark's xxhash64 it does not).
    * Runs as the fused [[graft.functions.VecExprs.Md5Long]] codegen
    * expression (digest bytes → long directly; the built-in
    * md5 → conv → decimal spelling computed the same bits ~3× slower).
    * Caller must VecExprs.register first (simhashPairs does). */
  private[graft] def md5Hash64(t: Column): Column =
    call_function("graft_md5long", t)

  /** D4: SimHash near-dup pairs.
    *
    * 64-bit simhash per doc: bit j is set when the majority of token
    * hashes have bit j set. The 64 bits are cut into `maxHamming + 1`
    * bands (pigeonhole: hamming ≤ maxHamming ⟹ at least one band is
    * identical, so banding never drops a true pair); exact
    * hamming ≤ maxHamming is then verified on candidates via
    * bit_count(xor). Entirely per-row expression work + one equi-join
    * on (band, band_val). More bands (higher maxHamming) = shorter
    * bands = more candidates — recall stays exact, cost grows.
    * Because banding is recall-exact and the bucket cap cannot engage
    * below `maxBucket` docs sharing a band value, the output below
    * that scale IS the brute-force hamming pair set — which is what
    * the DuckDB oracle mirror recomputes (bit-identical md5 token
    * hashes, majority bits, pairwise hamming ≤ maxHamming).
    *
    * `maxBucket` caps the (band, band_val) group size — the band-value
    * space is FIXED at 2^(64/bands) (65,536 values at maxHamming = 3),
    * so past ~10⁷ docs every bucket is hot by pigeonhole and the
    * self-join fans out O(n²/65k) per band without a cap. Same shape
    * as [[minhashLsh]]: a hot bucket is NOT dropped (its members often
    * share every band) — it collapses to a STAR around its min-id
    * member, each spoke exact-hamming-verified against the hub, so
    * per-bucket output is O(size) and connectivity survives for D8's
    * transitive clustering; `maxBucket = 0` (default) auto-sizes the
    * cap from measured density ([[resolvedMaxBucket]] — which for
    * simhash's fixed band-value space means the cap GROWS with corpus
    * density instead of silently star-collapsing every normal bucket
    * once mean occupancy crosses a fixed constant). Only the size²
    * full enumeration (and
    * spokes whose hamming to the HUB exceeds the bound despite a
    * shared band) is given up. Identity at test scale; a hard
    * per-key bound at 100 TB.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   maxBucket: Long = 0L): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming=$maxHamming out of range for a 64-bit simhash")
    graft.functions.VecExprs.register(docs.sparkSession)
    // Majority-bit simhash over the token-hash multiset, one codegen'd
    // pass per row (the HOF spelling — aggregate over 64 filter()s —
    // is CodegenFallback and allocates 64 arrays per doc).
    // size(hs) > 0: token-less docs (CJK/punctuation-only under this
    // tokenizer) would all hash to simhash 0 and report each other as
    // hamming-0 duplicates — N unrelated docs, N²/2 spurious pairs in
    // one bucket (the minhashLsh guard, applied here too)
    val withSim = docs
      .withColumn("hs", transform(tokens(col("text")), t => md5Hash64(t)))
      .filter(size(col("hs")) > 0)
      .withColumn("simhash", call_function("graft_simhash64", col("hs")))
      .select(col("doc_id"), col("simhash"))
    bandedHammingPairs(withSim, "simhash", maxHamming, maxBucket,
      "simhashPairs")
  }

  /** The pigeonhole-banded hamming self-join over one 64-bit hash per
    * doc — D4's candidate machinery factored out so every 64-bit
    * fingerprint family (simhash over tokens, dHash over pixels) gets
    * the identical recall-exact banding, exact bit_count verify, and
    * hot-bucket star collapse. `hashed` = (doc_id, `hashCol`); output
    * (doc_a, doc_b, hamming ≤ maxHamming), doc_a < doc_b except star
    * spokes where doc_a is the hub (= bucket min, so still <). */
  /** The pigeonhole band values of a 64-bit hash column: bands+1
    * boundaries over [0, 64), widths differing by ≤1 bit when bands
    * doesn't divide 64 — the partition is all pigeonhole needs. */
  private def bandCols(hashCol: String, maxHamming: Int): Seq[Column] = {
    val bands = maxHamming + 1
    val bounds = (0 to bands).map(b => b * 64 / bands)
    (0 until bands).map { b =>
      val lo = bounds(b); val w = bounds(b + 1) - bounds(b)
      val mask = if (w >= 64) -1L else (1L << w) - 1L
      shiftright(col(hashCol), lo).bitwiseAND(lit(mask))
    }
  }

  private[graft] def bandedHammingPairs(hashed: DataFrame, hashCol: String,
                                        maxHamming: Int, maxBucket: Long,
                                        cacheTag: String): DataFrame = {
    val banded0 = hashed.select(col("doc_id"), col(hashCol),
      posexplode(array(bandCols(hashCol, maxHamming): _*)).as(Seq("band", "band_val")))
    // capped path: banded feeds FIVE branches (hot aggregate, kept
    // anti-join, members twice, self-join sides) — uncached, each
    // would re-tokenize + re-hash the corpus (the minhashLsh cache
    // rationale). Uncapped it feeds only the self-join, whose two
    // sides collapse via exchange reuse — no cache needed.
    val banded =
      if (maxBucket == Long.MaxValue) banded0
      else cachedAs(s"${cacheTag}_banded", banded0)
    val cap = if (maxBucket == Long.MaxValue) maxBucket
              else resolvedMaxBucket(banded, "band_val", maxBucket)
    val (buckets, hotStar) =
      if (maxBucket == Long.MaxValue) (banded, None)
      else {
        val hot = banded.groupBy(col("band"), col("band_val"))
          .agg(count(lit(1)).as("sz")).filter(col("sz") > cap)
          .select("band", "band_val")
        val kept = banded.join(broadcast(hot), Seq("band", "band_val"), "left_anti")
        // hot buckets → star spokes around the min-id member; the hub
        // travels with its hash so spokes still get the exact
        // hamming verify below (doc_a = hub = min, so doc_a < doc_b)
        val members = banded.join(broadcast(hot), Seq("band", "band_val"))
        val star = members
          .groupBy(col("band"), col("band_val"))
          .agg(min_by(struct(col("doc_id"), col(hashCol)), col("doc_id")).as("hub"))
          .join(members, Seq("band", "band_val"))
          .filter(col("doc_id") =!= col("hub.doc_id"))
          .select(col("hub.doc_id").as("doc_a"), col("doc_id").as("doc_b"),
            bit_count(col(s"hub.$hashCol").bitwiseXOR(col(hashCol))).as("hamming"))
        (kept, Some(star))
      }
    val keptPairs = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col(s"a.$hashCol").bitwiseXOR(col(s"b.$hashCol"))).as("hamming"))
    hotStar.fold(keptPairs)(keptPairs.unionByName(_))
      .filter(col("hamming") <= maxHamming) // before distinct: only survivors shuffle
      .distinct()
  }

  /** D12: exact image dedup — pairs of image payloads with IDENTICAL
    * bytes, via one content-hash equi-join (doc_a < doc_b). The
    * pixel-space ground truth [[imagePhashPairs]] is recall-gated
    * against: byte-identical payloads necessarily share a dHash, so
    * the perceptual pair set must contain every exact pair. Pair
    * output is the gate-scale contract (D5's posture) — a deploy
    * flow composes survivors per content-hash group like D1. */
  def imageExactPairs(media: DataFrame): DataFrame =
    exactPayloadPairs(media, "image")

  /** D14a: exact AUDIO dedup — [[imageExactPairs]]' contract on the
    * audio modality; the ground truth [[audioPhashPairs]] is
    * containment-gated against (byte-identical ⟹ envelope-hash
    * identical). */
  def audioExactPairs(media: DataFrame): DataFrame =
    exactPayloadPairs(media, "audio")

  /** D15a: exact VIDEO dedup — [[imageExactPairs]]' contract on the
    * video modality; [[videoPhashPairs]] is containment-gated against
    * it. */
  def videoExactPairs(media: DataFrame): DataFrame =
    exactPayloadPairs(media, "video")

  /** D15: video near-dup pairs by SHARED FRAME FINGERPRINTS — the
    * standard keyframe-hash approach: per-frame dHashes
    * ([[Multimodal.videoPhash]]), one equi-join on the 64-bit frame
    * hash, pairs ranked by their count of distinct shared frames
    * (≥ `minShared`). Byte-identical videos share every frame hash,
    * so exact dups always pair (the containment gate); re-encoded or
    * trimmed copies pair on the frames they kept — what byte equality
    * can't see.
    *
    * `maxDf` caps a frame hash's video count before the self-join: a
    * boilerplate frame (intro card, black frame) shared by thousands
    * of videos would otherwise fan out df² candidate rows — dropped
    * hot hashes cost recall only on pairs whose EVERY shared frame is
    * boilerplate (which is what the cap is for). One aggregate + one
    * broadcast anti-join, the D3 df-cap shape. */
  def videoPhashPairs(media: DataFrame, step: Int = 1,
                      minShared: Long = 1L, maxDf: Long = 1024L): DataFrame = {
    require(minShared >= 1L, s"minShared=$minShared must be ≥ 1")
    // distinct: a frame repeated WITHIN one video must count once
    // toward every pair (n_shared is over distinct shared hashes)
    val frames = cachedAs("videoPhashPairs_frames",
      Multimodal.videoPhash(media, step)
        .select(col("doc_id"), col("phash")).distinct())
    val hot = frames.groupBy(col("phash"))
      .agg(count(lit(1)).as("df")).filter(col("df") > maxDf)
      .select("phash")
    val kept = frames.join(broadcast(hot), Seq("phash"), "left_anti")
    kept.as("a").join(kept.as("b"),
        col("a.phash") === col("b.phash") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.phash").as("ph"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(countDistinct(col("ph")).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Byte-identical payload pairs of one modality via a content-hash
    * equi-join — ONE definition for every exact media-dedup flavor. */
  private def exactPayloadPairs(media: DataFrame, kind: String): DataFrame = {
    val hashed = media.filter(col("kind") === kind)
      .select(col("doc_id"), md5(col("payload")).as("h"))
    hashed.as("a").join(hashed.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
  }

  /** D14: perceptual AUDIO near-dup pairs — envelope dHash per audio
    * payload ([[Multimodal.audioPhash]]: real RMS-contour hash for
    * JDK-decodable audio, deterministic stub otherwise), then the
    * same recall-exact banded hamming machinery as D4/D13
    * ([[bandedHammingPairs]]). Catches resampled/re-encoded copies
    * byte equality can't. */
  def audioPhashPairs(media: DataFrame, maxHamming: Int = 3,
                      maxBucket: Long = 0L): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming=$maxHamming out of range for a 64-bit envelope hash")
    val hashed = Multimodal.audioPhash(media)
      .select(col("doc_id"), col("phash"))
    bandedHammingPairs(hashed, "phash", maxHamming, maxBucket,
      "audioPhashPairs")
  }

  /** D13: perceptual image near-dup pairs — dHash per image payload
    * ([[Multimodal.imagePhash]]: real pixel hash for decodable images,
    * deterministic stub otherwise — byte-identical payloads get equal
    * hashes on BOTH paths, so exact dups are never lost to a codec
    * gap), then the same recall-exact banded hamming self-join D4
    * uses ([[bandedHammingPairs]]): hamming ≤ maxHamming ⟹ one of
    * maxHamming+1 bands identical, candidates equi-join on
    * (band, band_val), exact bit_count verify, hot buckets
    * star-collapse at the measured-density cap. Catches re-encoded /
    * rescaled / lightly-edited images that byte equality (D12)
    * cannot. */
  def imagePhashPairs(media: DataFrame, maxHamming: Int = 3,
                      maxBucket: Long = 0L): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming=$maxHamming out of range for a 64-bit dHash")
    val hashed = Multimodal.imagePhash(media)
      .select(col("doc_id"), col("phash"))
    bandedHammingPairs(hashed, "phash", maxHamming, maxBucket,
      "imagePhashPairs")
  }

  /** D13's banded table rows: `(doc_id, phash, bucket)` with
    * bucket = xxhash64(band, band_val) — the two-part pigeonhole key
    * folded into ONE 64-bit column so a single `bucketBy` spec covers
    * the whole candidate-join key (a fold collision merely adds a
    * candidate the exact hamming verify removes). Unlike the text
    * families' signature rows, the full phash TRAVELS with its bucket
    * rows: every read path exact-verifies `bit_count(xor) ≤
    * maxHamming`, so served pairs are VERIFIED pairs, never band
    * candidates. */
  private def phashBanded(media: DataFrame, maxHamming: Int): DataFrame =
    Multimodal.imagePhash(media)
      .select(col("doc_id"), col("phash"),
        posexplode(array(bandCols("phash", maxHamming): _*))
          .as(Seq("band", "band_val")))
      .select(col("doc_id"), col("phash"),
        xxhash64(col("band"), col("band_val")).as("bucket"))

  /** Materialize D13's banded dHash rows BUCKETED on the folded band
    * key — the image family's deploy table, completing the dedup table
    * story ([[writeSignatureTable]] D3, [[writeMinhashTable]] D2,
    * [[writeFingerprintTable]] D11): payloads are decoded and hashed
    * ONCE, every later self-join or arrival batch joins co-located
    * buckets with zero exchange on the key, and only 8-byte hashes
    * ever shuffle — the payload bytes never leave their scan.
    * Partitioned by `ingest_batch` (base = −1) for [[phashBatch]]'s
    * replay-idempotent appends. */
  def writePhashTable(media: DataFrame, table: String, path: String,
                      buckets: Int = 64, maxHamming: Int = 3): Unit =
    phashBanded(media, maxHamming)
      // pin column order: appends resolve positionally (the
      // writeMinhashTable rationale)
      .select(col("doc_id"), col("phash"), col("bucket"))
      .withColumn("ingest_batch", lit(-1L))
      .write.format("parquet").partitionBy("ingest_batch")
      .bucketBy(buckets, "bucket").sortBy("bucket")
      .option("path", path).mode("overwrite").saveAsTable(table)

  /** D13 over the materialized table: identical VERIFIED pair
    * semantics to [[imagePhashPairs]] (uncapped), but the candidate
    * self-join reads the bucketed table — no re-decode, no shuffle on
    * the bucket key (plan-proved in ImageDedupSpec). */
  def phashFromTable(spark: org.apache.spark.sql.SparkSession,
                     table: String, maxHamming: Int = 3): DataFrame = {
    val t = spark.table(table).hint("merge")
    t.as("a").join(t.as("b"),
        col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** One micro-batch of the arrival-time D13 flow (the [[minhashBatch]]
    * shape, image edition): hash + band the batch ONCE, (a) verified
    * pairs vs the corpus table — excluding this batch's own replayed
    * partition, (b) verified within-batch pairs, (c) the replay-safe
    * static-partition append. Per-batch cost is O(batch × bucket
    * density), independent of corpus size; `maxHamming` MUST match the
    * table build or the band spaces are disjoint (zero pairs, no error
    * to catch it). */
  def phashBatch(spark: org.apache.spark.sql.SparkSession,
                 table: String, batch: DataFrame, ingestBatch: Long,
                 maxHamming: Int = 3): DataFrame = {
    val raw = cachedAs("phashBatch_raw", phashBanded(batch, maxHamming))
    val corpus = spark.table(table)
      .filter(col("ingest_batch") =!= lit(ingestBatch)).hint("merge")
    def verified(pairs: DataFrame): DataFrame = pairs
      .filter(col("hamming") <= maxHamming)
    val vsCorpus = verified(corpus.as("a")
      .join(raw.as("b"), col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming")))
    val within = verified(raw.as("a")
      .join(raw.as("b"), col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming")))
    partitionOverwrite(raw.select(col("doc_id"), col("phash"), col("bucket")),
      table, ingestBatch, Seq("doc_id", "phash", "bucket"))
    vsCorpus.unionByName(within).distinct()
  }

  /** D5: embedding near-dup pairs — cosine ≥ tau over the `embeddings`
    * table. Implemented in [[Similarity.cosinePairs]]; kept in the D
    * inventory as the semantic "near-dup by embedding" entry. */
  def embeddingCosine(emb: DataFrame, tau: Double): DataFrame =
    Similarity.cosinePairs(emb, tau)

  /** D10: SemDeDup — semantic dedup via cluster-then-verify
    * ([[Similarity.semanticDedup]]); kept in the D inventory as the
    * paper-named flavor next to D5's exact and LSH spellings. */
  def semantic(emb: DataFrame, tau: Double): DataFrame =
    Similarity.semanticDedup(emb, tau)

  /** D7: corpus-level similarity — one merged minhash signature per
    * group (source/shard/snapshot) via the [[graft.functions.AggExprs
    * .MinHashMerge]] custom aggregate, then estimated Jaccard between
    * every group pair as the fraction of agreeing slots. Detects
    * wholesale near-duplication BETWEEN corpora with one aggregation
    * pass + a tiny groups² self-join — no pairwise document work at
    * all, the cheapest first look before committing to D2/D3 at
    * 100 TB. */
  def corpusSimilarity(docs: DataFrame, groupCol: String): DataFrame = {
    graft.functions.VecExprs.register(docs.sparkSession)
    // md5-derived slot hashes (the minhashBands signature): the merged
    // per-group signature is the per-slot min over every member doc's
    // grams, which the DuckDB mirror recomputes exactly — D7 is
    // hash-green (est_jaccard is an integer count / 32, no float risk)
    val sigs = docs
      .select(col(groupCol), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col(groupCol),
        call_function("graft_minhash32_md5", col("toks")).as("sig"))
      .groupBy(col(groupCol))
      .agg(call_function("graft_minhash_merge32", col("sig")).as("corpus_sig"),
        count(lit(1)).as("n_docs"))
    sigs.as("a").join(sigs.as("b"),
        col(s"a.$groupCol") < col(s"b.$groupCol"))
      .select(col(s"a.$groupCol").as("group_a"), col(s"b.$groupCol").as("group_b"),
        col("a.n_docs").as("n_a"), col("b.n_docs").as("n_b"),
        (size(filter(zip_with(col("a.corpus_sig"), col("b.corpus_sig"),
          (x, y) => x === y), b => b)).cast("double") / lit(32.0))
          .as("est_jaccard"))
  }

  /** Keep-one view over any pair list: survivors are docs never
    * named on the `doc_b` side of a pair. For the a<b-ordered pair
    * lists (D2–D5, D10) that IS min-id canonicalization; for
    * [[incrementalJaccard]] pairs (doc_a = corpus, doc_b = arrival,
    * regardless of id order) it is keep-the-corpus-copy. Don't mix
    * the two policies in one survivors call — canonicalize the pair
    * list first if uniting them. */
  def survivors(docs: DataFrame, pairs: DataFrame): DataFrame =
    docs.join(pairs.select(col("doc_b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** D6 for the embedding pair operators (D5/D5b/D10): vectors that
    * survive when every `(vec_a, vec_b)` pair drops its higher id —
    * the DEPLOY output of embedding dedup. The pair LIST is the
    * diagnostic artifact and inherently ~quadratic on clustered
    * corpora (sf1 measured it); what a production run materializes is
    * THIS — O(n) rows regardless of how clustered the corpus is.
    * Zero-norm vectors never pair, so they survive by construction on
    * both engines. Pairs ≪ corpus → AQE broadcasts the anti-join. */
  def embeddingSurvivors(emb: DataFrame, pairs: DataFrame): DataFrame =
    emb.select(col("vec_id")).join(
      pairs.select(col("vec_b").as("vec_id")).distinct(),
      Seq("vec_id"), "left_anti")

  /** The shared decontamination finalize: joined gram hits grouped
    * per (corpus doc, bench doc), kept at ≥ minShared — one spelling
    * for all three flavors (broadcast, Bloom, frozen-signature) whose
    * row-identity the specs assert. */
  private def sharedGramsAtLeast(joined: DataFrame, minShared: Int): DataFrame =
    joined.groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("shared_grams"))
      .filter(col("shared_grams") >= minShared)

  /** D9: benchmark decontamination — the train/eval hygiene pass every
    * LLM data pipeline runs before training: flag corpus documents
    * sharing at least `minShared` distinct word 3-grams with any
    * single benchmark (eval-set) document, reporting each offending
    * (corpus doc, benchmark doc, overlap) pair.
    *
    * Scale posture: the benchmark side is small by nature (eval sets
    * are thousands of docs, the corpus is billions) — its exploded
    * gram table broadcasts, the corpus gram stream equi-joins on the
    * 64-bit gram hash without shuffling, and the count aggregation
    * groups on (corpus doc, bench doc) with map-side partials.
    *
    * `maxDf` drops grams above that document frequency from BOTH sides
    * before the join (the [[capGramDf]] rationale: one boilerplate gram
    * shared by a bench doc and 10⁶ corpus docs explodes the join output
    * 10⁶-fold while signalling nothing). `shared_grams` then counts
    * shared INFORMATIVE grams — document the threshold next to the
    * `minShared` policy it feeds.
    */
  def contamination(docs: DataFrame, isBenchmark: Column,
                    minShared: Int,
                    maxDf: Long = Long.MaxValue): DataFrame = {
    graft.functions.VecExprs.register(docs.sparkSession)
    // cachedAs(): both filter branches read the exploded gram table —
    // uncached, each branch would re-scan and re-shingle the corpus
    // (the same both-branches pattern as ngramJaccard)
    // coalesce(flag, false): a NULL benchmark flag must mean "corpus
    // doc, check it" — under three-valued logic a null would fail
    // BOTH filters below and the doc would silently skip
    // decontamination (a false negative in a hygiene pass)
    val raw = cachedAs("contamination",
      docs.select(col("doc_id"), coalesce(isBenchmark, lit(false)).as("is_bench"),
        explode(gramHashes(col("text"))).as("gh")))
    val g =
      if (maxDf == Long.MaxValue) raw
      else raw.join(broadcast(hotGrams(raw, maxDf)), Seq("gh"), "left_anti")
    val bench = g.filter(col("is_bench")).select(col("doc_id").as("bench_id"), col("gh"))
    val corpus = g.filter(!col("is_bench")).select(col("doc_id"), col("gh"))
    sharedGramsAtLeast(corpus.join(broadcast(bench), Seq("gh")), minShared)
  }

  /** D9 at benchmark-suite scale: [[contamination]] with a Bloom-filter
    * pre-cut instead of a broadcast bench side. The broadcast flavor
    * assumes the bench gram table fits in every executor as a hash
    * relation; a full eval SUITE (hundreds of benchmarks × contest
    * problems × solutions) can run to 10⁸+ grams, where the broadcast
    * fails but a Bloom filter of the same key set is still a few
    * hundred MB of BITS — built distributed (per-partition sketches,
    * merged on the driver: O(bits), never O(rows)), shipped once per
    * task, probed inside the scan stage by a codegen'd expression
    * ([[graft.functions.VecExprs.BloomMightContain]]).
    *
    * Exactness is preserved: the probe only PRE-FILTERS (false
    * positives pass, never false negatives), and the exact equi-join
    * behind it re-checks every survivor — so the output is row-for-row
    * [[contamination]]'s (spec-asserted). What changes is the join's
    * traffic: only the ~`fpp` false-positive fraction of clean-corpus
    * grams (plus true hits) reaches the shuffle, instead of the whole
    * corpus gram stream. At 100 TB that is the difference between
    * shuffling ~10¹¹ gram rows and ~10⁹.
    *
    * `fpp` trades sketch size for shuffle traffic (1% ≈ 9.6 bits/key).
    * `maxDf` caps gram document frequency exactly as in
    * [[contamination]]. */
  /** D9d: FUZZY (Jaccard-normalized) decontamination — corpus docs
    * whose df-capped 3-gram Jaccard against any single benchmark doc
    * reaches `tau`: the paraphrase-robust sibling of [[contamination]]
    * (an absolute shared-gram count can't tell a long doc quoting 3
    * grams from a short doc that IS the benchmark lightly rewritten —
    * GPT-3's decontamination removes fuzzy near-dups of eval docs for
    * exactly this reason, Brown et al. 2020 App. C).
    *
    * Same scale posture as D9: the bench gram table broadcasts, the
    * corpus gram stream equi-joins on the 64-bit gram hash, the
    * (doc, bench) aggregation runs with map-side partials. `maxDf`
    * drops boilerplate grams from BOTH sides and the denominators
    * recompute over KEPT grams (the D3b exactness contract — the
    * result stays an exact Jaccard over the informative gram
    * subspace). Output: every offending pair with its set sizes and
    * the Jaccard, ready for D6-style survivor composition. */
  def contaminationFuzzy(docs: DataFrame, isBenchmark: Column, tau: Double,
                         maxDf: Long = Long.MaxValue): DataFrame = {
    graft.functions.VecExprs.register(docs.sparkSession)
    // cachedAs: the hot-gram aggregate, the sizes aggregate, and both
    // join sides read the exploded gram table (the contamination
    // rationale); coalesce(flag): NULL = corpus doc, check it
    val raw = cachedAs("contamination_fuzzy",
      docs.select(col("doc_id"),
        coalesce(isBenchmark, lit(false)).as("is_bench"),
        explode(gramHashes(col("text"))).as("gh")))
    val g = if (maxDf == Long.MaxValue) raw
            else raw.join(broadcast(hotGrams(raw, maxDf)), Seq("gh"), "left_anti")
    val sizes = g.groupBy(col("doc_id"), col("is_bench"))
      .agg(count(lit(1)).as("n"))
    val bench = g.filter(col("is_bench"))
      .select(col("doc_id").as("bench_id"), col("gh"))
    val corpus = g.filter(!col("is_bench")).select(col("doc_id"), col("gh"))
    corpus.join(broadcast(bench), Seq("gh"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.filter(!col("is_bench"))
        .select(col("doc_id"), col("n").as("n_doc")), Seq("doc_id"))
      .join(broadcast(sizes.filter(col("is_bench"))
        .select(col("doc_id").as("bench_id"), col("n").as("n_bench"))),
        Seq("bench_id"))
      .withColumn("jaccard",
        col("inter") / (col("n_doc") + col("n_bench") - col("inter")))
      .filter(col("jaccard") >= tau)
      .select("doc_id", "bench_id", "inter", "n_doc", "n_bench", "jaccard")
  }

  def contaminationBloom(docs: DataFrame, isBenchmark: Column,
                         minShared: Int,
                         maxDf: Long = Long.MaxValue,
                         fpp: Double = 0.01): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.VecExprs.register(spark)
    val raw = cachedAs("contamination_bloom",
      docs.select(col("doc_id"), coalesce(isBenchmark, lit(false)).as("is_bench"),
        explode(gramHashes(col("text"))).as("gh")))  // null flag = corpus (see contamination)
    val g =
      if (maxDf == Long.MaxValue) raw
      else raw.join(broadcast(hotGrams(raw, maxDf)), Seq("gh"), "left_anti")
    val bench = g.filter(col("is_bench")).select(col("doc_id").as("bench_id"), col("gh"))
    val corpus = g.filter(!col("is_bench")).select(col("doc_id"), col("gh"))
    // row count upper-bounds distinct grams — a slightly oversized
    // sketch costs bits, an undersized one costs fpp; never a result
    val expected = math.max(bench.count(), 64L)
    val bloom = bench.stat.bloomFilter("gh", expected, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos); bos.toByteArray
    }
    val pre = graft.functions.VecExprs.withBloomContains(spark, bytes) { fn =>
      corpus.filter(expr(s"$fn(gh)"))
    }
    // exact re-check of the pre-filter's survivors; deliberately NOT
    // broadcast — the premise is that the bench side doesn't fit
    sharedGramsAtLeast(pre.join(bench, Seq("gh")), minShared)
  }

  /** Build-once benchmark signature for arrival-time decontamination:
    * writes the bench gram table `(bench_id, gh)` to `path` and
    * returns the Bloom sketch bytes of its gram set — the two frozen
    * artifacts [[contaminationAgainst]] (and
    * [[graft.streaming.EventStream.streamingContamination]]) probe
    * per batch. The sketch is built from the WRITTEN table, so it is
    * exactly the on-disk key set. `benchMaxDf` drops grams appearing
    * in more than that many bench docs at build time ([[contamination]]'s
    * boilerplate rationale, frozen with the signature — a streaming
    * corpus can't supply a corpus-side df upfront). */
  def writeBenchSignature(benchDocs: DataFrame, path: String,
                          fpp: Double = 0.01,
                          benchMaxDf: Long = Long.MaxValue): Array[Byte] = {
    val spark = benchDocs.sparkSession
    graft.functions.VecExprs.register(spark)
    val g0 = benchDocs.select(col("doc_id").as("bench_id"),
      explode(gramHashes(col("text"))).as("gh"))
    // capped path reads g0 three times (hot aggregate, anti-join probe
    // side, write scan) — cache for the build, free after the write
    // (the writeSignatureTable rationale)
    val cached = if (benchMaxDf == Long.MaxValue) None else Some(g0.cache())
    try {
      val g = cached.fold(g0)(c =>
        c.join(broadcast(hotGrams(c, benchMaxDf)), Seq("gh"), "left_anti"))
      g.write.mode("overwrite").parquet(path)
    } finally cached.foreach(_.unpersist(false))
    val written = spark.read.parquet(path)
    val expected = math.max(written.count(), 64L)
    val bloom = written.stat.bloomFilter("gh", expected, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** Decontaminate a document frame against a frozen
    * [[writeBenchSignature]] artifact: [[contaminationBloom]]'s shape
    * with the sketch prebuilt — the Bloom probe rides the docs scan,
    * the exact equi-join re-checks survivors against the signature
    * table, the bench side never broadcasts. Works identically on a
    * batch frame and inside `foreachBatch` (the streaming wrapper
    * passes micro-batches straight through). */
  def contaminationAgainst(docs: DataFrame, benchPath: String,
                           sketch: Array[Byte], minShared: Int): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.VecExprs.register(spark)
    val grams = docs.select(col("doc_id"),
      explode(gramHashes(col("text"))).as("gh"))
    val pre = graft.functions.VecExprs.withBloomContains(spark, sketch) { fn =>
      grams.filter(expr(s"$fn(gh)"))
    }
    sharedGramsAtLeast(pre.join(spark.read.parquet(benchPath), Seq("gh")),
      minShared)
  }

  /** Dedup-candidate quality (r12) — the pair flavor of the eval
    * layer ([[graft.operators.Retrieval.evalTopK]] is the ranking
    * flavor): precision / recall / F1 of a candidate pair set
    * against a reference pair set, the offline audit every dedup
    * deploy runs when tuning bands/thresholds (how much does the LSH
    * shortlist miss, and how much junk does it admit, vs exact
    * Jaccard truth).
    *
    * Both inputs are `(doc_a, doc_b)` frames; orientation is
    * NORMALIZED here (least/greatest before the distinct), so a
    * caller passing one side unordered is scored on the undirected
    * pair set it meant, never double-penalized as both fp and fn
    * (r12 ADVICE — for the canonical doc_a < doc_b sets every
    * generator here emits, the normalization is a no-op).
    * tp/fp/fn come from ONE full-outer equi-join on the pair key
    * (scale shape: a shuffle on the pair key, never a cross);
    * precision6 = 1e6·tp/(tp+fp), recall6 = 1e6·tp/(tp+fn) and
    * f16 = 1e6·2tp/(2tp+fp+fn) — F1's harmonic mean collapses to
    * that single exact quotient — all half-up scale-6 integers (the
    * cross-engine arithmetic), zero when the denominator is empty. */
  def evalPairs(cand: DataFrame, ref: DataFrame): DataFrame = {
    def canon(df: DataFrame) = df.select(
      least(col("doc_a"), col("doc_b")).as("doc_a"),
      greatest(col("doc_a"), col("doc_b")).as("doc_b")).distinct()
    val c = canon(cand).withColumn("ic", lit(1L))
    val r = canon(ref).withColumn("ir", lit(1L))
    c.join(r, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(when(col("ic") === 1L && col("ir") === 1L, 1L).otherwise(0L))
          .as("tp0"),
        sum(when(col("ic") === 1L && col("ir").isNull, 1L).otherwise(0L))
          .as("fp0"),
        sum(when(col("ic").isNull && col("ir") === 1L, 1L).otherwise(0L))
          .as("fn0"))
      .select(coalesce(col("tp0"), lit(0L)).as("tp"),
        coalesce(col("fp0"), lit(0L)).as("fp"),
        coalesce(col("fn0"), lit(0L)).as("fn"))
      .select(col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") === 0L, lit(0.0))
          .otherwise(expr("(2 * 1000000 * tp + (tp + fp)) div (2 * (tp + fp))")
            .cast("double") / lit(1e6)).as("prec"),
        when(col("tp") + col("fn") === 0L, lit(0.0))
          .otherwise(expr("(2 * 1000000 * tp + (tp + fn)) div (2 * (tp + fn))")
            .cast("double") / lit(1e6)).as("rec"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") === 0L, lit(0.0))
          .otherwise(expr(
            "(2 * 1000000 * 2 * tp + (2 * tp + fp + fn)) div (2 * (2 * tp + fp + fn))")
            .cast("double") / lit(1e6)).as("f1"))
  }

  /** Clustering agreement (r12) — the third flavor of the eval layer
    * (ranking: [[graft.operators.Retrieval.evalTopK]]; pairs:
    * [[evalPairs]]): the Adjusted Rand Index between two labelings of
    * the same id universe, the standard audit for "do two clusterings
    * agree beyond chance" (Hubert & Arabie 1985) — e.g. lexical vs
    * semantic near-dup components before committing to one dedup
    * signal.
    *
    * Inputs are `(doc_id, cluster_id)` frames covering the SAME ids.
    * Work: one equi-join on doc_id, one contingency aggregate
    * (cells ≤ |labels_a|·|labels_b|, in practice ≪ n), and bounded
    * one-row reductions — scale shape is two shuffles over n rows.
    *
    * Exactness: ARI is a RATIONAL in pair counts — with T = C(n,2),
    * Sij = Σ C(n_ij,2), Sa = Σ C(a_i,2), Sb = Σ C(b_j,2):
    * num2 = 2·T·Sij − 2·Sa·Sb, den2 = T·(Sa+Sb) − 2·Sa·Sb, ARI =
    * num2/den2 — the products run in DECIMAL(38,0) from the start
    * (r12 review: in longs, 2·T·Sij overflows ANSI-loud already at
    * n ≈ 65k with one mega-cluster — T must stay under 2^31 for
    * 2T² < 2^63; decimals extend that to the REQUIRED n ≤ 6e7
    * bound, where 2e6·2T² still fits 38 digits), rounded
    * half-up at scale 6 on the ABSOLUTE value so the floor division
    * never sees a negative operand (Spark `div` and DuckDB `//`
    * disagree on negatives). den2 = 0 (two trivial partitions)
    * returns the identical-partition convention 1.0.
    *
    * Contract: the two labelings must each label every id ONCE and
    * cover the SAME id universe — ENFORCED via distinct counts (an
    * inner join silently computing the ARI of the intersection, or a
    * duplicated id double-counting its row, would report on a
    * different population than asked). Size bound: the exact scale-6
    * rounding needs 2e6·|num2| ≤ 2e6·2T² inside DECIMAL(38,0), so
    * n ≤ 6e7 ids — REQUIRED loudly; an audit at larger n should
    * sample first (the CorpusPrepJob audit posture). */
  def evalClustering(a: DataFrame, b: DataFrame): DataFrame = {
    val j = a.select(col("doc_id"), col("cluster_id").as("la"))
      .join(b.select(col("doc_id"), col("cluster_id").as("lb")), Seq("doc_id"))
    val cells = cachedAs("evalClustering_cells",
      j.groupBy(col("la"), col("lb")).agg(count(lit(1)).as("nij")))
    // n from the CACHED cells (Σ nij ≡ |join|), never a second
    // execution of the n-row join — and the id-universe check rides
    // distinct counts, so duplicate ids can't fake a matching total
    // (second review pass)
    val n = cells.agg(coalesce(sum(col("nij")), lit(0L)).as("n"))
    val nJ = n.head().getLong(0)
    def sides(df: DataFrame) = {
      val r = df.agg(count(lit(1)), countDistinct(col("doc_id"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val ((nA, dA), (nB, dB)) = (sides(a), sides(b))
    require(nA == dA && nB == dB,
      s"evalClustering: labelings must label each id once — " +
        s"|a|=$nA distinct=$dA, |b|=$nB distinct=$dB")
    require(nA == nJ && nB == nJ,
      s"evalClustering: labelings must cover the same id universe — " +
        s"|a|=$nA, |b|=$nB, |a ⋈ b|=$nJ (an intersection ARI would " +
        "report on a different population than asked)")
    require(nJ <= 60000000L,
      s"evalClustering: n=$nJ exceeds the exact-rounding bound " +
        "(2e6·2T² must fit DECIMAL(38,0), so n ≤ 6e7) — sample the " +
        "labelings before auditing, as the prep-job audit does")
    val sij = cells.agg(coalesce(
      sum(expr("(nij * (nij - 1)) div 2")), lit(0L)).as("s_ab"))
    val sa = cells.groupBy(col("la")).agg(sum(col("nij")).as("ai"))
      .agg(coalesce(sum(expr("(ai * (ai - 1)) div 2")), lit(0L)).as("s_a"))
    val sb = cells.groupBy(col("lb")).agg(sum(col("nij")).as("bj"))
      .agg(coalesce(sum(expr("(bj * (bj - 1)) div 2")), lit(0L)).as("s_b"))
    // four 1-row frames (the Corpus count-cross pattern)
    val D = "DECIMAL(38,0)"
    n.crossJoin(sij).crossJoin(sa).crossJoin(sb)
      .withColumn("t", expr(s"CAST((n * (n - 1)) div 2 AS $D)"))
      .withColumn("num2",
        expr(s"2 * t * CAST(s_ab AS $D) - 2 * CAST(s_a AS $D) * CAST(s_b AS $D)"))
      .withColumn("den2",
        expr(s"t * CAST(s_a + s_b AS $D) - 2 * CAST(s_a AS $D) * CAST(s_b AS $D)"))
      .select(col("n"), col("s_ab"), col("s_a"), col("s_b"),
        when(col("den2") === lit(0), lit(1.0)).otherwise(
          expr("""CAST((CASE WHEN num2 < 0 THEN -1 ELSE 1 END) *
                 |  ((2 * 1000000 * abs(num2) + den2) div (2 * den2))
                 |  AS DOUBLE)""".stripMargin) / lit(1e6)).as("ari"))
  }

  /** D8: duplicate clustering — connected components over a candidate
    * pair list, labeling every document with the smallest doc_id in
    * its component (the canonical representative) plus the component
    * size. Pairwise dedup (D2–D5) says "a~b"; clustering turns that
    * into the transitive keep-one groups an actual corpus clean needs
    * (a~b, b~c ⟹ {a,b,c} is one cluster even when a,c never pair).
    *
    * Implementation: min-label propagation with pointer jumping —
    * each round every node takes the min of its own label and its
    * neighbors' labels (one equi-join + groupBy on node id, shuffle
    * key = node id), then compresses one hop through its label's own
    * label (a second self-join). The compression halves remaining
    * path lengths, so rounds needed = O(log diameter), not
    * O(diameter) (`maxIter` still guards and THROWS rather than
    * return a half-merged labeling). Convergence is read from one
    * cheap aggregate: labels only ever DECREASE, so an unchanged
    * label sum ⟺ a fixpoint — no per-round anti-join. The iteration
    * runs only on nodes that appear in a pair — the corpus-sized
    * singleton majority joins once at the end. `localCheckpoint`
    * truncates the per-round lineage so the plan stays O(1) deep
    * instead of O(rounds). At 100 TB the same loop holds (this is
    * the textbook large-scale CC shape).
    *
    * `saltBuckets > 1` runs the per-round neighbor-min through
    * [[Skew.saltedMin]]'s two-phase shape (salt on `dst`): hash-agg
    * partials already collapse each map task's rows per `src`, but a
    * mega-component hub whose adjacency dominates single partitions
    * (dedup pair lists are exactly where such hubs appear) gets its
    * first-phase spread over `saltBuckets` reducers. min is
    * reassociation-safe, so the labeling is identical either way
    * (spec-checked).
    */
  /** `localCheckpoint` + handles to the blocks it pinned:
    * `Dataset.unpersist` is a CacheManager call and does NOT free
    * checkpoint blocks (they are RDD-level MEMORY_AND_DISK persists,
    * reclaimed only when the RDD is GC'd) — so an iterative loop that
    * "unpersists" each round's Dataset actually pins O(rounds) label
    * copies. The delta of `getPersistentRDDs` around the checkpoint
    * call captures the new RDD(s) for an explicit `RDD.unpersist`
    * once the round is dead.
    *
    * r16: ONE shared implementation, [[Par.checkpointPinned]] —
    * locked registration (safe under the concurrency Par introduced),
    * AQE stages materialized before the lock, and a lazy flavor whose
    * materialization fuses with the caller's next action (clusters'
    * convergence sum — one job per round instead of two). */
  private def checkpointPinned(df: DataFrame, eager: Boolean = true)
      : (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) =
    Par.checkpointPinned(df, eager)

  /** D16: corpus DUPLICATION PROFILE — the D8 labeling collapsed to
    * the cluster-size histogram `(cluster_size, n_clusters, n_docs)`:
    * the "how duplicated is this corpus" audit a prep run publishes
    * before choosing its dedup budget (singleton mass rides as the
    * cluster_size = 1 row, so Σ n_docs is the corpus and the dedup
    * ratio 1 − Σn_clusters/Σn_docs falls straight out). Scale shape
    * beyond [[clusters]] itself: one partial-agg distinct on
    * (cluster_size, cluster_id) + one tiny-key groupBy — nothing
    * corpus-sized is new. Fully oracled via the shared D8 closure
    * CTEs. */
  def dedupProfile(docs: DataFrame, pairs: DataFrame): DataFrame =
    clusters(docs, pairs)
      .groupBy(col("cluster_size"))
      .agg(countDistinct(col("cluster_id")).as("n_clusters"),
        count(lit(1)).as("n_docs"))

  def clusters(docs: DataFrame, pairs: DataFrame, maxIter: Int = 25,
               saltBuckets: Int = 1): DataFrame = {
    // lazy checkpoints (r16): the init labelSum below materializes
    // edges AND labels in one job; each round's convergence sum
    // materializes that round's checkpoint — compute+persist+sum
    // fused, one job per round instead of two
    val (edges, edgePins) = checkpointPinned(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"))),
      eager = false)
    var (labels, labelPins) = checkpointPinned(
      edges.select(col("src").as("doc_id")).distinct()
        .withColumn("cluster_id", col("doc_id")), eager = false)
    // decimal sum: overflow-safe for any id domain
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).first() match {
        case r if r.isNullAt(0) => java.math.BigDecimal.ZERO // empty graph
        case r => r.getDecimal(0)
      }
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val adjacency = edges.join(labels, edges("dst") === labels("doc_id"))
      val nbrMin =
        if (saltBuckets <= 1)
          adjacency.groupBy(col("src")).agg(min(col("cluster_id")).as("nbr_min"))
        else
          Skew.saltedMin(adjacency.select(col("src"), col("dst"), col("cluster_id")),
            Seq("src"), "cluster_id", saltBy = "dst", salts = saltBuckets,
            out = "nbr_min")
      val prop = labels.as("l")
        .join(nbrMin, col("l.doc_id") === nbrMin("src"), "left")
        .select(col("l.doc_id").as("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
      val (next, nextPins) = checkpointPinned(prop.as("p")
        .join(prop.select(col("doc_id").as("hop_id"),
            col("cluster_id").as("hop_lbl")),
          col("p.cluster_id") === col("hop_id"), "left")
        .select(col("p.doc_id").as("doc_id"),
          least(col("p.cluster_id"), coalesce(col("hop_lbl"), col("p.cluster_id")))
            .as("cluster_id")), eager = false)
      // this sum is the round's ONE materialization (the lazy
      // checkpoint persists during it) — it must run before the
      // previous round's blocks are unpersisted below
      val s = labelSum(next)
      // next is materialized — the previous round's checkpoint BLOCKS
      // (freed via the RDD handles; see checkpointPinned) are dead
      // weight now; keep at most 2 label copies pinned, not O(rounds)
      labelPins.foreach(_.unpersist(false))
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      labelPins = nextPins
      iter += 1
    }
    // the final labels checkpoint is self-contained (truncated
    // lineage) — the edge list's blocks are dead weight from here on;
    // labels itself must stay pinned (the returned plan reads it)
    edgePins.foreach(_.unpersist(false))
    if (!converged)
      throw new IllegalStateException(
        s"clusters() did not converge in $maxIter rounds — component " +
          "diameter exceeds the bound; raise maxIter")
    // cluster_size as groupBy + join over the PAIR-NODE set, not a
    // window over the full corpus: every component member appears in
    // `labels` (both endpoints of every pair do), so counting there is
    // the component size, and singletons (absent from labels) are 1 by
    // definition. A window over the corpus' cluster_id would pin a
    // mega-component's every row to ONE task (window partitions are
    // semantically unsplittable); here the hot cluster collapses
    // map-side in the partial count, and the size join back — still
    // keyed on cluster_id but over only the pair-node subset — is a
    // plain shuffle join AQE can skew-split.
    val sizes = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    val labeled = labels.join(sizes, Seq("cluster_id"))
    docs.join(labeled, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"))
  }

  /** D11: EXACT-substring duplicate detection — two documents are
    * substring-duplicates when they share a VERBATIM run of
    * normalized tokens (Lee et al. 2022's ExactSubstr, the classic
    * "deduplicating training data" criterion that catches the
    * verbatim quotation/boilerplate reuse Jaccard dilutes away),
    * re-expressed relationally via WINNOWING (Schleimer et al. 2003,
    * the MOSS fingerprinter) instead of their suffix array: per doc,
    * hash every k-token window (md5 over the space-joined slice),
    * then in each sliding window of `w` consecutive hashes keep the
    * MINIMUM — selection depends only on content, so any shared run
    * of ≥ k+w−1 tokens yields an IDENTICAL fingerprint on both sides
    * regardless of where the run sits in each doc (the guarantee a
    * fixed-stride sample cannot give: absolute positions align only
    * by luck — caught by this spec's alignment sweep). A doc shorter
    * than w windows keeps its single overall-min fingerprint.
    * Fingerprints equi-join, pairs aggregate shared counts.
    *
    * Scale shape: winnowing keeps ~2/(w+1) of the window hashes —
    * the index is a content-defined sample, exploded per doc, ONE
    * groupBy on a uniform md5 key space. `maxDf` drops boilerplate
    * fingerprints shared by more than maxDf docs (the D3b cap),
    * bounding per-key pair fan-out ≤ maxDf². Hash equality stands in
    * for byte equality at ~2⁻⁶⁴ collision odds per pair — like the
    * reference implementations that match on 64-bit window hashes.
    * Per-doc fingerprints are DEDUPED before the join (a fingerprint
    * repeated inside one doc must not multiply the pair count). */
  def substringDedup(docs: DataFrame, k: Int = 16, w: Int = 8,
                     maxDf: Long = Long.MaxValue,
                     maxSegment: Int = 4096): DataFrame = {
    val fp = cachedAs("substringDedup",
      capFpDf(winnowFingerprints(docs, k, w, maxSegment), maxDf))
    substringPairs(fp)
  }

  /** The per-doc winnowing fingerprint set `(doc_id, wh)` every D11
    * flavor shares — in-memory self-join, bucketed table write, and
    * incremental batches all live in the same fingerprint space.
    *
    * SEGMENTED: tokens are cut into slices of `maxSegment` tokens
    * whose starts advance by S = maxSegment − (k+w−2) — i.e.
    * consecutive slices overlap by k+w−2 tokens — and each slice is
    * windowed+winnowed independently. The union of per-segment
    * fingerprints is PROVABLY the unsegmented set: hash i depends
    * only on tokens [i, i+k−1] and frame p only on hashes
    * [p, p+w−1], so segment s (tokens [sS, sS+maxSegment−1]) computes
    * winnow starts [sS, sS+S−1] with exactly the global hash values;
    * the starts tile [0, nh−w] with no gaps or disagreements
    * (SubstringDedupSpec asserts set-equality across segment sizes).
    * The point is the WINDOW partition: unsegmented, one multi-GB
    * document's whole hash stream lands in a single task (window
    * partitions are semantically unsplittable); segmented, the
    * partition key is (doc_id, seg) and a giant doc spreads over
    * ~nTokens/S tasks — bounded task size at any document size. */
  def winnowFingerprints(docs: DataFrame, k: Int = 16, w: Int = 8,
                         maxSegment: Int = 4096): DataFrame = {
    require(k >= 2, s"window length k=$k must be ≥ 2")
    require(w >= 1, s"winnow width w=$w must be ≥ 1")
    require(maxSegment >= k + w,
      s"maxSegment=$maxSegment must be ≥ k+w=${k + w} (a segment must " +
        "hold at least one full winnow frame past its stride)")
    val stride = maxSegment - (k + w - 2)
    // Shape notes, both learned the hard way:
    //  - the winnow min runs as a per-segment SLIDING WINDOW over the
    //    EXPLODED hash rows, never as a second array lambda over an
    //    `hs` column: projection collapse inlines a referenced array
    //    column into every lambda invocation, re-evaluating the
    //    O(n·md5) transform once per fingerprint — O(n²) md5 calls,
    //    measured 258s at sf0.1 vs ~1s for this shape (the PERF.md
    //    HOF-re-evaluation hazard). Generate evaluates its input
    //    once per row, so exploding is the O(n) spelling.
    //  - every expression under an explode is TOTAL (greatest(…, 1)
    //    floors each sequence bound): InferFiltersFromGenerate clones
    //    generator inputs into an inferred filter below these
    //    projections, where the ≥k row filter no longer shields a
    //    partial expression — a bare `sequence(1, size−c)` goes
    //    DESCENDING through 0 on a short doc and slice throws.
    // The trailing-window filter keeps winnow starts only (0-based
    // pos ≤ nh_s−w), except a shorter-than-w doc (necessarily single-
    // segment: multi-segment docs have nh ≥ S+w > w, and every
    // segment of one holds ≥ w hashes) keeps pos 0 — its truncated
    // frame IS the overall min (the oracle's greatest floor mirrors
    // this). In multi-segment docs last_pos ≥ 0 everywhere, so the
    // greatest(…, 0) is inert there.
    val winnow = Window.partitionBy(col("doc_id"), col("seg"))
      .orderBy(col("pos")).rowsBetween(Window.currentRow, w - 1)
    docs
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= k)
      // nSegs = (max(nh−w, 0)) div S + 1 where nh = nt−k+1; the
      // sequence is total (bounds ≥ 0 always)
      .select(col("doc_id"), col("t"),
        explode(expr(
          s"sequence(0, greatest(size(t) - ${k - 1 + w}, 0) div $stride)"))
          .as("seg"))
      .select(col("doc_id"), col("seg"),
        expr(s"slice(t, seg * $stride + 1, $maxSegment)").as("ts"))
      .select(col("doc_id"), col("seg"),
        (greatest(size(col("ts")) - (k - 1), lit(1)) - w).as("last_pos"),
        posexplode(expr(
          s"transform(sequence(1, greatest(size(ts) - ${k - 1}, 1)), " +
            s"i -> md5(concat_ws(' ', slice(ts, i, $k))))")))
      .withColumn("wh", min(col("col")).over(winnow))
      .filter(col("pos") <= greatest(col("last_pos"), lit(0)))
      .select(col("doc_id"), col("wh"))
      .distinct()
  }

  /** The candidate self-join + shared-count tail over a fingerprint
    * set `(doc_id, wh)` — shared by the in-memory flow and the
    * bucketed-table flow so pair semantics can never diverge. */
  private def substringPairs(fp: DataFrame): DataFrame =
    fp.as("a").join(fp.as("b"), Seq("wh"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))

  /** Fingerprints shared by more than `maxDf` documents — the
    * boilerplate tail (license headers, nav chrome: a verbatim 23-token
    * run in 10⁶ docs is one join key holding ~10¹² candidate pairs,
    * exactly D3's hot-gram failure). Tiny by Zipf: bounded by
    * distinct-fingerprints/maxDf, so it broadcasts. */
  private def hotFingerprints(fp: DataFrame, maxDf: Long): DataFrame =
    fp.groupBy(col("wh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("wh")

  /** Drop a hot-fingerprint list — unlike the Jaccard cap there are
    * no set-size denominators to resize (n_shared counts kept
    * fingerprints only), so the cap is one broadcast anti-join. */
  private def dropHotFps(fp: DataFrame, hot: DataFrame): DataFrame =
    fp.join(broadcast(hot), Seq("wh"), "left_anti")

  private def capFpDf(fp: DataFrame, maxDf: Long): DataFrame =
    if (maxDf == Long.MaxValue) fp else dropHotFps(fp, hotFingerprints(fp, maxDf))

  /** Fingerprint document frequency — the tuning probe for
    * [[substringDedup]]'s `maxDf` (pick the threshold off this
    * distribution's tail before a 100 TB run), mirroring
    * [[gramDocFrequencies]]. */
  def fingerprintDocFrequencies(docs: DataFrame, k: Int = 16, w: Int = 8,
                                maxSegment: Int = 4096): DataFrame =
    winnowFingerprints(docs, k, w, maxSegment)
      .groupBy(col("wh")).agg(count(lit(1)).as("df"))

  /** Materialize the winnowing fingerprint set BUCKETED on the
    * fingerprint — D11's deploy-time flow, mirroring
    * [[writeSignatureTable]]: at 100 TB the corpus is fingerprinted
    * once (one shuffle into `buckets` file-sets) and every later
    * candidate self-join or incremental batch reads co-located
    * buckets with ZERO exchange on `wh` (plan-proved in
    * SubstringDedupSpec). Partitioned by `ingest_batch` (base = −1)
    * for [[appendToFingerprintTable]]'s replay idempotence. With a
    * finite `maxDf` the table is born capped and the dropped
    * fingerprints land in `<table>_hot` (at `<path>_hot`) so
    * incremental batches cap symmetrically. */
  def writeFingerprintTable(docs: DataFrame, table: String, path: String,
                            buckets: Int = 64,
                            k: Int = 16, w: Int = 8,
                            maxDf: Long = Long.MaxValue,
                            maxSegment: Int = 4096): Unit = {
    val spark = docs.sparkSession
    def writeMain(fp: DataFrame): Unit =
      fp.withColumn("ingest_batch", lit(-1L))
        .write.format("parquet").partitionBy("ingest_batch")
        .bucketBy(buckets, "wh").sortBy("wh")
        .option("path", path).mode("overwrite").saveAsTable(table)
    val fp0 = winnowFingerprints(docs, k, w, maxSegment)
    if (maxDf == Long.MaxValue) {
      // a stale `_hot` companion from an earlier capped build must not
      // survive an uncapped rebuild (the writeSignatureTable rationale:
      // batches would keep dropping fingerprints against a cap the
      // corpus side no longer applies)
      spark.sql(s"DROP TABLE IF EXISTS ${table}_hot")
      val hp = new org.apache.hadoop.fs.Path(s"${path}_hot")
      hp.getFileSystem(spark.sessionState.newHadoopConf()).delete(hp, true)
      writeMain(fp0)
    } else {
      // cache the fingerprint set: the hot-table write and the
      // anti-join otherwise each re-tokenize, re-hash, and re-winnow
      // the whole corpus (two full passes at 100 TB)
      val cached = fp0.cache()
      try {
        hotFingerprints(cached, maxDf)
          .write.format("parquet").option("path", s"${path}_hot")
          .mode("overwrite").saveAsTable(s"${table}_hot")
        writeMain(dropHotFps(cached, spark.table(s"${table}_hot")))
      } finally cached.unpersist(false)
    }
  }

  /** D11 over a materialized fingerprint table: identical pair
    * semantics to [[substringDedup]], but the candidate self-join
    * reads the bucketed table — no re-fingerprinting, no shuffle on
    * `wh`. */
  def substringFromTable(spark: org.apache.spark.sql.SparkSession,
                         table: String): DataFrame =
    substringPairs(spark.table(table).hint("merge"))

  /** Incremental D11 — substring pairs between a NEW document batch
    * and the materialized fingerprint table, without touching corpus
    * text (the [[incrementalJaccard]] shape: batch fingerprints,
    * small, shuffle into the table's bucketing; the corpus side reads
    * its co-located buckets in place — per-batch cost independent of
    * corpus size). Pairs come back as (corpus doc_a, new doc_b);
    * new-vs-new pairs are [[substringDedup]] on the batch alone.
    *
    * `hotTable`: when the table was written with a `maxDf` cap, pass
    * its `<table>_hot` side table so batch fingerprints are dropped
    * symmetrically. `excludeIngestBatch`: drop that partition from
    * the corpus side (partition-pruned) — under crash-replay the
    * batch's own fingerprints are already in the table and every
    * within-batch pair would otherwise come back doubled. */
  def incrementalSubstring(spark: org.apache.spark.sql.SparkSession,
                           table: String, newDocs: DataFrame,
                           k: Int = 16, w: Int = 8,
                           hotTable: Option[String] = None,
                           excludeIngestBatch: Option[Long] = None,
                           maxSegment: Int = 4096): DataFrame = {
    val newFp = hotTable.foldLeft(
      winnowFingerprints(newDocs, k, w, maxSegment))(
      (fp, h) => dropHotFps(fp, spark.table(h)))
    val corpus = excludeIngestBatch.fold(spark.table(table))(b =>
      spark.table(table).filter(col("ingest_batch") =!= lit(b)))
    corpus.hint("merge").as("a")
      .join(newFp.as("b"), col("a.wh") === col("b.wh") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Append a batch's fingerprints to the materialized table (the
    * arrival-time state update — next [[incrementalSubstring]] sees
    * these docs). Same replay-safe STATIC partition overwrite as
    * [[appendToSignatureTable]]: re-running an `ingestBatch` REPLACES
    * that partition instead of duplicating rows (a plain append under
    * at-least-once replay would double the replayed docs' (doc_id,
    * wh) rows and corrupt every later shared count); `insertInto`
    * through the table's own bucket spec keeps appended files
    * co-located on `wh`. The base corpus is batch −1. */
  def appendToFingerprintTable(docs: DataFrame, table: String,
                               ingestBatch: Long,
                               hotTable: Option[String] = None,
                               k: Int = 16, w: Int = 8,
                               maxSegment: Int = 4096): Unit = {
    val spark = docs.sparkSession
    val fp = hotTable.foldLeft(
      winnowFingerprints(docs, k, w, maxSegment))(
      (f, h) => dropHotFps(f, spark.table(h)))
    fpOverwrite(fp, table, ingestBatch)
  }

  private def fpOverwrite(fp: DataFrame, table: String,
                          ingestBatch: Long): Unit =
    partitionOverwrite(fp, table, ingestBatch, Seq("doc_id", "wh"))

  /** One micro-batch of the arrival-time D11 flow, fingerprinted ONCE
    * (the [[dedupBatch]] shape for winnowing): (a) shared-substring
    * pairs vs the corpus fingerprint table — excluding this batch's
    * own replayed rows, (b) within-batch pairs in the SAME frozen
    * capped fingerprint subspace, (c) the replay-safe append. Returns
    * (a) ∪ (b) for the caller's onPairs hook. */
  private[graft] def substringBatch(spark: org.apache.spark.sql.SparkSession,
                                    table: String, batch: DataFrame,
                                    hotTable: Option[String],
                                    ingestBatch: Long,
                                    k: Int = 16, w: Int = 8,
                                    maxSegment: Int = 4096): DataFrame = {
    val raw = cachedAs("substringBatch_raw",
      winnowFingerprints(batch, k, w, maxSegment))
    // the capped set gets its own slot only when a cap exists (the
    // dedupBatch rationale: slotting `raw` twice would let one slot's
    // replacement unpersist the other's blocks mid-batch)
    val fp = hotTable.fold(raw)(h =>
      cachedAs("substringBatch_capped", dropHotFps(raw, spark.table(h))))
    val vsCorpus = spark.table(table)
      .filter(col("ingest_batch") =!= lit(ingestBatch)).hint("merge").as("a")
      .join(fp.as("b"), col("a.wh") === col("b.wh") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    val within = substringPairs(fp)
    fpOverwrite(fp, table, ingestBatch)
    vsCorpus.unionByName(within)
  }
}
