package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Rows-only queries (no oracle mirror) additionally carry ROW
  * INVARIANTS: the DuckDB hash gate can't see them, so a regression
  * that silently empties or collapses one (a filter that drops
  * everything, a serve returning k/2 neighbors) would otherwise still
  * read as green. Verify counts every written result and exits
  * non-zero when a rows-only query misses its declared exact count
  * ([[SparkEntry.computedRowChecks]]) or floor ([[SparkEntry.rowFloors]]).
  *
  * Approximate queries additionally carry RECALL gates
  * ([[SparkEntry.recallChecks]]): recall vs the exact baseline is
  * measured from the just-written outputs, emitted as
  * VERIFY_RECALL.json (outDir + cwd) so the driver sees drift
  * round-over-round, and enforced against per-query floors. */
object Verify {

  /** Rows-only entries whose written output misses an invariant:
    * below the declared floor (the larger of [[SparkEntry.rowFloors]]
    * and `computedFloors`, default 1 = non-empty), off the declared
    * EXACT count (both directions — a padded serve is as red as a
    * collapsed one), or absent entirely. Pure — the spec drives it
    * with synthetic counts. */
  def floorFailures(rowCounts: Map[String, Long],
                    exact: Map[String, Long] = Map.empty,
                    computedFloors: Map[String, Long] = Map.empty): Seq[String] =
    SparkEntry.queries.keysIterator
      .filterNot(SparkEntry.oracleSql.contains)
      .flatMap { name =>
        val floor = math.max(SparkEntry.rowFloors.getOrElse(name, 1L),
          computedFloors.getOrElse(name, 1L))
        rowCounts.get(name) match {
          case Some(n) if exact.get(name).exists(_ != n) =>
            Some(s"$name: $n rows != exact expected ${exact(name)} (invariant regression)")
          case Some(n) if n < floor =>
            Some(s"$name: $n rows < floor $floor (rows-only regression)")
          case None => Some(s"$name: no output written")
          case _ => None
        }
      }.toSeq.sorted

  /** Recall-gate breaches: a measured recall below its declared floor,
    * or a recall that couldn't be computed (missing/unreadable
    * output). Pure — specs drive it with synthetic measurements. */
  def recallFailures(measured: Map[String, Option[Double]]): Seq[String] =
    SparkEntry.recallChecks.toSeq.sortBy(_._1).flatMap {
      case (q, (base, floor)) =>
        measured.getOrElse(q, None) match {
          case None =>
            Some(s"$q: recall vs $base not computable (missing output)")
          case Some(r) if r < floor =>
            Some(f"$q: recall $r%.3f vs $base below floor $floor%.2f")
          case _ => None
        }
    }

  /** |approx ∩ exact| / |exact|, joined on the exact baseline's
    * leading two (id, id) columns — computed from the SAME written
    * artifacts the driver hashes, so the number in VERIFY_RECALL.json
    * is the number the round actually shipped. The approx side is
    * key-deduped first: padded duplicate rows must not inflate
    * recall. */
  private def recallOf(spark: SparkSession, outDir: String,
                       approx: String, exact: String): Option[Double] =
    try {
      val e = spark.read.parquet(s"$outDir/$exact")
      // read the approx side BEFORE the empty-exact early-return: a
      // missing/unreadable approx output must be None (gate failure),
      // never a free 1.0 because the baseline happened to be empty
      val a = spark.read.parquet(s"$outDir/$approx")
      // key width defaults to the (id, id) pair convention; entries
      // whose agreement is keyed by a single id (a kept SET, not an
      // edge set) declare it in recallKeyCols
      val keys = e.columns
        .take(SparkEntry.recallKeyCols.getOrElse(approx, 2)).toSeq
      val nExact = e.count()
      if (nExact == 0L) Some(1.0)
      else {
        val hit = a.select(keys.map(col): _*).distinct()
          .join(e.select(keys.map(col): _*), keys, "inner").count()
        Some(hit.toDouble / nExact)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name subset — dev-loop
    // convenience (the driver always passes two args = full catalog;
    // subset runs skip the floor/recall gates, which need the full set)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, q) => (s, o, Some(q.split(',').toSet))
    }
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    new java.io.File(outDir).mkdirs()
    val counts = scala.collection.mutable.Map.empty[String, Long]
    val queryFails = scala.collection.mutable.ArrayBuffer.empty[String]
    // sorted-name order for the same reproducibility reason as Bench:
    // memo-sharing entries must split their cost deterministically
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter(kv => names.contains(kv._1)))
      .toSeq.sortBy(kv => SparkEntry.runOrderKey(kv._1))
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        counts(name) = spark.read.parquet(s"$outDir/$name").count()
      } catch {
        // NonFatal ONLY: an OOM mid-query must kill the run — the
        // remaining queries, the row checks, and the recall joins
        // would otherwise execute in a heap-poisoned JVM and could
        // write floor-passing garbage (the Bench catch rationale).
        // The failure is still RECORDED: r6's dataset regeneration
        // broke 24 queries and each just logged-and-vanished from the
        // driver's correctness JSON — a missing row read as "not run",
        // not "broken". The remaining queries still execute (maximize
        // the round's signal), but the run exits non-zero below.
        case scala.util.control.NonFatal(e) =>
          queryFails += name
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // Jsons.str escapes backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${Jsons.str(k)}: ${Jsons.str(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    if (only.isDefined) {
      // subset dev-loop run: dump the SQL and stop before the
      // full-catalog floor/recall gates (they'd all read "missing")
      failuresExit(spark, queryFails.toSeq.sorted.map(q => s"$q: query threw (no output)"))
      return
    }

    // row invariants: computed exacts/floors from the input tables;
    // if the computation itself dies (unreadable dir), fall back to
    // the static floors LOUDLY rather than skipping the gate
    val checks =
      try SparkEntry.computedRowChecks(spark, sfDir)
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[verify] computedRowChecks failed: ${e.getMessage}")
        SparkEntry.RowChecks(Map.empty, Map.empty)
      }
    val floorFails = floorFailures(counts.toMap, checks.exact, checks.floors)

    // recall vs exact baselines, from the written outputs
    val recalls: Map[String, Option[Double]] =
      SparkEntry.recallChecks.map { case (q, (base, _)) =>
        q -> recallOf(spark, outDir, q, base)
      }
    val recallJson = SparkEntry.recallChecks.toSeq.sortBy(_._1).map {
      case (q, (base, floor)) =>
        val r = recalls.getOrElse(q, None).map(Jsons.num(_, 4)).getOrElse("null")
        s"""${Jsons.str(q)}: {"baseline": ${Jsons.str(base)}, "floor": $floor, "recall": $r}"""
    }.mkString("{", ", ", "}")
    Files.writeString(Paths.get(s"$outDir/VERIFY_RECALL.json"), recallJson)
    // cwd copy: the file the round driver/judge picks up from the repo
    try Files.writeString(Paths.get("VERIFY_RECALL.json"), recallJson)
    catch { case scala.util.control.NonFatal(_) => () }
    val recallFails = recallFailures(recalls)

    failuresExit(spark,
      queryFails.toSeq.sorted.map(q => s"$q: query threw (no output)") ++
      floorFails ++ recallFails)
  }

  private def failuresExit(spark: SparkSession, failures: Seq[String]): Unit = {
    failures.foreach(f => System.err.println(s"[verify] GATE $f"))
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
