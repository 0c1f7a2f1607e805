package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Family-spanning headline subset reported in the driver-facing JSON
    * line. The driver keeps only the LAST ~2000 chars of output, so the
    * line must stay well under that including sbt's trailing
    * "[success]" line — the full 100+-query map does not fit (rounds 1
    * and 2 lost their bench numbers exactly this way: stderr spam after
    * the line in r1, a >2000-char line in r2). `value` still totals
    * EVERY query; the full per-query map goes to target/bench_full.json
    * for local analysis. */
  private val headline = Seq(
    "q1_agg", "q9_profit", "q18_large", "q21_waiting",
    "sk_time_bucket_avg", "sk_tier_reagg", "sk_asof_native", "sk_gap_fill",
    "sk_track_stats", "sk_anchorage", "sk_flat_migration", "sk_compaction",
    "sk_interval_join", "dedup_minhash_lsh", "dedup_components",
    "dedup_substring", "dedup_semantic", "ann_topk", "ann_ivf_topk", "text_tfidf",
    "pack_chunks", "mix_balance", "stream_bucket_agg",
    "sk_interval_native", "sk_downsample_lttb", "pipeline_end_to_end",
    "dedup_edit_distance", "text_boilerplate", "sample_temperature",
    "embed_outliers",
    // round-8 perf-weak set: median-of-3 so the 2×-vs-baseline gate is
    // judged on a trustworthy number, not a single-shot outlier
    "dedup_incremental_lsh", "kmeans_assign", "stream_dedup_lsh",
    // round-12 additions: one per new family (compact-ANN funnel, OLAP
    // cube, interpolating resample, sketch, chunking)
    "ann_bq_topk", "q_rollup", "sk_resample_interp",
    "sketch_hll_distinct", "doc_chunk_overlap",
    // late-r12 families: winnowing, span dedup, tokenizer fit,
    // sketch algebra, exact-k holdout, live sketch maintenance
    "text_winnow", "dedup_winnow", "bpe_fit", "bpe_apply",
    "dedup_paragraph", "sample_holdout_k", "sketch_hll_setops",
    "stream_hll_distinct",
    // round-13 additions: persisted index stores, live paced replay,
    // partial-compaction federation, band threshold, object paths
    "dedup_incremental_lsh_stored", "ann_ivfpq_stored",
    "stream_replay_live", "sk_buffer_union", "sk_threshold_band",
    "sk_object_path",
    // round-14 additions: stored graph twins (median-of-3 so the
    // one-time staging cost lands on sample 1, not the median),
    // streaming Schmitt band, 3-objective skyline
    "graph_pagerank_stored", "embed_knn_graph_stored",
    "graph_components_stored", "stream_threshold_band", "q_skyline3",
    // late-r14 families: single-pass PCA (+ whitening + live moment
    // store), KMV sketches (overlap/cardinality + live store), ANN
    // recall eval, KL mixing, BM25 (inline + staged postings)
    "embed_pca", "embed_whiten", "stream_pca_moments",
    "sketch_kmv_overlap", "sketch_kmv_distinct", "stream_kmv_overlap",
    "ann_recall_eval", "ann_mrr_eval", "mix_kl_report",
    "retrieve_bm25", "retrieve_bm25_stored", "stream_bm25_postings",
    // round-15 additions: live vector-index + kNN-graph maintenance
    "stream_ann_ivfpq", "stream_knn_graph", "embed_drift_report",
    "dedup_minhash_lsh_stored", "stream_drift_report",
    // round-16 additions: deletion with derived-index repair
    "store_delete_ivfpq", "store_delete_knn", "store_delete_bm25",
    // round-16 additions: live-index compaction, drift-triggered
    // blue/green refresh, delete-with-index-repair
    "stream_ann_ivfpq_compacted", "ann_index_refresh",
    // round-17 additions: deletion gated against the LIVE stores
    // (triggers → delete → triggers → compact → serve) and deletion
    // composed with the blue/green rotation
    "stream_ann_ivfpq_deleted", "stream_knn_graph_deleted",
    "stream_bm25_deleted", "ann_refresh_delete",
    // round-19 addition: two-stage rerank over the persisted stores
    "retrieve_rerank_ce")

  /** (cpu ticks total, steal ticks) from /proc/stat — the counters
    * that make a contaminated measurement window MACHINE-detectable:
    * BASELINE.md documents 5-8% hypervisor steal inflating driver runs
    * ×1.3-2.5, and until r13 telling a real regression from a noisy
    * window required a judge re-probe. Zeroes on non-Linux. */
  private def cpuTicks(): (Long, Long) = try {
    val l = scala.io.Source.fromFile("/proc/stat").getLines().next()
    val f = l.trim.split("\\s+").drop(1).map(_.toLong)
    (f.sum, if (f.length > 7) f(7) else 0L)
  } catch { case _: Throwable => (0L, 0L) }

  private def load1(): Double = try {
    scala.io.Source.fromFile("/proc/loadavg").getLines().next()
      .split("\\s+")(0).toDouble
  } catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (ticks0, steal0) = cpuTicks()
    val load1Pre = load1()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: streaming/AQE WARN spam after the JSON line can
    // push it out of the driver's 2000-char output window.
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the JVM/codegen/FS before timing so no query is charged
    // with session startup or a cold Janino compile. EVERY query runs
    // once at sf0.001: plan SHAPES (and therefore the generated code
    // Janino compiles) are identical at every scale factor, so the
    // timed sf runs hit the codegen cache — the same
    // compile-once-run-everywhere property a long-lived production
    // session has. Data-size-dependent work is still fully timed.
    // (Before this, run-to-run swings of ±60% on untouched queries
    // came from compile cost landing on whichever shape ran first.)
    // SPARK_GRAFT_NO_WARM=1 skips it for a quick smoke run.
    try {
      spark.range(1000).selectExpr("sum(id)").count()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).count()
      val warmDir = "/root/testdata/sf0.001"
      if (sys.env.get("SPARK_GRAFT_NO_WARM").isEmpty &&
          new java.io.File(warmDir).isDirectory) {
        SparkEntry.queries.foreach { case (_, fn) =>
          try fn(spark, warmDir).count() catch { case _: Throwable => }
        }
        spark.catalog.clearCache()
      }
    } catch { case _: Throwable => }
    // A thrown query returns the sentinel -1.0, which every consumer
    // below (medians, totals, exponent fits, the headline line) treats
    // as a FAILURE, never as a wall time — round 8's q_bucketed_join
    // crash masqueraded as the suite's fastest query (0.092 s = the
    // time-to-throw) because the old catch recorded the elapsed time.
    // SPARK_GRAFT_BENCH_NOOP=1: time the noop sink instead of count()
    // (guide §1.4 — count() lets the optimizer prune columns/subtrees;
    // the noop write computes EVERY column of every row). OPT-IN ONLY:
    // the default stays count() because every baseline since r7 was
    // measured with it and the driver's 2x gate compares against those
    // numbers — a noop run is published alongside a count() run once
    // (r21) to document the conversion, never silently swapped in.
    val noopSink = sys.env.get("SPARK_GRAFT_BENCH_NOOP").isDefined
    def timeAt(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Double = {
      val t0 = System.nanoTime()
      val ok = try {
        val df = fn(spark, dir)
        if (noopSink) df.write.format("noop").mode("overwrite").save()
        else df.count()
        true
      } catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop caches between queries so one query's working set does
      // not pressure the next one's timing. clearCache only covers
      // Dataset caches — localCheckpoint blocks persist at the RDD
      // level and accumulated across the 182-query suite until GC,
      // measurably inflating later queries (mm_features 0.25 → 1.1 s
      // in-suite vs isolated, r12); unpersist them explicitly.
      try spark.catalog.clearCache() catch { case _: Throwable => }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => }
      if (ok) dt else -1.0
    }
    // median over the SUCCESSFUL samples; -1.0 when every sample failed
    def medianOk(ts: Seq[Double]): Double = {
      val ok = ts.filter(_ >= 0).sorted
      if (ok.isEmpty) -1.0 else ok(ok.size / 2)
    }
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      timeAt(fn, sfDir)
    // SCALING MODE (SPARK_GRAFT_SCALING=1): wall-time-vs-rows curves
    // for the hottest operators across all three SFs — the measured
    // form of the per-plan scale audits in SURVEY §5a. Exponent is
    // fitted between the two LARGEST SFs (per-query fixed overhead
    // ~0.3 s dominates the smallest and would fake sublinearity);
    // exponent ≈ 1 = the plan's work grows linearly in the data.
    if (sys.env.get("SPARK_GRAFT_SCALING").isDefined) {
      // SPARK_GRAFT_SCALING_SFS=dir1,dir2,dir3 overrides the sf-dir
      // ladder (the last two entries drive the exponent fit) — used to
      // extend the curve onto a 10×-sf0.1 replicated corpus.
      val sfs = sys.env.get("SPARK_GRAFT_SCALING_SFS")
        .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"))
      // SPARK_GRAFT_SCALING_QUERIES=a,b,c overrides the default hot set
      // (used for one-off curve checks on a specific operator).
      val hot = sys.env.get("SPARK_GRAFT_SCALING_QUERIES")
        .map(_.split(',').toSeq.map(_.trim).filter(SparkEntry.queries.contains))
        .filter(_.nonEmpty)
        .getOrElse(Seq("dedup_minhash_lsh", "dedup_components", "dedup_edit_distance",
          "dedup_substring", "mm_phash_dedup"))
      val docRows = sfs.map(d =>
        d -> spark.read.parquet(s"$d/documents.parquet").count()).toMap
      def r3(v: Double): String = f"$v%.3f"
      val curves = hot.map { q =>
        val fn = SparkEntry.queries(q)
        val ts = sfs.map { d => d -> medianOk(Seq.fill(3)(timeAt(fn, d))) }
        // the last two ladder entries drive the fit — works for any
        // ladder length ≥ 2, not just the default 3-dir one
        val (d1, t1) = ts(ts.size - 2); val (d2, t2) = ts.last
        // a failed point poisons the fit — report NaN, not a fake slope
        val exp = if (t1 < 0 || t2 < 0) Double.NaN
          else math.log(t2 / t1) / math.log(docRows(d2).toDouble / docRows(d1))
        (q, ts, exp)
      }
      val json = curves.map { case (q, ts, exp) =>
        // NaN is not valid JSON — a single failed point must not make
        // the whole scaling line unparseable; serialize it as null
        val expJson = if (exp.isNaN) "null" else r3(exp)
        "\"" + q + "\":{" +
          ts.map { case (d, t) =>
            "\"" + d.split('/').last + "\":" + r3(t) }.mkString(",") +
          ",\"exponent\":" + expJson + "}"
      }.mkString("{", ",", "}")
      val rowsJson = docRows.toSeq.sortBy(_._1).map { case (d, n) =>
        "\"" + d.split('/').last + "\":" + n }.mkString("{", ",", "}")
      val line = s"""{"metric":"scaling","rows":$rowsJson,"curves":$json}"""
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("target/bench_scaling.json"), line)
      catch { case _: Throwable => }
      spark.stop()
      println(line)
      return
    }
    // Median-of-3 for the headline set: r6 measured a ×4.75 query-level
    // swing between single-shot runs of IDENTICAL code, wider than the
    // 2× perf gate itself — a single sample cannot gate anything. The
    // long tail of non-headline queries stays single-shot to keep total
    // bench wall time inside the driver's budget.
    val headSet = headline.toSet
    // clamp to ≥1 (Seq.fill(0) would make the median index throw) and
    // fall back to the default on a non-integer value
    val repeats = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption).getOrElse(3))
    // SPARK_GRAFT_BENCH_ALL_MEDIAN=1: median-of-N for EVERY query, not
    // just the headline set — the baseline re-pin protocol, where tail
    // queries' single-shot ×1.5–1.8 spread would otherwise be frozen
    // into the per-query medians the 2× gate compares against.
    val allMedian = sys.env.get("SPARK_GRAFT_BENCH_ALL_MEDIAN").isDefined
    // SPARK_GRAFT_BENCH_ONLY=a,b,c: time only the named queries (local
    // iteration on a perf fix; not used by the driver)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val benched = only match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None => SparkEntry.queries
    }
    val samples = benched.map { case (name, fn) =>
      val n = if (allMedian || headSet(name)) repeats else 1
      name -> Seq.fill(n)(timeOnce(fn)).sorted
    }
    val results = samples.map { case (name, ts) => name -> medianOk(ts) }
    val failed = results.collect { case (name, v) if v < 0 => name }.toSeq.sorted
    def r3(v: Double): String = f"$v%.3f"
    def dict(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    // failed queries (value -1.0) are kept in the per-query maps as the
    // visible sentinel but excluded from the wall-time total
    val total = results.values.filter(_ >= 0).sum
    // full map + raw per-query samples (spread) for local analysis only
    val spread = samples.collect { case (k, ts) if ts.size > 1 =>
      "\"" + k + "\":[" + ts.map(r3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    // Environment fields make the artifact SELF-adjudicating: a run
    // whose steal_pct is high or whose load rose far beyond this JVM's
    // own 32 threads is a contaminated window (BASELINE.md acceptance
    // rule), detectable without a judge re-probe.
    // AUTO-RE-PROBE (BASELINE.md swing-audit rule, mechanized): a
    // headline query reading >2x its pinned median inside an otherwise
    // fine run is, on this box's track record, usually suite-position
    // contention (q4_dim_broadcast x2.10 in-suite -> x1.24 isolated;
    // retrieve_bm25 2.37 s in the r14 driver run -> 1.01 s judge
    // re-probe), not a regression. Re-run such outliers median-of-3 at
    // the END of the suite (caches dropped, no neighbor query in
    // flight) and carry both numbers: `reprobes` in the JSON line is
    // the isolated median the acceptance rule adjudicates with.
    // Pins come from the newest BENCH_FULL_r*_pin*.json (override via
    // SPARK_GRAFT_BENCH_PINS); no pin file -> no re-probes.
    val pins: Map[String, Double] = try {
      val path = sys.env.get("SPARK_GRAFT_BENCH_PINS").orElse {
        val fs = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.matches("BENCH_FULL_r\\d+_pin\\d*\\.json"))
        // numeric (round, pin-revision) order — a lexicographic name
        // sort would rank r9 above r15 and r15 above a future r100
        def key(n: String): (Int, Int) = {
          val m = "BENCH_FULL_r(\\d+)_pin(\\d*)\\.json".r.findFirstMatchIn(n).get
          (m.group(1).toInt,
            if (m.group(2).isEmpty) 0 else m.group(2).toInt)
        }
        fs.sortBy(f => key(f.getName)).lastOption.map(_.getPath)
      }
      path.map { p =>
        val s = java.nio.file.Files.readString(java.nio.file.Paths.get(p))
        val q = s.substring(s.indexOf("\"queries\":{"))
        "\"([a-z0-9_]+)\":(-?[0-9.]+)".r.findAllMatchIn(q)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }.getOrElse(Map.empty)
    } catch { case _: Throwable => Map.empty }
    // only headline queries with a meaningful pin: sub-0.15 s absolutes
    // swing on scheduler noise alone and are not worth a re-probe
    val outliers = headline.filter { q =>
      val t = results.getOrElse(q, -1.0); val p = pins.getOrElse(q, -1.0)
      t > 0 && p >= 0.15 && t > 2.0 * p
    }
    val reprobes = outliers.map { q =>
      q -> medianOk(Seq.fill(3)(timeOnce(SparkEntry.queries(q))))
    }.toMap
    val (ticks1, steal1) = cpuTicks()
    val stealPct =
      if (ticks1 > ticks0) 100.0 * (steal1 - steal0) / (ticks1 - ticks0) else -1.0
    val envJson = f"""{"steal_pct":$stealPct%.2f,"load1_pre":${load1Pre}%.2f,"load1_post":${load1()}%.2f}"""
    val errJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("target/bench_full.json"),
      s"""{"total":${r3(total)},"errors":$errJson,"env":$envJson,"reprobes":${dict(reprobes)},"queries":${dict(results)},"samples":$spread,"sf":"$sfDir"}""")
    catch { case _: Throwable => }
    val head = headline.flatMap(q => results.get(q).map(q -> _))
    // A crashed query is EXCLUDED from `total`, so on any failure the
    // sum is smaller (better-looking) than a clean run — emit the -1
    // failure sentinel as the headline value so the perf gate can never
    // pass on a crash; the partial sum stays in bench_full.json.
    val gateTotal = if (failed.nonEmpty) -1.0 else total
    // The driver keeps only the LAST ~2000 chars of output: a mass
    // failure (round 10: 62 errored names) must not bloat the errors
    // array past the window and truncate the line into unparseable
    // JSON — cap at 5 names + a count; the full list stays in
    // target/bench_full.json.
    val errHead =
      (failed.take(5).map("\"" + _ + "\"") ++
        (if (failed.size > 5) Seq("\"+" + (failed.size - 5) + " more\"") else Nil))
        .mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${r3(gateTotal)},"unit":"sec","n_errors":${failed.size},"errors":$errHead,"env":$envJson,"reprobes":${dict(reprobes)},"queries":${dict(head)},"sf":"$sfDir"}"""
    // Fixed-path copy of the headline line as a parse fallback.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bench_headline.json"), line)
    catch { case _: Throwable => }
    spark.stop()
    // Last line of output, compact enough to survive the tail window
    // (build.sbt: StdoutOutput + showSuccess=false keep it bare+last).
    println(line)
  }
}
