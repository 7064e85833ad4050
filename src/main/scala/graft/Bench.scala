package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Aggregates, Enrich, ParseStage, Route}
import graft.sources.{Tables, TranscriptGen}

/** Benchmark harness. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "scaling":{...}}
  *
  * The scaling block is the sandbox evidence for the north rule's
  * N-vs-4N-executor criterion (no real cluster here): the identical
  * end-to-end job runs at local[8] and local[32] on the same input and
  * reports throughput at both plus efficiency = (tps32/tps8)/4.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      // size scan splits so every core count runs several task waves: the
      // sf4 table is 480 × ~3 MB files, and the default 128 MB bin-packing
      // coalesces them to ~32 splits = ONE wave at 32 cores, where a single
      // straggler extends the whole job (measured: eff 0.48 → 0.59+ from
      // this knob alone under identical load)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      // the default 100-entry codegen class cache LRU-thrashes on a
      // 30-query suite: by the time a pass returns to a query, its
      // generated classes are evicted and the sample pays a 1-2 s Janino
      // recompile (measured: a6 3.56 s right after 10 other queries,
      // 1.61 s with this raised — and back to 1.6 on the SECOND run either
      // way, the recompile signature). Any real multi-query deployment
      // wants this above its distinct-plan count.
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The end-to-end job for throughput/scaling numbers — the BASELINE.json
    * metric is "parsed+routed turns/sec": parse → enrich → route → per-sink
    * aggregate counts (counter-handler analog) + event-time window
    * distribution. Compute-dominated, which is what the scaling criterion is
    * meant to probe; the shuffle-heavy unpivoted metric query (a6) is
    * benchmarked separately in `queries`.
    * (Measured alternatives: persisting the parsed DF across subtrees makes
    * the 32-core run slower — columnar cache build dominates — so each
    * subtree recomputes the cheap, linearly-scaling parse.)
    */
  private def pipelineE2E(spark: SparkSession, sfDir: String): Long = {
    val parsed = ParseStage.parse(Tables.transcripts(spark, sfDir))
    // one action, one parse pass: route + per-(sink, role, window) counter
    // aggregation, map-side-combined into a handful of groups. Dimension
    // builds and the unpivoted metric query have their own headline
    // benchmarks (j1_enrich, a6) — this is the throughput-definition job.
    Route.withSink(parsed)
      .groupBy(col("sink"), col("role"),
        ParseStage.timeWindowCol(col("log_ts"), col("tz_offset_sec")).as("w"))
      .agg(count(lit(1)), sum(col("bytes_sent")))
      .count()
  }

  /** pure-JVM CPU calibration: the throughput ratio this MACHINE can give
    * going from n1 to n2 busy threads (SMT/steal means local[32] is not 4x
    * local[8] even for perfect code). Reported alongside the job ratio so
    * the efficiency number can be judged against the achievable ceiling.
    */
  private def cpuRatio(n1: Int, n2: Int, millis: Long = 1500): Double = {
    def burn(n: Int): Double = {
      val counts = new java.util.concurrent.atomic.AtomicLong()
      val threads = (1 to n).map { _ =>
        new Thread(() => {
          val deadline = System.nanoTime() + millis * 1000000L
          var x = 0L
          var c = 0L
          while (System.nanoTime() < deadline) {
            var i = 0
            while (i < 10000) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
            c += 1
          }
          if (x == 42) println("")
          counts.addAndGet(c)
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      counts.get.toDouble / millis
    }
    burn(n1) // warm-up
    val r1 = burn(n1)
    val r2 = burn(n2)
    r2 / r1
  }

  /** WORKLOAD-FAITHFUL calibration: the SAME fixed work the Spark job's
    * dominant stage does — parse `totalLines` access-log lines through the
    * exact engine parse function (LineParser.parseAuto) — on raw JVM
    * threads, no Spark. The ALU-only cpuRatio overstates the ceiling for
    * parse-shaped work (a spin loop has no memory traffic, so it gets full
    * SMT benefit): measured here, pure-ALU scales ~3.7-4.0× from 8→32
    * threads while raw-thread parsing scales only ~2.7-3.2× on the same
    * box (SMT + memory bandwidth — 32 vCPUs share the physical cores and
    * DRAM that 8 threads had headroom on). On a real cluster, N→4N
    * EXECUTORS multiplies sockets and DRAM; this single-VM ceiling is the
    * honest denominator for what 8→32 local threads can express. The
    * baseline is FIXED-WORK (not fixed-time) so its duration matches the
    * job's and the same min-over-samples statistic applies to both sides.
    * Returns seconds.
    */
  private def rawParseBaseline(n: Int, totalLines: Long): Double = {
    val per = totalLines / n
    val t0 = System.nanoTime()
    val threads = (0 until n).map { t =>
      new Thread(() => {
        var k = 0L
        var i = t.toLong * per % burnLines.length
        var sink = 0
        while (k < per) {
          // materialize the line from bytes first: the engine has to build
          // every text String out of parquet buffers, and that allocation/
          // copy is exactly the kind of bandwidth-bound work whose thread
          // scaling is worse than pure parsing — a pooled-String baseline
          // would omit a cost the job cannot avoid and overstate the ceiling
          val line = new String(burnLines(i.toInt), java.nio.charset.StandardCharsets.UTF_8)
          if (graft.parse.LineParser.parseAuto(line).isDefined) sink += 1
          i += 1; if (i >= burnLines.length) i = 0
          k += 1
        }
        if (sink == -1) println("")
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  // 2M distinct lines (~400 MB, well past LLC so the memory behavior
  // matches the streaming scan), cycled to reach the target count
  private lazy val burnLines: Array[Array[Byte]] = {
    val n = 2000000
    val lay = TranscriptGen.layout(n.toLong)
    Array.tabulate(n)(i =>
      TranscriptGen.turn(i.toLong, lay).text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // warm-up session also materializes the transcripts table so synthesis
    // cost never pollutes a measurement
    var spark = session(cpus)
    val turns = Tables.transcripts(spark, sfDir).count()

    val headline: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "pipeline_parse" -> ((s, d) => ParseStage.parse(Tables.transcripts(s, d))),
      "a2_keyed_counts" -> SparkEntry.queries("a2_keyed_counts"),
      "a6_metric_rows" -> SparkEntry.queries("a6_metric_rows"),
      "f1_route_sinks" -> SparkEntry.queries("f1_route_sinks"),
      "j1_enrich" -> SparkEntry.queries("j1_enrich"),
      "q1_agg" -> SparkEntry.queries("q1_agg"),
      "q3_topn_join" -> SparkEntry.queries("q3_topn_join"),
      "w_window_running" -> SparkEntry.queries("w_window_running"),
      "e_rate_windows" -> SparkEntry.queries("e_rate_windows"),
      "dedup_exact" -> SparkEntry.queries("dedup_exact"),
      "dedup_minhash" -> SparkEntry.queries("dedup_minhash"),
      "dedup_simhash" -> SparkEntry.queries("dedup_simhash"),
      "dedup_embedding" -> SparkEntry.queries("dedup_embedding"),
      "dedup_clusters" -> SparkEntry.queries("dedup_clusters"),
      "dedup_incremental" -> SparkEntry.queries("dedup_incremental"),
      "dedup_incr_prebanded" -> SparkEntry.queries("dedup_incr_prebanded"),
      "ann_topk" -> SparkEntry.queries("ann_topk"),
      "ann_lsh" -> SparkEntry.queries("ann_lsh"),
      "ann_ivf" -> SparkEntry.queries("ann_ivf"),
      "ann_ivf_preassigned" -> SparkEntry.queries("ann_ivf_preassigned"),
      "text_langid" -> SparkEntry.queries("text_langid"),
      "text_quality" -> SparkEntry.queries("text_quality"),
      "text_tokens" -> SparkEntry.queries("text_tokens"),
      "text_fingerprint" -> SparkEntry.queries("text_fingerprint"),
      "text_vocab" -> SparkEntry.queries("text_vocab"),
      "sample_split" -> SparkEntry.queries("sample_split"),
      "mm_binary_meta" -> SparkEntry.queries("mm_binary_meta"),
      "mm_decode" -> SparkEntry.queries("mm_decode"),
      "mm_transform" -> SparkEntry.queries("mm_transform"),
      "mm_features" -> SparkEntry.queries("mm_features"),
      "s6_conv_progress" -> SparkEntry.queries("s6_conv_progress"))

    // 3 samples per query, INTERLEAVED: the whole headline list runs as 3
    // round-robin passes (pass 1 pays JIT/compile, all passes full
    // executions, nothing cached) and each query takes its min across
    // passes. Back-to-back samples (the r3 shape) let one 30-60 s noise
    // burst poison all of a query's samples at once — VERDICT r3 item 2;
    // with ~15 s between a query's samples, a burst now lands on at most
    // one of them. The per-query max is recorded alongside so residual
    // noise is VISIBLE in the artifact instead of silently absorbed.
    val passes = (1 to 3).map { _ =>
      // GC barrier between passes: a pass leaves dozens of torrent
      // broadcasts and codegen artifacts pinned until the next collection;
      // collecting between passes starts each pass from comparable heap
      // state. (It does NOT close the whole in-session gap — a6 still
      // samples ~2x its fresh-session time mid-bench, recorded in BENCH.md
      // with the isolated QueryProbe number; the max column keeps the
      // spread visible.)
      System.gc()
      headline.map { case (name, fn) =>
        name -> time {
          try fn(spark, sfDir).count()
          catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        }
      }
    }
    val results = headline.map { case (name, _) =>
      name -> passes.map(_.find(_._1 == name).get._2).min
    }
    val resultsMax = headline.map { case (name, _) =>
      name -> passes.map(_.find(_._1 == name).get._2).max
    }.toMap

    // scaling: identical e2e job at 8 and 32 cores. The scaling input is a
    // LARGER fixed table (sf4 = 24M turns) than the per-query corpus so the
    // parallel fraction dominates fixed per-stage overheads — at 600k turns
    // a 32-core local run is scheduling-bound and the ratio says nothing
    // about the partitioning.
    val scalingSf = "sf4"
    val scalingDir = s"/root/testdata/$scalingSf" // name only; table is synthesized
    val scalingTurns = TranscriptGen.turnsFor(scalingSf)
    Tables.transcripts(spark, scalingDir).count() // materialize outside timing
    spark.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    // Noise controls (this host is a shared VM with bursty neighbor load;
    // identical runs can swing 5-20x): SESSION REUSE per block (timed runs
    // pay no session-start/JIT/first-plan cost — fixed seconds land on both
    // core counts equally and skew the RATIO against the fast side);
    // INTERLEAVED 8/32 rounds, each containing BOTH the Spark job and the
    // fixed-work raw-thread baseline at that width; min over samples per
    // (side, kind) — the min is each measurement's quiet-window estimate,
    // and because baseline and job have the same duration scale the same
    // statistic is meaningful for both. Ceiling-relative efficiency =
    // (job 8→32 speedup) / (raw-thread 8→32 speedup for the same work).
    rawParseBaseline(32, 2000000) // JIT + memo-cache warm-up, discarded
    def jobBlock(n: Int, runs: Int): Seq[Double] = {
      val s = session(n)
      try (1 to runs).map(_ => time(pipelineE2E(s, scalingDir)))
      finally {
        s.stop()
        SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      }
    }
    // MANY SHORT ROUNDS (each ~2 min: raw8, job8 ×2, raw32, job32 ×2) so
    // every quantity samples several different noise windows. One global
    // JIT/codegen warm job first — the CodeGenerator cache and JIT are
    // JVM-wide, so later blocks' first runs pay only session-start cost
    // (~1 s, filtered by the per-block min).
    {
      val s = session(32)
      try time(pipelineE2E(s, scalingDir))
      finally { s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession() }
    }
    def rawMin(n: Int, runs: Int): Double =
      (1 to runs).map(_ => rawParseBaseline(n, scalingTurns)).min
    // 3 rounds ≈ 8-9 min of scaling samples: 6 per quantity, and the whole
    // bench stays near the round-1 driver runtime (a driver-side timeout
    // that truncates the run would lose the artifact entirely)
    var rounds = (1 to 3).map { _ =>
      (rawMin(8, 2), jobBlock(8, 2), rawMin(32, 2), jobBlock(32, 2))
    }
    // Noise guard (VERDICT r2 item 10): the raw parse ratio is a property of
    // the MACHINE, so it should be stable run-to-run; if this run's value
    // deviates >20% from the median of past runs (data/bench_history.jsonl),
    // the whole scaling block likely sampled a polluted window — take two
    // extra rounds before settling (bounded: at most once per run).
    val histPath = java.nio.file.Paths.get("/root/repo/data/bench_history.jsonl")
    def ratioOf(rs: Seq[(Double, Seq[Double], Double, Seq[Double])]): Double =
      rs.map(_._1).min / rs.map(_._3).min
    // history lines: "2.6500" = clean, "d 2.6500" = flagged-deviant at
    // record time. Deviant entries are EXCLUDED from the median (ADVICE r3:
    // polluted samples must not feed the pollution detector) but still
    // recorded, so a genuine machine-characteristic shift can be told apart
    // from noise: if the last `regimeWindow` entries are ALL deviant, the
    // machine has moved and the median re-bases on everything — otherwise a
    // one-time shift would wedge the guard into rejecting every future run.
    val allPast: Seq[(Boolean, Double)] =
      if (java.nio.file.Files.exists(histPath))
        scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(histPath)).asScala.toSeq
          .flatMap { l =>
            val t = l.trim
            if (t.startsWith("d "))
              scala.util.Try(t.drop(2).trim.toDouble).toOption.map(v => (true, v))
            else scala.util.Try(t.toDouble).toOption.map(v => (false, v))
          }
      else Seq.empty
    val regimeWindow = 3
    val regimeShift = allPast.size >= regimeWindow &&
      allPast.takeRight(regimeWindow).forall(_._1)
    val past: Seq[Double] =
      (if (regimeShift) allPast else allPast.filterNot(_._1)).map(_._2).takeRight(12)
    var deviated = false
    if (past.size >= 2) {
      val med = past.sorted.apply(past.size / 2)
      if (math.abs(ratioOf(rounds) - med) / med > 0.2) {
        deviated = true
        System.err.println(s"[bench] raw ratio ${ratioOf(rounds)} deviates >20% " +
          s"from historical median $med — sampling 2 extra rounds")
        rounds = rounds ++ (1 to 2).map { _ =>
          (rawMin(8, 2), jobBlock(8, 2), rawMin(32, 2), jobBlock(32, 2))
        }
        // still deviant after the extra rounds? then this run sampled a
        // polluted window end-to-end (or the machine moved — the regime
        // check above resolves which on later runs)
        deviated = math.abs(ratioOf(rounds) - med) / med > 0.2
      }
    }
    java.nio.file.Files.createDirectories(histPath.getParent)
    java.nio.file.Files.writeString(histPath,
      (if (deviated) "d " else "") + f"${ratioOf(rounds)}%.4f%n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    if (deviated) System.err.println("[bench] ratio still deviant after extra rounds — " +
      "recorded as deviant ('d' tag): excluded from the guard median unless a regime shift")
    val raw8 = rounds.map(_._1).min
    val t8 = rounds.flatMap(_._2).min
    val raw32 = rounds.map(_._3).min
    val t32 = rounds.flatMap(_._4).min
    val hwParseRatio = raw8 / raw32
    val hwAluRatio = cpuRatio(8, 32)
    // Two estimators of the true quiet-machine efficiency, both reported:
    //  - global (HEADLINE): min per quantity independently across all rounds
    //    — 6 samples per quantity spread over ~9 min. Converges to each
    //    factor's quiet-window value; measured cross-run stability of the
    //    mins (t8 23.8-27.9 s, raw8 17.9-18.0 s across full runs) shows it
    //    does converge on this host. Caveat (ADVICE r2): each min may come
    //    from a DIFFERENT quiet window, so the ratio-of-mins is an upward-
    //    biased estimate of any single window's ratio — which is why the
    //    paired median below stays in the artifact as the pessimistic bound.
    //  - paired: per-round (jobRatio / rawRatio), median over rounds. Was
    //    meant to cancel load within a round, but measured bursts last
    //    ~30-60 s — SHORTER than a round — so pairing does not align windows
    //    (one run: paired median 0.577 vs global 0.886 from the same
    //    samples). Kept in the artifact as the pessimistic cross-check.
    val effGlobal = (t8 / t32) / hwParseRatio
    val perRound = rounds.map { case (r8, j8, r32, j32) =>
      (j8.min / j32.min) / (r8 / r32)
    }.sorted
    val effPaired = perRound(perRound.length / 2) // median
    // ADVICE r2: this key was silently redefined in round 2 (denominator
    // switched from the ALU spin-loop ratio to the raw parse-thread ratio),
    // making r1-vs-r2 values under the same key incomparable. Restored: this
    // key again carries the ORIGINAL r1 definition (ALU-ceiling denominator,
    // the conservative one); the parse-ceiling estimator lives solely under
    // its own eff_vs_ceiling_global key.
    val effVsHw = (t8 / t32) / hwAluRatio

    val tps8 = scalingTurns / t8
    val tps32 = scalingTurns / t32
    val eff = (tps32 / tps8) / 4.0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val qsMax = results.map { case (k, _) => "\"" + k + "\":" + f"${resultsMax(k)}%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val scaling = f"""{"turns":$scalingTurns,"sec_cores8":$t8%.3f,"sec_cores32":$t32%.3f,""" +
      f""""tps_cores8":${tps8}%.0f,"tps_cores32":${tps32}%.0f,"efficiency_8_to_32":$eff%.3f,""" +
      f""""raw_parse_sec_8":$raw8%.3f,"raw_parse_sec_32":$raw32%.3f,""" +
      f""""hw_parse_ratio_8_to_32":$hwParseRatio%.3f,"hw_cpu_ratio_8_to_32":$hwAluRatio%.3f,""" +
      f""""eff_vs_ceiling_global":$effGlobal%.3f,"eff_vs_ceiling_paired_median":$effPaired%.3f,""" +
      f""""efficiency_vs_hw_ceiling":$effVsHw%.3f}"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""queries_max":$qsMax,"ratio_deviant":$deviated,"sf":"$sfDir","scaling":$scaling}"""
    // stdout AND a file: the driver could not machine-parse the JSON out of
    // sbt's [info]-prefixed stdout in round 1 ("parsed": null)
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/bench_out.json"), json + "\n")
    // ...plus an IMMUTABLE per-run artifact (VERDICT r3 item 7): the driver
    // overwrites bench_out.json on its own runs, so README/BENCH.md cite a
    // timestamped record that nothing rewrites
    val runsDir = java.nio.file.Paths.get("/root/repo/data/bench_runs")
    java.nio.file.Files.createDirectories(runsDir)
    java.nio.file.Files.writeString(
      runsDir.resolve(s"bench_${System.currentTimeMillis()}.json"), json + "\n")
  }
}
