package graft.learn

/** History-driven sketch advisor — beyond the reference: its ML layer
  * records per-strategy stats (/root/reference/ml_optimizer.py:406-438)
  * but nothing ever tells the operator WHICH sketches would convert
  * scan-path queries into catalog serves. Here the engine reports every
  * sketchable query shape that did NOT serve from a stored sketch;
  * `QueryEngine.adviseSketches` aggregates the misses into concrete
  * build recommendations, skipping keys the catalog already covers
  * with a fresh sketch. The loop closes operationally: run the
  * recommended build and the same queries flip to the no-scan path.
  */
object SketchAdvisor {

  /** One sketchable (table, column, sketch type, optional group-by)
    * shape observed on a non-sketch plan.
    */
  final case class Candidate(table: String, column: String,
      sketchType: String, groupBy: Option[String])

  /** A recommendation: how often the shape paid a scan, and the build
    * call that would serve it from the catalog instead.
    */
  final case class Advice(candidate: Candidate, misses: Long, build: String)

  /** Human-actionable build recipe per sketch type (the SketchOps /
    * POST /sketches/create call that serves the missed shape).
    */
  def buildRecipe(c: Candidate): String = (c.sketchType, c.groupBy) match {
    case ("hll", _) =>
      s"SketchOps.createHll(spark, catalog, ${c.table}, ${c.column})"
    case ("histogram", _) =>
      s"SketchOps.createHistogram(spark, catalog, ${c.table}, ${c.column})"
    case ("cms", _) =>
      // a comma-joined column list is the COMPOSITE tuple-key CMS
      // (conjunctive equality frequencies; round 10)
      val key =
        if (c.column.contains(","))
          c.column.split(",").map(k => s""""$k"""")
            .mkString("Seq(", ", ", ") /* + eps, delta */")
        else c.column
      s"SketchOps.createCms(spark, catalog, ${c.table}, $key)"
    case ("hll_grouped", Some(g)) =>
      s"SketchOps.createGroupedHll(spark, catalog, ${c.table}, $g, ${c.column})"
    case ("histogram_grouped", Some(g)) =>
      s"SketchOps.createGroupedHistogram(spark, catalog, ${c.table}, $g, ${c.column})"
    case ("histogram_grouped_shared", Some(g)) =>
      // shared grid: the build whose per-group histograms merge —
      // what IN-list / partial-key percentile serves require
      s"SketchOps.createGroupedHistogram(spark, catalog, ${c.table}, $g, " +
        s"${c.column}, 64, sharedGrid = true)"
    case ("bottomk", None) =>
      // repeated INLINE-sampled aggregates: every query re-paid the
      // full scan + lottery; a materialized fixed-size sample answers
      // them from k cached rows — and the streaming maintainer keeps
      // it fresh under ingest, where fixed-fraction samples go stale
      s"Samplers.createBottomK(spark, catalog, ${c.table}, uniqueKeyCol)" +
        " // SampleMaintainers.maintainBottomKSample keeps it fresh under ingest"
    case ("bottomk_grouped", Some(g)) =>
      s"Samplers.createBottomKGrouped(spark, catalog, ${c.table}, $g, uniqueKeyCol)"
    case ("topk", Some(g)) =>
      // heavy-hitters summary: exact counts of every group reaching
      // the threshold — pick it at or below the query's HAVING bound /
      // the expected k-th heaviest count, above the tail
      val key = g.split(",").map(k => s""""$k"""").mkString("Seq(", ", ", ")")
      s"SketchOps.createTopK(spark, catalog, ${c.table}, $key, threshold)"
    case ("topk_sum", Some(g)) =>
      // the SUM twin (revenue top-k): exact decimal sums of every
      // group reaching the threshold over the summed column
      val key = g.split(",").map(k => s""""$k"""").mkString("Seq(", ", ", ")")
      s"SketchOps.createTopKSum(spark, catalog, ${c.table}, $key, " +
        s"${c.column}, threshold)"
    case ("kmv", _) =>
      // one per set-op SIDE — both sides' sketches (same k) must exist
      // before the INTERSECT/UNION/EXCEPT count serves
      s"SketchOps.createKmv(spark, catalog, ${c.table}, ${c.column})"
    case ("agms", _) =>
      // composite keys render as the Seq the builder takes; the column
      // field carries the comma-joined catalog name either way
      val key =
        if (c.column.contains(","))
          c.column.split(",").map(k => s""""$k"""").mkString("Seq(", ", ", ")")
        else c.column
      s"SketchOps.createAgms(spark, catalog, ${c.table}, $key)"
    case ("outlier", _) =>
      // a SAMPLE build, not a sketch: the heavy tail of the flagged
      // measure materializes exactly, the rest HT-samples; keyCol must
      // be a unique row key (the cutoff tie-break)
      s"Samplers.createOutlierSample(spark, catalog, ${c.table}, " +
        s"${c.column}, uniqueKeyCol)"
    case ("universe", _) =>
      // a materialized universe sample per big join side — the pair
      // must share ONE fraction to stay join-compatible
      val key =
        if (c.column.contains(","))
          c.column.split(",").map(k => s""""$k"""").mkString("Seq(", ", ", ")")
        else c.column
      s"Samplers.createUniverse(spark, catalog, ${c.table}, $key, f) " +
        "// same fraction f on BOTH join sides"
    case _ => s"unknown sketch type ${c.sketchType}"
  }

  /** TTL-aware build recipe (round 14): when the missed shape sits on
    * a table that is STREAM-MAINTAINED (any windowed state rider or
    * `last_batch`-guarded sketch in its catalog — evidence a batch
    * build would go stale on the next fold), advise the WINDOWED
    * maintainer for the family instead of the one-shot batch build, so
    * the closed loop lands on state that tracks the live window. None
    * for shapes with no windowed form yet (the caller falls back to
    * [[buildRecipe]]).
    */
  def windowedRecipe(c: Candidate): Option[String] =
    (c.sketchType, c.groupBy) match {
      case ("hll", _) if !c.column.contains(",") => Some(
        s"EventStreams.maintainHllWindowed(stream, catalog, ${c.table}, " +
          s"${c.column}, tsCol, windowMicros, bucketMicros) " +
          "// TTL: COUNT(DISTINCT) serves over the live window")
      case ("cms", _) if !c.column.contains(",") => Some(
        s"EventStreams.maintainCmsWindowed(stream, catalog, ${c.table}, " +
          s"${c.column}, tsCol, windowMicros, bucketMicros) " +
          "// TTL: point frequencies serve over the live window")
      case ("histogram", _) => Some(
        s"WindowedSketches.maintainHistogramWindowed(stream, catalog, " +
          s"${c.table}, ${c.column}, tsCol, windowMicros, bucketMicros, " +
          "lo, width, buckets) " +
          "// TTL: percentiles/range counts serve over the live window")
      case ("kmv", _) => Some(
        s"WindowedSketches.maintainKmvWindowed(stream, catalog, ${c.table}, " +
          s"${c.column}, tsCol, windowMicros, bucketMicros) " +
          "// TTL: set-op cardinalities serve over the live window")
      case ("topk", Some(g)) =>
        val key = g.split(",").map(k => s""""$k"""").mkString("Seq(", ", ", ")")
        Some(s"WindowedSketches.maintainTopKWindowed(stream, catalog, " +
          s"${c.table}, $key, tsCol, windowMicros, bucketMicros, threshold) " +
          "// TTL: the trending-now top-k serves over the live window")
      case ("bottomk", None) => Some(
        s"SampleMaintainers.maintainBottomKWindowed(stream, catalog, ${c.table}, " +
          "uniqueKeyCol, tsCol, windowMicros, bucketMicros) " +
          "// TTL: the fixed-size sample tracks the live window")
      case _ => None
    }

  /** One monitor per lock-file path, JVM-wide (the MetaCatalog.locked
    * pattern: FileLock throws on same-process overlap, so threads must
    * serialize before the OS lock).
    */
  private val jvmLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Thread+process exclusive section on `lockFile` — serializes the
    * advisor snapshot against other engines sharing the workDir, the
    * same way the MetaCatalog registries do.
    */
  private def lockedOn[T](lockFile: java.nio.file.Path)(body: => T): T = {
    val monitor = jvmLocks.getOrElseUpdate(
      lockFile.toAbsolutePath.normalize.toString, new Object)
    monitor.synchronized {
      val ch = java.nio.channels.FileChannel.open(lockFile,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val l = ch.lock()
        try body finally l.release()
      } finally ch.close()
    }
  }
}

/** Bounded access-ordered miss counter (the parse-cache LRU policy:
  * hot shapes survive, the coldest key falls out past `maxKeys`).
  *
  * DURABLE since round 15: with a `persistDir`, every observe rewrites
  * `<dir>/meta/advisor_misses.bin` (a small snapshot — at most
  * `maxKeys` fixed-size entries, written via temp + fsync + atomic
  * rename) and construction reloads it, so pending build advice
  * survives a restart alongside the query history it feeds. Since
  * round 16 the rewrite MERGES with the on-disk snapshot under a
  * cross-process file lock, so two engines sharing a workDir no longer
  * drop each other's miss counts.
  */
final class SketchAdvisor(maxKeys: Int = 4096,
    persistDir: Option[String] = None) {
  import SketchAdvisor._

  private val misses =
    new java.util.LinkedHashMap[Candidate, java.lang.Long](
        64, 0.75f, /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Candidate, java.lang.Long]): Boolean =
        size() > maxKeys
    }

  private val snapshotPath: Option[java.nio.file.Path] = persistDir.map { d =>
    val meta = java.nio.file.Paths.get(d, "meta")
    java.nio.file.Files.createDirectories(meta)
    meta.resolve("advisor_misses.bin")
  }

  private def lockFileFor(p: java.nio.file.Path): java.nio.file.Path =
    p.resolveSibling(p.getFileName.toString + ".lock")

  /** Decode a snapshot file into (candidate, count) pairs in stored
    * order. Damage degrades to "advice forgotten" (empty), never a
    * failure (the history-log policy).
    */
  private def readEntries(p: java.nio.file.Path): Seq[(Candidate, Long)] =
    if (!java.nio.file.Files.exists(p)) Nil
    else {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Candidate, Long)]
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        java.nio.file.Files.newInputStream(p)))
      try {
        val n = in.readInt()
        (0 until n).foreach { _ =>
          val table = in.readUTF(); val column = in.readUTF()
          val sketchType = in.readUTF()
          val groupBy = if (in.readBoolean()) Some(in.readUTF()) else None
          val count = in.readLong()
          buf += ((Candidate(table, column, sketchType, groupBy), count))
        }
        buf.toSeq
      } catch {
        case scala.util.control.NonFatal(_) => Nil
      } finally in.close()
    }

  // reload the persisted snapshot (restart law) under the snapshot's
  // file lock (another engine over the same workDir may be mid-persist;
  // the MetaCatalog registries serialize the same way): entries
  // re-enter in stored order, so the access-ordered LRU resumes where
  // it left off.
  snapshotPath.foreach { p =>
    SketchAdvisor.lockedOn(lockFileFor(p)) {
      readEntries(p).foreach { case (c, n) => misses.put(c, Long.box(n)) }
    }
  }

  // MERGE-ON-WRITE under the cross-process file lock (round 16 — two
  // engines sharing a workDir used to last-writer-wins and silently
  // drop each other's miss counts): re-read the on-disk snapshot inside
  // the lock, keep foreign candidates this engine never saw, and take
  // the larger count for shared ones. Capped at maxKeys by evicting the
  // COLDEST FOREIGN entries first (our own LRU already bounds ours);
  // foreign entries are written ahead of ours so a reload treats them
  // as least-recently-used. The temp file is forced to disk before the
  // atomic rename (the writeAtomic durability discipline).
  private def persist(): Unit = snapshotPath.foreach { p =>
    SketchAdvisor.lockedOn(lockFileFor(p)) {
      import scala.jdk.CollectionConverters._
      val ours = misses.entrySet().asScala.toSeq
        .map(e => e.getKey -> e.getValue.longValue())
      val ourKeys = ours.iterator.map(_._1).toSet
      val onDisk = readEntries(p)
      val diskCounts = onDisk.toMap
      val foreign = onDisk.filterNot { case (c, _) => ourKeys(c) }
      val oursMerged = ours.map { case (c, n) =>
        c -> math.max(n, diskCounts.getOrElse(c, 0L)) }
      val keepForeign =
        foreign.drop(math.max(0, foreign.size + oursMerged.size - maxKeys))
      val merged = keepForeign ++ oursMerged
      val tmp = p.resolveSibling(p.getFileName.toString +
        s".tmp-${ProcessHandle.current.pid}-${Thread.currentThread.getId}")
      val ch = java.nio.channels.FileChannel.open(tmp,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        java.nio.channels.Channels.newOutputStream(ch)))
      try {
        out.writeInt(merged.size)
        merged.foreach { case (c, n) =>
          out.writeUTF(c.table); out.writeUTF(c.column)
          out.writeUTF(c.sketchType)
          out.writeBoolean(c.groupBy.isDefined)
          c.groupBy.foreach(out.writeUTF)
          out.writeLong(n)
        }
        out.flush(); ch.force(true)
      } finally out.close()
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      graft.catalog.MetaCatalog.fsyncDir(p.getParent)
    }
  }

  // Snapshot writes are THROTTLED off the query serve path: observe()
  // runs per missed query, and rewriting a warm 4096-entry snapshot on
  // each one would add two filesystem ops per query for data that only
  // needs to survive restarts. At most one write per second; a crash
  // inside the window forgets ≤1 s of misses, which re-accumulate from
  // the same workload — the same graceful degradation as a damaged
  // snapshot.
  @volatile private var lastPersistMs = 0L

  def observe(cs: Seq[Candidate]): Unit = misses.synchronized {
    cs.foreach { c =>
      misses.put(c, Long.box(Option(misses.get(c)).fold(1L)(_ + 1L)))
    }
    if (cs.nonEmpty) {
      val now = System.currentTimeMillis()
      if (now - lastPersistMs >= 1000L) {
        persist()
        lastPersistMs = now
      }
    }
  }

  /** Write the current snapshot NOW, bypassing the throttle — orderly
    * shutdown (Server.stop) and restart-law tests call this so nothing
    * inside the 1 s window is lost on a clean exit.
    */
  def flush(): Unit = misses.synchronized(persist())

  def snapshot: Map[Candidate, Long] = misses.synchronized {
    import scala.jdk.CollectionConverters._
    misses.asScala.map { case (k, v) => k -> v.longValue() }.toMap
  }
}
