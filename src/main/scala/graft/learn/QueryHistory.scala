package graft.learn

import java.io.{BufferedInputStream, DataInputStream, DataOutputStream, EOFException, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable.ArrayBuffer

/** Query-performance history — the reference declares this learning loop
  * but never writes to it (/root/reference/ml_optimizer.py:305-321 creates
  * `ml_query_performance_history`; nothing INSERTs — SURVEY §2.B11). Here
  * the loop is closed: QueryEngine appends a record after each measured
  * query, and StrategyChooser's history adjustment actually sees data.
  *
  * DURABLE since round 15 (the reference's history table IS persistent
  * SQLite — ml_optimizer.py:410-421 — while rounds 1-14 kept an
  * in-memory buffer): with a `persistDir`, every append also lands in
  * `<dir>/meta/query_history.bin` as one length-prefixed record, and
  * construction replays the log — learned strategy adjustments and
  * `GET /ml/stats` survive a restart. The log is append-only (no
  * rewrite churn on the per-query path); a torn tail record from a
  * crash mid-append is dropped at load, everything before it survives.
  */
object QueryHistory {
  case class Record(
      queryPattern: String,
      tableSize: Long,
      strategy: String,
      actualSpeedup: Double,
      actualError: Double,
      predictedSpeedup: Double,
      predictedError: Double,
      executionTimeMs: Long,
      errorTolerance: Double,
      timestampMs: Long)

  /** Normalized query pattern used to match "similar" queries — feature
    * signature instead of the reference's raw-SQL pattern matching.
    */
  def pattern(f: graft.plan.QueryFeatures): String = {
    val aggs = f.aggFunctions.sorted.mkString(",")
    s"t=${f.tableName.getOrElse("?")};aggs=$aggs;gb=${f.groupByArity};d=${f.hasDistinct}"
  }
}

final class QueryHistory(persistDir: Option[String] = None) {
  import QueryHistory._
  private val records = ArrayBuffer.empty[Record]

  private val logPath: Option[Path] = persistDir.map { d =>
    val meta = Paths.get(d, "meta")
    Files.createDirectories(meta)
    meta.resolve("query_history.bin")
  }

  // replay the persisted log (restart law); a truncated tail record —
  // crash mid-append — ends the replay without failing the boot, and
  // any other malformed bytes end it too (a damaged log degrades to
  // "less learned history", never a boot failure)
  logPath.filter(Files.exists(_)).foreach { p =>
    val in = new DataInputStream(new BufferedInputStream(Files.newInputStream(p)))
    try {
      var done = false
      while (!done) {
        try records += readRecord(in)
        catch { case scala.util.control.NonFatal(_) => done = true }
      }
    } finally in.close()
  }

  private def readRecord(in: DataInputStream): Record = {
    val len = in.readInt()
    if (len < 0 || len > (1 << 20))
      throw new EOFException(s"bad length $len")
    val buf = new Array[Byte](len)
    in.readFully(buf)
    val r = new DataInputStream(new java.io.ByteArrayInputStream(buf))
    Record(r.readUTF(), r.readLong(), r.readUTF(), r.readDouble(),
      r.readDouble(), r.readDouble(), r.readDouble(), r.readLong(),
      r.readDouble(), r.readLong())
  }

  private def writeRecord(rec: Record): Unit = logPath.foreach { p =>
    val body = new java.io.ByteArrayOutputStream()
    val w = new DataOutputStream(body)
    w.writeInt(0) // length placeholder — patched below
    w.writeUTF(rec.queryPattern); w.writeLong(rec.tableSize)
    w.writeUTF(rec.strategy); w.writeDouble(rec.actualSpeedup)
    w.writeDouble(rec.actualError); w.writeDouble(rec.predictedSpeedup)
    w.writeDouble(rec.predictedError); w.writeLong(rec.executionTimeMs)
    w.writeDouble(rec.errorTolerance); w.writeLong(rec.timestampMs)
    val arr = body.toByteArray
    val len = arr.length - 4
    arr(0) = (len >>> 24).toByte; arr(1) = (len >>> 16).toByte
    arr(2) = (len >>> 8).toByte; arr(3) = len.toByte
    // ONE write syscall to the O_APPEND stream: concurrent appenders
    // (two engines over one workDir) emit whole records, not
    // interleaved fragments that would corrupt the log mid-file
    val out = new FileOutputStream(p.toFile, true)
    try { out.write(arr); out.flush() } finally out.close()
  }

  // one-shot flag so a persistently failing disk logs a single warning,
  // not one per served query
  private var warnedWriteFailure = false

  def append(r: Record): Unit = synchronized {
    records += r
    // the read side deliberately degrades on damage ("a damaged log
    // degrades, never a failure"); the write side matches — a full
    // disk or lost workDir permission must not fail a query that
    // already computed successfully. Degrades to in-memory-only.
    try writeRecord(r)
    catch {
      case scala.util.control.NonFatal(e) =>
        if (!warnedWriteFailure) {
          warnedWriteFailure = true
          System.err.println(
            s"[graft] query-history persistence disabled for this " +
              s"session: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
    }
  }

  /** Records matching a query pattern, most recent first (cap like the
    * reference's LIMIT on its history SELECT).
    */
  def forPattern(p: String, limit: Int = 50): Seq[Record] = synchronized {
    records.filter(_.queryPattern == p).sortBy(-_.timestampMs).take(limit).toSeq
  }

  def all: Seq[Record] = synchronized { records.toSeq }

  /** Per-strategy learning stats over the trailing window — the
    * reference's GET /ml/stats (/root/reference/ml_optimizer.py:406-438):
    * query_count / avg_speedup / avg_error per strategy, 30-day window.
    */
  def learningStats(windowDays: Int = 30,
      nowMs: Long = System.currentTimeMillis()): Map[String, (Long, Double, Double)] = synchronized {
    val cutoff = nowMs - windowDays.toLong * 24 * 3600 * 1000
    records.filter(_.timestampMs >= cutoff).groupBy(_.strategy).map {
      case (s, rs) =>
        s -> ((rs.size.toLong,
          rs.map(_.actualSpeedup).sum / rs.size,
          rs.map(_.actualError).sum / rs.size))
    }.toMap
  }
}
