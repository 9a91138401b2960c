package graft.catalog

import java.nio.file.{Files, Paths}
import scala.collection.concurrent.TrieMap

/** Engine metadata catalog — the Spark-side analogue of the reference's
  * four SQLite metadata tables (`aqe_table_stats`, `aqe_samples`,
  * `aqe_sketches`, `aqe_strata_info`; /root/reference/storage.py:37-85).
  *
  * Kept in driver memory (it is tiny: one row per table/sample/sketch)
  * with the sample DATA itself materialized as parquet under `workDir` —
  * at cluster scale the catalog stays driver-side while samples live on
  * distributed storage, exactly like the reference keeps metadata rows
  * next to materialized sample tables.
  */
final class MetaCatalog(val workDir: String) {

  case class TableStats(tableName: String, rowCount: Long, updatedAt: Long)
  /** `baseRows` is the base table's rowcount AT SAMPLE-CREATION time —
    * the serving lookups compare it against the current table stats and
    * skip samples whose base has since grown or shrunk (the same
    * freshness policy as the engine's sketch guard: with no recorded
    * count or no table stats there is no evidence of staleness and the
    * sample serves).
    */
  case class SampleInfo(tableName: String, sampleTable: String,
      fraction: Double, strataColumn: Option[String], path: String,
      createdAt: Long, baseRows: Option[Long] = None)
  /** `version` increases monotonically on every catalog write of the
    * same (table, column, type) key; upsertSketchMerging's CAS compares
    * on it, so the compare-and-swap invariant is carried by an explicit
    * structural field rather than by Array[Byte]'s accidental
    * reference-equality semantics.
    */
  case class SketchInfo(tableName: String, columnName: String,
      sketchType: String, data: Array[Byte], parameters: String,
      createdAt: Long, version: Long = 0L)
  case class StratumInfo(sampleTable: String, strataValue: String,
      popSize: Long, sampleSize: Long, fraction: Double, weight: Double,
      variance: Double)

  /** Key-distribution statistics the q65 detector produces and the
    * salted-aggregate chooser consumes (SaltRewrite) — the catalog row
    * that closes the detect → persist → re-plan skew loop.
    */
  case class KeySkew(tableName: String, columnName: String, nRows: Long,
      nKeys: Long, maxKeyRows: Long, topSharePpm: Long, updatedAt: Long)

  /** Measure-distribution statistics the outlier detector produces
    * (QueryEngine.profileMeasureSkew) and the outlier-sample advisor
    * consumes: the share of the column's total ABSOLUTE mass held by
    * its top-k rows, in ppm. A heavy-tailed measure (top 500 rows ≥ 5%
    * of the mass) is exactly where uniform sampling's SUM variance
    * blows up and the outlier index pays.
    */
  case class MeasureSkew(tableName: String, columnName: String,
      nRows: Long, topK: Long, topSharePpm: Long, updatedAt: Long)

  private val tableStats = TrieMap.empty[String, TableStats]
  private val samples = TrieMap.empty[String, SampleInfo] // key = sampleTable
  private val sketches = TrieMap.empty[(String, String, String), SketchInfo]
  private val strata = TrieMap.empty[String, Seq[StratumInfo]]
  private val keySkew = TrieMap.empty[(String, String), KeySkew]
  private val measureSkew = TrieMap.empty[(String, String), MeasureSkew]

  Files.createDirectories(Paths.get(workDir))

  def samplesDir: String = s"$workDir/samples"

  // --- table stats (aqe_table_stats) ---
  def upsertTableStats(table: String, rowCount: Long): Unit =
    tableStats.put(table,
      TableStats(table, rowCount, System.currentTimeMillis()))
  def statsFor(table: String): Option[TableStats] = tableStats.get(table)

  // --- samples (aqe_samples) ---
  def addSample(info: SampleInfo): Unit = samples.put(info.sampleTable, info)
  def sampleByName(sampleTable: String): Option[SampleInfo] =
    samples.get(sampleTable)
  def samplesFor(table: String): Seq[SampleInfo] =
    samples.values.filter(_.tableName == table).toSeq
  /** Staleness guard for materialized samples (the twin of the engine's
    * sketchIsFresh): a sample that recorded its base rowcount serves
    * only while the catalog's table stats agree — after an append the
    * serving lookups fall through to inline sampling/exact instead of
    * answering from a sample of the OLD table.
    */
  def sampleIsFresh(s: SampleInfo): Boolean =
    (s.baseRows, statsFor(s.tableName)) match {
      case (Some(recorded), Some(ts)) => recorded == ts.rowCount
      case _                          => true
    }

  /** Re-stamp every sample of `table` as fresh w.r.t. the CURRENT table
    * stats — for callers that deliberately overwrite the stats (test
    * harnesses forcing a size-tier rule) while asserting the samples
    * still represent the table.
    */
  def refreshSampleBase(table: String): Unit = {
    val rows = statsFor(table).map(_.rowCount)
    samplesFor(table).foreach(s => samples.put(s.sampleTable,
      s.copy(baseRows = rows)))
  }

  /** Reference semantics: the "best" registered sample is the SMALLEST
    * fraction (/root/reference/planner.py:173-183 ORDER BY ASC LIMIT 1);
    * stale samples (base table changed size) never serve.
    */
  def bestUniformSample(table: String): Option[SampleInfo] =
    samplesFor(table).filter(_.strataColumn.isEmpty)
      .filter(sampleIsFresh)
      .sortBy(_.fraction).headOption
  def stratifiedSampleFor(table: String, col: String): Option[SampleInfo] =
    samplesFor(table).filter(_.strataColumn.contains(col))
      .filter(sampleIsFresh)
      .sortBy(_.fraction).headOption
  /** Materialized universe (join-key-lottery) sample for (table, key) —
    * Samplers.createUniverse's `__universe__<key>` marker keeps these
    * out of the uniform/stratified lookups. Fresh-guarded like every
    * serving lookup; smallest fraction first (reference tie-break).
    */
  /** Materialized outlier-indexed sample for (table, valueCol) —
    * Samplers.createOutlierSample's `__outlier__<col>` marker keeps
    * these out of the uniform/stratified lookups (the outlier part is
    * value-clustered, not row-uniform, so serving it as a plain sample
    * would bias every non-weighted read). Fresh-guarded like every
    * serving lookup.
    */
  def outlierSampleFor(table: String, valueCol: String): Option[SampleInfo] =
    samplesFor(table)
      .filter(_.strataColumn.contains(s"__outlier__${valueCol.toLowerCase}"))
      .filter(sampleIsFresh)
      // a TWO-SIDED build (recorded "outlier_low" stratum) preempts a
      // one-sided one on the same (table, measure): it serves every
      // shape the one-sided sample serves PLUS exact MIN, so the pick
      // between coexisting builds is deterministic and capability-
      // maximal instead of listing-order luck (a MIN query refused
      // because the one-sided entry happened to sort first)
      .sortBy(s => (if (strataFor(s.sampleTable)
        .exists(_.strataValue == "outlier_low")) 0 else 1, s.fraction))
      .headOption

  def universeSampleFor(table: String, key: String): Option[SampleInfo] =
    samplesFor(table).filter(_.strataColumn.contains(s"__universe__$key"))
      .filter(sampleIsFresh)
      .sortBy(_.fraction).headOption

  /** Materialized bottom-k (fixed-size order-statistic) sample for
    * `table` — Samplers.createBottomK's `__bottomk__<key>` marker keeps
    * these out of the uniform/stratified lookups (its weight is the
    * post-aggregation N/k scale, not a per-row HT column). Fresh-guarded
    * like every serving lookup; smallest fraction first.
    */
  def bottomKSampleFor(table: String): Option[SampleInfo] =
    samplesFor(table)
      .filter(_.strataColumn.exists(_.startsWith("__bottomk__")))
      .filter(sampleIsFresh)
      .sortBy(_.fraction).headOption

  /** Materialized GROUPED bottom-k sample for `table` (the streamable
    * stratified form, `__bottomkg__<groupcol>` marker). The group
    * column rides in the marker — `bottomKGroupColumn` decodes it.
    */
  def bottomKGroupedSampleFor(table: String): Option[SampleInfo] =
    samplesFor(table)
      .filter(_.strataColumn.exists(_.startsWith("__bottomkg__")))
      .filter(sampleIsFresh)
      .sortBy(_.fraction).headOption

  def bottomKGroupColumn(s: SampleInfo): Option[String] =
    s.strataColumn.filter(_.startsWith("__bottomkg__"))
      .map(_.stripPrefix("__bottomkg__"))

  // --- sketches (aqe_sketches; unique on table+column+type) ---

  /** Flat-JSON parameter merge: `next`'s fields win, but fields present
    * only in `prev` are carried forward. A writer that owns a subset of
    * the parameters (the streaming maintainer owns `last_batch`, the
    * batch builder owns `rows`) must not silently drop the other
    * writer's fields — losing `rows` would disable the engine's
    * freshness guard; losing `last_batch` would let a replayed stream
    * batch double-count after a batch rebuild. Parameters are always
    * the catalog's own flat {"k":v,...} objects, so a field regex is a
    * complete parser here. Removing a field requires a new key.
    */
  private val paramFieldRe = """"([^"]+)"\s*:\s*("[^"]*"|[^,}\s]+)""".r
  private[graft] def mergeParams(prev: String, next: String): String = {
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, String]
    paramFieldRe.findAllMatchIn(prev).foreach(m => fields(m.group(1)) = m.group(2))
    paramFieldRe.findAllMatchIn(next).foreach(m => fields(m.group(1)) = m.group(2))
    fields.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
  }

  @annotation.tailrec
  def upsertSketch(info: SketchInfo): Unit = {
    val key = (info.tableName, info.columnName, info.sketchType)
    sketches.putIfAbsent(key, info) match {
      case None => ()
      case Some(prev) =>
        val next = info.copy(
          parameters = mergeParams(prev.parameters, info.parameters),
          version = prev.version + 1)
        if (!sketches.replace(key, prev, next)) upsertSketch(info)
    }
  }

  /** Atomic read-merge-write: fold `info.data` into any existing sketch
    * under the map's CAS so two concurrent maintainers of the same
    * (table, column) never lose a batch (a bare getSketch-then-
    * upsertSketch interleaves). `merge(prev, next)` must be commutative
    * over the sketch's byte format (HLL register-max / histogram
    * count-add are). Parameters merge field-wise (see mergeParams) and
    * `version` increments, which is also what makes the replace a true
    * CAS: `next` always differs structurally from any concurrently
    * swapped-in value of the same key.
    */
  @annotation.tailrec
  def upsertSketchMerging(info: SketchInfo)(
      merge: (Array[Byte], Array[Byte]) => Array[Byte]): SketchInfo = {
    val key = (info.tableName, info.columnName, info.sketchType)
    sketches.putIfAbsent(key, info) match {
      case None => info
      case Some(prev) =>
        val next = info.copy(data = merge(prev.data, info.data),
          parameters = mergeParams(prev.parameters, info.parameters),
          version = prev.version + 1)
        if (sketches.replace(key, prev, next)) next
        else upsertSketchMerging(info)(merge)
    }
  }
  def getSketch(table: String, column: String, sketchType: String): Option[SketchInfo] =
    sketches.get((table, column, sketchType))
  def listSketches(table: Option[String] = None): Seq[SketchInfo] =
    table.fold(sketches.values.toSeq)(t =>
      sketches.values.filter(_.tableName == t).toSeq)

  // --- key-skew stats (q65 detector -> salted-plan chooser) ---
  def upsertKeySkew(table: String, column: String, nRows: Long,
      nKeys: Long, maxKeyRows: Long): Unit = {
    val ppm = if (nRows > 0) maxKeyRows * 1000000L / nRows else 0L
    keySkew.put((table, column),
      KeySkew(table, column, nRows, nKeys, maxKeyRows, ppm,
        System.currentTimeMillis()))
  }
  def keySkewFor(table: String, column: String): Option[KeySkew] =
    keySkew.get((table, column))

  def upsertMeasureSkew(table: String, column: String, nRows: Long,
      topK: Long, topSharePpm: Long): Unit =
    measureSkew.put((table, column.toLowerCase),
      MeasureSkew(table, column.toLowerCase, nRows, topK, topSharePpm,
        System.currentTimeMillis()))
  def measureSkewFor(table: String, column: String): Option[MeasureSkew] =
    measureSkew.get((table, column.toLowerCase))

  // --- strata info (aqe_strata_info) ---
  def putStrata(sampleTable: String, info: Seq[StratumInfo]): Unit =
    strata.put(sampleTable, info)
  def strataFor(sampleTable: String): Seq[StratumInfo] =
    strata.getOrElse(sampleTable, Nil)
}

/** Sample-table naming convention shared with the reference
  * (`{table}__sample_{frac}`, `{table}__strat_sample_{col}_{frac}` with
  * 0.01 -> "0_01"; /root/reference/sampler.py:99-117, parsed back at
  * planner.py:114-140).
  */
object SampleNaming {
  /** 0.01 -> "0_01", 0.1 -> "0_1", 0.005 -> "0_005", 0.3 -> "0_3". */
  def encodeFraction(f: Double): String = {
    if (f <= 0) return "0_000"
    var s = f"$f%.3f".replace(".", "_").reverse.dropWhile(_ == '0').reverse
    if (s.endsWith("_")) s += "0"
    if (!s.startsWith("0_")) s = "0_" + s
    s
  }

  def decodeFraction(enc: String): Option[Double] =
    scala.util.Try(enc.replace("_", ".").toDouble).toOption
      .filter(f => f > 0 && f <= 1)

  def uniformName(table: String, f: Double): String =
    s"${table}__sample_${encodeFraction(f)}"
  def stratifiedName(table: String, col: String, f: Double): String =
    s"${table}__strat_sample_${col}_${encodeFraction(f)}"

  /** Parse a sample-table name back to (baseTable, fraction) — used when a
    * user queries a sample table directly (planner.py:114-140).
    */
  def parse(name: String): Option[(String, Double)] = {
    // The fraction suffix always looks like 0_01 / 0_3 (encodeFraction),
    // so anchor on `0_[0-9]+$` to stop greedy backtracking from eating it.
    val uni = "(.+)__sample_(0_[0-9]+)".r
    val strat = "(.+)__strat_sample_.+_(0_[0-9]+)".r
    name match {
      case strat(t, enc) => decodeFraction(enc).map(f => (t, f))
      case uni(t, enc)   => decodeFraction(enc).map(f => (t, f))
      case _             => None
    }
  }
}
