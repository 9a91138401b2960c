package graft.sample

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.{MetaCatalog, SampleNaming}

/** Sample creation — the reference's /samples/create and
  * /samples/stratified endpoints (/root/reference/sampler.py).
  *
  * Spark-first design notes (scale):
  *  - Uniform sampling is Bernoulli per partition (`df.sample`) — no
  *    shuffle, no sort, embarrassingly parallel; the reference's
  *    `abs(random()) < f` scan is the same algorithm single-threaded.
  *  - Stratified stats are ONE `groupBy(strata).agg(count, avg, var_samp)`
  *    pass (a single shuffle of pre-aggregated partials), replacing the
  *    reference's O(strata) correlated subqueries
  *    (/root/reference/sampler.py:152-164).
  *  - `sampleBy` applies per-stratum Bernoulli fractions map-side — again
  *    no shuffle beyond the stats pass.
  *  - Samples are materialized as parquet, registered as temp views so
  *    the planner can substitute them by relation name, and pinned in the
  *    in-memory cache — repeated cheap scans are the entire point of a
  *    sample, and 1% of a 100 TB table fits the cluster cache tier.
  *  - Everything is seeded (default 42): the reference's unseeded
  *    `random()` makes its results nondeterministic; ours reproduce.
  */
object Samplers {

  case class StratumAllocation(value: String, popSize: Long,
      sampleSize: Long, fraction: Double, weight: Double, variance: Double)

  /** Bernoulli uniform sample, materialized + registered.
    * Mirrors create_uniform_sample (/root/reference/sampler.py:9-47).
    */
  /** Target rows per materialized sample file: small samples collapse to
    * ONE file (a sample query's latency is then one scan task instead of
    * one per source split), while a 100 TB-scale sample still fans out
    * across files/executors.
    */
  private val sampleFileRows = 2L * 1000 * 1000

  private def sampleFiles(expectedRows: Double): Int =
    math.max(1, math.min(256, math.ceil(expectedRows / sampleFileRows).toInt))

  def createUniform(spark: SparkSession, catalog: MetaCatalog,
      table: String, fraction: Double, seed: Long = 42L): (String, Long) = {
    require(fraction > 0 && fraction < 1, "sample_fraction must be in (0,1)")
    val name = SampleNaming.uniformName(table, fraction)
    val path = s"${catalog.samplesDir}/$name"
    val df = spark.table(table)
    val base = df.count()
    df.sample(withReplacement = false, fraction, seed)
      .coalesce(sampleFiles(base * fraction))
      .write.mode("overwrite").parquet(path)
    // A sample's whole purpose is cheap repeated scans: pin it in memory.
    // At 1% a sample fits where its base table does not (100 TB -> 1 TB
    // across the cluster's cache tier); parquet stays as the spill/restart
    // source of truth. The count() below materializes the cache eagerly.
    val sampleDf = spark.read.parquet(path).cache()
    sampleDf.createOrReplaceTempView(name)
    val rows = sampleDf.count()
    catalog.upsertTableStats(table, base)
    catalog.addSample(catalog.SampleInfo(table, name, fraction, None, path,
      System.currentTimeMillis(), baseRows = Some(base)))
    // GC (round 15): a rebuild supersedes same-kind samples the
    // freshness guard already refuses — reclaim their parquet now
    catalog.vacuumStaleSamples(table)(_.strataColumn.isEmpty)
    (name, rows)
  }

  /** Stratified sample with proportional or Neyman allocation.
    * Mirrors create_stratified_sample (/root/reference/sampler.py:50-96);
    * allocation formulas ported from sampler.py:194-225.
    */
  def createStratified(spark: SparkSession, catalog: MetaCatalog,
      table: String, strataCol: String, totalFraction: Double,
      varianceCol: Option[String] = None, seed: Long = 42L)
      : (String, Seq[StratumAllocation]) = {
    require(totalFraction > 0 && totalFraction < 1,
      "total_fraction must be in (0,1)")
    val df = spark.table(table)

    // One distributed stats pass: N_h, and sigma^2_h when a variance
    // column drives Neyman allocation.
    val statsAggs = varianceCol match {
      case Some(v) => Seq(count(lit(1)).as("pop_size"),
        coalesce(var_samp(col(v)), lit(0.0)).as("variance"))
      case None => Seq(count(lit(1)).as("pop_size"), lit(0.0).as("variance"))
    }
    val stats = df.groupBy(col(strataCol).cast("string").as("stratum"))
      .agg(statsAggs.head, statsAggs.tail: _*)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

    val allocations = varianceCol match {
      case Some(_) => allocateNeyman(stats, totalFraction)
      case None    => allocateProportional(stats, totalFraction)
    }

    val fractions = allocations.map(a => a.value -> a.fraction).toMap
    val name = SampleNaming.stratifiedName(table, strataCol, totalFraction)
    val path = s"${catalog.samplesDir}/$name"
    // Materialize the per-stratum Horvitz-Thompson weight (1/fraction_h)
    // with the sample so weighted aggregation needs no join at query time.
    // The weight attaches via a broadcast join against the (tiny) strata
    // table — a chained when() per stratum would build an O(strata)
    // expression tree, which breaks down at high stratum cardinality.
    import spark.implicits._
    val weights = allocations
      .map(a => (a.value, if (a.fraction > 0) 1.0 / a.fraction else 0.0))
      .toDF("graft_stratum", "graft_weight")
    df.stat.sampleBy(col(strataCol).cast("string"), fractions, seed)
      .join(broadcast(weights),
        col(strataCol).cast("string") === col("graft_stratum"), "left")
      .drop("graft_stratum")
      .coalesce(sampleFiles(stats.map(_._2).sum * totalFraction))
      .write.mode("overwrite").parquet(path)
    // Pinned in memory like the uniform sample (see createUniform); the
    // achieved-size aggregate below doubles as eager materialization.
    val sampleDf = spark.read.parquet(path).cache()
    sampleDf.createOrReplaceTempView(name)

    // Read back ACHIEVED per-stratum sizes (sampler.py:249-266) — Bernoulli
    // sampling hits the target only in expectation.
    val achieved = sampleDf.groupBy(col(strataCol).cast("string").as("stratum"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val withAchieved = allocations.map(a =>
      a.copy(sampleSize = achieved.getOrElse(a.value, 0L)))

    catalog.upsertTableStats(table, stats.map(_._2).sum)
    catalog.addSample(catalog.SampleInfo(table, name, totalFraction,
      Some(strataCol), path, System.currentTimeMillis(),
      baseRows = Some(stats.map(_._2).sum)))
    catalog.putStrata(name, withAchieved.map(a =>
      catalog.StratumInfo(name, a.value, a.popSize, a.sampleSize,
        a.fraction, a.weight, a.variance)))
    catalog.vacuumStaleSamples(table)(_.strataColumn.contains(strataCol))
    (name, withAchieved)
  }

  /** Deterministic stratified sample (equal-allocation flavor):
    * per-stratum inclusion is a keyed-hash lottery (the streaming/q28
    * systematic trick applied per stratum), so membership — and
    * therefore every Horvitz-Thompson estimate computed from the
    * sample — is reproducible across runs, partitionings, and engines.
    *
    * Allocation is integer-only by design: each stratum's HT weight is
    * the power of two 2^floor(log2(N_h / targetPerStratum)) (≥1,
    * ≤8192), and a row is kept iff
    * `graft_h60('q76:' || key) % 8192 < 8192 / w_h`. Integer weights
    * keep weighted sums of integer measures EXACT (order-independent
    * doubles), and the whole allocation chain (integer divide, binary
    * length, shift) is re-derivable bit-for-bit in DuckDB — this is
    * what lets the real-fraction stratified estimate be oracle-gated,
    * which seeded Bernoulli `sampleBy` (rand depends on the partition
    * split) cannot be. The trade: rates come from a power-of-two grid
    * (inverse stratum size ≈ equal allocation) instead of Neyman's
    * variance-optimal real-valued fractions — use createStratified
    * when reproducibility is not required.
    *
    * Scale shape: one count-by-stratum stats pass, then a map-side
    * broadcast-join + filter (no shuffle) writing the sample once.
    */
  def createStratifiedDeterministic(spark: SparkSession,
      catalog: MetaCatalog, table: String, strataCol: String,
      keyCol: String, targetPerStratum: Long = 512L)
      : (String, Seq[StratumAllocation]) = {
    require(targetPerStratum >= 1, "targetPerStratum must be >= 1")
    graft.functions.GraftFunctions.register(spark)
    val df = spark.table(table)
    val stats = df.groupBy(col(strataCol).cast("string").as("stratum"))
      .agg(count(lit(1)).as("pop_size"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    val allocations = stats.toSeq.map { case (value, popSize) =>
      val m = popSize / targetPerStratum
      val w = if (m < 1L) 1L
        else math.min(8192L, java.lang.Long.highestOneBit(m))
      val threshold = 8192L / w
      StratumAllocation(value, popSize, popSize / w,
        threshold.toDouble / 8192.0, w.toDouble, 0.0)
    }

    val name = s"${table}__strat_det_${strataCol}"
    val path = s"${catalog.samplesDir}/$name"
    import spark.implicits._
    val weights = allocations
      .map(a => (a.value, a.weight, (8192L / a.weight.toLong)))
      .toDF("graft_stratum", "graft_weight", "graft_threshold")
    df.join(broadcast(weights),
        col(strataCol).cast("string") === col("graft_stratum"))
      .filter(expr(
        s"graft_h60(concat('q76:', cast($keyCol as string))) % 8192 < graft_threshold"))
      .drop("graft_stratum", "graft_threshold")
      .coalesce(sampleFiles(
        allocations.map(a => a.popSize / a.weight).sum))
      .write.mode("overwrite").parquet(path)
    val sampleDf = spark.read.parquet(path).cache()
    sampleDf.createOrReplaceTempView(name)

    val achieved = sampleDf.groupBy(col(strataCol).cast("string").as("stratum"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val withAchieved = allocations.map(a =>
      a.copy(sampleSize = achieved.getOrElse(a.value, 0L)))
    val totalPop = stats.map(_._2).sum
    val achievedFraction = math.min(0.9999,
      withAchieved.map(_.sampleSize).sum.toDouble / math.max(1L, totalPop))

    catalog.upsertTableStats(table, totalPop)
    catalog.addSample(catalog.SampleInfo(table, name, achievedFraction,
      Some(strataCol), path, System.currentTimeMillis(),
      baseRows = Some(totalPop)))
    catalog.putStrata(name, withAchieved.map(a =>
      catalog.StratumInfo(name, a.value, a.popSize, a.sampleSize,
        a.fraction, a.weight, a.variance)))
    catalog.vacuumStaleSamples(table)(_.strataColumn.contains(strataCol))
    (name, withAchieved)
  }

  /** Outlier-indexed sample (Chaudhuri/Das/Datar/Motwani/Narasayya,
    * "Overcoming Limitations of Sampling for Aggregation Queries",
    * ICDE 2001): the top-`outlierK` rows by `valueCol` are materialized
    * EXACTLY at weight 1 (the outlier index), and the remaining rows
    * pass a deterministic keyed-hash lottery at a power-of-two HT
    * weight. A skewed SUM's sampling variance is dominated by whether
    * the heavy tail lands in the sample; answering the tail exactly
    * leaves only the (value-bounded) non-outlier part to estimate.
    *
    * Determinism end-to-end: outlier membership is the total order
    * (valueCol DESC, keyCol ASC) — `keyCol` must be unique — expressed
    * as a scan-local cutoff predicate (the k-th row's (value, key) pair,
    * fetched once at build time via a distributed top-k, never a full
    * sort); rest membership is the 'ol:' keyed-hash lottery. Both are
    * re-derivable bit-for-bit in DuckDB, and the integer weights keep
    * decimal-routed weighted sums exact — so engine serves from this
    * sample can be oracle-gated (q163).
    *
    * Scale shape: one TakeOrderedAndProject top-k pass (per-partition
    * heaps, no global sort), one filtered write; rows with NULL values
    * can never be outliers and fall to the rest lottery.
    */
  def createOutlierSample(spark: SparkSession, catalog: MetaCatalog,
      table: String, valueCol: String, keyCol: String,
      outlierK: Int = 500, targetRest: Long = 2048L,
      lowK: Int = 0): (String, Long, Long, Long) = {
    require(outlierK >= 1, "outlierK must be >= 1")
    require(targetRest >= 1, "targetRest must be >= 1")
    require(lowK >= 0, "lowK must be >= 0")
    graft.functions.GraftFunctions.register(spark)
    val df = spark.table(table)
    // keyCol MUST be unique and non-null: a NULL key can never win the
    // rest lottery (the hash predicate evaluates NULL) yet still counts
    // in the base — a silent downward bias on every HT estimate — and a
    // duplicate key breaks the exactly-k cutoff's total order. One
    // build-time aggregate pays for the guarantee (build-only cost,
    // like the histogram builds' sx exactness proof).
    val keyStats = df.agg(
      count(lit(1)).as("n"),
      count(col(keyCol)).as("nk"),
      countDistinct(col(keyCol)).as("nd")).collect()(0)
    val base = keyStats.getLong(0)
    require(keyStats.getLong(1) == base,
      s"outlier sample key $table.$keyCol must be non-null " +
        s"(${base - keyStats.getLong(1)} null keys)")
    require(keyStats.getLong(2) == base,
      s"outlier sample key $table.$keyCol must be unique " +
        s"(${base - keyStats.getLong(2)} duplicate keys)")
    // the k-th (value, key) pair under the DESC/ASC total order — the
    // scan-local membership cutoff (k rows through TakeOrdered, 1 row
    // to the driver)
    val cut = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("v"), col(keyCol).as("k"))
      .orderBy(col("v").desc, col("k").asc).limit(outlierK)
      .orderBy(col("v").asc, col("k").desc).limit(1)
      .collect()
    val outlierPred = cut.headOption.map { r =>
      val cv = r.getDouble(0)
      val ck = r.get(1)
      (col(valueCol).cast("double") > cv) ||
        (col(valueCol).cast("double") === cv && col(keyCol) <= lit(ck))
    }.getOrElse(lit(false))
    // OPTIONAL low tail (round 13): the bottom-lowK rows by
    // (value ASC, key ASC) also materialize at weight 1, making MIN
    // exactly servable — symmetric with the high tail's exact MAX. A
    // row on BOTH tails (tiny table) stays in the high part only; the
    // rest lottery excludes both.
    val lowCut =
      if (lowK == 0) Array.empty[org.apache.spark.sql.Row]
      else df.filter(col(valueCol).isNotNull)
        .select(col(valueCol).cast("double").as("v"), col(keyCol).as("k"))
        .orderBy(col("v").asc, col("k").asc).limit(lowK)
        .orderBy(col("v").desc, col("k").desc).limit(1)
        .collect()
    val lowPred = lowCut.headOption.map { r =>
      val cv = r.getDouble(0)
      val ck = r.get(1)
      (col(valueCol).cast("double") < cv) ||
        (col(valueCol).cast("double") === cv && col(keyCol) <= lit(ck))
    }.getOrElse(lit(false))
    val m = math.max(0L, base - outlierK - lowK) / targetRest
    val w = if (m < 1L) 1L
      else math.min(8192L, java.lang.Long.highestOneBit(m))
    val threshold = 8192L / w
    // two-sided builds get a DISTINCT name: temp views are
    // session-global, so a one-sided and a two-sided sample on the
    // same (table, measure) in different catalogs of one session must
    // not overwrite each other's registered view (their rest-lottery
    // memberships differ)
    val name =
      if (lowK > 0) s"${table}__outlier2_$valueCol"
      else s"${table}__outlier_$valueCol"
    val path = s"${catalog.samplesDir}/$name"
    val outPart = df.filter(outlierPred)
      .withColumn("graft_weight", lit(1.0))
    val lowPart = df
      .filter(coalesce(lowPred, lit(false)) &&
        !coalesce(outlierPred, lit(false)))
      .withColumn("graft_weight", lit(1.0))
    val restPart = df.filter(!coalesce(outlierPred, lit(false)) &&
        !coalesce(lowPred, lit(false)))
      .filter(expr(
        s"graft_h60(concat('ol:', cast($keyCol as string))) % 8192 < $threshold"))
      .withColumn("graft_weight", lit(w.toDouble))
    outPart.unionByName(lowPart).unionByName(restPart)
      .coalesce(sampleFiles(outlierK + lowK + (base - outlierK - lowK) / w))
      .write.mode("overwrite").parquet(path)
    val sampleDf = spark.read.parquet(path).cache()
    sampleDf.createOrReplaceTempView(name)
    // achieved sizes from the materialized sample (w == 1 makes the
    // parts weight-indistinguishable: count them via the predicates)
    val nOut = sampleDf.filter(outlierPred).count()
    val nLow =
      if (lowK == 0) 0L
      else sampleDf.filter(coalesce(lowPred, lit(false)) &&
        !coalesce(outlierPred, lit(false))).count()
    val nRest = sampleDf.count() - nOut - nLow
    val achievedFraction = math.min(0.9999,
      (nOut + nLow + nRest).toDouble / math.max(1L, base))
    catalog.upsertTableStats(table, base)
    catalog.addSample(catalog.SampleInfo(table, name, achievedFraction,
      Some(s"__outlier__${valueCol.toLowerCase}"), path,
      System.currentTimeMillis(), baseRows = Some(base)))
    catalog.putStrata(name, Seq(
      catalog.StratumInfo(name, "outlier", nOut, nOut, 1.0, 1.0, 0.0)) ++
      (if (lowK > 0)
        Seq(catalog.StratumInfo(name, "outlier_low", nLow, nLow, 1.0, 1.0,
          0.0))
      else Nil) ++ Seq(
      catalog.StratumInfo(name, "rest", math.max(0L, base - nOut - nLow),
        nRest, 1.0 / w, w.toDouble, 0.0)))
    catalog.vacuumStaleSamples(table)(_.strataColumn
      .contains(s"__outlier__${valueCol.toLowerCase}"))
    (name, nOut, nLow, nRest)
  }

  /** BOTTOM-K sample (round 12): the k rows with the SMALLEST keyed
    * hash `graft_h60('bk:'||key)` under the (hash ASC, key ASC) total
    * order — a FIXED-SIZE uniform sample (order-statistic / bottom-k
    * sampling, Cohen & Kaplan's summarization primitive).
    *
    * Why a second uniform form when Bernoulli samples exist: a
    * Bernoulli/lottery sample is fixed-FRACTION — its size grows with
    * the table, and two partial samples cannot be combined without
    * re-tossing. Bottom-k is fixed-SIZE and MERGEABLE: the bottom-k of
    * a union is the bottom-k of the parts' bottom-k's, so it is the one
    * sample a STREAM can maintain incrementally (fold each micro-batch,
    * keep k smallest — `SampleMaintainers.maintainBottomKSample`), and at
    * 100 TB it is the form that keeps a sample cache-resident forever
    * instead of scaling with ingest.
    *
    * Determinism: the hash is the keyed h60 lottery (no RNG), the
    * order is total (key unique), so the sample is a pure function of
    * the data — rebuilds, stream folds, and a DuckDB oracle all land on
    * the same k rows. Membership materializes via a scan-local cutoff
    * predicate from one distributed TakeOrdered pass (the outlier
    * sample's pattern — no full-table rank/sort). The serve weight is
    * N/k (simple-random-sample expansion, N known exactly from the
    * catalog), applied as ONE post-aggregation multiply
    * (`SampleRewrite.Directive.postScale`) so estimates stay
    * bit-portable — never a per-row non-integer product whose sum
    * order could drift.
    *
    * The sample stores the base table's columns plus `graft_h` (the
    * merge key the streaming maintainer folds on). Registered with a
    * `__bottomk__<key>` strata marker so uniform/stratified lookups
    * never serve it directly (its weight discipline differs).
    */
  def createBottomK(spark: SparkSession, catalog: MetaCatalog,
      table: String, keyCol: String, k: Int = 2048): (String, Long) = {
    require(k >= 1, "k must be >= 1")
    graft.functions.GraftFunctions.register(spark)
    val df = spark.table(table)
    // same unique+non-null key guard as the outlier build: a NULL key
    // hashes NULL (never sampled, still counted in N — downward bias),
    // a duplicate key breaks the exactly-k cutoff's total order
    val keyStats = df.agg(
      count(lit(1)).as("n"),
      count(col(keyCol)).as("nk"),
      countDistinct(col(keyCol)).as("nd")).collect()(0)
    val base = keyStats.getLong(0)
    require(keyStats.getLong(1) == base,
      s"bottom-k sample key $table.$keyCol must be non-null " +
        s"(${base - keyStats.getLong(1)} null keys)")
    require(keyStats.getLong(2) == base,
      s"bottom-k sample key $table.$keyCol must be unique " +
        s"(${base - keyStats.getLong(2)} duplicate keys)")
    val hCol = expr(
      s"graft_h60(concat('bk:', cast($keyCol as string)))")
    // the k-th (hash, key) pair under the ASC/ASC total order — the
    // scan-local membership cutoff (k rows through TakeOrdered, 1 row
    // to the driver); a table with <= k rows keeps everything
    val cut = df
      .select(hCol.as("gh"), col(keyCol).as("kk"))
      .orderBy(col("gh").asc, col("kk").asc).limit(k)
      .orderBy(col("gh").desc, col("kk").desc).limit(1)
      .collect()
    val member = cut.headOption.map { r =>
      val ch = r.getLong(0)
      val ck = r.get(1)
      (hCol < lit(ch)) || (hCol === lit(ch) && col(keyCol) <= lit(ck))
    }.getOrElse(lit(true))
    val name = s"${table}__bottomk_$keyCol"
    val path = s"${catalog.samplesDir}/$name"
    df.filter(member)
      .withColumn("graft_h", hCol)
      .coalesce(sampleFiles(k.toDouble))
      .write.mode("overwrite").parquet(path)
    val sampleDf = spark.read.parquet(path).cache()
    sampleDf.createOrReplaceTempView(name)
    val achieved = sampleDf.count() // min(k, base)
    val fraction = math.min(0.9999,
      achieved.toDouble / math.max(1L, base))
    catalog.upsertTableStats(table, base)
    catalog.addSample(catalog.SampleInfo(table, name, fraction,
      Some(s"__bottomk__${keyCol.toLowerCase}"), path,
      System.currentTimeMillis(), baseRows = Some(base)))
    catalog.putStrata(name, Seq(
      catalog.StratumInfo(name, "all", base, achieved, fraction,
        base.toDouble / math.max(1L, achieved), 0.0)))
    catalog.vacuumStaleSamples(table)(_.strataColumn
      .exists(_.startsWith("__bottomk__")))
    // the rider: the running base count a streaming maintainer seeds
    // from (a maintainer taking over a batch-built sample must CONTINUE
    // N, not reset it) plus the build-time decimal-safety proof — the
    // serve routes a SUM/AVG argument through DECIMAL(18,4) only for
    // columns every SAMPLE row survives exactly (≤4 decimal places,
    // |v| < 1e14; only sample rows are ever cast, so validating the
    // materialized rows is exactly sufficient)
    catalog.upsertSketch(catalog.SketchInfo(table, keyCol,
      "bottomk_rider", Array.emptyByteArray,
      s"""{"rows":$base,"k":$k,"decsafe":${"\"" + decimalSafeCols(sampleDf) + "\""}}""",
      System.currentTimeMillis()))
    (name, achieved)
  }

  /** Comma-joined list of the frame's numeric columns whose EVERY value
    * round-trips DECIMAL(18,4) exactly (try_cast: an overflowing value
    * nulls instead of throwing under ANSI, and null <=> value is
    * false). The bottom-k serves' decimal-routing gate.
    */
  private[graft] def decimalSafeCols(df: DataFrame): String = {
    import org.apache.spark.sql.types._
    val numeric = df.schema.fields.filter(f => f.dataType match {
      case _: IntegerType | _: ShortType | _: LongType | _: DoubleType |
           _: FloatType | _: DecimalType => true
      case _ => false
    }).map(_.name).filterNot(_.startsWith("graft_"))
    if (numeric.isEmpty) ""
    else {
      val checks = numeric.map(c =>
        expr(s"every(cast(`$c` as double) <=> " +
          s"cast(try_cast(`$c` as decimal(18,4)) as double))").as(c))
      val row = df.agg(checks.head, checks.tail.toIndexedSeq: _*).collect()(0)
      numeric.zipWithIndex
        .filter { case (_, i) => !row.isNullAt(i) && row.getBoolean(i) }
        .map(_._1.toLowerCase).mkString(",")
    }
  }

  /** GROUPED bottom-k sample (round 12): [[createBottomK]] PER GROUP —
    * each group keeps its k hash-smallest rows under the
    * ('bkg:' hash ASC, key ASC) total order. This is the STREAMABLE
    * STRATIFIED sample: like a stratified sample it guarantees every
    * group representation (the plain bottom-k's documented weakness —
    * a rare group can lose the global hash race entirely), and like
    * bottom-k it is MERGEABLE per group, so a stream folds it in
    * O(groups·k) driver state (`SampleMaintainers.maintainBottomKSample`
    * with a group column) where a lottery-stratified sample could only
    * rebuild. Each row carries `graft_gw` = its group's exact N_g/k_g
    * expansion (one double division per group, computed from exact
    * counts at build/fold time), applied ONCE post-aggregation per
    * output group (`SampleRewrite.Directive.postScaleColumn`) — the
    * grouped twin of the constant N/k scale. One shuffle to build
    * (window rank per group — the same exchange any stratified build
    * pays). Registered under `__bottomkg__<groupcol>`.
    */
  def createBottomKGrouped(spark: SparkSession, catalog: MetaCatalog,
      table: String, groupCol: String, keyCol: String,
      kPerGroup: Int = 512): (String, Long) = {
    require(kPerGroup >= 1, "kPerGroup must be >= 1")
    graft.functions.GraftFunctions.register(spark)
    val df = spark.table(table)
    val keyStats = df.agg(
      count(lit(1)).as("n"),
      count(col(keyCol)).as("nk"),
      countDistinct(col(keyCol)).as("nd"),
      count(col(groupCol)).as("ng")).collect()(0)
    val base = keyStats.getLong(0)
    require(keyStats.getLong(1) == base,
      s"grouped bottom-k key $table.$keyCol must be non-null")
    require(keyStats.getLong(2) == base,
      s"grouped bottom-k key $table.$keyCol must be unique")
    require(keyStats.getLong(3) == base,
      s"grouped bottom-k group column $table.$groupCol must be non-null " +
        "(a NULL group cannot carry a weight)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(
        expr(s"graft_h60(concat('bkg:', cast($keyCol as string)))").asc,
        col(keyCol).asc)
    val gcounts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("graft_gn"))
    val name = s"${table}__bottomkg_$groupCol"
    val path = s"${catalog.samplesDir}/$name"
    // the rank filter keeps exactly k_g = min(k, N_g) rows per group,
    // so the per-group weight N_g/k_g is known from the counts alone —
    // one double division per row, same value for every row of a group
    df.withColumn("graft_h",
        expr(s"graft_h60(concat('bkg:', cast($keyCol as string)))"))
      .withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") <= kPerGroup)
      .drop("graft_rn")
      .join(broadcast(gcounts), Seq(groupCol))
      .withColumn("graft_gw", expr(
        s"cast(graft_gn as double) / " +
          s"cast(least(cast($kPerGroup as bigint), graft_gn) as double)"))
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
    val sampleDf = spark.read.parquet(path).cache()
    sampleDf.createOrReplaceTempView(name)
    val achieved = sampleDf.count()
    val fraction = math.min(0.9999,
      achieved.toDouble / math.max(1L, base))
    catalog.upsertTableStats(table, base)
    catalog.addSample(catalog.SampleInfo(table, name, fraction,
      Some(s"__bottomkg__${groupCol.toLowerCase}"), path,
      System.currentTimeMillis(), baseRows = Some(base)))
    val strata = sampleDf
      .groupBy(col(groupCol))
      .agg(max(col("graft_gn")).as("gn"), count(lit(1)).as("gk"))
      .collect()
      .map { r =>
        val gn = r.getLong(1); val gk = r.getLong(2)
        catalog.StratumInfo(name, String.valueOf(r.get(0)), gn, gk,
          gk.toDouble / math.max(1L, gn), gn.toDouble / math.max(1L, gk),
          0.0)
      }.toSeq
    catalog.putStrata(name, strata)
    // the rider: per-group running counts (escaped group\tcount lines —
    // the streaming maintainer CONTINUES these instead of resetting)
    // plus the decimal-safety proof over the materialized rows
    val blob = strata.sortBy(_.strataValue)
      .map(st => s"${graft.streaming.BlobEscape.esc(st.strataValue)}\t${st.popSize}")
      .mkString("\n").getBytes("UTF-8")
    catalog.upsertSketch(catalog.SketchInfo(table, groupCol,
      "bottomkg_rider", blob,
      s"""{"rows":$base,"k":$kPerGroup,"decsafe":${"\"" + decimalSafeCols(sampleDf) + "\""}}""",
      System.currentTimeMillis()))
    catalog.vacuumStaleSamples(table)(_.strataColumn
      .exists(_.startsWith("__bottomkg__")))
    (name, achieved)
  }

  /** Universe sample: the rows whose JOIN KEY wins the shared keyed-hash
    * lottery `graft_h60('uv:'||key) % 10000 < round(f*10000)` —
    * materialized once so repeated universe-sampled joins
    * (QueryEngine's both-sides-big path) read two small cached tables
    * instead of re-hashing both full scans per query (the same
    * pay-once-at-creation economics as createUniform; at 100 TB the
    * md5-based lottery over every row is itself a full-scan cost).
    * Two universe samples with the SAME fraction are join-compatible:
    * equal keys hash identically, so the sampled join is the
    * key-universe p-sample of the full join under one 1/p HT scale.
    * Registered with a `__universe__<key>` strata marker so the
    * uniform-sample lookup can never serve it as a row-level sample
    * (it is key-clustered, not row-uniform).
    */
  def createUniverse(spark: SparkSession, catalog: MetaCatalog,
      table: String, key: String, fraction: Double): (String, Long) =
    createUniverse(spark, catalog, table, Seq(key), fraction)

  /** Composite-key variant: the lottery hashes the key tuple
    * (SampleRewrite.universeKeyExpr — same rendering the inline filter
    * uses, so materialized membership is identical); registered under
    * the comma-joined key name the engine's lookup uses.
    */
  def createUniverse(spark: SparkSession, catalog: MetaCatalog,
      table: String, keys: Seq[String], fraction: Double): (String, Long) = {
    require(fraction > 0 && fraction < 1, "fraction must be in (0,1)")
    require(keys.nonEmpty, "at least one key column required")
    graft.functions.GraftFunctions.register(spark)
    val threshold = math.max(1, math.round(fraction * 10000).toInt)
    val p = threshold / 10000.0
    val name = s"${table}__uni_${keys.mkString("_")}_${SampleNaming.encodeFraction(p)}"
    val path = s"${catalog.samplesDir}/$name"
    val df = spark.table(table)
    val base = df.count()
    df.filter(expr(
        s"graft_h60(${graft.plan.SampleRewrite.universeKeyExpr(keys)}) % 10000 < $threshold"))
      .coalesce(sampleFiles(base * p))
      .write.mode("overwrite").parquet(path)
    val sampleDf = spark.read.parquet(path).cache()
    sampleDf.createOrReplaceTempView(name)
    val rows = sampleDf.count()
    catalog.upsertTableStats(table, base)
    catalog.addSample(catalog.SampleInfo(table, name, p,
      Some(s"__universe__${keys.mkString(",")}"), path, System.currentTimeMillis(),
      baseRows = Some(base)))
    catalog.vacuumStaleSamples(table)(_.strataColumn
      .contains(s"__universe__${keys.mkString(",")}"))
    (name, rows)
  }

  /** Neyman allocation: n_h = n_total * N_h*sigma_h / sum(N_h*sigma_h),
    * fraction capped at 1.0 (/root/reference/sampler.py:194-217).
    */
  def allocateNeyman(strata: Seq[(String, Long, Double)],
      totalFraction: Double): Seq[StratumAllocation] = {
    val totalPop = strata.map(_._2).sum
    val weights = strata.map { case (_, n, variance) =>
      n * math.sqrt(variance)
    }
    val totalWeight = weights.sum
    val totalSampleSize = totalPop * totalFraction
    strata.zip(weights).map { case ((value, popSize, variance), w) =>
      var (size, frac) =
        if (totalWeight > 0) {
          val sz = (totalSampleSize * w / totalWeight).toLong
          (sz, sz.toDouble / popSize)
        } else ((popSize * totalFraction).toLong, totalFraction)
      if (frac > 1.0) { frac = 1.0; size = popSize }
      StratumAllocation(value, popSize, size, frac, w, variance)
    }
  }

  /** Proportional allocation (/root/reference/sampler.py:220-225). */
  def allocateProportional(strata: Seq[(String, Long, Double)],
      totalFraction: Double): Seq[StratumAllocation] =
    strata.map { case (value, popSize, variance) =>
      StratumAllocation(value, popSize, (popSize * totalFraction).toLong,
        totalFraction, popSize.toDouble, variance)
    }
}
