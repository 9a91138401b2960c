package graft.tools

import org.apache.spark.sql.SparkSession

/** SF-scaling probe: per-query wall time at sf0.01 vs sf0.1 (10× the
  * rows) with a slope flag — the cheap local stand-in for the "would
  * this survive 100×?" question. A query whose warm time grows by more
  * than GROWTH_FLAG (1.5 × the 10× data ratio) has a super-linear
  * stage (a widening join, an unguarded posting list, a collapsed
  * partition) and gets flagged for investigation; results are recorded
  * as the slope table in PLANS.md.
  *
  * Method: per query, one untimed warm pass at each SF (codegen,
  * parquet footers, shared memoized materializations), then the MIN of
  * two timed passes, interleaved sf0.01→sf0.1 per query so a
  * contention window cannot poison one side of every ratio. Times
  * under FLOOR_S at the small SF are ratio-unreliable (fixed job
  * latency dominates) — those rows print with `~` and are exempt from
  * the flag unless the large-SF side is also slow.
  *
  *   runMain graft.tools.Scaling            # all queries
  *   runMain graft.tools.Scaling q17 q19    # prefix filter
  */
object Scaling {
  val SmallSf = "/root/testdata/sf0.01"
  val LargeSf = "/root/testdata/sf0.1"
  val GrowthFlag = 15.0 // 1.5 × the 10× row-count ratio
  val FloorS = 0.25     // below this at sf0.01, the ratio is floor-noise

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

    val prefixes = args.filter(!_.startsWith("--")).toSeq
    val queries = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) =>
        prefixes.isEmpty || prefixes.exists(n.startsWith)
      }

    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    // warm both SFs first (memoized corpus materializations, codegen)
    queries.foreach { case (name, fn) =>
      try { timed(fn, SmallSf); timed(fn, LargeSf) }
      catch { case t: Throwable =>
        println(s"[scaling] WARM-FAIL $name: ${t.getClass.getSimpleName}") }
    }

    val small = collection.mutable.Map[String, Double]()
    val large = collection.mutable.Map[String, Double]()
    for (_ <- 1 to 2) queries.foreach { case (name, fn) =>
      try {
        val s = timed(fn, SmallSf)
        small(name) = math.min(small.getOrElse(name, s), s)
        val l = timed(fn, LargeSf)
        large(name) = math.min(large.getOrElse(name, l), l)
      } catch { case _: Throwable => () }
    }

    println("| query | sf0.01 s | sf0.1 s | ratio (10x rows) | flag |")
    println("|---|---|---|---|---|")
    var flagged = 0
    queries.foreach { case (name, _) =>
      (small.get(name), large.get(name)) match {
        case (Some(s), Some(l)) =>
          val ratio = l / s
          val floorNoise = s < FloorS
          val bad = ratio > GrowthFlag && !floorNoise
          if (bad) flagged += 1
          val mark =
            if (bad) "SUPER-LINEAR"
            else if (floorNoise) "~ (floor-dominated at sf0.01)"
            else ""
          println(f"| $name | $s%.2f | $l%.2f | ${ratio}%.1f | $mark |")
        case _ => println(s"| $name | - | - | - | FAILED |")
      }
    }
    println(s"[scaling] flagged=$flagged of ${queries.size} " +
      s"(threshold ${GrowthFlag}x warm-time growth for 10x rows)")
    spark.stop()
  }
}
