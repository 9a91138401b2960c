package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway dev harness: isolated timing or plan dump for any
  * SparkEntry query, away from bench-subset contention effects.
  * Not part of the driver contract.
  *
  *   runMain graft.tools.Scratch q19_ngram_jaccard q50_contamination
  *   runMain graft.tools.Scratch --plan q59_doc_chunks
  */
object Scratch {
  def t[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (args.contains("--rangesum")) {
      // probe: why does the grouped range SUM serve engage (or not)
      // under the default budget on this data distribution?
      graft.Tables.ensureRegistered(spark, sfDir)
      val cat = new graft.catalog.MetaCatalog(
        java.nio.file.Files.createTempDirectory("graft-scr").toString)
      val eng = new graft.engine.QueryEngine(spark, cat)
      graft.sketch.SketchOps.createGroupedHistogram(spark, cat,
        "lineitem", Seq("l_returnflag"), "l_extendedprice", 64)
      Seq(
        "SELECT l_returnflag, count(*) AS n, sum(l_extendedprice) AS s, " +
          "avg(l_extendedprice) AS a FROM lineitem " +
          "WHERE l_extendedprice >= 2000 GROUP BY l_returnflag",
        "SELECT l_returnflag, count(*) AS n, sum(l_extendedprice) AS s " +
          "FROM lineitem WHERE l_extendedprice >= 2000 GROUP BY l_returnflag"
      ).foreach { q =>
        val r = eng.query(q)
        println(s"[scratch] planType=${r.planType} serveKind=${r.serveKind} " +
          s"err=${r.estimatedError} reason=${r.reason}")
      }
      spark.stop(); return
    }
    if (args.contains("--hdrprobe")) {
      graft.Tables.ensureRegistered(spark, sfDir)
      val cat = new graft.catalog.MetaCatalog(
        java.nio.file.Files.createTempDirectory("graft-scr").toString)
      val eng = new graft.engine.QueryEngine(spark, cat)
      graft.sketch.SketchOps.createHdr(spark, cat, "lineitem",
        "l_extendedprice")
      cat.listSketches(Some("lineitem")).foreach(s =>
        println(s"[scratch] sketch ${s.sketchType} col=${s.columnName} " +
          s"params=${s.parameters} bytes=${s.data.length}"))
      Seq(
        "SELECT count(*) AS n FROM lineitem " +
          "WHERE l_extendedprice >= 3000 AND l_extendedprice < 50000",
        "SELECT count(*) AS n, sum(l_extendedprice) AS s FROM lineitem " +
          "WHERE l_extendedprice >= 3000 AND l_extendedprice < 50000",
        "SELECT count(*) AS n, sum(l_extendedprice) AS s, " +
          "avg(l_extendedprice) AS a FROM lineitem " +
          "WHERE l_extendedprice >= 3000 AND l_extendedprice < 50000"
      ).foreach { q =>
        val r = eng.query(q, eng.Options(maxRelError = 0.5))
        println(s"[scratch] planType=${r.planType} serveKind=${r.serveKind} " +
          s"err=${r.estimatedError} reason=${r.reason}")
      }
      spark.stop(); return
    }
    if (args.contains("--prefixstats")) {
      // candidate-volume probe behind q165's prefix filter
      val (full, pref) = graft.queries.Dedup.prefixFilterStats(spark, sfDir)
      println(s"[scratch] candidate pairs: full=$full prefix=$pref " +
        f"(${pref.toDouble / math.max(1L, full) * 100}%.1f%%)")
      spark.stop(); return
    }
    val plan = args.contains("--plan")
    val names =
      if (args.exists(!_.startsWith("--"))) args.filter(!_.startsWith("--")).toSeq
      else Seq("q19_ngram_jaccard", "q50_contamination")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (plan)
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      else (1 to 2).foreach { pass =>
        t(s"p$pass $name")(fn(spark, sfDir).queryExecution.toRdd.count())
      }
    }
    spark.stop()
  }
}
