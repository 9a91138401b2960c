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
    if (args.contains("--semdedup")) {
      // q145 stage timings, isolated: adjudicates whether a bench
      // drift is the assignment, the pair join, or the propagation loop
      graft.Tables.ensureRegistered(spark, sfDir)
      // pass 1 of the first hop count pays the memo builds (assign,
      // normed, candidate graph); compare WARM passes across hop counts
      Seq(3, 4, 6).foreach { h =>
        (1 to 2).foreach { pass =>
          println(s"[scratch] --- semdedup hops=$h pass $pass ---")
          t(s"q145 total (hops=$h pass $pass)") {
            graft.queries.Similarity.semanticDedupOf(spark, sfDir,
              verbose = true, hopsPerRound = h).queryExecution.toRdd.count()
          }
        }
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
    if (args.contains("--prefixprobe")) {
      // piecewise timings for the q165 prefix-join stages
      import org.apache.spark.sql.functions._
      val ex = t("shingleHashes")(graft.queries.Dedup.shingleHashes(spark, sfDir))
      val dfreq = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
      val kept = ex.join(dfreq.filter(col("df") <= 64), "h")
      t("kept count")(println("[scratch] kept=" + kept.count()))
      val sets = kept
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("h")))).as("dh"))
        .select(col("doc_id"), expr("cardinality(dh)").as("n"),
          expr("transform(dh, x -> x.h)").as("hs"))
      val setsM = t("sets agg + checkpoint")(sets.localCheckpoint())
      val prefix = setsM.select(col("doc_id"), col("n"),
        posexplode(expr(
          "slice(hs, 1, cast(n - ((n + 1) div 2) + 1 as int))"))
          .as(Seq("p0", "h")))
        .select(col("doc_id"), col("n"), (col("p0") + 1).as("p"), col("h"))
      t("prefix count")(println("[scratch] prefix=" + prefix.count()))
      val cands = prefix.as("a")
        .join(prefix.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
            col("b.n") <= col("a.n") * 2 && col("a.n") <= col("b.n") * 2 &&
            expr("least(a.n - a.p, b.n - b.p) >= (a.n + b.n) div 3"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val candsM = t("cands join+distinct")(cands.localCheckpoint())
      println("[scratch] cands=" + candsM.count())
      val out = candsM
        .join(setsM.select(col("doc_id").as("doc_a"), col("hs").as("ha"),
          col("n").as("na")), "doc_a")
        .join(setsM.select(col("doc_id").as("doc_b"), col("hs").as("hb"),
          col("n").as("nb")), "doc_b")
        .withColumn("i", expr("cardinality(array_intersect(ha, hb))"))
        .withColumn("jaccard", expr("cast(i as double) / (na + nb - i)"))
        .filter(col("jaccard") > 0.5)
      t("verify")(println("[scratch] out=" + out.count()))
      spark.stop(); return
    }
    if (args.contains("--prefixstats")) {
      // candidate-volume probe behind q165's prefix filter
      val (full, pref, cand) = graft.queries.Dedup.prefixFilterStats(spark, sfDir)
      println(s"[scratch] candidate pairs: full=$full prefix=$pref cand=$cand " +
        f"(prefix ${pref.toDouble / math.max(1L, full) * 100}%.1f%%, " +
        f"verified set ${cand.toDouble / math.max(1L, full) * 100}%.2f%%)")
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
