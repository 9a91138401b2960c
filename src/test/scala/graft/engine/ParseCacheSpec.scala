package graft.engine

import java.nio.file.Files

import graft.catalog.MetaCatalog
import graft.{SparkSpec, Tables}

/** The engine's parse cache must evict per-entry in access order (LRU),
  * never flush wholesale: a serving workload's hot query shapes stay
  * cached when the capacity+1'th distinct shape arrives.
  */
class ParseCacheSpec extends SparkSpec {

  lazy val engine = new QueryEngine(spark,
    new MetaCatalog(Files.createTempDirectory("graft-lru").toString),
    parseCacheCap = 4)

  override def beforeAll(): Unit = {
    super.beforeAll()
    Tables.registerAll(spark, sfDir)
  }

  private def q(i: Int): String = s"SELECT count(*) AS n, $i AS tag FROM nation"

  test("eviction is per-entry LRU, not a wholesale flush") {
    val opts = engine.Options(preferExact = true)
    (1 to 4).foreach(i => engine.query(q(i), opts))
    assert((1 to 4).forall(i => engine.parsedCached(q(i)).isDefined))

    // touch q1 so q2 becomes the eldest, then overflow with q5
    engine.query(q(1), opts)
    engine.query(q(5), opts)

    assert(engine.parsedCached(q(2)).isEmpty, "eldest entry must be evicted")
    // everything else survives — a wholesale clear() would have dropped
    // the hot entries too
    assert(Seq(1, 3, 4, 5).forall(i => engine.parsedCached(q(i)).isDefined))
  }

  test("cached plan is reused (same instance) across calls") {
    val opts = engine.Options(preferExact = true)
    engine.query(q(7), opts)
    val first = engine.parsedCached(q(7)).get._1
    engine.query(q(7), opts)
    assert(engine.parsedCached(q(7)).get._1 eq first)
  }
}
