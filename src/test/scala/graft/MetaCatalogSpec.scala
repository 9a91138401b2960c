package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.MetaCatalog

/** Catalog invariants that the engine's guards depend on: field-wise
  * parameter merging on sketch upserts (neither the batch builder nor a
  * streaming maintainer may drop the other's fields) and the explicit
  * version counter that carries upsertSketchMerging's CAS.
  */
class MetaCatalogSpec extends AnyFunSuite {

  private def freshCatalog =
    new MetaCatalog(Files.createTempDirectory("graft-cat-test").toString)

  test("mergeParams: next wins per field, prev-only fields carry forward") {
    val c = freshCatalog
    assert(c.mergeParams("""{"buckets":64,"rows":1000}""",
      """{"buckets":64,"last_batch":3}""")
      == """{"buckets":64,"rows":1000,"last_batch":3}""")
    assert(c.mergeParams("""{"b":12}""", """{"b":14,"rows":5}""")
      == """{"b":14,"rows":5}""")
    assert(c.mergeParams("{}", """{"x":"y z"}""") == """{"x":"y z"}""")
  }

  test("stream maintenance preserves the batch builder's rows field (freshness guard survives)") {
    val c = freshCatalog
    // batch build records rows (the engine's freshness evidence)
    c.upsertSketch(c.SketchInfo("t", "x", "histogram",
      Array[Byte](1), """{"buckets":8,"rows":100}""", 1L))
    // streaming maintainer owns only buckets/last_batch
    val merged = c.upsertSketchMerging(c.SketchInfo("t", "x", "histogram",
      Array[Byte](2), """{"buckets":8,"last_batch":7}""", 2L))(
      (a, b) => a ++ b)
    assert(merged.parameters.contains(""""rows":100"""), merged.parameters)
    assert(merged.parameters.contains(""""last_batch":7"""), merged.parameters)
    // a later batch REBUILD must not drop last_batch either, or a
    // replayed stream batch would double-count
    c.upsertSketch(c.SketchInfo("t", "x", "histogram",
      Array[Byte](3), """{"buckets":8,"rows":150}""", 3L))
    val after = c.getSketch("t", "x", "histogram").get
    assert(after.parameters.contains(""""rows":150"""), after.parameters)
    assert(after.parameters.contains(""""last_batch":7"""), after.parameters)
  }

  test("version increments on every write of the same key (explicit CAS token)") {
    val c = freshCatalog
    c.upsertSketch(c.SketchInfo("t", "x", "hyperloglog",
      Array[Byte](1), """{"b":12}""", 1L))
    assert(c.getSketch("t", "x", "hyperloglog").get.version == 0L)
    c.upsertSketchMerging(c.SketchInfo("t", "x", "hyperloglog",
      Array[Byte](2), """{"b":12}""", 2L))((a, b) => a ++ b)
    assert(c.getSketch("t", "x", "hyperloglog").get.version == 1L)
    c.upsertSketch(c.SketchInfo("t", "x", "hyperloglog",
      Array[Byte](3), """{"b":12}""", 3L))
    assert(c.getSketch("t", "x", "hyperloglog").get.version == 2L)
  }

  test("concurrent merging writers never lose a batch") {
    val c = freshCatalog
    val writers = (1 to 8).map { i =>
      new Thread(() => (1 to 50).foreach { _ =>
        c.upsertSketchMerging(c.SketchInfo("t", "x", "ctr",
          Array[Byte](1), s"""{"w":$i}""", i.toLong)) { (a, b) =>
          // one-byte counter: merge = sum (commutative, like histogram add)
          Array[Byte]((a(0) + b(0)).toByte)
        }
      })
    }
    writers.foreach(_.start())
    writers.foreach(_.join())
    val s = c.getSketch("t", "x", "ctr").get
    assert(s.data(0) == (8 * 50).toByte, s.data(0))
    assert(s.version == (8 * 50 - 1).toLong, s.version)
  }
}
