package graft.tools

/** Second-process writer for the MetaCatalog multi-process CAS law:
  * opens the catalog over an EXISTING workDir and folds `n` one-unit
  * batches into the ("t", "x", "ctr") counter sketch via
  * `upsertSketchMerging`. MetaCatalogSpec spawns this main in a REAL
  * second JVM (plain `java -cp`, no Spark — the catalog is pure
  * java.nio) interleaved with its own writers, so the no-lost-batch
  * guarantee is proven across OS processes through the file locks,
  * not just across threads under the JVM monitor.
  */
object CatalogStress {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args(1).toInt
    val cat = new graft.catalog.MetaCatalog(dir)
    var i = 0
    while (i < n) {
      cat.upsertSketchMerging(cat.SketchInfo("t", "x", "ctr",
        Array[Byte](1), """{"proc":"child"}""", 1L)) { (a, b) =>
        Array[Byte]((a(0) + b(0)).toByte)
      }
      i += 1
    }
    // the child's last view of the fold, for debugging a failed law
    println(cat.getSketch("t", "x", "ctr").map(_.data(0)).getOrElse(-1))
  }
}
