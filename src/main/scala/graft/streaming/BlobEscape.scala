package graft.streaming

/** Line-safe escaping for the bottom-k riders' group\tcount blobs: a
  * group VALUE can contain tabs or newlines (it is arbitrary data), and
  * the blob is line/tab-delimited — escape the three metacharacters so
  * the round trip is total. Shared by the batch builders (which seed
  * the blob) and the streaming maintainers (which continue it).
  */
object BlobEscape {
  def esc(s: String): String = s
    .replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")

  def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't'   => b.append('\t'); i += 2
          case 'n'   => b.append('\n'); i += 2
          case '\\'  => b.append('\\'); i += 2
          case other => b.append(other); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Serialize a group→count map to the rider blob (sorted, escaped). */
  def encodeCounts(counts: Map[String, Long]): Array[Byte] =
    counts.toSeq.sortBy(_._1)
      .map { case (g, c) => s"${esc(g)}\t$c" }.mkString("\n")
      .getBytes("UTF-8")

  /** Parse the rider blob back ('' decodes to the empty map). */
  def decodeCounts(data: Array[Byte]): Map[String, Long] = {
    val s = new String(data, "UTF-8")
    if (s.isEmpty) Map.empty
    else s.split("\n", -1).iterator.filter(_.nonEmpty).map { line =>
      val i = line.lastIndexOf('\t')
      require(i >= 0, s"corrupt bottomkg rider line: $line")
      unesc(line.substring(0, i)) -> line.substring(i + 1).toLong
    }.toMap
  }
}
