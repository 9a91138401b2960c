package graft.sketch

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Serialization for a GROUPED HyperLogLog sketch: one HLL per group
  * value, packed into a single catalog blob so the per-group
  * COUNT(DISTINCT) shape (`SELECT g, count(distinct x) FROM t GROUP
  * BY g`) can be answered from the catalog with no scan — the grouped
  * extension of the reference's single-value sketch store
  * (/root/reference/sketches.py:10-151, app.py:222-258; the reference
  * has no grouped variant at all).
  *
  * Layout (little-endian): `[u32 n]` then per group
  * `[i32 keyLen][key UTF-8 bytes][u32 sketchLen][sketch bytes]`,
  * keyLen == -1 encodes a NULL group key. Group keys are stored as the
  * string rendering of the grouping value (`cast(g as string)`), the
  * same string-keyed contract the Count-Min store uses.
  *
  * The blob is driver-resident metadata, not data: the builder refuses
  * more than `SketchOps.MaxHllGroups` groups, so at 100 TB the blob
  * stays a few MB while the build itself remains one distributed pass.
  */
object GroupedHll {

  /** Canonical group order (NULL key first, then string order): two
    * blobs over the same groups serialize byte-identically regardless
    * of aggregation order — what lets the stream-maintenance law
    * assert stream-built == batch-built at the byte level. The payload
    * is opaque bytes, so the same packing carries any per-group sketch
    * (GroupedHistogram reuses it with Histogram payloads).
    */
  def pack(unordered: Seq[(Option[String], Array[Byte])]): Array[Byte] = {
    val groups = unordered.sortBy { case (k, _) => (k.isDefined, k.getOrElse("")) }
    val keys = groups.map { case (k, _) =>
      k.map(_.getBytes(StandardCharsets.UTF_8))
    }
    val size = 4 + groups.zip(keys).map { case ((_, s), kb) =>
      8 + kb.map(_.length).getOrElse(0) + s.length
    }.sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(groups.size)
    groups.zip(keys).foreach { case ((_, sketch), kb) =>
      kb match {
        case Some(b) => buf.putInt(b.length); buf.put(b)
        case None    => buf.putInt(-1)
      }
      buf.putInt(sketch.length)
      buf.put(sketch)
    }
    buf.array()
  }

  def unpack(data: Array[Byte]): Seq[(Option[String], Array[Byte])] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getInt
    (0 until n).map { _ =>
      val keyLen = buf.getInt
      val key =
        if (keyLen < 0) None
        else {
          val kb = new Array[Byte](keyLen)
          buf.get(kb)
          Some(new String(kb, StandardCharsets.UTF_8))
        }
      val sLen = buf.getInt
      val sb = new Array[Byte](sLen)
      buf.get(sb)
      key -> sb
    }
  }

  def serialize(groups: Seq[(Option[String], Array[Byte])]): Array[Byte] =
    pack(groups)

  def deserialize(data: Array[Byte]): Seq[(Option[String], Hll)] =
    unpack(data).map { case (k, b) => k -> Hll.deserialize(b) }

  /** Union merge of two packed blobs with a caller-supplied payload
    * merge where both hold a group — the grouped-sketch merge shape
    * shared by HLL (register max) and histogram (count addition)
    * payloads. Canonical-order pack keeps the result byte-deterministic.
    */
  def mergePacked(a: Array[Byte], b: Array[Byte])(
      mergePayload: (Array[Byte], Array[Byte]) => Array[Byte]): Array[Byte] = {
    val left = unpack(a).toMap
    val right = unpack(b).toMap
    pack((left.keySet ++ right.keySet).toSeq.map { k =>
      k -> ((left.get(k), right.get(k)) match {
        case (Some(x), Some(y)) => mergePayload(x, y)
        case (Some(x), None)    => x
        case (None, y)          => y.get
      })
    })
  }

  /** Register-max merge of two grouped blobs: union of group keys, HLL
    * merge where both hold a group. Idempotent like the underlying HLL
    * (no last_batch replay guard needed), and canonical-order serialize
    * keeps the result byte-deterministic.
    */
  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    mergePacked(a, b) { (x, y) =>
      Hll.deserialize(x).merge(Hll.deserialize(y)).serialize
    }
}
