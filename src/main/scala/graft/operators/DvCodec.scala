package graft.operators

/** Position-list codec for COMPRESSED deletion vectors: a sorted list of
  * in-file row indexes encoded as delta-varints (LEB128 gaps). This is
  * the sorted-delta-varint flavor of what production formats store as
  * roaring bitmaps — chosen over roaring because the position sets a
  * merge-on-read delete produces are SORTED BY CONSTRUCTION (they come
  * out of a per-file groupBy of scan order), gaps are small, and LEB128
  * of small gaps is 1 byte/position before parquet's own page
  * compression collapses repeated gap patterns further. A 100M-row
  * delete that wrote ~800 MB of (file, row_index) parquet rows under the
  * row-per-position format writes ~100 MB raw / far less compressed
  * here, one binary cell per touched file.
  *
  * Format: varint(first index), then varint(gap) per subsequent index,
  * gaps strictly positive (indexes strictly increasing — duplicates are
  * a protocol bug and fail loudly at encode). Empty list = empty bytes.
  * The decoder is deliberately tiny so a second engine can replay it —
  * scripts/manifest_interop.py carries the ~10-line Python twin.
  */
object DvCodec {

  /** Encode a strictly-increasing sequence of non-negative row indexes. */
  def encode(sorted: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(sorted.length + 8)
    var prev = -1L
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i)
      require(v > prev, s"positions must be strictly increasing: $v after $prev")
      var d = if (i == 0) v else v - prev
      prev = v
      while ((d & ~0x7fL) != 0) { out.write(((d & 0x7f) | 0x80).toInt); d >>>= 7 }
      out.write(d.toInt)
      i += 1
    }
    out.toByteArray
  }

  /** Decode back to the strictly-increasing index array. */
  def decode(bytes: Array[Byte]): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    var acc = 0L
    while (i < bytes.length) {
      var shift = 0
      var d = 0L
      var b = 0
      while ({ b = bytes(i) & 0xff; i += 1; d |= (b & 0x7fL) << shift; shift += 7; (b & 0x80) != 0 })
        require(shift <= 63, "varint overflow — corrupt deletion vector")
      acc = if (out.isEmpty) d else acc + d
      out += acc
    }
    out.toArray
  }
}
