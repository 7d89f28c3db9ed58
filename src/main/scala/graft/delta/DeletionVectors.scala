package graft.delta

import org.apache.hadoop.fs.{FileSystem, Path}
import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Deletion-vector codec and storage (Delta protocol, "Deletion
  * Vectors" section; reader feature `deletionVectors`).
  *
  * A deletion vector is the set of 0-based row indexes of a data file
  * that are logically deleted, stored as a 64-bit roaring bitmap array
  * in the spec's "portable" serialization:
  *
  * {{{
  *   magic  (4 bytes LE)  = 1681511377
  *   count  (8 bytes LE)  = number of 32-bit bitmaps
  *   per bitmap:
  *     key  (4 bytes LE)  = high 32 bits of the values it holds
  *     data               = standard-portable 32-bit RoaringBitmap
  * }}}
  *
  * and the 32-bit bitmaps use the public RoaringFormatSpec portable
  * layout (array / bitset / run containers). On disk a DV file is
  * `<version byte = 1>` followed by one or more
  * `<size int32 BE><bitmap bytes><crc32 int32 BE>` entries; the
  * descriptor's `offset` addresses an entry's size header. Inline DVs
  * ("i") carry the bitmap bytes z85-encoded in `pathOrInlineDv`; "u"
  * storage names the file by a z85-encoded UUID under the table root
  * (with an optional random path prefix for object-store key spread).
  *
  * The reference's engine (delta-rs 0.12, /root/reference) predates
  * deletion vectors entirely — this module is capability beyond parity,
  * required to read tables written by modern engines where DELETE
  * defaults to DVs instead of file rewrites.
  */
object DeletionVectors {

  // ---- z85 (ZeroMQ base85 variant, the spec's encoding) --------------------

  private val Z85Chars =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Lookup: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Chars.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** 4 bytes -> 5 chars; input length must be a multiple of 4. */
  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"z85 encodes 4-byte groups, got ${bytes.length} bytes")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div >= 1) { sb.append(Z85Chars(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 decodes 5-char groups, got ${s.length} chars")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Lookup(c.toInt) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      var k = 0
      while (k < 4) { out(i / 5 * 4 + k) = ((v >>> (8 * (3 - k))) & 0xff).toByte; k += 1 }
      i += 5
    }
    out
  }

  /** UUID <-> the 20-char z85 form used in "u" `pathOrInlineDv`. */
  def encodeUuid(u: java.util.UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits)
    z85Encode(bb.array())
  }

  def decodeUuid(s: String): java.util.UUID = {
    require(s.length == 20, s"encoded UUID must be 20 z85 chars, got ${s.length}")
    val bb = ByteBuffer.wrap(z85Decode(s))
    new java.util.UUID(bb.getLong, bb.getLong)
  }

  // ---- RoaringBitmapArray portable (de)serialization ------------------------

  /** Spec magic number for the portable RoaringBitmapArray format. */
  val PortableMagic: Int = 1681511377

  private val SerialCookie = 12347 // 32-bit roaring, with run containers
  private val SerialCookieNoRun = 12346 // 32-bit roaring, no run containers
  private val NoOffsetThreshold = 4
  private val ArrayMaxCardinality = 4096

  /** Deserialize a portable RoaringBitmapArray into sorted row indexes. */
  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == PortableMagic,
      s"bad RoaringBitmapArray magic $magic (expected $PortableMagic)")
    val nBitmaps = bb.getLong
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue, s"bad bitmap count $nBitmaps")
    val out = ArrayBuffer.empty[Long]
    var b = 0L
    while (b < nBitmaps) {
      val key = bb.getInt.toLong & 0xffffffffL // high 32 bits
      readRoaring32(bb, v => out += (key << 32) | (v & 0xffffffffL))
      b += 1
    }
    out.toArray
  }

  /** One standard-portable 32-bit RoaringBitmap, values emitted in order. */
  private def readRoaring32(bb: ByteBuffer, emit: Long => Unit): Unit = {
    val cookie = bb.getInt
    val hasRuns = (cookie & 0xffff) == SerialCookie
    val nContainers =
      if (hasRuns) (cookie >>> 16) + 1
      else {
        require(cookie == SerialCookieNoRun, s"bad roaring cookie $cookie")
        bb.getInt
      }
    val runFlags: Array[Byte] =
      if (hasRuns) { val a = new Array[Byte]((nContainers + 7) / 8); bb.get(a); a }
      else Array.emptyByteArray
    def isRun(i: Int): Boolean =
      hasRuns && (runFlags(i / 8) & (1 << (i % 8))) != 0
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = bb.getShort & 0xffff
      cards(i) = (bb.getShort & 0xffff) + 1
      i += 1
    }
    // offset header present for the no-run cookie, or with runs when
    // there are >= NO_OFFSET_THRESHOLD containers (RoaringFormatSpec);
    // we read sequentially so the offsets themselves are unused.
    if (!hasRuns || nContainers >= NoOffsetThreshold) bb.position(bb.position() + 4 * nContainers)
    i = 0
    while (i < nContainers) {
      val base = keys(i).toLong << 16
      if (isRun(i)) {
        val nRuns = bb.getShort & 0xffff
        var r = 0
        while (r < nRuns) {
          val start = bb.getShort & 0xffff
          val len = bb.getShort & 0xffff
          var v = start
          while (v <= start + len) { emit(base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= ArrayMaxCardinality) {
        var c = 0
        while (c < cards(i)) { emit(base | (bb.getShort & 0xffff)); c += 1 }
      } else {
        // bitset container: 1024 little-endian words
        var w = 0
        while (w < 1024) {
          var word = bb.getLong
          val wordBase = base | (w.toLong << 6)
          while (word != 0) {
            val t = java.lang.Long.numberOfTrailingZeros(word)
            emit(wordBase | t)
            word &= word - 1
          }
          w += 1
        }
      }
      i += 1
    }
  }

  /** Serialize sorted, distinct row indexes as a portable
    * RoaringBitmapArray (array containers below the 4096 threshold,
    * bitset containers above — the same rule the format prescribes). */
  def serialize(sortedRows: Array[Long]): Array[Byte] = {
    require(sortedRows.forall(_ >= 0), "row indexes must be >= 0")
    val byHigh = sortedRows.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    val body = ArrayBuffer.empty[Array[Byte]]
    byHigh.foreach { case (key, vals) =>
      val kb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      kb.putInt(key.toInt)
      body += kb.array()
      body += writeRoaring32(vals.map(v => (v & 0xffffffffL).toInt))
    }
    val head = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    head.putInt(PortableMagic).putLong(byHigh.size.toLong)
    (Seq(head.array()) ++ body).reduce(_ ++ _)
  }

  private def writeRoaring32(values: Array[Int]): Array[Byte] = {
    val byContainer = values.groupBy(v => (v >>> 16) & 0xffff).toSeq.sortBy(_._1)
    val n = byContainer.size
    val containerBytes = byContainer.map { case (_, vs) =>
      if (vs.length <= ArrayMaxCardinality) {
        val bb = ByteBuffer.allocate(2 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
        vs.sorted.foreach(v => bb.putShort((v & 0xffff).toShort))
        bb.array()
      } else {
        val words = new Array[Long](1024)
        vs.foreach { v =>
          val low = v & 0xffff
          words(low >>> 6) |= 1L << (low & 63)
        }
        val bb = ByteBuffer.allocate(8192).order(ByteOrder.LITTLE_ENDIAN)
        words.foreach(bb.putLong)
        bb.array()
      }
    }
    val size = 8 + 4 * n + 4 * n + containerBytes.map(_.length).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(SerialCookieNoRun)
    bb.putInt(n)
    byContainer.foreach { case (k, vs) =>
      bb.putShort((k & 0xffff).toShort)
      bb.putShort(((vs.length - 1) & 0xffff).toShort)
    }
    var off = 8 + 4 * n + 4 * n
    containerBytes.foreach { c => bb.putInt(off); off += c.length }
    containerBytes.foreach(bb.put)
    bb.array()
  }

  // ---- storage --------------------------------------------------------------

  /** Resolve a "u"/"p" descriptor to its DV file path. */
  def filePath(tableRoot: Path, dv: DeletionVectorDescriptor): Path =
    dv.storageType match {
      case "u" =>
        val enc = dv.pathOrInlineDv
        require(enc.length >= 20, s"bad u-storage pathOrInlineDv '$enc'")
        val prefix = enc.dropRight(20)
        val name = s"deletion_vector_${decodeUuid(enc.takeRight(20))}.bin"
        if (prefix.isEmpty) new Path(tableRoot, name)
        else new Path(new Path(tableRoot, prefix), name)
      case "p" => new Path(dv.pathOrInlineDv)
      case other =>
        throw new IllegalArgumentException(s"storageType '$other' has no file path")
    }

  /** Read + verify a descriptor's deleted-row set (sorted indexes). */
  def readRows(fs: FileSystem, tableRoot: Path, dv: DeletionVectorDescriptor): Array[Long] = {
    val data = dv.storageType match {
      case "i" => z85Decode(dv.pathOrInlineDv).take(dv.sizeInBytes)
      case "u" | "p" =>
        val p = filePath(tableRoot, dv)
        val in = fs.open(p)
        try {
          in.seek(dv.offset.getOrElse(0).toLong)
          val size = in.readInt() // big-endian length header
          require(size == dv.sizeInBytes,
            s"DV size header $size != descriptor sizeInBytes ${dv.sizeInBytes} in $p")
          val buf = new Array[Byte](size)
          in.readFully(buf)
          val storedCrc = in.readInt()
          val crc = new java.util.zip.CRC32()
          crc.update(buf)
          require(storedCrc == crc.getValue.toInt,
            s"DV checksum mismatch in $p @ ${dv.offset.getOrElse(0)}")
          buf
        } finally in.close()
      case other =>
        throw new IllegalArgumentException(s"unknown DV storageType '$other'")
    }
    val rows = deserialize(data)
    require(rows.length.toLong == dv.cardinality,
      s"DV cardinality ${rows.length} != descriptor cardinality ${dv.cardinality}")
    rows
  }

  /** Write one DV file holding the given per-file deleted-row sets and
    * return each file's "u"-storage descriptor (insertion order
    * preserved). One physical file per commit — the packing delta-spark
    * uses — so a DELETE touching N files costs one object-store PUT. */
  def writeFile(
      fs: FileSystem,
      tableRoot: Path,
      rowSets: Seq[Array[Long]]): Seq[DeletionVectorDescriptor] = {
    val uuid = java.util.UUID.randomUUID()
    val target = filePath(tableRoot, DeletionVectorDescriptor("u", encodeUuid(uuid), None, 0, 0))
    val out = fs.create(target, false)
    val descriptors = ArrayBuffer.empty[DeletionVectorDescriptor]
    try {
      out.writeByte(1) // format version
      var offset = 1
      rowSets.foreach { rows =>
        val sorted = rows.distinct.sorted
        val data = serialize(sorted)
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        out.writeInt(data.length) // big-endian
        out.write(data)
        out.writeInt(crc.getValue.toInt)
        descriptors += DeletionVectorDescriptor(
          "u", encodeUuid(uuid), Some(offset), data.length, sorted.length.toLong)
        offset += 4 + data.length + 4
      }
    } finally out.close()
    descriptors.toSeq
  }
}
