package graft.lake

import java.util.Base64

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal
import scala.util.hashing.MurmurHash3

/** Per-file key bloom filter, stored inline in the manifest entry
  * ([[DataFileMeta.keyBloom]]), so a point lookup can skip data files that
  * cannot contain the key WITHOUT opening them — at query time the check is
  * a driver-side bit probe over metadata already in memory, zero file IO.
  *
  * Built at stage time from the parquet DICTIONARY pages of the key column
  * (the reference pattern is Iceberg's puffin blobs; here the manifest is
  * the natural home because commits already rewrite O(added files) manifest
  * bytes). A dictionary page holds EXACTLY the distinct values of its row
  * group, so lifting it costs one page read per file — no data pages are
  * touched. Files whose key column fell back to plain encoding (dictionary
  * overflow, i.e. very high per-file key cardinality) get NO bloom and are
  * never pruned; that is the safe degradation, and such files are the ones
  * most likely to contain any given key anyway.
  *
  * Why this matters at 100 TB: hash-bucket pruning cuts a point lookup to
  * 1/numBuckets of the table, but within a bucket the footer min/max of a
  * HASH-spread string key spans the whole alphabet and prunes nothing. The
  * bloom is the only per-file statistic that bites inside a bucket: a
  * lookup touches the handful of delta/L0 files that actually carry the
  * key's rows instead of every file in the bucket.
  *
  * Layout (base64): [k: 1 byte][mBits: 4 bytes big-endian][bit array].
  * Double hashing (Kirsch–Mitzenmacher) over two murmur3 seeds. False
  * positives only cost an unpruned file; false negatives are impossible
  * (every distinct value of every row group is inserted).
  */
object KeyBloom {
  /** Bits per entry (~1% fpp at k=7). */
  private val BitsPerEntry = 10
  /** Hard cap on bloom size: 32 KiB of bits per file. */
  private val MaxBits = 1 << 18
  /** Above this many distinct keys even the max-size bloom falls under
    * [[BitsPerEntry]] bits/entry and fpp degrades past useful selectivity —
    * store nothing rather than a filter that prunes (almost) nothing.
    * Tied to MaxBits/BitsPerEntry (~26k) so every STORED bloom keeps
    * ≥10 bits/entry (≈1% fpp); the old 65536 cap admitted blooms at
    * ~4 bits/entry (~26% fpp). */
  val MaxEntries: Int = MaxBits / BitsPerEntry
  private val K = 7

  /** Build from the distinct values; None when `values` overflows
    * [[MaxEntries]] (caller stores null → file never pruned). */
  def build(values: Iterable[String]): Option[String] = {
    val vs = values
    val n = vs.size
    if (n == 0 || n > MaxEntries) return None
    val mBits = math.min(MaxBits,
      math.max(256, Integer.highestOneBit(n * BitsPerEntry - 1) << 1))
    val bits = new Array[Byte](mBits / 8)
    vs.foreach { v =>
      val (h1, h2) = hashes(v)
      var i = 0
      while (i < K) {
        val b = bitOf(h1, h2, i, mBits)
        bits(b >>> 3) = (bits(b >>> 3) | (1 << (b & 7))).toByte
        i += 1
      }
    }
    val out = new Array[Byte](5 + bits.length)
    out(0) = K.toByte
    out(1) = (mBits >>> 24).toByte; out(2) = (mBits >>> 16).toByte
    out(3) = (mBits >>> 8).toByte; out(4) = mBits.toByte
    System.arraycopy(bits, 0, out, 5, bits.length)
    Some(Base64.getEncoder.encodeToString(out))
  }

  /** Probe. True on any malformed blob (never prune on bad metadata). */
  def mightContain(blob: String, value: String): Boolean =
    try {
      val raw = Base64.getDecoder.decode(blob)
      val k = raw(0).toInt
      val mBits = ((raw(1) & 0xff) << 24) | ((raw(2) & 0xff) << 16) |
        ((raw(3) & 0xff) << 8) | (raw(4) & 0xff)
      if (k <= 0 || mBits <= 0 || raw.length < 5 + mBits / 8) return true
      val (h1, h2) = hashes(value)
      var i = 0
      while (i < k) {
        val b = bitOf(h1, h2, i, mBits)
        if ((raw(5 + (b >>> 3)) & (1 << (b & 7))) == 0) return false
        i += 1
      }
      true
    } catch { case NonFatal(_) => true }

  /** The two base hashes, computed ONCE per value (Kirsch–Mitzenmacher:
    * index i derives from h1 + i·h2, not from i fresh string hashes). */
  private def hashes(v: String): (Int, Int) =
    (MurmurHash3.stringHash(v, 0x9747b28c),
      MurmurHash3.stringHash(v, 0x1b873593) | 1)

  private def bitOf(h1: Int, h2: Int, i: Int, mBits: Int): Int =
    // mBits is a power of two ≥ 256 — the non-negative double-hash value
    // mods uniformly
    (((h1.toLong & 0xffffffffL) + i.toLong * (h2.toLong & 0xffffffffL)) % mBits).toInt

  /** Lift the distinct values of string column `column` from a parquet
    * file's dictionary pages — one footer + one dictionary page read per
    * row group, NO data pages. None when any row group has non-dictionary
    * data pages (distinct set would be incomplete → no bloom), the column
    * is absent, or anything at all goes wrong (stats are advisory). */
  def liftDictionary(
      reader: org.apache.parquet.hadoop.ParquetFileReader,
      column: String): Option[Set[String]] =
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      val desc = schema.getColumns.asScala
        .find(d => d.getPath.length == 1 && d.getPath()(0) == column)
        .getOrElse(return None)
      val out = Set.newBuilder[String]
      var n = 0
      for (block <- reader.getFooter.getBlocks.asScala) {
        val chunk = block.getColumns.asScala
          .find(_.getPath.toDotString == column).getOrElse(return None)
        val es = chunk.getEncodingStats
        // EncodingStats absent (old writer) or any plain-encoded data page
        // → the dictionary does not cover every row; bail
        if (es == null || es.hasNonDictionaryEncodedPages) return None
        // getNextDictionaryReader + skipNextRowGroup walk row groups
        // WITHOUT touching data pages (the public per-row-group dictionary
        // access pattern; getDictionaryReader's return type is pkg-private)
        val dictPage = reader.getNextDictionaryReader.readDictionaryPage(desc)
        if (dictPage == null) return None
        reader.skipNextRowGroup()
        val dict = dictPage.getEncoding.initDictionary(desc, dictPage)
        var i = 0
        while (i <= dict.getMaxId) {
          out += dict.decodeToBinary(i).toStringUsingUTF8
          n += 1
          if (n > MaxEntries * 4) return None // runaway guard
          i += 1
        }
      }
      Some(out.result())
    } catch { case NonFatal(_) => None }
}
