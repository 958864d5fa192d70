package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream, RandomAccessFile}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Codec for the reference's binary columnar-vector file family
  * (/root/reference/src/util/utils.py:72-193; layout in FIXTURES.md §A1):
  *
  *   bytes 0-3  int32 nvecs | bytes 4-7 int32 dim | row-major elements
  *
  * `.fbin` float32, `.u8bin` uint8, `.i8bin` int8, `.ibin` int32.
  *
  * The reader is a parallel fixed-width scan: the row range is split into
  * `numSlices` chunks and every task seeks directly to
  * `8 + start*dim*elemSize` (the reference's chunked-read offset contract,
  * utils.py:103-105 — we do NOT reproduce read_ibin's missing *4 offset
  * bug, utils.py:146-147). Ids are file ordinals, exactly like the
  * reference. On a cluster this parallelizes over any POSIX/NFS-visible
  * path; engine-internal data should live in Parquet (SURVEY §2 S5) — this
  * codec exists for interop with the reference's artifacts.
  *
  * Two writers: `write` streams partitions to a single local file via
  * `toLocalIterator` (an interop convenience), and the 100 TB path
  * `writeParts`/`concatParts` — every task writes its id-range as a
  * headerless part in parallel, then one sequential raw byte copy (an
  * object store's compose/multipart-complete call) assembles the
  * reference-format file. BinFormatSpec proves the two paths byte-equal.
  */
object BinFormat {

  sealed abstract class ElemType(val size: Int)
  case object F32 extends ElemType(4) // .fbin
  case object U8 extends ElemType(1) // .u8bin
  case object I8 extends ElemType(1) // .i8bin
  case object I32 extends ElemType(4) // .ibin

  /** (nvecs, dim) from the 8-byte little-endian header (utils.py:77-88). */
  def readHeader(path: String): (Int, Int) = {
    val f = new RandomAccessFile(path, "r")
    try {
      val b = new Array[Byte](8)
      f.readFully(b)
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      (bb.getInt, bb.getInt)
    } finally f.close()
  }

  /** Parallel ranged read: rows [startIdx, startIdx+count) as (id, vec),
    * vec always promoted to Array[Float] (SURVEY §1.2: every consumer does
    * float arithmetic; uint8 decoded with & 0xFF). */
  def read(
      spark: SparkSession,
      path: String,
      elem: ElemType,
      startIdx: Long = 0L,
      count: Long = -1L,
      numSlices: Int = 32): DataFrame = {
    val (nvecs, dim) = readHeader(path)
    val n = if (count < 0) nvecs - startIdx else math.min(count, nvecs - startIdx)
    val bounds = (0 until numSlices)
      .map(i => (startIdx + i * n / numSlices, startIdx + (i + 1) * n / numSlices))
      .filter { case (a, b) => b > a }
    val rdd = spark.sparkContext
      .parallelize(bounds, math.max(bounds.size, 1))
      .flatMap { case (lo, hi) =>
        val f = new RandomAccessFile(path, "r")
        try {
          val rowBytes = dim * elem.size
          f.seek(8L + lo * rowBytes)
          val buf = new Array[Byte](rowBytes)
          // drain fully inside try/finally (the iterator is lazy; a
          // truncated file must not leak the handle across task retries)
          (lo until hi).map { id =>
            f.readFully(buf)
            val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
            val vec = new Array[Float](dim)
            var i = 0
            while (i < dim) {
              vec(i) = elem match {
                case F32 => bb.getFloat(i * 4)
                case I32 => bb.getInt(i * 4).toFloat
                case U8 => (buf(i) & 0xff).toFloat
                case I8 => buf(i).toFloat
              }
              i += 1
            }
            Row(id, vec)
          }.toVector
        } finally f.close()
      }
    spark.createDataFrame(
      rdd,
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("vec", ArrayType(FloatType, false), false))))
  }

  /** Int32 ground-truth matrix reader (.ibin) as (id, ids: Array[Int]).
    *
    * Decodes ints DIRECTLY — never through the float32 vec path, which
    * silently rounds ids >= 2^24 (the billion-point corpora this format
    * exists for sit far above that ceiling). Same parallel range-read
    * shape as [[read]]. */
  def readIbin(spark: SparkSession, path: String, numSlices: Int = 32)
      : DataFrame = {
    val (nvecs, dim) = readHeader(path)
    val bounds = (0 until numSlices)
      .map(i => (nvecs.toLong * i / numSlices, nvecs.toLong * (i + 1) / numSlices))
      .filter { case (a, b) => b > a }
    val rdd = spark.sparkContext
      .parallelize(bounds, math.max(bounds.size, 1))
      .flatMap { case (lo, hi) =>
        val f = new RandomAccessFile(path, "r")
        try {
          val rb = dim * 4
          f.seek(8L + lo * rb)
          val buf = new Array[Byte](rb)
          (lo until hi).map { id =>
            f.readFully(buf)
            val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
            val ids = new Array[Int](dim)
            var i = 0
            while (i < dim) { ids(i) = bb.getInt(i * 4); i += 1 }
            Row(id, ids)
          }.toVector
        } finally f.close()
      }
    spark.createDataFrame(
      rdd,
      StructType(Seq(
        StructField("id", LongType, false),
        StructField("ids", ArrayType(IntegerType, false), false))))
  }

  /** Int32 ground-truth matrix writer (.ibin): input (id, ivec:
    * array<int>), rows ordered by id. The exact-integer twin of [[write]]
    * — ids never pass through float32. */
  def writeIbin(df: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    // min == max row width in ONE aggregate: a ragged ivec column would
    // otherwise silently write a payload that disagrees with the header
    val head = df.agg(min(size(col("ivec"))), max(size(col("ivec"))),
      count(lit(1))).head()
    val nvecs = head.getLong(2)
    require(nvecs > 0, s"writeIbin: empty input — a .ibin file needs >= 1 row ($path)")
    val (dimMin, dimMax) = (head.getInt(0), head.getInt(1))
    require(dimMin == dimMax,
      s"writeIbin: ragged ivec widths (min $dimMin, max $dimMax) — " +
        s"every row must have the same dimension ($path)")
    val dim = dimMax
    val os = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      def le32(v: Int): Unit = {
        os.write(v & 0xff); os.write((v >> 8) & 0xff)
        os.write((v >> 16) & 0xff); os.write((v >> 24) & 0xff)
      }
      le32(nvecs.toInt); le32(dim)
      val it = df.orderBy(col("id")).select(col("ivec")).toLocalIterator()
      while (it.hasNext) {
        val ids = it.next().getSeq[Int](0)
        val bb = ByteBuffer.allocate(ids.length * 4).order(ByteOrder.LITTLE_ENDIAN)
        ids.foreach(bb.putInt)
        os.write(bb.array())
      }
    } finally os.close()
  }

  /** TSV projection of (id, vec): one line per vector, elements
    * tab-separated — `fbin_to_tsv` (utils.py:179-182, np.savetxt with
    * delimiter="\t"). np.savetxt's default fmt is '%.18e', so elements are
    * emitted in the same full-precision scientific notation: the export is
    * LOSSLESS for float32 values and textually compatible with
    * reference-produced TSVs. Kept as a DataFrame of lines so it composes
    * with any Spark text sink; [[writeTsv]] is the single-file export twin
    * of [[write]]. */
  def tsvLines(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    df.orderBy(col("id"))
      .select(array_join(
        transform(col("vec"), v => format_string("%.18e", v.cast("double"))),
        "\t").as("line"))
  }

  /** Export (id, vec) ordered by id as a single local TSV file (S6). */
  def writeTsv(df: DataFrame, path: String): Unit = {
    val os = new java.io.PrintWriter(
      new BufferedOutputStream(new FileOutputStream(path)))
    try {
      val it = tsvLines(df).toLocalIterator()
      while (it.hasNext) os.println(it.next().getString(0))
    } finally os.close()
  }

  /** Row-major element bytes of one vector (little-endian, no header) —
    * the shared serializer of both writers. */
  private def rowBytes(vec: Seq[Float], elem: ElemType): Array[Byte] = {
    val bb = ByteBuffer.allocate(vec.length * elem.size).order(ByteOrder.LITTLE_ENDIAN)
    vec.foreach { v =>
      elem match {
        case F32 => bb.putFloat(v)
        case I32 => bb.putInt(v.toInt)
        case U8 => bb.put((v.toInt & 0xff).toByte)
        case I8 => bb.put(v.toByte)
      }
    }
    bb.array()
  }

  /** PARALLEL export, stage 1 (the 100 TB write path): range-partition by
    * id, sort within partitions, and let EVERY TASK write its id-range as
    * a headerless `part-NNNNN.bin` under `dir` — no driver bottleneck, no
    * global sort. File-ordinal order is preserved because range partitions
    * are globally ordered and parts concatenate in partition order. */
  def writeParts(df: DataFrame, dir: String, elem: ElemType, numParts: Int = 32): Unit = {
    import org.apache.spark.sql.functions.col
    val d = new java.io.File(dir)
    d.mkdirs()
    // clear prior parts: a re-export with fewer non-empty partitions must
    // not leave stale part files for concatParts to silently absorb
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".bin"))
      .foreach(_.delete())
    df.select(col("id"), col("vec"))
      .repartitionByRange(numParts, col("id"))
      .sortWithinPartitions(col("id"))
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val os = new BufferedOutputStream(
            new FileOutputStream(f"$dir/part-$pid%05d.bin"))
          try it.foreach(r => os.write(rowBytes(r.getSeq[Float](1), elem)))
          finally os.close()
        }
      }
  }

  /** PARALLEL export, stage 2: assemble header + parts into one
    * reference-format file with a single sequential RAW BYTE copy (no
    * decode; on an object store this is a server-side compose call —
    * only this local fallback touches the driver). nvecs is derived from
    * the part sizes, so the parts are the one source of truth. */
  def concatParts(dir: String, outPath: String, dim: Int, elem: ElemType): Unit = {
    val listed = Option(new java.io.File(dir).listFiles())
      .getOrElse(throw new IllegalArgumentException(
        s"concatParts: part directory does not exist: $dir"))
    val parts = listed
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".bin"))
      .sortBy(_.getName)
    require(parts.nonEmpty, s"concatParts: no part-*.bin files in $dir")
    val totalBytes = parts.map(_.length()).sum
    val rb = dim.toLong * elem.size
    require(totalBytes % rb == 0,
      s"part bytes $totalBytes not a multiple of row size $rb")
    val os = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(outPath)))
    try {
      def le32(v: Int): Unit = {
        os.write(v & 0xff); os.write((v >> 8) & 0xff)
        os.write((v >> 16) & 0xff); os.write((v >> 24) & 0xff)
      }
      le32((totalBytes / rb).toInt); le32(dim)
      val buf = new Array[Byte](1 << 20)
      parts.foreach { p =>
        val in = new java.io.BufferedInputStream(new java.io.FileInputStream(p))
        try {
          var n = in.read(buf)
          while (n > 0) { os.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
      }
    } finally os.close()
  }

  /** Write (id, vec) ordered by id to a single reference-format file. */
  def write(df: DataFrame, path: String, elem: ElemType): Unit = {
    import org.apache.spark.sql.functions._
    val dim = df.select(size(col("vec"))).head().getInt(0)
    val nvecs = df.count().toInt
    val os = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      def le32(v: Int): Unit = {
        os.write(v & 0xff); os.write((v >> 8) & 0xff)
        os.write((v >> 16) & 0xff); os.write((v >> 24) & 0xff)
      }
      le32(nvecs); le32(dim)
      val it = df.orderBy(col("id")).select(col("vec")).toLocalIterator()
      while (it.hasNext) os.write(rowBytes(it.next().getSeq[Float](0), elem))
    } finally os.close()
  }
}
