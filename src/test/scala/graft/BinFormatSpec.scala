package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.BinFormat
import graft.sources.BinFormat.{F32, I32, I8, U8}

class BinFormatSpec extends SparkSpec {
  import spark.implicits._

  lazy val tmp = Files.createTempDirectory("graft-bin").toString

  test("fbin round-trip preserves values, ids are ordinals") {
    val pts = Tables.points(spark, sf0).where(col("id") < 50)
    val path = s"$tmp/t.fbin"
    BinFormat.write(pts, path, F32)
    assert(BinFormat.readHeader(path) === ((50, 64)))
    val back = BinFormat.read(spark, path, F32)
    assert(back.count() === 50)
    val diff = back.join(pts.withColumnRenamed("vec", "orig"), "id")
      .where(col("vec") =!= col("orig"))
    assert(diff.count() === 0)
  }

  test("u8bin/i8bin/ibin round-trips with integral values") {
    def fixture(lo: Int, span: Int) = (0L until 20L).map(i =>
      (i, Array.tabulate(8)(j => (lo + (i * 8 + j) % span).toFloat))).toDF("id", "vec")
    val cases = Seq(
      (U8, "u8bin", fixture(0, 250)), // full uint8 range incl >127
      (I8, "i8bin", fixture(-120, 240)), // negative int8 values
      (I32, "ibin", fixture(-100000, 200000))) // beyond byte range
    for ((elem, ext, df) <- cases) {
      val path = s"$tmp/t.$ext"
      BinFormat.write(df, path, elem)
      val back = BinFormat.read(spark, path, elem)
      assert(back.join(df.withColumnRenamed("vec", "o"), "id")
        .where(col("vec") =!= col("o")).count() === 0, s"mismatch for $ext")
    }
  }

  test("S6 fbin -> TSV export round-trip (fbin_to_tsv)") {
    val pts = Tables.points(spark, sf0).where(col("id") < 20)
    val fbin = s"$tmp/s6.fbin"
    val tsv = s"$tmp/s6.tsv"
    // the full reference pipeline: DataFrame -> write_fbin -> read_fbin -> TSV
    BinFormat.write(pts, fbin, F32)
    val back = BinFormat.read(spark, fbin, F32)
    BinFormat.writeTsv(back, tsv)
    val lines = scala.io.Source.fromFile(tsv).getLines().toVector
    assert(lines.size === 20)
    assert(lines.forall(_.split("\t").length === 64))
    // %.18e (np.savetxt default) is lossless for float32: the re-parsed
    // line must reproduce the original vector EXACTLY
    val v0 = lines.head.split("\t").map(_.toDouble)
    val orig = pts.where(col("id") === 0).head().getSeq[Float](1)
    assert(v0.zip(orig).forall { case (a, b) => a == b.toDouble })
    assert(lines.head.split("\t").head.matches("""-?\d\.\d{18}e[+-]\d+"""))
  }

  test("parallel part export + concat is byte-identical to the serial writer") {
    val pts = Tables.points(spark, sf0).where(col("id") < 100)
    for (elem <- Seq[BinFormat.ElemType](F32, BinFormat.U8)) {
      val serial = s"$tmp/serial_$elem.bin"
      val partsDir = s"$tmp/parts_$elem"
      val parallel = s"$tmp/parallel_$elem.bin"
      BinFormat.write(pts, serial, elem)
      BinFormat.writeParts(pts, partsDir, elem, numParts = 7)
      // multiple real parts, none with a header
      val partFiles = new java.io.File(partsDir).listFiles().filter(_.getName.startsWith("part-"))
      assert(partFiles.length > 1)
      BinFormat.concatParts(partsDir, parallel, dim = 64, elem)
      val a = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(serial))
      val b = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(parallel))
      assert(a.toSeq === b.toSeq, s"byte mismatch for $elem")
    }
  }

  test("writeIbin/readIbin round-trip ids above the float32 2^24 ceiling") {
    val big = (1 << 24) + 1 // rounds to 2^24 if it ever touches float32
    val gt = Seq(
      (0L, Seq(1, 2, big)),
      (1L, Seq(big + 1, 5, 6))).toDF("id", "ivec")
    val path = s"$tmp/gt.ibin"
    BinFormat.writeIbin(gt, path)
    val back = BinFormat.readIbin(spark, path).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toList))
    assert(back === Array((0L, List(1, 2, big)), (1L, List(big + 1, 5, 6))))
  }

  test("writeParts re-export clears stale parts; concatParts rejects missing dir") {
    val dir = s"$tmp/restale"
    val wide = Tables.points(spark, sf0).where(col("id") < 64)
    val narrow = Tables.points(spark, sf0).where(col("id") < 8)
    BinFormat.writeParts(wide, dir, F32, numParts = 8)
    BinFormat.writeParts(narrow, dir, F32, numParts = 2)
    val out = s"$tmp/restale.fbin"
    BinFormat.concatParts(dir, out, dim = 64, F32)
    // the artifact must contain ONLY the second export's 8 rows
    assert(BinFormat.readHeader(out)._1 === 8)
    intercept[IllegalArgumentException] {
      BinFormat.concatParts(s"$tmp/no_such_dir", s"$tmp/x.bin", 64, F32)
    }
  }

  test("ranged read honors the chunk offset contract (no read_ibin bug)") {
    val pts = Tables.points(spark, sf0).where(col("id") < 30)
    val path = s"$tmp/r.fbin"
    BinFormat.write(pts, path, F32)
    val chunk = BinFormat.read(spark, path, F32, startIdx = 10, count = 5)
    assert(chunk.count() === 5)
    assert(chunk.agg(min("id"), max("id")).head().toSeq === Seq(10L, 14L))
    val diff = chunk.join(pts.withColumnRenamed("vec", "orig"), "id")
      .where(col("vec") =!= col("orig"))
    assert(diff.count() === 0)
  }
}
