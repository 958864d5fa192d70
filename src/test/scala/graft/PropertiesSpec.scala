package graft

import org.scalacheck.Gen

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Intervals

/** Property-based checks (SURVEY §5 industrialization: triangle inequality
  * of the distance expression, island extraction round-trips). Driven
  * through the engine's column functions on small literal data. */
class PropertiesSpec extends SparkSpec {

  /** scalatest+scalacheck bridge isn't in the offline cache; sample
    * generators directly. */
  def forAll[A](g: Gen[A], n: Int = 25)(f: A => Unit): Unit =
    (1 to n).foreach(_ => g.sample.foreach(f))
  def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 25).foreach(_ => for (a <- g1.sample; b <- g2.sample) f(a, b))
  def forAll[A, B, C](g1: Gen[A], g2: Gen[B], g3: Gen[C])(f: (A, B, C) => Unit): Unit =
    (1 to 25).foreach(_ => for (a <- g1.sample; b <- g2.sample; c <- g3.sample) f(a, b, c))
  import spark.implicits._

  val vecGen: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](8, Gen.chooseNum(-100f, 100f))

  test("l2Dist: symmetry, identity, triangle inequality") {
    forAll(vecGen, vecGen, vecGen) { (a, b, c) =>
      val df = Seq((a, b, c)).toDF("a", "b", "c")
      val r = df.select(
        l2Dist($"a", $"b"), l2Dist($"b", $"a"),
        l2Dist($"a", $"a"),
        l2Dist($"a", $"c"), l2Dist($"c", $"b")).head()
      val (ab, ba, aa, ac, cb) =
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(ab === ba)
      assert(aa === 0.0)
      assert(ab <= ac + cb + 1e-9)
    }
  }

  test("cosineSim bounded in [-1, 1] for nonzero vectors") {
    forAll(vecGen.suchThat(_.exists(_ != 0f)), vecGen.suchThat(_.exists(_ != 0f))) {
      (a, b) =>
        val r = Seq((a, b)).toDF("a", "b").select(cosineSim($"a", $"b")).head().getDouble(0)
        assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9)
    }
  }

  test("islands round-trip: expand(islands(S)) == S for any finite id set") {
    val setGen = Gen.containerOf[Set, Long](Gen.chooseNum(0L, 300L)).suchThat(_.nonEmpty)
    forAll(setGen, 15) { ids =>
      val df = ids.toSeq.toDF("x")
      val iv = Intervals.islands(df).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // intervals disjoint + non-adjacent
      val sorted = iv.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Array((_, e1), (b2, _)) => assert(b2 > e1 + 1)
        case _ =>
      }
      val expanded = sorted.flatMap { case (b, e) => b to e }.toSet
      assert(expanded === ids)
    }
  }

  test("boundary sweep matches brute-force on random half-open interval sets") {
    val ivGen = Gen.listOfN(8,
      for { b <- Gen.chooseNum(0L, 60L); len <- Gen.chooseNum(1L, 12L) } yield (b, b + len))
    forAll(ivGen.suchThat(_.nonEmpty), 10) { ivs =>
      val df = ivs.toDF("begin", "end")
      def covered(x: Long) = ivs.exists { case (b, e) => x >= b && x < e }
      def strictlyInside(x: Long) = ivs.exists { case (b, e) => b < x && e > x }
      val bounds = ivs.flatMap { case (b, e) => Seq(b, e) }.distinct.sorted
      // splitOverlaps = adjacent-boundary pieces whose lower bound is covered
      val pieces = bounds.zip(bounds.drop(1)).filter { case (lo, _) => covered(lo) }
      assert(Intervals.splitOverlaps(df).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet === pieces.toSet)
      // lenient merge = maximal runs of contiguous covered pieces
      def mergeRuns(keepJoin: Long => Boolean): Set[(Long, Long)] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        pieces.foreach { case (lo, hi) =>
          if (out.nonEmpty && out.last._2 == lo && keepJoin(lo))
            out(out.length - 1) = (out.last._1, hi)
          else out += ((lo, hi))
        }
        out.toSet
      }
      assert(Intervals.mergeOverlapsHO(df, strict = false).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet === mergeRuns(_ => true))
      // strict merge additionally breaks at boundaries nothing strictly spans
      assert(Intervals.mergeOverlapsHO(df, strict = true).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet === mergeRuns(strictlyInside))
    }
  }

  test("mergeNeighbors is idempotent and preserves coverage") {
    val ivGen = Gen.listOfN(6,
      for { b <- Gen.chooseNum(0L, 100L); len <- Gen.chooseNum(0L, 10L) } yield (b, b + len))
    forAll(ivGen.suchThat(_.nonEmpty), 15) { ivs =>
      val df = ivs.toDF("begin", "end")
      val once = Intervals.mergeNeighbors(df)
      val twice = Intervals.mergeNeighbors(once)
      val a = once.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val b = twice.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(a === b)
      val cover = ivs.flatMap { case (x, y) => x to y }.toSet
      val merged = a.flatMap { case (x, y) => x to y }.toSet
      assert(merged === cover)
    }
  }

  test("nearDupClusters equals brute-force connected components on random graphs") {
    val edgesGen = for {
      n <- Gen.chooseNum(2, 40) // nodes 0..n-1
      m <- Gen.chooseNum(1, 60)
      es <- Gen.listOfN(m,
        for { a <- Gen.chooseNum(0L, n - 1L); b <- Gen.chooseNum(0L, n - 1L) } yield (a, b))
    } yield es.filter { case (a, b) => a != b }
    forAll(edgesGen.suchThat(_.nonEmpty), 10) { es =>
      // brute-force union-find on the driver
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(x => x -> find(x)).toMap
      val got = graft.operators.Dedup
        .nearDupClusters(es.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected)
    }
  }

  test("bloom membership: packed bit test == position-set semantics; inserts always hit") {
    import graft.operators.Sketches
    val keysGen = Gen.listOfN(30, Gen.alphaNumStr.suchThat(_.nonEmpty)).map(_.distinct)
    forAll(keysGen.suchThat(_.size >= 2), 8) { keys =>
      val df = keys.toDF("key")
      val bloom = Sketches.bloomBits(df, "key", m = 512, k = 3)
      val positions = bloom.collect().map(_.getLong(0)).toSet
      val words = Sketches.packBloom(bloom, m = 512)
      // packed test must equal the position-set definition for arbitrary probes
      val probes = (keys.take(10) ++ Seq("missing-1", "missing-2", "zz")).distinct
      val got = probes.toDF("key")
        .select(col("key"), Sketches.bloomHitCol(words, col("key"), m = 512, k = 3).as("hit"))
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      val expected = probes.map { p =>
        val hit = (0 until 3).forall { j =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(s"bloom$j:$p".getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString.take(8)
          positions.contains(java.lang.Long.parseLong(hex, 16) % 512)
        }
        p -> hit
      }.toMap
      assert(got === expected)
      // no false negatives ever
      keys.foreach(k => assert(got.getOrElse(k, true)))
    }
  }

  test("wordpiece: consumed spans tile the word; tokens are vocab members or [UNK]") {
    import graft.functions.WordpieceTokens
    import org.apache.spark.sql.catalyst.expressions.Literal
    val pieceGen = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val vocabGen = Gen.chooseNum(2, 10).flatMap { n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf(true, false), pieceGen)).map(_.map {
        case (cont, p) => if (cont) s"##$p" else p
      }.distinct)
    }
    val wordGen = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    forAll(vocabGen, wordGen) { (vocab, word) =>
      val expr = WordpieceTokens(Literal(word), vocab)
      val arr = expr.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val toks = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      val vset = vocab.toSet
      // every token is a vocab member or [UNK]; first real token is a
      // starter, later real tokens are continuations
      toks.zipWithIndex.foreach { case (t, i) =>
        assert(t == "[UNK]" || vset.contains(t), s"$vocab $word -> $toks")
      }
      // consumed spans reassemble the word exactly
      val rebuilt = new StringBuilder
      toks.foreach {
        case "[UNK]" => rebuilt += word(rebuilt.length) // consumes 1 char
        case t if t.startsWith("##") =>
          val p = t.substring(2)
          assert(word.startsWith(p, rebuilt.length), s"$vocab $word -> $toks")
          rebuilt ++= p
        case t =>
          assert(rebuilt.isEmpty && word.startsWith(t), s"$vocab $word -> $toks")
          rebuilt ++= t
      }
      assert(rebuilt.toString === word, s"$vocab $word -> $toks")
    }
  }

  test("epochShuffle is a balanced permutation for any id set and shard count") {
    val idsGen = Gen.containerOfN[Set, Long](60, Gen.chooseNum(0L, 100000L))
    forAll(idsGen.suchThat(_.nonEmpty), Gen.chooseNum(1, 8)) { (ids, shards) =>
      val out = graft.operators.Corpus
        .epochShuffle(ids.toSeq.toDF("id"), seed = "p", nShards = shards)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      // a permutation: same ids out, every (shard, pos) slot distinct
      assert(out.map(_._1).sorted === ids.toSeq.sorted)
      assert(out.map(t => (t._2, t._3)).distinct.length === out.length)
      // round-robin deal: shard sizes differ by <= 1, positions contiguous
      val bySh = out.groupBy(_._2)
      assert(bySh.values.map(_.length).max - bySh.values.map(_.length).min <= 1)
      bySh.foreach { case (_, rows) =>
        assert(rows.map(_._3).sorted === (0L until rows.length).toVector)
      }
    }
  }

  test("safeSplit: same text same split, any (train, val) percents") {
    val txtGen = Gen.containerOfN[Vector, String](30,
      Gen.oneOf("a b", "c d e", "f", "g h i j", "k l"))
    forAll(txtGen, Gen.chooseNum(1, 70)) { (texts, tp) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val got = graft.operators.Corpus.safeSplit(docs, tp, 10)
        .select("id", "text", "split").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      // the split is a FUNCTION of the text alone
      got.groupBy(_._2).foreach { case (_, rows) =>
        assert(rows.map(_._3).distinct.length === 1)
      }
      assert(got.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    }
  }

  test("GIF LZW encode/decode round-trips arbitrary byte arrays") {
    val bytesGen = for {
      n <- Gen.chooseNum(0, 3000)
      mode <- Gen.oneOf("random", "runs", "cycle")
    } yield mode match {
      case "random" =>
        val r = new scala.util.Random(n); Array.fill(n)(r.nextInt(256).toByte)
      case "runs" => Array.tabulate(n)(i => (i / 37).toByte)
      case "cycle" => Array.tabulate(n)(i => (i % 5).toByte)
    }
    forAll(bytesGen, 15) { data =>
      val enc = graft.operators.Multimodal.lzwEncode(data, 8)
      val dec = graft.operators.Multimodal.lzwDecode(enc, 8, data.length)
      assert(dec.toSeq === data.toSeq, s"n=${data.length}")
    }
  }
}
