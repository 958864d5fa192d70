package graft.functions

import org.apache.commons.codec.digest.DigestUtils

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature over a shingle array.
  *
  * Semantics — identical to the relational pipeline (explode → md5 →
  * group-min) and to the DuckDB oracle: for k in [0, numHashes),
  * sig[k] = min over shingles s of md5Hex(k + ":" + s), minimum taken
  * lexicographically on the hex string (ASCII, so UTF8String binary order
  * == String order). Empty shingle arrays yield null entries, matching
  * list_min([]) = NULL.
  *
  * Why an Expression: the relational form materializes |shingles| ×
  * numHashes rows through a shuffle just to take per-(doc,k) minima; this
  * computes the same 16 minima in one tight per-row loop — no explode, no
  * shuffle, codegen-friendly. At 100 TB the signature step becomes a pure
  * map stage.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(StringType, true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    MinHashSignature.compute(arr, numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = MinHashSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = ($cls).compute($a, $numHashes);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSignature {
  /** "<k>:" prefixes as UTF-8 bytes (md5 input is the UTF-8 of k:shingle). */
  private val prefixCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def prefixes(numHashes: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(numHashes, n =>
      Array.tabulate(n)(k => (k.toString + ":").getBytes("UTF-8")))

  /** Unsigned byte-array compare — equals hex-string lexicographic order. */
  private def ltUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(32)
    d.foreach { b =>
      sb.append(Character.forDigit((b >> 4) & 0xf, 16))
      sb.append(Character.forDigit(b & 0xf, 16))
    }
    sb.toString
  }

  /** Per-thread MessageDigest — getInstance per ROW would add an
    * allocation + provider lookup in the q25/q59 hot map stage (same
    * rationale as SimHash32.mdLocal). */
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared kernel for interpreted + codegen paths. One thread-cached
    * MessageDigest, raw-digest minima (hex order == unsigned byte order),
    * hex only at the end — identical results to md5Hex-per-pair, far fewer
    * allocations. */
  def compute(arr: ArrayData, numHashes: Int): GenericArrayData = {
    val md = mdLocal.get()
    val pfx = prefixes(numHashes)
    val n = arr.numElements()
    val mins = new Array[Array[Byte]](numHashes)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val sBytes = arr.getUTF8String(i).getBytes
        var k = 0
        while (k < numHashes) {
          md.reset()
          md.update(pfx(k))
          md.update(sBytes)
          val h = md.digest()
          if (mins(k) == null || ltUnsigned(h, mins(k))) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(
      mins.map(m => if (m == null) null else UTF8String.fromString(hex(m))))
  }
}

/** Single-pass 32-bit SimHash over a token array, as a '0'/'1' bit string.
  *
  * Semantics — byte-identical to the relational pipeline
  * ([[graft.operators.Dedup.simhash32Relational]]) and the DuckDB oracle:
  * token bit b is bit b of the token's md5 digest in MSB-first hex order
  * (hex digit floor(b/4), bit 3-b%4 of that digit == digest byte b/8, bit
  * 7-b%8); document bit b is '1' iff the sum of ±1 contributions over ALL
  * tokens (duplicates counted) is > 0 (ties -> '0'). Null tokens contribute
  * nothing (sum ignores nulls).
  *
  * Why an Expression: the relational form explodes every token into 32
  * (id, b) rows and pays two shuffled aggregations — a 32×|tokens| shuffle
  * for a per-document 32-bit fingerprint. This computes the same 32
  * accumulators in one tight per-row loop: a pure map stage at 100 TB.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash32"
  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = SimHash32.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = ($cls).compute($a);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash32 {
  /** Per-thread MessageDigest — getInstance per ROW would add an
    * allocation + provider lookup in a hot map stage. */
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared kernel for interpreted + codegen paths. One thread-cached
    * MessageDigest reset per token; 32 int accumulators; bits read
    * straight from the raw digest (MSB-first == the hex-digit arithmetic
    * of the relational form). */
  def compute(arr: ArrayData): UTF8String = {
    val md = mdLocal.get()
    val acc = new Array[Int](32)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        val h = md.digest()
        var b = 0
        while (b < 32) {
          val bit = ((h(b >>> 3) & 0xff) >>> (7 - (b & 7))) & 1
          acc(b) += 2 * bit - 1
          b += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](32)
    var b = 0
    while (b < 32) {
      out(b) = if (acc(b) > 0) '1' else '0'
      b += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Greedy longest-match WordPiece tokenization of ONE word — the subword
  * step of an LLM tokenizer, as a native expression.
  *
  * Semantics (mirrored verbatim by the recursive-CTE oracle): at position
  * 0 the candidates are the non-`##` vocab entries that prefix the word;
  * at later positions the `##`-continuation entries whose suffix matches.
  * The winner is the LONGEST consumed span, ties broken by the
  * lexicographically smallest vocab string (`ORDER BY len DESC, v`). No
  * candidate: emit `[UNK]` and advance one character (the char-skip
  * variant — deterministic and total, no whole-word UNK collapse).
  *
  * Why an Expression: tokenization is an unbounded per-row loop — not
  * expressible as Column combinators, and a Scala UDF would box every
  * row. Like [[SimHash32]], the kernel is shared between the interpreted
  * and codegen paths; the scale contract is that callers tokenize the
  * corpus's DISTINCT words (vocabulary-sized input) and equi-join back,
  * so the loop never runs per corpus token.
  */
case class WordpieceTokens(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def prettyName: String = "wordpiece"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string")
    }

  /** (piece-to-match, emit-token, consumed) sorted by (consumed desc,
    * token asc) — the greedy scan tries in this order and takes the first
    * hit. Starters and continuations kept separate. */
  @transient private lazy val starters: Array[(String, Int)] =
    vocab.filterNot(_.startsWith("##")).filter(_.nonEmpty).distinct
      .map(v => (v, v.length)).sortBy { case (v, l) => (-l, v) }.toArray
  @transient private lazy val continuations: Array[(String, String, Int)] =
    vocab.filter(v => v.startsWith("##") && v.length > 2).distinct
      .map(v => (v.substring(2), v, v.length - 2))
      .sortBy { case (_, v, l) => (-l, v) }.toArray

  def tokenize(word: UTF8String): ArrayData = {
    val w = word.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var pos = 0
    while (pos < w.length) {
      var emitted: String = null
      var consumed = 1
      if (pos == 0) {
        val n = starters.length
        var i = 0
        while (i < n && emitted == null) {
          val (v, l) = starters(i)
          if (w.startsWith(v)) { emitted = v; consumed = l }
          i += 1
        }
      } else {
        val n = continuations.length
        var i = 0
        while (i < n && emitted == null) {
          val (suf, v, l) = continuations(i)
          if (w.startsWith(suf, pos)) { emitted = v; consumed = l }
          i += 1
        }
      }
      // [UNK] advances one CODEPOINT (not one UTF-16 unit): the oracle's
      // substr/len are codepoint-based, and splitting a surrogate pair
      // would diverge from it on any supplementary character
      if (emitted == null) consumed = Character.charCount(w.codePointAt(pos))
      out += UTF8String.fromString(if (emitted == null) "[UNK]" else emitted)
      pos += consumed
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def nullSafeEval(input: Any): Any =
    tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordpiece", this, classOf[WordpieceTokens].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.tokenize($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Length (in CHARACTERS) of the longest common prefix of two strings —
  * the kernel of SuffixArray.duplicateSpans' fast path: one codegen'd
  * byte loop per candidate pair replaces log(n) rank-table join rounds
  * for every pair whose LCP fits the probe window. Steps CHARACTER-wise
  * (UTF-8 lead-byte widths), so a multi-byte character either matches
  * whole or not at all — identical to the oracle's codepoint substr
  * comparison; pure ASCII degenerates to the byte loop. */
case class CommonPrefixLen(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "common_prefix_len"
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two string arguments")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String]
    val b = r.asInstanceOf[UTF8String]
    val la = a.numBytes(); val lb = b.numBytes()
    var i = 0; var out = 0L; var break = false
    while (!break && i < la && i < lb) {
      val x = a.getByte(i)
      val w = if (x >= 0) 1
        else if ((x & 0xE0) == 0xC0) 2
        else if ((x & 0xF0) == 0xE0) 3
        else 4
      if (i + w > la || i + w > lb) break = true
      else {
        var j = 0
        while (j < w && !break) {
          if (a.getByte(i + j) != b.getByte(i + j)) break = true
          j += 1
        }
        if (!break) { i += w; out += 1 }
      }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val la = ctx.freshName("la")
      val lb = ctx.freshName("lb")
      val x = ctx.freshName("x")
      val w = ctx.freshName("w")
      val j = ctx.freshName("j")
      val loop = ctx.freshName("prefixLoop")
      s"""
         |int $la = $a.numBytes();
         |int $lb = $b.numBytes();
         |int $i = 0;
         |${ev.value} = 0L;
         |$loop:
         |while ($i < $la && $i < $lb) {
         |  byte $x = $a.getByte($i);
         |  int $w = ($x >= 0) ? 1 : ((($x & 0xE0) == 0xC0) ? 2 : ((($x & 0xF0) == 0xE0) ? 3 : 4));
         |  if ($i + $w > $la || $i + $w > $lb) break $loop;
         |  for (int $j = 0; $j < $w; $j++)
         |    if ($a.getByte($i + $j) != $b.getByte($i + $j)) break $loop;
         |  $i += $w;
         |  ${ev.value} += 1L;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** Big-endian pack of the `m` characters of a pure-ASCII string starting
  * at (0-based) character `off` into one non-negative long, `bits` bits
  * per character; positions past the string's end contribute 0 — which
  * sorts strictly below every real character, so packed-value order
  * equals truncated-suffix order and packed-value EQUALITY equals
  * truncated-suffix equality (given no real character is chr(0)).
  * Caller contract (SuffixArray.core verifies both before packing): the
  * string is pure ASCII (byte = character, so indexing is O(1)) and
  * m * bits <= 63 (the value stays non-negative). */
case class PackChars(str: Expression, off: Expression, m: Int, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = str
  override def right: Expression = off
  override def prettyName: String = "pack_chars"
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (str.dataType, off.dataType) match {
      case (StringType, IntegerType) if m >= 1 && bits >= 1 && m * bits <= 63 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (string, int) and 1 <= m*bits <= 63")
    }

  override protected def nullSafeEval(s: Any, o: Any): Any = {
    val u = s.asInstanceOf[UTF8String]
    val nb = u.numBytes()
    val o0 = o.asInstanceOf[Int]
    var acc = 0L
    var j = 0
    while (j < m) {
      val i = o0 + j
      acc = (acc << bits) | (if (i < nb) (u.getByte(i) & 0xffL) else 0L)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, o) => {
      val nb = ctx.freshName("nb")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      s"""
         |int $nb = $s.numBytes();
         |${ev.value} = 0L;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $i = $o + $j;
         |  ${ev.value} = (${ev.value} << $bits) |
         |    ($i < $nb ? ((long) $s.getByte($i)) & 0xffL : 0L);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(str = l, off = r)
}

object TextExpressions {
  /** MinHash signature column: array of numHashes hex-string minima. */
  def minhashSig(shingles: Column, numHashes: Int = 16): Column =
    column(MinHashSignature(expression(shingles), numHashes))

  /** Character count of the longest common prefix (codegen'd byte loop). */
  def commonPrefixLen(a: Column, b: Column): Column =
    column(CommonPrefixLen(expression(a), expression(b)))

  /** Packed ASCII window: m chars from (0-based) off, bits bits each. */
  def packChars(str: Column, off: Column, m: Int, bits: Int): Column =
    column(PackChars(expression(str), expression(off), m, bits))

  /** 32-bit SimHash bit string over a token array — single map-stage pass. */
  def simhash32(tokens: Column): Column =
    column(SimHash32(expression(tokens)))

  /** Greedy longest-match WordPiece of one word against a literal vocab. */
  def wordpiece(word: Column, vocab: Seq[String]): Column =
    column(WordpieceTokens(expression(word), vocab))
}
