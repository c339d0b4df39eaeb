package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the BPE training loop (BpeOps) — r16 optimization
  * round. The tokenization lives as a sentinel-delimited string
  * (US·tok·US US·tok·US, US = \u001f, one byte in UTF-8 and never a
  * continuation byte, so byte scanning is char-safe). The previous
  * formulation paid, per training round, (a) a full regex split into a
  * token array + one concat allocation per adjacent pair + one exploded
  * row per pair feeding the hash aggregate, and (b) one full string
  * scan-and-copy per selected merge rule (up to `perRound` sequential
  * `replace` calls). These kernels do the same work in one byte pass per
  * round each:
  *
  *  - [[BpePairCounts]]: per-document adjacent-pair counts as a
  *    map<pair, count> (pair key = a·US·b, the exact group key the old
  *    explode produced), pre-aggregated WITHIN the document, so the
  *    exploded row count drops from total pairs to distinct pairs per
  *    doc and the downstream partial agg hashes far fewer rows.
  *    Σ map values per key across docs ≡ the old per-occurrence counts.
  *  - [[BpeTokenCount]]: the token count (= size of the old split
  *    array) without materializing the array.
  *  - [[BpeMultiReplace]]: one left-to-right pass applying a batch of
  *    merge rules. PRECONDITION (guaranteed by BpeOps.selectDisjoint,
  *    which is the only caller): the batch is symbol-disjoint — no two
  *    rules share a left symbol, right symbol, or merged symbol. Under
  *    that precondition the one-pass result is byte-identical to
  *    folding Spark's `replace` over the rules in order: matches of
  *    different rules can never overlap (an overlap would require a
  *    shared token), at most one rule matches at any byte position (a
  *    rule match is determined by the full US·a·US·US·b·US frame), and
  *    a replacement (US·ab·US) cannot create a new match for any rule
  *    in the batch (ab is a consumed symbol). BpeKernelSpec pins the
  *    equality on the real corpus and on adversarial batches.
  */
object BpeKernel {

  private final val S: Byte = 0x1f

  /** Strip the outer sentinels exactly like
    * substr(s, 2, greatest(length(s)-2, 0)): drop the first and last
    * CHAR. Both are single-byte US in every real input; fall back to
    * char-based substring otherwise so the semantics stay identical.
    */
  private def stripped(s: UTF8String): Array[Byte] = {
    val b = s.getBytes
    if (b.length >= 2 && b(0) == S && b(b.length - 1) == S)
      java.util.Arrays.copyOfRange(b, 1, b.length - 1)
    else s.substring(1, math.max(s.numChars() - 1, 1)).getBytes
  }

  /** Token segment boundaries of a stripped string: left-to-right
    * non-overlapping scan for the doubled sentinel, mirroring
    * split(t, quote(US+US), -1) — empty segments (leading, trailing,
    * consecutive separators) are kept, and the empty string yields one
    * empty token, exactly like Java regex split with limit -1.
    * Returns alternating (start, end) offsets.
    */
  private def segments(t: Array[Byte]): Array[Int] = {
    val out = new java.util.ArrayList[Integer](64)
    var start = 0
    var i = 0
    while (i + 1 < t.length) {
      if (t(i) == S && t(i + 1) == S) {
        out.add(start); out.add(i)
        i += 2
        start = i
      } else i += 1
    }
    out.add(start); out.add(t.length)
    val arr = new Array[Int](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    arr
  }

  /** Per-document adjacent-pair counts: map(a·US·b -> occurrences).
    * Documents with fewer than two tokens yield an empty map (the old
    * size(toks) >= 2 filter).
    */
  def pairCounts(s: UTF8String): MapData = {
    val t = stripped(s)
    val seg = segments(t)
    val ntok = seg.length / 2
    val m = new java.util.LinkedHashMap[UTF8String, java.lang.Long](64)
    var i = 0
    while (i + 1 < ntok) {
      val as = seg(2 * i); val ae = seg(2 * i + 1)
      val bs = seg(2 * i + 2); val be = seg(2 * i + 3)
      val key = new Array[Byte]((ae - as) + 1 + (be - bs))
      System.arraycopy(t, as, key, 0, ae - as)
      key(ae - as) = S
      System.arraycopy(t, bs, key, ae - as + 1, be - bs)
      val k = UTF8String.fromBytes(key)
      val prev = m.get(k)
      m.put(k, java.lang.Long.valueOf(if (prev == null) 1L else prev.longValue() + 1L))
      i += 1
    }
    val keys = new Array[Any](m.size())
    val vals = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey; vals(j) = e.getValue
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  /** Token count = segment count of the stripped string (== size of the
    * old split array, including its empty-string edge cases).
    */
  def tokenCount(s: UTF8String): Long = {
    val t = stripped(s)
    var n = 1L
    var i = 0
    while (i + 1 < t.length) {
      if (t(i) == S && t(i + 1) == S) { n += 1L; i += 2 } else i += 1
    }
    n
  }

  /** One-pass batched replace (see object doc for the disjointness
    * precondition and the sequential-equality argument). Patterns all
    * start with the sentinel byte, so non-sentinel positions copy
    * through without any pattern probe.
    */
  def multiReplace(s: UTF8String, froms: Array[Array[Byte]], tos: Array[Array[Byte]]): UTF8String = {
    val b = s.getBytes
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    while (i < b.length) {
      var matched = -1
      if (b(i) == S) {
        var k = 0
        while (matched < 0 && k < froms.length) {
          val f = froms(k)
          if (i + f.length <= b.length) {
            var j = 0
            var ok = true
            while (ok && j < f.length) { ok = b(i + j) == f(j); j += 1 }
            if (ok) matched = k
          }
          k += 1
        }
      }
      if (matched >= 0) {
        out.write(tos(matched), 0, tos(matched).length)
        i += froms(matched).length
      } else {
        out.write(b(i))
        i += 1
      }
    }
    UTF8String.fromBytes(out.toByteArray)
  }
}

/** map<pair, count> of adjacent token pairs of a sentinel string. */
case class BpePairCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "bpe_pair_counts"

  override def nullSafeEval(a: Any): Any =
    BpeKernel.pairCounts(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graftbridge.BpeKernel.pairCounts($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Token count of a sentinel string (== size of the split-token array). */
case class BpeTokenCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(a: Any): Any =
    BpeKernel.tokenCount(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graftbridge.BpeKernel.tokenCount($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass batched literal replace over a symbol-disjoint merge batch
  * (byte-identical to folding StringReplace over the batch in order —
  * see BpeKernel's doc). `froms`/`tos` are compile-time literals.
  */
case class BpeMultiReplace(child: Expression, froms: Seq[String], tos: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  require(froms.nonEmpty && froms.length == tos.length,
    "BpeMultiReplace needs a non-empty, aligned from/to batch")

  @transient private lazy val fromBytes: Array[Array[Byte]] =
    froms.map(_.getBytes("UTF-8")).toArray
  @transient private lazy val toBytes: Array[Array[Byte]] =
    tos.map(_.getBytes("UTF-8")).toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_multi_replace"

  override def nullSafeEval(a: Any): Any =
    BpeKernel.multiReplace(a.asInstanceOf[UTF8String], fromBytes, toBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fromsRef = ctx.addReferenceObj("bpeFroms", fromBytes, "byte[][]")
    val tosRef = ctx.addReferenceObj("bpeTos", toBytes, "byte[][]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftbridge.BpeKernel.multiReplace($c, $fromsRef, $tosRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
