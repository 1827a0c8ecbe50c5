package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text/binary scan-rate expressions.
  *
  * Same (b)-custom-Expression step as PqEncode/CentroidRanks: these
  * replace higher-order-function formulations whose per-element lambda
  * frames never enter whole-stage codegen. Each expression is ONE call
  * per row from the generated code into a tight JVM loop — profiling
  * (BENCH round 8) showed the HOF forms costing ~3 s flat at sf0.1
  * with both bench runs identical, the signature of interpreted
  * evaluation rather than data volume.
  */
object TextExpressions {

  /** CSV of hashed-bucket counts for a token array — the native form of
    * `transform(sequence(0,n-1), i -> size(filter(th, h -> h = i)))`
    * over `th = transform(toks, t -> md5Long32(t) % n)`.
    */
  def hashBucketCountsCsv(toks: Column, nBuckets: Int): Column =
    ColumnBridge.column(HashBucketCountsCsv(ColumnBridge.expression(toks), nBuckets))

  /** Per-frame unsigned-byte sums over a binary column's complete
    * frames — the native form of the hex-substring + aggregate fold.
    */
  def frameByteSums(bin: Column, frameSize: Int): Column =
    ColumnBridge.column(FrameByteSums(ColumnBridge.expression(bin), frameSize))

  /** 60-bit SimHash of a token array — the native form of the
    * 60-lane vote fold (`Hashing.simHash60` / `SimHash.relational`).
    */
  def simHash60(toks: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(toks)))

  /** Space-joined n-gram shingles of a token array (all windows, in
    * order, duplicates kept) — the native form of the posexplode +
    * lead-window assembly. Callers dedup with Spark's codegen'd
    * `.distinct()`, which beats any per-row JVM set.
    */
  def shingles(toks: Column, n: Int): Column =
    ColumnBridge.column(ShingleWindows(ColumnBridge.expression(toks), n))

  /** 60-bit md5 hashes of all n-gram shingles (duplicates kept) — the
    * string-free form for consumers that only ever join on the hash.
    */
  def shingleHashes60(toks: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(toks), n, 15))

  /** 32-bit variant (first 8 md5 hex chars — `Hashing.md5Long32`): the
    * pre-hash MinHash signatures permute. Duplicates kept — a MIN
    * aggregate is unaffected by them, so signature builds skip the
    * dedup shuffle entirely.
    */
  def shingleHashes32(toks: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(toks), n, 8))

  /** Per-band min-md5 4-gram keys of a head string — the native form
    * of the banded edit-distance blocking key.
    */
  def editBandKeys(head: Column, nBands: Int): Column =
    ColumnBridge.column(EditBandKeys(ColumnBridge.expression(head), nBands))

  /** BPE token count of a word under a trained merge list (sequential
    * replay encoder — see graft.text.Bpe). Run on the DISTINCT word
    * table (vocab-bounded), never the token stream.
    */
  def bpeSegmentCount(word: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeSegmentCount(ColumnBridge.expression(word), merges))

}

/** Sequential-replay BPE encoder: start from the word's characters and
  * apply each trained merge IN RANK ORDER, each application merging
  * all non-overlapping occurrences left-to-right — exactly the
  * operation the trainer applied at that rank, so for any
  * training-corpus word the result IS the training-time segmentation
  * (and for OOV words, the standard apply-merges-in-order encoding).
  * Returns the segment COUNT (the token-budget consumers only need
  * counts; the segments themselves never materialize).
  */
case class BpeSegmentCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_segment_count expects string, got $t")
  }

  /** Row kernel — also the codegen body via addReferenceObj(this). */
  def compute(w: UTF8String): Long = {
    // code-point split — must mirror Bpe.train's symbol inventory
    var syms: Array[String] = graft.text.Bpe.codePointSyms(w.toString)
    var r = 0
    while (r < merges.length && syms.length > 1) {
      val (a, b) = merges(r)
      // apply only if the pair occurs — the common case skips the copy
      var hit = false
      var j = 0
      while (!hit && j + 1 < syms.length) {
        if (syms(j) == a && syms(j + 1) == b) hit = true
        j += 1
      }
      if (hit) syms = graft.text.Bpe.applyMerge(syms, a, b)
      r += 1
    }
    syms.length.toLong
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("bpeSegmentCount", this,
        classOf[BpeSegmentCount].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeSegmentCount =
    copy(child = newChild)
}

/** Bucket = first 8 md5 hex chars as a long (the exact value of
  * `conv(substring(md5(t),1,8),16,10)` = the digest's first 4 bytes as
  * an unsigned 32-bit int), mod `nBuckets`. Output is the
  * comma-joined per-bucket counts — bit-identical to the HOF form and
  * the DuckDB oracle. Null token elements propagate null (as
  * `transform` would).
  */
case class HashBucketCountsCsv(child: Expression, nBuckets: Int)
    extends UnaryExpression {

  require(nBuckets >= 1 && nBuckets <= 4096)

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hash_bucket_counts expects array<string>, got $t")
  }

  /** Row kernel — also the codegen body via addReferenceObj(this). */
  def compute(a: ArrayData): UTF8String = {
    val md = HashBucketCountsCsv.digest.get()
    val counts = new Array[Int](nBuckets)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      md.reset()
      val h = md.digest(a.getUTF8String(i).getBytes)
      val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      counts((v % nBuckets).toInt) += 1
      i += 1
    }
    val sb = new java.lang.StringBuilder(nBuckets * 3)
    var b = 0
    while (b < nBuckets) {
      if (b > 0) sb.append(',')
      sb.append(counts(b))
      b += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("hashBucketCsv", this,
        classOf[HashBucketCountsCsv].getName)
      s"""
         |${ev.value} = $ref.compute($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HashBucketCountsCsv =
    copy(child = newChild)
}

object HashBucketCountsCsv {
  /** One MessageDigest per executor thread — md5 instances are not
    * thread-safe and allocation per row would dominate short tokens.
    */
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** `array<long>` of per-frame sums of UNSIGNED byte values over the
  * input's complete `frameSize`-byte frames (numBytes / frameSize
  * frames; the tail remainder is dropped) — bit-identical to summing
  * `conv(substring(hex(bin), i*2+1, 2), 16, 10)` over each frame.
  */
case class FrameByteSums(child: Expression, frameSize: Int)
    extends UnaryExpression {

  require(frameSize >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_frame_byte_sums expects binary, got $t")
  }

  /** Row kernel — also the codegen body via addReferenceObj(this). */
  def compute(bytes: Array[Byte]): ArrayData = {
    val nFrames = bytes.length / frameSize
    val out = new Array[Long](nFrames)
    var f = 0
    while (f < nFrames) {
      var s = 0L
      var i = f * frameSize
      val end = i + frameSize
      while (i < end) {
        s += (bytes(i) & 0xff).toLong
        i += 1
      }
      out(f) = s
      f += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("frameByteSums", this,
        classOf[FrameByteSums].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): FrameByteSums =
    copy(child = newChild)
}

/** Native 60-bit SimHash over `array<string>` tokens: one md5 per
  * token (the first 15 hex chars as a 60-bit value — exactly
  * `Hashing.md5Long60`), 60 signed bit votes, bit j of the result set
  * iff vote_j >= 0. Bit-identical to the scalar `Hashing.simHash60`
  * fold and to `SimHash.relational`'s 60-SUM formulation (asserted in
  * TextExpressionsSpec), but ONE codegen'd call per document into a
  * tight JVM loop — no token explode, no shuffle, no per-element
  * lambda frames. An empty token array yields the all-votes-tie
  * signature (every vote 0 >= 0), matching the scalar fold; callers
  * that drop empty docs filter before calling. A null element
  * propagates null (as the `transform`-based forms would).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash60 expects array<string>, got $t")
  }

  /** Row kernel — also the codegen body via addReferenceObj(this). */
  def computeBoxed(a: ArrayData): java.lang.Long = {
    val md = SimHash60.digest.get()
    val votes = new Array[Int](60)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val h = md.digest(a.getUTF8String(i).getBytes)
      // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
      var v = 0L
      var k = 0
      while (k < 7) { v = (v << 8) | (h(k) & 0xffL); k += 1 }
      v = (v << 4) | ((h(7) & 0xffL) >>> 4)
      var j = 0
      while (j < 60) {
        votes(j) += (((v >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) >= 0) sim |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(sim)
  }

  override def nullSafeEval(input: Any): Any =
    computeBoxed(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("simHash60", this, classOf[SimHash60].getName)
      val boxed = ctx.freshName("boxed")
      s"""
         |java.lang.Long $boxed = $ref.computeBoxed($a);
         |${ev.isNull} = $boxed == null;
         |${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  /** One MessageDigest per executor thread — md5 instances are not
    * thread-safe and allocation per row would dominate short tokens.
    */
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** ALL word n-gram shingles of a token array, window order,
  * space-joined, duplicates kept — the native form of the posexplode +
  * lead()-window relational assembly. The trade, measured at sf0.1:
  * this costs ~0.2 s/query more CPU locally (object-array explode vs
  * the fully codegen'd window pipeline), but the window build pays a
  * CORPUS-SIZED shuffle of every token whose only purpose is lining
  * tokens up next to their neighbors — at the 100 TB target that
  * shuffle is hours of network/disk and dwarfs any constant-factor
  * CPU, so the row-local form is the plan a cluster wants. Dedup
  * stays OUTSIDE in Spark's `.distinct()` — its unsafe-row hash
  * aggregate is codegen'd and measured faster than any per-row JVM
  * LinkedHashSet (a first cut deduped inline and lost ~25%). Emits
  * STRINGS, not hashes: every consumer (MinHash signatures, exact
  * shingle-set joins, novelty election) keeps its exact string-keyed
  * semantics and hashes exactly as before, so no oracle changes and no
  * hash-collision divergence. A doc with fewer than `n` tokens yields
  * an empty array (it contributes no rows after explode, as the
  * relational form's lead-null filter did). Null elements propagate
  * null.
  */
case class ShingleWindows(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1 && n <= 16)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects array<string>, got $t")
  }

  /** Row kernel — also the codegen body via addReferenceObj(this).
    * One allocation per emitted shingle (exact-size byte buffer, tokens
    * written in place) — `UTF8String.concat` chains would pay n-1
    * intermediate copies per window.
    */
  def compute(a: ArrayData): ArrayData = {
    val cnt = a.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](cnt)
    var i = 0
    while (i < cnt) {
      if (a.isNullAt(i)) return null
      toks(i) = a.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](cnt - n + 1)
    i = 0
    while (i <= cnt - n) {
      var bytes = n - 1
      var j = 0
      while (j < n) { bytes += toks(i + j).numBytes; j += 1 }
      val buf = new Array[Byte](bytes)
      var off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET.toLong
      j = 0
      while (j < n) {
        if (j > 0) {
          org.apache.spark.unsafe.Platform.putByte(buf, off, ' '.toByte)
          off += 1
        }
        val t = toks(i + j)
        t.writeToMemory(buf, off)
        off += t.numBytes
        j += 1
      }
      out(i) = UTF8String.fromBytes(buf)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("shingleWindows", this,
        classOf[ShingleWindows].getName)
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleWindows =
    copy(child = newChild)
}


/** Hashes of ALL word n-gram shingles of a token array, window
  * order, duplicates kept — each value is exactly
  * `Hashing.md5Long60(concat_ws(" ", window))` (hexChars = 15) or
  * `Hashing.md5Long32(...)` (hexChars = 8), computed in one codegen'd
  * call per doc with a single reused byte buffer: no shingle strings
  * are ever materialized, no token shuffle, and downstream
  * joins/aggregates key on 8-byte longs instead of ~20-byte strings
  * (narrower exchanges — at 100 TB the shingle index shuffle halves).
  * Callers that need set semantics dedup with Spark's codegen'd
  * `.distinct()` on (id, hash); MIN-aggregating callers (MinHash
  * signatures) need no dedup at all. A doc with fewer than `n` tokens
  * yields an empty array; null elements propagate null.
  */
case class ShingleHashes(child: Expression, n: Int, hexChars: Int)
    extends UnaryExpression {

  require(n >= 1 && n <= 16)
  require(hexChars == 8 || hexChars == 15)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects array<string>, got $t")
  }

  /** Row kernel — also the codegen body via addReferenceObj(this). */
  def compute(a: ArrayData): ArrayData = {
    val cnt = a.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Long])
    val toks = new Array[UTF8String](cnt)
    var i = 0
    var maxWin = 0
    while (i < cnt) {
      if (a.isNullAt(i)) return null
      toks(i) = a.getUTF8String(i)
      i += 1
    }
    i = 0
    while (i <= cnt - n) {
      var bytes = n - 1
      var j = 0
      while (j < n) { bytes += toks(i + j).numBytes; j += 1 }
      if (bytes > maxWin) maxWin = bytes
      i += 1
    }
    val md = ShingleHashes.digest.get()
    val buf = new Array[Byte](maxWin)
    val out = new Array[Long](cnt - n + 1)
    i = 0
    while (i <= cnt - n) {
      var off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET.toLong
      var j = 0
      while (j < n) {
        if (j > 0) {
          org.apache.spark.unsafe.Platform.putByte(buf, off, ' '.toByte)
          off += 1
        }
        val t = toks(i + j)
        t.writeToMemory(buf, off)
        off += t.numBytes
        j += 1
      }
      md.update(buf, 0,
        (off - org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET).toInt)
      val h = md.digest()
      out(i) =
        if (hexChars == 8) {
          // first 8 hex chars = first 4 bytes as an unsigned 32-bit int
          ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
            ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
        } else {
          // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
          var v = 0L
          var k = 0
          while (k < 7) { v = (v << 8) | (h(k) & 0xffL); k += 1 }
          (v << 4) | ((h(7) & 0xffL) >>> 4)
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("shingleHashes", this,
        classOf[ShingleHashes].getName)
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($a);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** One MessageDigest per executor thread — md5 instances are not
    * thread-safe and allocation per row would dominate short tokens.
    */
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** MinHash band keys over a head string's char 4-grams:
  * element j (0-based) = MIN over window starts i of
  * `md5("b<j>|" || substr(head, i, 4))` as a lowercase-hex string —
  * exactly the value of the HOF formulation
  * `array_min(transform(sequence(1, greatest(len-3, 1)),
  * i => md5(concat("b<j>|", head.substr(i, 4)))))`, for every band in
  * one codegen'd call. Grams use Spark's own `substringSQL`
  * (code-point semantics), the min runs on raw digest bytes compared
  * UNSIGNED (lowercase hex order == unsigned byte order), and only
  * each band's winner is hex-formatted — the HOF form paid an
  * interpreted lambda frame, a 32-char string and a string compare
  * per (band, window). Null input propagates null.
  */
case class EditBandKeys(child: Expression, nBands: Int)
    extends UnaryExpression {

  require(nBands >= 1 && nBands <= 16)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_edit_band_keys expects string, got $t")
  }

  @transient private lazy val salts: Array[Array[Byte]] =
    Array.tabulate(nBands)(j => s"b$j|".getBytes("UTF-8"))

  /** Row kernel — also the codegen body via addReferenceObj(this). */
  def compute(head: UTF8String): ArrayData = {
    val md = EditBandKeys.digest.get()
    val w = math.max(head.numChars() - 3, 1)
    // hash each gram once; reuse across bands via per-band salted pass
    val out = new Array[Any](nBands)
    var j = 0
    while (j < nBands) {
      var best: Array[Byte] = null
      var i = 1
      while (i <= w) {
        md.update(salts(j))
        md.update(head.substringSQL(i, 4).getBytes)
        val h = md.digest()
        if (best == null || {
          var c = 0
          var k = 0
          while (c == 0 && k < 16) {
            c = (h(k) & 0xff) - (best(k) & 0xff); k += 1
          }
          c < 0
        }) best = h
        i += 1
      }
      val hex = new Array[Byte](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = EditBandKeys.hexDigits((best(k) & 0xf0) >> 4)
        hex(2 * k + 1) = EditBandKeys.hexDigits(best(k) & 0x0f)
        k += 1
      }
      out(j) = UTF8String.fromBytes(hex)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("editBandKeys", this,
        classOf[EditBandKeys].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): EditBandKeys =
    copy(child = newChild)
}

object EditBandKeys {
  private val hexDigits = "0123456789abcdef".getBytes("US-ASCII")
  /** One MessageDigest per executor thread — md5 instances are not
    * thread-safe and allocation per row would dominate short heads.
    */
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}
