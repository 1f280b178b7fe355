package graft.functions

import graft.Hashing
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot hashing kernels.
  *
  * The first implementation used `transform`/`aggregate` higher-order
  * functions; those evaluate their lambdas interpreted (per element, per
  * row), which made character-level hashing the bench bottleneck (e.g.
  * 26 s for fingerprints at sf0.1). These expressions generate tight Java
  * loops via `doGenCode`, so they stay inside whole-stage codegen and cost
  * nanoseconds per character — and, equally important, they turn the
  * minhash/simhash pipelines from explode + crossJoin + two shuffled
  * aggregations into a single map-side projection.
  *
  * Semantics are bit-identical to the DuckDB oracle SQL (left fold of
  * `acc*31 + charCode (mod m)`; ASCII inputs so charAt == code point).
  */

/** Rolling hash of a string's characters, mod `m`. */
case class RollHashExpr(child: Expression, m: Long) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def prettyName: String = "graft_roll_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s   = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i   = 0
    while (i < s.length) { acc = (acc * 31 + s.charAt(i)) % m; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s   = ctx.freshName("s")
      val i   = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        java.lang.String $s = $c.toString();
        long $acc = 0L;
        for (int $i = 0; $i < $s.length(); $i++) {
          $acc = ($acc * 31 + $s.charAt($i)) % ${m}L;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): RollHashExpr =
    copy(child = newChild)
}

/** Minimum rolling hash over all `k`-char grams of a string (winnowing-style
  * fingerprint); null when the string is shorter than `k`. */
case class MinGramHashExpr(child: Expression, k: Int, m: Long) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def prettyName: String = "graft_min_gram_hash"
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val s = v.asInstanceOf[UTF8String].toString
    if (s.length < k) return null
    var best = Long.MaxValue
    var i    = 0
    while (i <= s.length - k) {
      var acc = 0L
      var j   = 0
      while (j < k) { acc = (acc * 31 + s.charAt(i + j)) % m; j += 1 }
      if (acc < best) best = acc
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val s        = ctx.freshName("s")
    val best     = ctx.freshName("best")
    val acc      = ctx.freshName("acc")
    val i        = ctx.freshName("i")
    val j        = ctx.freshName("j")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${childGen.isNull}) {
        java.lang.String $s = ${childGen.value}.toString();
        if ($s.length() >= $k) {
          long $best = Long.MAX_VALUE;
          for (int $i = 0; $i <= $s.length() - $k; $i++) {
            long $acc = 0L;
            for (int $j = 0; $j < $k; $j++) {
              $acc = ($acc * 31 + $s.charAt($i + $j)) % ${m}L;
            }
            if ($acc < $best) $best = $acc;
          }
          ${ev.isNull} = false;
          ${ev.value} = $best;
        }
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinGramHashExpr =
    copy(child = newChild)
}

/** MinHash signature of a set of (already-hashed) shingles: for each
  * parameter row j, min over the set of `(a_j*h + b_j) mod m`. Replaces an
  * explode + crossJoin(params) + shuffled min-aggregate with one map-side
  * loop over the array. */
case class MinHashSigExpr(child: Expression, as: Array[Long], bs: Array[Long], m: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Long](as.length)
    var j   = 0
    while (j < as.length) {
      var best = Long.MaxValue
      var i    = 0
      while (i < arr.numElements()) {
        val v = (as(j) * arr.getLong(i) + bs(j)) % m
        if (v < best) best = v
        i += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val out  = ctx.freshName("out")
      val best = ctx.freshName("best")
      val i    = ctx.freshName("i")
      val j    = ctx.freshName("j")
      val v    = ctx.freshName("v")
      s"""
        long[] $out = new long[$asRef.length];
        for (int $j = 0; $j < $asRef.length; $j++) {
          long $best = Long.MAX_VALUE;
          for (int $i = 0; $i < $c.numElements(); $i++) {
            long $v = ($asRef[$j] * $c.getLong($i) + $bsRef[$j]) % ${m}L;
            if ($v < $best) $best = $v;
          }
          $out[$j] = $best;
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** 32-bit SimHash of a word array: rolling-hash each word mod 2^32, count
  * +1/-1 per bit over the word multiset, emit the sign bits as a long.
  * Replaces explode + crossJoin(bits) + two shuffled aggregations. */
case class SimHash32Expr(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def prettyName: String = "graft_simhash32"

  override protected def nullSafeEval(input: Any): Any = {
    val arr    = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](32)
    var i      = 0
    while (i < arr.numElements()) {
      val s   = arr.getUTF8String(i).toString
      var acc = 0L
      var c   = 0
      while (c < s.length) { acc = (acc * 31 + s.charAt(c)) % 4294967296L; c += 1 }
      var b = 0
      while (b < 32) {
        if (((acc >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b   = 0
    while (b < 32) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counts = ctx.freshName("counts")
      val i      = ctx.freshName("i")
      val s      = ctx.freshName("s")
      val acc    = ctx.freshName("acc")
      val ci     = ctx.freshName("ci")
      val b      = ctx.freshName("b")
      val sig    = ctx.freshName("sig")
      s"""
        int[] $counts = new int[32];
        for (int $i = 0; $i < $c.numElements(); $i++) {
          java.lang.String $s = $c.getUTF8String($i).toString();
          long $acc = 0L;
          for (int $ci = 0; $ci < $s.length(); $ci++) {
            $acc = ($acc * 31 + $s.charAt($ci)) % 4294967296L;
          }
          for (int $b = 0; $b < 32; $b++) {
            if ((($acc >> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
          }
        }
        long $sig = 0L;
        for (int $b = 0; $b < 32; $b++) {
          if ($counts[$b] > 0) $sig |= (1L << $b);
        }
        ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash32Expr =
    copy(child = newChild)
}

/** Distinct word n-gram shingles of a space-separated text, as one codegen
  * loop (replacing interpreted `transform(sequence(...), concat_ws(...))`,
  * which dominated the dedup bench). Split semantics match Spark's
  * `split(text, ' ')` / DuckDB's `string_split`: empty tokens are kept.
  * Returns shingles in first-occurrence order (list_distinct semantics). */
case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val words = WordShinglesExpr.splitKeepEmpty(input.asInstanceOf[UTF8String].toString)
    val out   = new java.util.LinkedHashSet[UTF8String]()
    var i     = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder(words(i))
      var j  = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  // eval does string building + set dedup — codegen would be the same calls,
  // so route the generated code through the boxed eval path
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingler", this, classOf[WordShinglesExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.shingle($c);")
  }

  /** Entry point for generated code. */
  def shingle(s: UTF8String): ArrayData =
    nullSafeEval(s).asInstanceOf[ArrayData]

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}

object WordShinglesExpr {
  /** Split on single spaces, keeping empty tokens (Spark/DuckDB parity). */
  def splitKeepEmpty(s: String): Array[String] = {
    val out  = scala.collection.mutable.ArrayBuffer.empty[String]
    var from = 0
    var i    = s.indexOf(' ')
    while (i >= 0) {
      out += s.substring(from, i)
      from = i + 1
      i = s.indexOf(' ', from)
    }
    out += s.substring(from)
    out.toArray
  }
}

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS scheme):
  * rolling k-gram hashes, then the minimum of every w-hash sliding window,
  * deduplicated and sorted. Guarantees any match of length >= k+w-1 shares
  * a fingerprint while keeping only ~2/(w+1) of the gram hashes — the
  * density/recall trade a substring-level dedup pipeline wants. One tight
  * generated loop per row (gram hashing is the hot part); output is a
  * sorted long array so downstream explode + equi-join is deterministic. */
case class WinnowExpr(child: Expression, k: Int, w: Int, m: Long)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def prettyName: String = "graft_winnow"
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val s = v.asInstanceOf[UTF8String].toString
    if (s.length < k) return null
    val ng    = s.length - k + 1
    val grams = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      var acc = 0L
      var j   = 0
      while (j < k) { acc = (acc * 31 + s.charAt(i + j)) % m; j += 1 }
      grams(i) = acc
      i += 1
    }
    val nw  = math.max(1, ng - w + 1)
    val fps = new Array[Long](nw)
    var jw = 0
    while (jw < nw) {
      var best = Long.MaxValue
      var x    = jw
      val end  = math.min(jw + w, ng)
      while (x < end) { if (grams(x) < best) best = grams(x); x += 1 }
      fps(jw) = best
      jw += 1
    }
    java.util.Arrays.sort(fps)
    var u = 0
    var x = 0
    while (x < nw) { if (x == 0 || fps(x) != fps(x - 1)) { fps(u) = fps(x); u += 1 }; x += 1 }
    new GenericArrayData(java.util.Arrays.copyOf(fps, u))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cg   = child.genCode(ctx)
    val s    = ctx.freshName("s")
    val ng   = ctx.freshName("ng")
    val gr   = ctx.freshName("grams")
    val acc  = ctx.freshName("acc")
    val i    = ctx.freshName("i")
    val j    = ctx.freshName("j")
    val nw   = ctx.freshName("nw")
    val fps  = ctx.freshName("fps")
    val jw   = ctx.freshName("jw")
    val best = ctx.freshName("best")
    val x    = ctx.freshName("x")
    val end  = ctx.freshName("end")
    val u    = ctx.freshName("u")
    ev.copy(code = code"""
      ${cg.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${cg.isNull}) {
        java.lang.String $s = ${cg.value}.toString();
        if ($s.length() >= $k) {
          int $ng = $s.length() - $k + 1;
          long[] $gr = new long[$ng];
          for (int $i = 0; $i < $ng; $i++) {
            long $acc = 0L;
            for (int $j = 0; $j < $k; $j++) {
              $acc = ($acc * 31 + $s.charAt($i + $j)) % ${m}L;
            }
            $gr[$i] = $acc;
          }
          int $nw = java.lang.Math.max(1, $ng - $w + 1);
          long[] $fps = new long[$nw];
          for (int $jw = 0; $jw < $nw; $jw++) {
            long $best = Long.MAX_VALUE;
            int $end = java.lang.Math.min($jw + $w, $ng);
            for (int $x = $jw; $x < $end; $x++) {
              if ($gr[$x] < $best) $best = $gr[$x];
            }
            $fps[$jw] = $best;
          }
          java.util.Arrays.sort($fps);
          int $u = 0;
          for (int $x = 0; $x < $nw; $x++) {
            if ($x == 0 || $fps[$x] != $fps[$x - 1]) { $fps[$u++] = $fps[$x]; }
          }
          ${ev.isNull} = false;
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
            java.util.Arrays.copyOf($fps, $u));
        }
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

/** Static targets for the bound-truncation columns ([[boundfns]]) —
  * Iceberg truncate(16) semantics live in
  * [[graft.icelite.IcebergFormat.truncateLowerBound]]/`truncateUpperBound`;
  * these adapt them to Spark's internal UTF8String for codegen
  * StaticInvoke (a direct static call in generated code — no row-at-a-time
  * Scala-function UDF). */
object BoundStatics {
  def truncLower(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(graft.icelite.IcebergFormat.truncateLowerBound(s.toString))
  def truncUpper(s: UTF8String): UTF8String =
    if (s == null) null
    else graft.icelite.IcebergFormat.truncateUpperBound(s.toString)
      .map(UTF8String.fromString).orNull
}

/** Static target for the bounded edit-distance verify ([[hashfns.levBounded]]).
  *
  * Equivalent to `levenshtein(a, b) <= threshold ? levenshtein(a, b) : -1`
  * but engineered for the near-duplicate shape the dedup verifies feed it:
  *  - common prefix AND suffix are stripped first (edit distance is
  *    invariant under shared-affix removal), so two 10 KB documents that
  *    differ in a 5-char tail cost a 5×5 DP, not a 10k×10k one — the case
  *    that made dd20's verify a 911 s wall at 100× on a suffix-mutated
  *    duplicate corpus;
  *  - the DP is BANDED at the threshold (O(threshold·len) cells) and
  *    early-exits -1 as soon as a row's minimum exceeds it (row minima are
  *    non-decreasing), so definite non-matches pay O(threshold²);
  *  - CODE-POINT level, matching Spark's builtin `levenshtein` and the
  *    DuckDB oracle's character semantics: the strings decode to code-point
  *    arrays up front (one pass each), so non-BMP input (emoji etc.)
  *    counts one edit per character, not per UTF-16 surrogate half. */
object LevStatics {
  private final val BIG = 1 << 29 // in-band sentinel; 1 + BIG cannot overflow

  def levBounded(a: UTF8String, b: UTF8String, threshold: Int): Long = {
    if (threshold < 0) return -1L
    // allocation-free rejection first: numChars counts code points off the
    // UTF-8 bytes, so a length gap beyond the threshold (the dominant
    // non-match shape in dd20's verify) never decodes either string
    if (math.abs(a.numChars() - b.numChars()) > threshold) return -1L
    val s = a.toString.codePoints().toArray
    val t = b.toString.codePoints().toArray
    // strip common prefix, then common suffix of the remainder
    val ls = s.length; val lt = t.length
    var lo = 0
    val minL = math.min(ls, lt)
    while (lo < minL && s(lo) == t(lo)) lo += 1
    var es = ls; var et = lt
    while (es > lo && et > lo && s(es - 1) == t(et - 1)) { es -= 1; et -= 1 }
    var n = es - lo; var m = et - lo
    if (n == 0) return if (m <= threshold) m.toLong else -1L
    if (m == 0) return if (n <= threshold) n.toLong else -1L
    if (math.abs(n - m) > threshold) return -1L
    // banded two-row DP over s[lo..es) x t[lo..et); keep n <= m
    var x = s; var y = t; var xo = lo; var yo = lo
    if (n > m) { x = t; y = s; xo = lo; yo = lo; val tmp = n; n = m; m = tmp }
    var p = new Array[Int](n + 1)
    var d = new Array[Int](n + 1)
    val boundary = math.min(n, threshold) + 1
    var i = 0
    while (i < boundary) { p(i) = i; i += 1 }
    java.util.Arrays.fill(p, boundary, n + 1, BIG)
    java.util.Arrays.fill(d, BIG)
    var j = 1
    while (j <= m) {
      val cj = y(yo + j - 1)
      d(0) = j
      val min = math.max(1, j - threshold)
      val max = math.min(n, j + threshold)
      if (min > max) return -1L
      if (min > 1) d(min - 1) = BIG
      var rowMin = d(0)
      i = min
      while (i <= max) {
        d(i) =
          if (x(xo + i - 1) == cj) p(i - 1)
          else 1 + math.min(math.min(d(i - 1), p(i)), p(i - 1))
        if (d(i) < rowMin) rowMin = d(i)
        i += 1
      }
      if (rowMin > threshold) return -1L
      val tmp = p; p = d; d = tmp
      j += 1
    }
    if (p(n) <= threshold) p(n).toLong else -1L
  }
}

/** Column wrappers for manifest string-bound truncation. */
object boundfns {
  import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
  private def wrap(name: String, c: Column, nullable: Boolean): Column =
    bridge.column(StaticInvoke(
      BoundStatics.getClass, StringType, name, Seq(bridge.expression(c)),
      inputTypes = Seq(StringType), propagateNull = true, returnNullable = nullable))
  /** 16-code-point prefix — a valid Iceberg lower bound. */
  def truncLower(c: Column): Column = wrap("truncLower", c, nullable = false)
  /** Incremented 16-cp prefix (strictly ≥ the value) — NULL when no code
    * point could bump, read as unbounded by every pruner. */
  def truncUpper(c: Column): Column = wrap("truncUpper", c, nullable = true)
}

/** Column-API wrappers. */
object hashfns {
  private def expr(c: Column): Expression = bridge.expression(c)
  private def col(e: Expression): Column  = bridge.column(e)

  def rollHash(c: Column, m: Long = Hashing.P): Column = col(RollHashExpr(expr(c), m))

  def minGramHash(c: Column, k: Int, m: Long = Hashing.P): Column =
    col(MinGramHashExpr(expr(c), k, m))

  def minhashSig(c: Column): Column = {
    val as = Hashing.minhashParams.map(_._2).toArray
    val bs = Hashing.minhashParams.map(_._3).toArray
    col(MinHashSigExpr(expr(c), as, bs, Hashing.P))
  }

  def simhash32(c: Column): Column = col(SimHash32Expr(expr(c)))

  def wordShingles(c: Column, n: Int = 3): Column = col(WordShinglesExpr(expr(c), n))

  def winnow(c: Column, k: Int, w: Int, m: Long = Hashing.P): Column =
    col(WinnowExpr(expr(c), k, w, m))

  /** Bounded edit distance: `levenshtein(a, b)` when ≤ `threshold`, else
    * -1 — affix-trimmed + banded ([[LevStatics.levBounded]]), a direct
    * static call in generated code. */
  def levBounded(a: Column, b: Column, threshold: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
    bridge.column(StaticInvoke(
      LevStatics.getClass, LongType, "levBounded",
      Seq(expr(a), expr(b), expr(threshold)),
      inputTypes = Seq(StringType, StringType, IntegerType),
      propagateNull = true, returnNullable = false))
  }
}
