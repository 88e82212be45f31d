package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Custom Catalyst expressions for the text-hash kernels. Each evaluates one
 * flat JVM loop per row ([[TextHashes]]), and every expression implements
 * real `doGenCode` — the kernel stays one static/reference call, but the
 * call site lives inside the whole-stage-generated code, so there is no
 * boxed eval(InternalRow) detour and the child value is computed exactly
 * once by the surrounding stage. The win over built-in higher-order
 * functions is avoiding thousands of interpreted per-element lambda
 * evaluations per row.
 */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextHashes.shingleHashesSorted(input.asInstanceOf[UTF8String].toString, n))
  // real codegen (not CodegenFallback): the kernel stays one static JVM
  // call, but the call site lives inside the whole-stage-generated code —
  // no per-row boxed eval(InternalRow) detour on the dedup hot loop
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
       |  graft.functions.TextHashes.shingleHashesSorted($c.toString(), $n));
     """.stripMargin)
  override def prettyName: String = "graft_shingle_hashes"
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

case class WordGramMd5sExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextHashes.wordGramMd5s(input.asInstanceOf[UTF8String].toString, n))
  // see ShingleHashesExpr: one static kernel call sited inside whole-stage
  // codegen — the transform∘sequence∘md5∘array_join formulation interprets
  // four lambdas per window per row and materializes every gram string
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
       |  graft.functions.TextHashes.wordGramMd5s($c.toString(), $n));
     """.stripMargin)
  override def prettyName: String = "graft_word_gram_md5s"
  override protected def withNewChildInternal(newChild: Expression): WordGramMd5sExpr =
    copy(child = newChild)
}

case class CharGramsExpr(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.charGrams(input.asInstanceOf[UTF8String], n)
  // see ShingleHashesExpr: one static kernel call sited inside whole-stage
  // codegen — the HOF formulation (transform∘sequence∘substr) interprets
  // three lambdas per gram per row, measured ~10x slower on the
  // heavy-hitters gram explode
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashes.charGrams($c, $n);")
  override def prettyName: String = "graft_char_grams"
  override protected def withNewChildInternal(newChild: Expression): CharGramsExpr =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression, shingleN: Int, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val sig = TextHashes.minHashSig(
      input.asInstanceOf[UTF8String].toString, shingleN, numHashes, seed)
    if (sig == null) null else new GenericArrayData(sig)
  }
  override def nullable: Boolean = true
  // see ShingleHashesExpr: static-kernel call sited inside whole-stage
  // codegen; a null signature (too-short doc) sets the column null
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sig = ctx.freshName("sig")
      s"""
       |long[] $sig = graft.functions.TextHashes.minHashSig(
       |  $c.toString(), $shingleN, $numHashes, ${seed}L);
       |if ($sig == null) {
       |  ${ev.isNull} = true;
       |} else {
       |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       |}
     """.stripMargin
    })
  override def prettyName: String = "graft_minhash_sig"
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** Winnowing fingerprint set of already-normalized text — sorted distinct
  * lowercase-hex md5 minima ([[TextHashes.winnowFpsHex]]). One flat kernel
  * call per row replacing the transform/sequence/slice/array_min
  * higher-order formulation, whose per-window slice allocations and
  * interpreted per-element lambdas dominated the winnowing entries. */
case class WinnowFpsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextHashes.winnowFpsHex(input.asInstanceOf[UTF8String].getBytes, k, w))
  // see ShingleHashesExpr: static-kernel call sited inside whole-stage codegen
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
       |  graft.functions.TextHashes.winnowFpsHex($c.getBytes(), $k, $w));
     """.stripMargin)
  override def prettyName: String = "graft_winnow_fps"
  override protected def withNewChildInternal(newChild: Expression): WinnowFpsExpr =
    copy(child = newChild)
}

case class SimHash64Expr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashes.simHash64(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextHashes.simHash64($c.toString());")
  override def prettyName: String = "graft_simhash64"
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

case class SimHash128Expr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHashes.simHash128(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
       |  graft.functions.TextHashes.simHash128($c.toString(), 4));
     """.stripMargin)
  // gramN=4 is simHash128's Scala default — Janino compiles plain Java, so
  // the generated call must pass it explicitly or codegen fails and the
  // whole stage silently drops to interpreted eval
  override def prettyName: String = "graft_simhash128"
  override protected def withNewChildInternal(newChild: Expression): SimHash128Expr =
    copy(child = newChild)
}

/** Band keys for simhash banding — see [[TextHashes.simHashBandKeys128]]. */
case class SimHashBandKeys128Expr(left: Expression, right: Expression, rotations: Int)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(w0: Any, w1: Any): Any =
    new GenericArrayData(TextHashes.simHashBandKeys128(
      w0.asInstanceOf[Long], w1.asInstanceOf[Long], rotations))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
       |  graft.functions.TextHashes.simHashBandKeys128($a, $b, $rotations));
     """.stripMargin)
  override def prettyName: String = "graft_simhash_band_keys128"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashBandKeys128Expr =
    copy(left = newLeft, right = newRight)
}

case class SortedIntersectSizeExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashes.sortedIntersectSize(
      a.asInstanceOf[ArrayData].toLongArray(), b.asInstanceOf[ArrayData].toLongArray())
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |${ev.value} = graft.functions.TextHashes.sortedIntersectSize(
       |  $a.toLongArray(), $b.toLongArray());
     """.stripMargin)
  override def prettyName: String = "graft_sorted_intersect_size"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSizeExpr =
    copy(left = newLeft, right = newRight)
}

/**
 * Unicode NFC canonical normalization (java.text.Normalizer) — the
 * canonicalization step that must run BEFORE any hash-based dedup at corpus
 * scale: "café" composed (U+00E9) and decomposed (e + U+0301) are different
 * byte strings, so every downstream md5/MinHash/SimHash kernel sees two
 * unrelated documents unless the corpus is normalized first. Spark ships no
 * normalization builtin, hence the custom expression; NFC (not NFK*) because
 * canonical composition is lossless — compatibility folding is a separate
 * policy decision a pipeline makes per-field. Scan-stage, zero-shuffle; the
 * fast path (`Normalizer.isNormalized`, true for ~all real web text) skips
 * the copy entirely, so the 100 TB cost is a per-row check, not a rewrite.
 */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      // same fast path as nullSafeEval: already-NFC text (~all real web
      // text) returns the input UTF8String without a copy
      s"""
       |java.lang.String $s = $c.toString();
       |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
       |  ${ev.value} = $c;
       |} else {
       |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
       |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
       |}
     """.stripMargin
    })
  override def prettyName: String = "graft_nfc_normalize"
  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

/**
 * Cosine similarity over two numeric arrays (float or double, mixed ok) —
 * one flat fused loop for dot product and both norms. The higher-order
 * `aggregate(zip_with(...))` formulation interprets ~4 boxed lambda calls
 * per element per row; this is the hot inner kernel of every similarity
 * operator, so it gets a real loop AND real codegen: unlike the heavy text
 * kernels (where one virtual call per row is noise), a 64-dim cosine is
 * light enough that staying inside whole-stage codegen matters when an
 * exact verify evaluates it millions of times.
 */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

  override def dataType: DataType = DoubleType

  private def elemGetter(dt: DataType, arr: String, idx: String): String = dt match {
    case ArrayType(DoubleType, _) => s"$arr.getDouble($idx)"
    case _ => s"(double) $arr.getFloat($idx)"
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException("cosine_sim: dimension mismatch " +
         |    $n + " vs " + $b.numElements() +
         |    " - a silent min-length similarity would be plausible but wrong");
         |}
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "cosine_sim: null element at index " + $i);
         |  }
         |  double $x = ${elemGetter(left.dataType, a, i)};
         |  double $y = ${elemGetter(right.dataType, b, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = Math.sqrt($na) * Math.sqrt($nb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
       """.stripMargin
    })

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim needs array<float|double> args, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = VectorKernels.toDoubles(a, left.dataType)
    val ys = VectorKernels.toDoubles(b, right.dataType)
    if (xs.length != ys.length)
      throw new IllegalArgumentException(
        s"cosine_sim: dimension mismatch ${xs.length} vs ${ys.length} — " +
          "a silent min-length similarity would be plausible but wrong")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val n = xs.length
    var i = 0
    while (i < n) {
      dot += xs(i) * ys(i); na += xs(i) * xs(i); nb += ys(i) * ys(i)
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override def prettyName: String = "graft_cosine_sim"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/**
 * Random-hyperplane LSH bucket id: bit i of the result is the sign of
 * emb · planes(i). The planes live INSIDE the expression (not as literal
 * children), so the plan stays small at any dimension and all planes are
 * evaluated in one fused pass per row.
 */
case class HyperplaneBucketExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = bucketOf(input)

  // codegen calls this directly on the expression reference: the child value
  // is computed once by the surrounding generated code (CodegenFallback
  // would re-evaluate it through eval(row) and box the result)
  def bucketOf(input: Any): Long = {
    val xs = VectorKernels.toDoubles(input, child.dataType)
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      if (plane.length != xs.length)
        throw new IllegalArgumentException(
          s"hyperplane_bucket: vector dim ${xs.length} != plane dim ${plane.length}")
      var dot = 0.0
      var i = 0
      while (i < xs.length) { dot += xs(i) * plane(i); i += 1 }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("hyperplaneBucket", this, classOf[HyperplaneBucketExpr].getName)
      s"${ev.value} = $ref.bucketOf($c);"
    })

  // the planes array participates in equality so plans with different seeds
  // don't dedupe into each other
  override def equals(other: Any): Boolean = other match {
    case o: HyperplaneBucketExpr =>
      child == o.child && java.util.Arrays.deepEquals(
        planes.asInstanceOf[Array[AnyRef]], o.planes.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.deepHashCode(planes.asInstanceOf[Array[AnyRef]])

  override def prettyName: String = "graft_hyperplane_bucket"
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
    copy(child = newChild)
}

/**
 * Dim-free variant of [[HyperplaneBucketExpr]]: planes are generated lazily
 * from (numPlanes, dim, seed) when the first vector arrives, so the plan
 * needs no driver-side dimension probe (one fewer Spark job per query).
 * Deterministic: every task derives the identical planes from the seed.
 *
 * A corpus with mixed dimensions gets per-dim planes AND per-dim bucket
 * ranges — the vector's dimension occupies the bucket id's high bits, so
 * vectors of different dimensionality can never share a bucket (a cross-dim
 * candidate pair would be meaningless and the cosine verify would throw).
 * Supports numPlanes <= 44 and dim < 2^20.
 */
case class HyperplaneBucketGenExpr(child: Expression, numPlanes: Int, seed: Long)
    extends UnaryExpression {
  require(numPlanes >= 1 && numPlanes <= 44,
    s"numPlanes out of range [1, 44]: $numPlanes")

  override def dataType: DataType = LongType

  @transient private lazy val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()
  private def planesFor(dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent(dim, d => VectorKernels.hyperplanes(numPlanes, d, seed))

  override def nullSafeEval(input: Any): Any = bucketOf(input)

  // see HyperplaneBucketExpr.bucketOf: direct primitive call from codegen
  def bucketOf(input: Any): Long = {
    val xs = VectorKernels.toDoubles(input, child.dataType)
    if (xs.length >= (1 << 20))
      throw new IllegalArgumentException(
        s"hyperplane_bucket_gen supports dim < 2^20, got ${xs.length}")
    val planes = planesFor(xs.length)
    var bucket = xs.length.toLong << 44
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0
      var i = 0
      while (i < xs.length) { dot += xs(i) * plane(i); i += 1 }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj(
        "hyperplaneBucketGen", this, classOf[HyperplaneBucketGenExpr].getName)
      s"${ev.value} = $ref.bucketOf($c);"
    })

  override def prettyName: String = "graft_hyperplane_bucket_gen"
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketGenExpr =
    copy(child = newChild)
}

/**
 * Query-directed multi-probe sibling of [[HyperplaneBucketGenExpr]] (Lv et
 * al., VLDB 2007): emits the vector's HOME bucket plus the single-bit flips
 * of its `flips` LOWEST-MARGIN planes (smallest |dot|, ties to the lower
 * plane index). A near pair that lands at Hamming distance 1 almost always
 * disagrees on a plane BOTH points sit close to — the plane their angle
 * straddles — so probing the low-margin flips recovers most of the
 * Hamming-1 recall at candidate-cost factor (1+flips) instead of the
 * (1+bits) of exhaustive 1-flip probing. Planes derive from (numPlanes,
 * dim, seed) exactly as [[HyperplaneBucketGenExpr]]; element 0 of the
 * result IS that expression's bucket, so a probe side built from this
 * expression equi-joins against home buckets built from either.
 */
case class HyperplaneProbeGenExpr(
    child: Expression, numPlanes: Int, seed: Long, flips: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types.ArrayType
  require(numPlanes >= 1 && numPlanes <= 44,
    s"numPlanes out of range [1, 44]: $numPlanes")
  require(flips >= 0 && flips <= numPlanes,
    s"flips out of range [0, $numPlanes]: $flips")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()
  private def planesFor(dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent(dim, d => VectorKernels.hyperplanes(numPlanes, d, seed))

  override def nullSafeEval(input: Any): Any = probesOf(input)

  // see HyperplaneBucketExpr.bucketOf: direct primitive call from codegen
  def probesOf(input: Any): ArrayData = {
    val xs = VectorKernels.toDoubles(input, child.dataType)
    if (xs.length >= (1 << 20))
      throw new IllegalArgumentException(
        s"hyperplane_probe_gen supports dim < 2^20, got ${xs.length}")
    val planes = planesFor(xs.length)
    val dots = new Array[Double](planes.length)
    var bucket = xs.length.toLong << 44
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      var dot = 0.0
      var i = 0
      while (i < xs.length) { dot += xs(i) * plane(i); i += 1 }
      dots(p) = dot
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    val out = new Array[Long](1 + flips)
    out(0) = bucket
    if (flips > 0) {
      // partial selection of the `flips` smallest (|dot|, plane index) — the
      // margins are the SAME left-associative dots the home bucket signed,
      // so the oracle's abs(dot) ranking selects identical planes
      val selM = Array.fill(flips)(Double.PositiveInfinity)
      val selP = Array.fill(flips)(Int.MaxValue)
      var q = 0
      while (q < planes.length) {
        val m = math.abs(dots(q))
        if (m < selM(flips - 1) || (m == selM(flips - 1) && q < selP(flips - 1))) {
          var pos = flips - 1
          while (pos > 0 && (m < selM(pos - 1) ||
              (m == selM(pos - 1) && q < selP(pos - 1)))) {
            selM(pos) = selM(pos - 1); selP(pos) = selP(pos - 1)
            pos -= 1
          }
          selM(pos) = m; selP(pos) = q
        }
        q += 1
      }
      var r = 0
      while (r < flips) { out(1 + r) = bucket ^ (1L << selP(r)); r += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj(
        "hyperplaneProbeGen", this, classOf[HyperplaneProbeGenExpr].getName)
      s"${ev.value} = $ref.probesOf($c);"
    })

  override def prettyName: String = "graft_hyperplane_probe_gen"
  override protected def withNewChildInternal(newChild: Expression): HyperplaneProbeGenExpr =
    copy(child = newChild)
}

/**
 * IVF coarse-quantizer assignment: the `nprobe` centroid ids nearest to the
 * input vector by cosine, descending (ties broken toward the lower id). The
 * centroid matrix lives INSIDE the expression — at K centroids the plan
 * holds ONE node instead of K literal-array struct children, so the Catalyst
 * tree stays O(1) and codegen survives K in the thousands (the cell count a
 * 100 TB corpus actually needs). Centroid norms are precomputed once per
 * expression instance; per row the work is one dot product per centroid plus
 * an O(K·nprobe) partial selection.
 */
/** The IVF cell-assignment math shared by [[IvfAssignExpr]] (scan-stage
  * kernel) and driver-side probe planning — ONE implementation, so a cell
  * list computed on the driver is bit-identical to the expression's. */
object IvfAssign {
  def invNorms(centroids: Array[Array[Double]]): Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) 0.0 else 1.0 / n
  }

  /** Top-`nprobe` centroid ids of `xs` by dot(x,c)·invNorm(c), descending
    * sim then ascending cid — [[IvfAssignExpr]]'s exact selection. */
  def assign(centroids: Array[Array[Double]], invNorms: Array[Double],
      nprobe: Int, xs: Array[Double]): Array[Int] = {
    // |x| is constant across centroids, so ranking by dot(x,c)/|c| is the
    // cosine ranking without ever computing |x|
    val k = centroids.length
    // size the selection to min(nprobe, k): with ZERO centroids (empty-corpus
    // quantizer) this returns an empty array per row — never the Int.MaxValue
    // sentinel the NaN note below promises can't leak
    val n = math.min(nprobe, k)
    if (n == 0) return Array.emptyIntArray
    val topSim = new Array[Double](n)
    val topCid = new Array[Int](n)
    java.util.Arrays.fill(topSim, Double.NegativeInfinity)
    java.util.Arrays.fill(topCid, Int.MaxValue)
    var c = 0
    while (c < k) {
      val cen = centroids(c)
      if (cen.length != xs.length)
        throw new IllegalArgumentException(
          s"ivf_assign: vector dim ${xs.length} != centroid dim ${cen.length}")
      var dot = 0.0
      var i = 0
      while (i < xs.length) { dot += xs(i) * cen(i); i += 1 }
      // a NaN similarity (NaN component in the vector) must not poison the
      // selection — rank it like "no affinity" so the vector still lands in
      // a real, searchable cell instead of leaking the Int.MaxValue sentinel
      val raw = dot * invNorms(c)
      val sim = if (java.lang.Double.isNaN(raw)) Double.NegativeInfinity else raw
      // insertion into the running top-n (descending sim, then ascending cid)
      if (sim > topSim(n - 1) || (sim == topSim(n - 1) && c < topCid(n - 1))) {
        var pos = n - 1
        while (pos > 0 && (sim > topSim(pos - 1) ||
            (sim == topSim(pos - 1) && c < topCid(pos - 1)))) {
          topSim(pos) = topSim(pos - 1); topCid(pos) = topCid(pos - 1)
          pos -= 1
        }
        topSim(pos) = sim; topCid(pos) = c
      }
      c += 1
    }
    topCid
  }
}

case class IvfAssignExpr(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

  // centroids MAY be empty: the default quantizers sample from the corpus,
  // so an EMPTY corpus yields zero centroids — the expression then assigns
  // no cells (empty array per row; there are no rows anyway), and every
  // downstream cell join degrades to the structurally-correct empty result
  // instead of failing the [1, K] contract at plan-build time.
  require(nprobe >= 1 && nprobe <= math.max(1, centroids.length),
    s"nprobe ($nprobe) must be in [1, ${math.max(1, centroids.length)}]")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val invNorms: Array[Double] = IvfAssign.invNorms(centroids)

  override def nullSafeEval(input: Any): Any = assignOf(input)

  // see HyperplaneBucketExpr.bucketOf: direct call from codegen; the math
  // lives in [[IvfAssign.assign]] so driver-side callers (probe-cell
  // planning in ivfTopKIndexed) run the IDENTICAL code path
  def assignOf(input: Any): ArrayData =
    new GenericArrayData(IvfAssign.assign(
      centroids, invNorms, nprobe, VectorKernels.toDoubles(input, child.dataType)))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("ivfAssign", this, classOf[IvfAssignExpr].getName)
      s"${ev.value} = $ref.assignOf($c);"
    })

  // centroids participate in equality so different quantizers don't dedupe
  override def equals(other: Any): Boolean = other match {
    case o: IvfAssignExpr =>
      child == o.child && nprobe == o.nprobe && java.util.Arrays.deepEquals(
        centroids.asInstanceOf[Array[AnyRef]], o.centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + nprobe) +
      java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])

  override def prettyName: String = "graft_ivf_assign"
  override protected def withNewChildInternal(newChild: Expression): IvfAssignExpr =
    copy(child = newChild)
}

/**
 * Fused ADC scoring kernel (round 20): the asymmetric reconstructed cosine
 * of one PQ-coded vector against probe `p`, read entirely from lookup
 * tables — `dlut(p)(i·k + code_i)` partial dots and `nlut(i·k + code_i)`
 * codeword squared norms, both precomputed on the driver and living INSIDE
 * the expression (the [[IvfAssignExpr]] contract: one plan node, primitive
 * arrays, one reference call from whole-stage codegen). The m-term
 * element_at-chain Column formulation measured ~6 µs/row — two orders over
 * this loop — because each term is its own Catalyst node against a boxed
 * nested-array literal; here the whole score is one flat JVM loop.
 *
 * Summation order is the engine-exactness contract the DuckDB oracle
 * replays (`list_reduce(list(… ORDER BY m))`): both accumulators fold the
 * per-subspace partials in ascending-subspace order from 0.0 (adding 0.0
 * first is IEEE-exact), and the probe norm is divided in the same
 * expression shape as the Column form it replaces.
 */
case class PqAdcScoreExpr(left: Expression, right: Expression,
    dlut: Array[Array[Double]], nlut: Array[Double],
    qNorms: Array[Double], k: Int)
    extends BinaryExpression {
  import org.apache.spark.sql.types.DoubleType

  require(k > 0 && nlut.length % k == 0,
    s"nlut length ${nlut.length} not a multiple of k=$k")
  require(dlut.forall(_.length == nlut.length),
    "every probe LUT must match the codeword-norm LUT shape")
  require(dlut.length == qNorms.length, "one norm per probe LUT")

  override def dataType: DataType = DoubleType

  @transient private lazy val m: Int = nlut.length / k

  override def nullSafeEval(codes: Any, probe: Any): Any =
    scoreOf(codes.asInstanceOf[ArrayData], probe.asInstanceOf[Int])

  // see IvfAssignExpr.assignOf: direct call from codegen
  def scoreOf(codes: ArrayData, p: Int): Double = {
    val lp = dlut(p)
    var d = 0.0
    var s = 0.0
    var i = 0
    while (i < m) {
      val idx = i * k + codes.getInt(i)
      d += lp(idx)
      s += nlut(idx)
      i += 1
    }
    d / (math.sqrt(s) * qNorms(p))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, p) => {
      val ref = ctx.addReferenceObj("pqAdcScore", this, classOf[PqAdcScoreExpr].getName)
      s"${ev.value} = $ref.scoreOf($codes, $p);"
    })

  // the LUTs participate in equality so different probe batches don't dedupe
  override def equals(other: Any): Boolean = other match {
    case o: PqAdcScoreExpr =>
      left == o.left && right == o.right && k == o.k &&
        java.util.Arrays.deepEquals(
          dlut.asInstanceOf[Array[AnyRef]], o.dlut.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(nlut, o.nlut) &&
        java.util.Arrays.equals(qNorms, o.qNorms)
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * (31 * (31 * left.hashCode() + right.hashCode()) + k) +
      java.util.Arrays.deepHashCode(dlut.asInstanceOf[Array[AnyRef]])) +
      java.util.Arrays.hashCode(nlut)

  override def prettyName: String = "graft_pq_adc_score"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScoreExpr =
    copy(left = newLeft, right = newRight)
}

/** Deterministic vector-hash helpers shared by the LSH expressions. */
object VectorKernels {
  import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

  /** Pseudo-gaussian hyperplanes (sum of 4 seeded uniforms) — the same
    * generator for every (numPlanes, dim, seed), wherever it is evaluated. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    var state = seed
    def nextUniform(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Array.fill(numPlanes)(Array.fill(dim)(
      nextUniform() + nextUniform() + nextUniform() + nextUniform()))
  }

  /** ArrayData of float or double → Array[Double] — the one conversion all
    * vector expressions share (float inputs widen element-wise). Null
    * elements throw the same error interpreted and codegen'd — a silent 0.0
    * would skew every similarity downstream. */
  def toDoubles(v: Any, dt: DataType): Array[Double] = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val isDouble = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(s"null element at index $i in vector")
      out(i) = if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
      i += 1
    }
    out
  }
}

case class SigEqualFractionExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashes.sigEqualFraction(
      a.asInstanceOf[ArrayData].toLongArray(), b.asInstanceOf[ArrayData].toLongArray())
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |${ev.value} = graft.functions.TextHashes.sigEqualFraction(
       |  $a.toLongArray(), $b.toLongArray());
     """.stripMargin)
  override def prettyName: String = "graft_sig_equal_fraction"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigEqualFractionExpr =
    copy(left = newLeft, right = newRight)
}

/**
 * Distinct-pattern containment count via a shared [[AhoCorasick]] automaton:
 * `countOf(text)` = how many of `patterns` occur in the text at least once.
 * One text pass regardless of pattern count — the scale path for blocklists
 * past the per-phrase-`contains` regime ([[graft.operators.CorpusPipeline
 * .blocklistFilter]] switches to this expression automatically). The
 * automaton builds once per executor in a transient lazy val; the plan node
 * carries only the pattern list.
 */
case class MultiContainsCountExpr(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType

  @transient private lazy val automaton: AhoCorasick = AhoCorasick.build(patterns)

  override def nullSafeEval(input: Any): Any = countOf(input)

  // codegen calls this on the expression reference: the child value is
  // computed once by the surrounding generated code (the
  // HyperplaneBucketExpr contract)
  def countOf(input: Any): Int =
    automaton.countDistinct(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj(
        "multiContains", this, classOf[MultiContainsCountExpr].getName)
      s"${ev.value} = $ref.countOf($c);"
    })

  override def prettyName: String = "graft_multi_contains_count"
  override protected def withNewChildInternal(newChild: Expression): MultiContainsCountExpr =
    copy(child = newChild)
}

/**
 * Registration: `GraftFunctions.register(spark)` for an existing session, or
 * `spark.sql.extensions=graft.functions.GraftExtensions` at session build —
 * the SparkSessionExtensions path the reference's table factories occupy in
 * Flink's SPI (reference: source/table/RocketMQDynamicTableSourceFactory.java).
 * SQL: graft_shingle_hashes(text, n), graft_minhash_sig(text, n, k, seed),
 * graft_sorted_intersect_size(a, b).
 */
object GraftFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.{ColumnShim => ExpressionUtils}

  // ---- Column-level API (no registration needed) ----

  def shingleHashes(text: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashesExpr(ExpressionUtils.expression(text), n))

  /** Distinct md5 hex of sliding word n-grams, first-occurrence order. */
  def wordGramMd5s(text: Column, n: Int): Column =
    ExpressionUtils.column(WordGramMd5sExpr(ExpressionUtils.expression(text), n))

  def minHashSig(text: Column, shingleN: Int, numHashes: Int, seed: Long): Column =
    ExpressionUtils.column(
      MinHashSigExpr(ExpressionUtils.expression(text), shingleN, numHashes, seed))

  def sortedIntersectSize(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SortedIntersectSizeExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def simHash64(text: Column): Column =
    ExpressionUtils.column(SimHash64Expr(ExpressionUtils.expression(text)))

  /** Sorted distinct winnowing fingerprints (hex md5) of normalized text. */
  def winnowFps(normText: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowFpsExpr(ExpressionUtils.expression(normText), k, w))

  def simHash128(text: Column): Column =
    ExpressionUtils.column(SimHash128Expr(ExpressionUtils.expression(text)))

  def nfcNormalize(text: Column): Column =
    ExpressionUtils.column(NfcNormalizeExpr(ExpressionUtils.expression(text)))

  def simHashBandKeys128(w0: Column, w1: Column, rotations: Int): Column =
    ExpressionUtils.column(SimHashBandKeys128Expr(
      ExpressionUtils.expression(w0), ExpressionUtils.expression(w1), rotations))

  /** How many of `patterns` occur in the text — one Aho-Corasick pass,
    * independent of pattern count. */
  def multiContainsCount(text: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(
      MultiContainsCountExpr(ExpressionUtils.expression(text), patterns))

  def sigEqualFraction(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SigEqualFractionExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def hyperplaneBucket(emb: Column, planes: Array[Array[Double]]): Column =
    ExpressionUtils.column(HyperplaneBucketExpr(ExpressionUtils.expression(emb), planes))

  /** Dim-free hyperplane bucket: planes derived from (numPlanes, row dim, seed). */
  def hyperplaneBucketGen(emb: Column, numPlanes: Int, seed: Long): Column =
    ExpressionUtils.column(
      HyperplaneBucketGenExpr(ExpressionUtils.expression(emb), numPlanes, seed))

  /** Multi-probe bucket array: home bucket + `flips` lowest-margin 1-bit
    * flips — element 0 equals [[hyperplaneBucketGen]]'s bucket. */
  def hyperplaneProbeGen(emb: Column, numPlanes: Int, seed: Long, flips: Int): Column =
    ExpressionUtils.column(
      HyperplaneProbeGenExpr(ExpressionUtils.expression(emb), numPlanes, seed, flips))

  /** Top-`nprobe` nearest centroid ids by cosine, descending. */
  def ivfAssign(emb: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    ExpressionUtils.column(
      IvfAssignExpr(ExpressionUtils.expression(emb), centroids, nprobe))

  /** Fused ADC score of a PQ code row against probe `p` — see
    * [[PqAdcScoreExpr]]. `dlut(p)` and `nlut` are flat m×k tables. */
  def pqAdcScore(codes: Column, probe: Column, dlut: Array[Array[Double]],
      nlut: Array[Double], qNorms: Array[Double], k: Int): Column =
    ExpressionUtils.column(
      PqAdcScoreExpr(ExpressionUtils.expression(codes),
        ExpressionUtils.expression(probe), dlut, nlut, qNorms, k))

  /** Mergeable bottom-k sketch aggregate: k smallest distinct
    * (key, payload) pairs per group — see [[BottomKPairsAgg]]. */
  def bottomKPairs(key: Column, payload: Column, k: Int): Column =
    ExpressionUtils.column(
      BottomKPairsAgg(ExpressionUtils.expression(key),
        ExpressionUtils.expression(payload), k).toAggregateExpression())

  def charGrams(text: Column, n: Int): Column =
    ExpressionUtils.column(CharGramsExpr(ExpressionUtils.expression(text), n))

  def misraGries(item: Column, capacity: Int): Column =
    ExpressionUtils.column(
      MisraGriesAgg(ExpressionUtils.expression(item), capacity).toAggregateExpression())

  // ---- SQL registration ----

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  val registry: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_shingle_hashes",
      new ExpressionInfo(classOf[ShingleHashesExpr].getName, "graft_shingle_hashes"),
      (args: Seq[Expression]) => ShingleHashesExpr(args(0), intLit(args(1), "n"))),
    ("graft_minhash_sig",
      new ExpressionInfo(classOf[MinHashSigExpr].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => MinHashSigExpr(args(0), intLit(args(1), "shingleN"),
        intLit(args(2), "numHashes"), intLit(args(3), "seed").toLong)),
    ("graft_sorted_intersect_size",
      new ExpressionInfo(classOf[SortedIntersectSizeExpr].getName, "graft_sorted_intersect_size"),
      (args: Seq[Expression]) => SortedIntersectSizeExpr(args(0), args(1))),
    ("graft_simhash64",
      new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash64"),
      (args: Seq[Expression]) => SimHash64Expr(args(0))),
    ("graft_simhash128",
      new ExpressionInfo(classOf[SimHash128Expr].getName, "graft_simhash128"),
      (args: Seq[Expression]) => SimHash128Expr(args(0))),
    ("graft_simhash_band_keys128",
      new ExpressionInfo(classOf[SimHashBandKeys128Expr].getName, "graft_simhash_band_keys128"),
      (args: Seq[Expression]) => SimHashBandKeys128Expr(args(0), args(1),
        intLit(args(2), "rotations"))),
    ("graft_cosine_sim",
      new ExpressionInfo(classOf[CosineSimExpr].getName, "graft_cosine_sim"),
      (args: Seq[Expression]) => CosineSimExpr(args(0), args(1))),
    ("graft_text_signals",
      new ExpressionInfo(classOf[TextSignalsExpr].getName, "graft_text_signals"),
      (args: Seq[Expression]) => TextSignalsExpr(args(0))),
    ("graft_text_repetition",
      new ExpressionInfo(classOf[TextRepetitionExpr].getName, "graft_text_repetition"),
      (args: Seq[Expression]) => TextRepetitionExpr(args(0))),
    ("graft_nfc_normalize",
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "graft_nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalizeExpr(args(0))),
    ("graft_winnow_fps",
      new ExpressionInfo(classOf[WinnowFpsExpr].getName, "graft_winnow_fps"),
      (args: Seq[Expression]) => WinnowFpsExpr(args(0), intLit(args(1), "k"),
        intLit(args(2), "w"))),
    ("graft_bottom_k",
      new ExpressionInfo(classOf[BottomKPairsAgg].getName, "graft_bottom_k"),
      // the analyzer wraps a bare AggregateFunction in AggregateExpression
      (args: Seq[Expression]) => BottomKPairsAgg(args(0), args(1),
        intLit(args(2), "k"))),
    ("graft_char_entropy",
      new ExpressionInfo(classOf[CharEntropyExpr].getName, "graft_char_entropy"),
      (args: Seq[Expression]) => CharEntropyExpr(args(0))),
    ("graft_char_grams",
      new ExpressionInfo(classOf[CharGramsExpr].getName, "graft_char_grams"),
      (args: Seq[Expression]) => CharGramsExpr(args(0), intLit(args(1), "n"))),
    ("graft_misra_gries",
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_misra_gries"),
      (args: Seq[Expression]) => MisraGriesAgg(args(0),
        intLit(args(1), "capacity"))))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = registry.foreach { case (name, info, builder) =>
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` —
  * registers the SQL functions and the graft-mq property-predicate
  * pushdown rule ([[graft.plans.PushPropertyPredicates]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.registry.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // operator-optimization rules run before V2ScanRelationPushDown, so the
    // rewritten relation is what the physical scan gets built from
    ext.injectOptimizerRule(_ => graft.plans.PushPropertyPredicates)
  }
}
