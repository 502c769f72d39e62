package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/**
 * Codegen'd float-vector dot product.
 *
 * Spark's higher-order array functions (`zip_with`/`aggregate`/`transform`)
 * are evaluated INTERPRETED — no whole-stage codegen, one boxed lambda call
 * per element. For pairwise similarity that cost is multiplied by
 * |pairs|·dim and dominates the query (measured: 125k pair-cosines over
 * 64-dim vectors ≈ 69 s interpreted vs <1 s with this expression). This is
 * exactly the "custom Catalyst Expression beats composition" case: a tight
 * primitive loop over the two `ArrayData`, generated inline into the
 * enclosing whole-stage-codegen'd plan.
 */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  // Manual check (not ExpectsInputTypes — AbstractDataType is private[sql] in
  // Spark 4): without it, ARRAY<DOUBLE> input would silently reinterpret bits
  // through ArrayData.getFloat instead of failing analysis.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT>, ARRAY<FLOAT>), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  // Locals MUST come from ctx.freshName: two instances of this expression in
  // one generated function (e.g. dot(a,b) and dot(a,a) in the same projection)
  // otherwise redefine the same Java locals → CompileException → interpreted
  // fallback for the whole stage.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("fdpN")
      val s = ctx.freshName("fdpS")
      val i = ctx.freshName("fdpI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/**
 * Codegen'd nearest-centroid argmax: the index (0-based, in the caller's
 * centroid order) of the centroid with the greatest cosine to the input
 * ARRAY<FLOAT> vector.
 *
 * Why an expression and not a `least()` of per-centroid structs: inlining K
 * centroid dot-products as literal expression trees generates O(K·dim) Java
 * source in ONE method — at K=128, dim=64 (a PQ codebook) Janino exceeds the
 * JVM's 64 KB method bytecode limit (`CodeContext.makeSpace`), the
 * whole-stage compile fails EXPENSIVELY (~seconds of churn per plan), and the
 * stage falls back to interpreted eval. Here the matrix rides along as a
 * reference object (`float[][]` + precomputed `double[]` norms) and the
 * generated code is one tight fixed-size loop, independent of K.
 *
 * Ordering parity with the previous aggregate formulation (min over
 * `struct(descCosKey, cell_id)`), assuming the caller passes centroids sorted
 * by cell_id so index order == id order:
 *   - key = -cosine; a NaN cosine or zero denominator maps to +∞ (a
 *     degenerate vector/centroid must never be anyone's nearest match);
 *   - strict `<` update keeps the FIRST (min-id) centroid on ties;
 *   - all-NaN (or NULL input vector) rows resolve to index 0 = min cell_id,
 *     exactly where the old NULL-sorts-first struct ordering landed them.
 */
case class NearestCentroidIndex(child: Expression,
    centroids: Array[Array[Float]], norms: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "nearest_centroid_index"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${t.sql}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else {
      val x = v.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { val f = x.getFloat(i).toDouble; s += f * f; i += 1 }
      val vnorm = math.sqrt(s)
      var best = 0
      var bestKey = Double.PositiveInfinity
      var c = 0
      while (c < centroids.length) {
        val cv = centroids(c)
        val m = math.min(n, cv.length)
        var d = 0.0
        var j = 0
        while (j < m) { d += x.getFloat(j).toDouble * cv(j).toDouble; j += 1 }
        val denom = vnorm * norms(c)
        val key =
          if (denom == 0d) Double.PositiveInfinity
          else {
            val cos = d / denom
            if (java.lang.Double.isNaN(cos)) Double.PositiveInfinity else -cos
          }
        if (key < bestKey) { bestKey = key; best = c }
        c += 1
      }
      best
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("nciCentroids", centroids, "float[][]")
    val cnorms = ctx.addReferenceObj("nciNorms", norms, "double[]")
    val childGen = child.genCode(ctx)
    val (x, n, s, vnorm, best, bestKey, c, cv, m, d, j, denom, key) = (
      ctx.freshName("nciX"), ctx.freshName("nciN"), ctx.freshName("nciS"),
      ctx.freshName("nciVnorm"), ctx.freshName("nciBest"), ctx.freshName("nciBestKey"),
      ctx.freshName("nciC"), ctx.freshName("nciCv"), ctx.freshName("nciM"),
      ctx.freshName("nciD"), ctx.freshName("nciJ"), ctx.freshName("nciDenom"),
      ctx.freshName("nciKey"))
    val code =
      code"""
         |${childGen.code}
         |int $best = 0;
         |if (!${childGen.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $x = ${childGen.value};
         |  int $n = $x.numElements();
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double nciF = (double) $x.getFloat($j);
         |    $s += nciF * nciF;
         |  }
         |  double $vnorm = java.lang.Math.sqrt($s);
         |  double $bestKey = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $cents.length; $c++) {
         |    float[] $cv = $cents[$c];
         |    int $m = java.lang.Math.min($n, $cv.length);
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $m; $j++) {
         |      $d += (double) $x.getFloat($j) * (double) $cv[$j];
         |    }
         |    double $denom = $vnorm * $cnorms[$c];
         |    double $key;
         |    if ($denom == 0.0) { $key = Double.POSITIVE_INFINITY; }
         |    else {
         |      double nciCos = $d / $denom;
         |      $key = Double.isNaN(nciCos) ? Double.POSITIVE_INFINITY : -nciCos;
         |    }
         |    if ($key < $bestKey) { $bestKey = $key; $best = $c; }
         |  }
         |}
       """.stripMargin
    ev.copy(code = code, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode.variable(best, IntegerType))
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidIndex =
    copy(child = newChild)
}

/**
 * Codegen'd max-cosine against a driver-held centroid matrix — the
 * [[NearestCentroidIndex]] companion for "how close is this vector to its
 * nearest seed" (farthest-first seeding). Same compact-loop rationale.
 *
 * Ordering parity with the previous `greatest()` of per-seed cosines:
 * Spark's `greatest` treats NaN as greater than any number, so ANY NaN
 * cosine (zero-norm vector or seed) makes the result NaN — mirrored here by
 * an early NaN return. NULL input vector → NULL (nullSafe), matching
 * `greatest` over all-NULL candidates.
 */
case class MaxCosineSim(child: Expression,
    centroids: Array[Array[Float]], norms: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "max_cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val f = x.getFloat(i).toDouble; s += f * f; i += 1 }
    val vnorm = math.sqrt(s)
    var best = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      val m = math.min(n, cv.length)
      var d = 0.0
      var j = 0
      while (j < m) { d += x.getFloat(j).toDouble * cv(j).toDouble; j += 1 }
      val denom = vnorm * norms(c)
      val cos = if (denom == 0d) Double.NaN else d / denom
      if (java.lang.Double.isNaN(cos)) return Double.NaN
      if (cos > best) best = cos
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("mcsCentroids", centroids, "float[][]")
    val cnorms = ctx.addReferenceObj("mcsNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val (n, s, vnorm, best, c, cv, m, d, j, denom, cos) = (
        ctx.freshName("mcsN"), ctx.freshName("mcsS"), ctx.freshName("mcsVnorm"),
        ctx.freshName("mcsBest"), ctx.freshName("mcsC"), ctx.freshName("mcsCv"),
        ctx.freshName("mcsM"), ctx.freshName("mcsD"), ctx.freshName("mcsJ"),
        ctx.freshName("mcsDenom"), ctx.freshName("mcsCos"))
      s"""
         |int $n = $x.numElements();
         |double $s = 0.0;
         |for (int $j = 0; $j < $n; $j++) {
         |  double mcsF = (double) $x.getFloat($j);
         |  $s += mcsF * mcsF;
         |}
         |double $vnorm = java.lang.Math.sqrt($s);
         |double $best = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  float[] $cv = $cents[$c];
         |  int $m = java.lang.Math.min($n, $cv.length);
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    $d += (double) $x.getFloat($j) * (double) $cv[$j];
         |  }
         |  double $denom = $vnorm * $cnorms[$c];
         |  double $cos = ($denom == 0.0) ? Double.NaN : $d / $denom;
         |  if (Double.isNaN($cos)) { $best = Double.NaN; break; }
         |  if ($cos > $best) { $best = $cos; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MaxCosineSim =
    copy(child = newChild)
}

/**
 * Multi-probe companion of [[NearestCentroidIndex]]: the p nearest centroid
 * indices (0-based, nearest first), same ordering contract — key = -cosine,
 * NaN/zero-denominator → +∞ (degenerate rows lose), ties keep the lower
 * index. For p ≥ nCells returns all indices in distance order; NULL input
 * degrades to ascending indices (all keys +∞), the multi-probe analogue of
 * NearestCentroidIndex's NULL → 0.
 *
 * Selection is p passes over the key array (p·K with p ≤ 8, K ≤ hundreds —
 * cheaper than sorting and allocation-free beyond the output).
 */
case class NearestCentroidIndices(child: Expression,
    centroids: Array[Array[Float]], norms: Array[Double], p: Int)
    extends UnaryExpression {
  require(p > 0, s"probe count must be positive, got $p")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "nearest_centroid_indices"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${t.sql}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val keys = new Array[Double](centroids.length)
    java.util.Arrays.fill(keys, Double.PositiveInfinity)
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { val f = x.getFloat(i).toDouble; s += f * f; i += 1 }
      val vnorm = math.sqrt(s)
      var c = 0
      while (c < centroids.length) {
        val cv = centroids(c)
        val m = math.min(n, cv.length)
        var d = 0.0
        var j = 0
        while (j < m) { d += x.getFloat(j).toDouble * cv(j).toDouble; j += 1 }
        val denom = vnorm * norms(c)
        if (denom != 0d) {
          val cos = d / denom
          if (!java.lang.Double.isNaN(cos)) keys(c) = -cos
        }
        c += 1
      }
    }
    val take = math.min(p, centroids.length)
    val out = new Array[Int](take)
    val used = new Array[Boolean](centroids.length)
    var r = 0
    while (r < take) {
      var best = -1
      var bestKey = 0.0
      var c = 0
      while (c < centroids.length) {
        if (!used(c) && (best == -1 || keys(c) < bestKey)) { best = c; bestKey = keys(c) }
        c += 1
      }
      used(best) = true; out(r) = best; r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("ncisCentroids", centroids, "float[][]")
    val cnorms = ctx.addReferenceObj("ncisNorms", norms, "double[]")
    val childGen = child.genCode(ctx)
    val (x, n, s, vnorm, c, cv, m, d, j, denom, keys, used, out, take, r, best, bestKey, c2) = (
      ctx.freshName("ncisX"), ctx.freshName("ncisN"), ctx.freshName("ncisS"),
      ctx.freshName("ncisVnorm"), ctx.freshName("ncisC"), ctx.freshName("ncisCv"),
      ctx.freshName("ncisM"), ctx.freshName("ncisD"), ctx.freshName("ncisJ"),
      ctx.freshName("ncisDenom"), ctx.freshName("ncisKeys"), ctx.freshName("ncisUsed"),
      ctx.freshName("ncisOut"), ctx.freshName("ncisTake"), ctx.freshName("ncisR"),
      ctx.freshName("ncisBest"), ctx.freshName("ncisBestKey"), ctx.freshName("ncisC2"))
    val value = ctx.freshName("ncisResult")
    val code =
      code"""
         |${childGen.code}
         |double[] $keys = new double[$cents.length];
         |java.util.Arrays.fill($keys, Double.POSITIVE_INFINITY);
         |if (!${childGen.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $x = ${childGen.value};
         |  int $n = $x.numElements();
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double ncisF = (double) $x.getFloat($j);
         |    $s += ncisF * ncisF;
         |  }
         |  double $vnorm = java.lang.Math.sqrt($s);
         |  for (int $c = 0; $c < $cents.length; $c++) {
         |    float[] $cv = $cents[$c];
         |    int $m = java.lang.Math.min($n, $cv.length);
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $m; $j++) {
         |      $d += (double) $x.getFloat($j) * (double) $cv[$j];
         |    }
         |    double $denom = $vnorm * $cnorms[$c];
         |    if ($denom != 0.0) {
         |      double ncisCos = $d / $denom;
         |      if (!Double.isNaN(ncisCos)) $keys[$c] = -ncisCos;
         |    }
         |  }
         |}
         |int $take = java.lang.Math.min($p, $cents.length);
         |int[] $out = new int[$take];
         |boolean[] $used = new boolean[$cents.length];
         |for (int $r = 0; $r < $take; $r++) {
         |  int $best = -1;
         |  double $bestKey = 0.0;
         |  for (int $c2 = 0; $c2 < $cents.length; $c2++) {
         |    if (!$used[$c2] && ($best == -1 || $keys[$c2] < $bestKey)) {
         |      $best = $c2; $bestKey = $keys[$c2];
         |    }
         |  }
         |  $used[$best] = true; $out[$r] = $best;
         |}
         |org.apache.spark.sql.catalyst.util.GenericArrayData $value =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode.variable(
        value, dataType))
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidIndices =
    copy(child = newChild)
}

/**
 * Two-level (coarse→fine) multi-probe nearest-cell indices — the scale
 * path past the flat argmax: a flat [[NearestCentroidIndices]] scan costs
 * nCells·dim per row, which turns the whole assignment quadratic once the
 * cell count scales with the corpus (`Similarity.autoCellCount`). Here the
 * FINE centroids are pre-grouped (driver-side, bounded) under ~√nCells
 * COARSE centroids; per row: score all coarse groups (√c·d), probe the
 * best `q`, score only their member fine cells (~q·√c·d), and emit the `p`
 * best fine indices — ~(1+q)·√c·d per row instead of c·d.
 *
 * Approximate by construction (a fine cell in an unprobed coarse group is
 * never scored — SimilaritySpec pins the candidate recall floor against
 * the flat scan). Ordering contract matches the flat expression: nearest
 * first by −cos, ties and unscored cells resolved to the SMALLEST fine
 * index, so eval ≡ codegen bit-for-bit and results are partition-order
 * independent.
 */
case class TwoLevelNearestCellIndices(child: Expression,
    coarse: Array[Array[Float]], coarseNorms: Array[Double],
    members: Array[Array[Int]],
    fine: Array[Array[Float]], fineNorms: Array[Double],
    q: Int, p: Int)
    extends UnaryExpression {
  require(q > 0, s"coarse probe count must be positive, got $q")
  require(p > 0, s"fine probe count must be positive, got $p")
  require(coarse.length == members.length,
    s"coarse group count ${coarse.length} != member list count ${members.length}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "two_level_nearest_cell_indices"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${t.sql}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val fineKeys = new Array[Double](fine.length)
    java.util.Arrays.fill(fineKeys, Double.PositiveInfinity)
    val scored = new Array[Boolean](fine.length)
    val coarseKeys = new Array[Double](coarse.length)
    java.util.Arrays.fill(coarseKeys, Double.PositiveInfinity)
    val v = child.eval(input)
    var vnorm = 0.0
    var x: ArrayData = null
    var n = 0
    if (v != null) {
      x = v.asInstanceOf[ArrayData]
      n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) { val f = x.getFloat(i).toDouble; s += f * f; i += 1 }
      vnorm = math.sqrt(s)
      var c = 0
      while (c < coarse.length) {
        val cv = coarse(c)
        val m = math.min(n, cv.length)
        var d = 0.0
        var j = 0
        while (j < m) { d += x.getFloat(j).toDouble * cv(j).toDouble; j += 1 }
        val denom = vnorm * coarseNorms(c)
        if (denom != 0d) {
          val cos = d / denom
          if (!java.lang.Double.isNaN(cos)) coarseKeys(c) = -cos
        }
        c += 1
      }
    }
    // probe the q best coarse groups (ties → smaller group index), scoring
    // their member fine cells; everything else stays +inf/unscored
    val takeG = math.min(q, coarse.length)
    val usedG = new Array[Boolean](coarse.length)
    var r = 0
    while (r < takeG) {
      var best = -1
      var bestKey = 0.0
      var c = 0
      while (c < coarse.length) {
        if (!usedG(c) && (best == -1 || coarseKeys(c) < bestKey)) {
          best = c; bestKey = coarseKeys(c)
        }
        c += 1
      }
      usedG(best) = true
      val mem = members(best)
      var k = 0
      while (k < mem.length) {
        val fi = mem(k)
        scored(fi) = true
        if (x != null) {
          val fv = fine(fi)
          val m = math.min(n, fv.length)
          var d = 0.0
          var j = 0
          while (j < m) { d += x.getFloat(j).toDouble * fv(j).toDouble; j += 1 }
          val denom = vnorm * fineNorms(fi)
          if (denom != 0d) {
            val cos = d / denom
            if (!java.lang.Double.isNaN(cos)) fineKeys(fi) = -cos
          }
        }
        k += 1
      }
      r += 1
    }
    // select the p best SCORED-ELIGIBLE fine cells: among probed members
    // first (by key, ties to smaller index); if fewer than p were probed,
    // fill from unprobed cells in index order — mirrors the flat
    // expression's behavior on null/empty vectors (all-inf keys → index
    // order) so degenerate rows stay deterministic
    val take = math.min(p, fine.length)
    val out = new Array[Int](take)
    val used = new Array[Boolean](fine.length)
    r = 0
    while (r < take) {
      var best = -1
      var bestKey = 0.0
      var bestScored = false
      var c = 0
      while (c < fine.length) {
        if (!used(c)) {
          val better =
            if (best == -1) true
            else if (scored(c) != bestScored) scored(c) // probed beats unprobed
            else if (fineKeys(c) != bestKey) fineKeys(c) < bestKey
            else false // equal key: earlier (smaller) index already won
          if (better) { best = c; bestKey = fineKeys(c); bestScored = scored(c) }
        }
        c += 1
      }
      used(best) = true; out(r) = best; r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gCoarse = ctx.addReferenceObj("tlncCoarse", coarse, "float[][]")
    val gCoarseNorms = ctx.addReferenceObj("tlncCoarseNorms", coarseNorms, "double[]")
    val gMembers = ctx.addReferenceObj("tlncMembers", members, "int[][]")
    val gFine = ctx.addReferenceObj("tlncFine", fine, "float[][]")
    val gFineNorms = ctx.addReferenceObj("tlncFineNorms", fineNorms, "double[]")
    val childGen = child.genCode(ctx)
    val pfx = ctx.freshName("tlnc")
    val value = ctx.freshName("tlncResult")
    val code =
      code"""
         |${childGen.code}
         |double[] ${pfx}FineKeys = new double[$gFine.length];
         |java.util.Arrays.fill(${pfx}FineKeys, Double.POSITIVE_INFINITY);
         |boolean[] ${pfx}Scored = new boolean[$gFine.length];
         |double[] ${pfx}CoarseKeys = new double[$gCoarse.length];
         |java.util.Arrays.fill(${pfx}CoarseKeys, Double.POSITIVE_INFINITY);
         |org.apache.spark.sql.catalyst.util.ArrayData ${pfx}X = null;
         |int ${pfx}N = 0;
         |double ${pfx}Vnorm = 0.0;
         |if (!${childGen.isNull}) {
         |  ${pfx}X = ${childGen.value};
         |  ${pfx}N = ${pfx}X.numElements();
         |  double ${pfx}S = 0.0;
         |  for (int ${pfx}J = 0; ${pfx}J < ${pfx}N; ${pfx}J++) {
         |    double ${pfx}F = (double) ${pfx}X.getFloat(${pfx}J);
         |    ${pfx}S += ${pfx}F * ${pfx}F;
         |  }
         |  ${pfx}Vnorm = java.lang.Math.sqrt(${pfx}S);
         |  for (int ${pfx}C = 0; ${pfx}C < $gCoarse.length; ${pfx}C++) {
         |    float[] ${pfx}Cv = $gCoarse[${pfx}C];
         |    int ${pfx}M = java.lang.Math.min(${pfx}N, ${pfx}Cv.length);
         |    double ${pfx}D = 0.0;
         |    for (int ${pfx}J = 0; ${pfx}J < ${pfx}M; ${pfx}J++) {
         |      ${pfx}D += (double) ${pfx}X.getFloat(${pfx}J) * (double) ${pfx}Cv[${pfx}J];
         |    }
         |    double ${pfx}Denom = ${pfx}Vnorm * $gCoarseNorms[${pfx}C];
         |    if (${pfx}Denom != 0.0) {
         |      double ${pfx}Cos = ${pfx}D / ${pfx}Denom;
         |      if (!Double.isNaN(${pfx}Cos)) ${pfx}CoarseKeys[${pfx}C] = -${pfx}Cos;
         |    }
         |  }
         |}
         |int ${pfx}TakeG = java.lang.Math.min($q, $gCoarse.length);
         |boolean[] ${pfx}UsedG = new boolean[$gCoarse.length];
         |for (int ${pfx}R = 0; ${pfx}R < ${pfx}TakeG; ${pfx}R++) {
         |  int ${pfx}Best = -1;
         |  double ${pfx}BestKey = 0.0;
         |  for (int ${pfx}C = 0; ${pfx}C < $gCoarse.length; ${pfx}C++) {
         |    if (!${pfx}UsedG[${pfx}C] &&
         |        (${pfx}Best == -1 || ${pfx}CoarseKeys[${pfx}C] < ${pfx}BestKey)) {
         |      ${pfx}Best = ${pfx}C; ${pfx}BestKey = ${pfx}CoarseKeys[${pfx}C];
         |    }
         |  }
         |  ${pfx}UsedG[${pfx}Best] = true;
         |  int[] ${pfx}Mem = $gMembers[${pfx}Best];
         |  for (int ${pfx}K = 0; ${pfx}K < ${pfx}Mem.length; ${pfx}K++) {
         |    int ${pfx}Fi = ${pfx}Mem[${pfx}K];
         |    ${pfx}Scored[${pfx}Fi] = true;
         |    if (${pfx}X != null) {
         |      float[] ${pfx}Fv = $gFine[${pfx}Fi];
         |      int ${pfx}M = java.lang.Math.min(${pfx}N, ${pfx}Fv.length);
         |      double ${pfx}D = 0.0;
         |      for (int ${pfx}J = 0; ${pfx}J < ${pfx}M; ${pfx}J++) {
         |        ${pfx}D += (double) ${pfx}X.getFloat(${pfx}J) * (double) ${pfx}Fv[${pfx}J];
         |      }
         |      double ${pfx}Denom = ${pfx}Vnorm * $gFineNorms[${pfx}Fi];
         |      if (${pfx}Denom != 0.0) {
         |        double ${pfx}Cos = ${pfx}D / ${pfx}Denom;
         |        if (!Double.isNaN(${pfx}Cos)) ${pfx}FineKeys[${pfx}Fi] = -${pfx}Cos;
         |      }
         |    }
         |  }
         |}
         |int ${pfx}Take = java.lang.Math.min($p, $gFine.length);
         |int[] ${pfx}Out = new int[${pfx}Take];
         |boolean[] ${pfx}Used = new boolean[$gFine.length];
         |for (int ${pfx}R = 0; ${pfx}R < ${pfx}Take; ${pfx}R++) {
         |  int ${pfx}Best = -1;
         |  double ${pfx}BestKey = 0.0;
         |  boolean ${pfx}BestScored = false;
         |  for (int ${pfx}C = 0; ${pfx}C < $gFine.length; ${pfx}C++) {
         |    if (!${pfx}Used[${pfx}C]) {
         |      boolean ${pfx}Better;
         |      if (${pfx}Best == -1) ${pfx}Better = true;
         |      else if (${pfx}Scored[${pfx}C] != ${pfx}BestScored) ${pfx}Better = ${pfx}Scored[${pfx}C];
         |      else if (${pfx}FineKeys[${pfx}C] != ${pfx}BestKey) ${pfx}Better = ${pfx}FineKeys[${pfx}C] < ${pfx}BestKey;
         |      else ${pfx}Better = false;
         |      if (${pfx}Better) {
         |        ${pfx}Best = ${pfx}C;
         |        ${pfx}BestKey = ${pfx}FineKeys[${pfx}C];
         |        ${pfx}BestScored = ${pfx}Scored[${pfx}C];
         |      }
         |    }
         |  }
         |  ${pfx}Used[${pfx}Best] = true; ${pfx}Out[${pfx}R] = ${pfx}Best;
         |}
         |org.apache.spark.sql.catalyst.util.GenericArrayData $value =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData(${pfx}Out);
       """.stripMargin
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode.variable(
        value, dataType))
  }

  override protected def withNewChildInternal(newChild: Expression): TwoLevelNearestCellIndices =
    copy(child = newChild)
}

/**
 * Residual against a driver-held centroid matrix: out = vec − matrix[idx],
 * element-wise over the common prefix (a vector longer than the centroid
 * keeps its tail unchanged; shorter stays shorter). The encode-side step of
 * residual product quantization — `idx` is expected from
 * [[NearestCentroidIndex]]/[[NearestCentroidIndices]], and an out-of-range
 * index falls back to the unmodified vector (degenerate rows quantize raw
 * rather than crash the stage). NULL vector → NULL; NULL idx → raw vector.
 */
case class ResidualVector(left: Expression, right: Expression,
    centroids: Array[Array[Float]])
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "residual_vector"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT>, INT), got (${l.sql}, ${r.sql})")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) return null
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = x.getFloat(i); i += 1 }
    val idxV = right.eval(input)
    if (idxV != null) {
      val idx = idxV.asInstanceOf[Int]
      if (idx >= 0 && idx < centroids.length) {
        val cv = centroids(idx)
        val m = math.min(n, cv.length)
        var j = 0
        while (j < m) { out(j) -= cv(j); j += 1 }
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("rvCentroids", centroids, "float[][]")
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val (x, n, out, i, cv, m, j, idx) = (
      ctx.freshName("rvX"), ctx.freshName("rvN"), ctx.freshName("rvOut"),
      ctx.freshName("rvI"), ctx.freshName("rvCv"), ctx.freshName("rvM"),
      ctx.freshName("rvJ"), ctx.freshName("rvIdx"))
    val value = ctx.freshName("rvResult")
    val code =
      code"""
         |${leftGen.code}
         |${rightGen.code}
         |boolean ${ev.isNull} = ${leftGen.isNull};
         |org.apache.spark.sql.catalyst.util.GenericArrayData $value = null;
         |if (!${ev.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $x = ${leftGen.value};
         |  int $n = $x.numElements();
         |  float[] $out = new float[$n];
         |  for (int $i = 0; $i < $n; $i++) $out[$i] = $x.getFloat($i);
         |  if (!${rightGen.isNull}) {
         |    int $idx = ${rightGen.value};
         |    if ($idx >= 0 && $idx < $cents.length) {
         |      float[] $cv = $cents[$idx];
         |      int $m = java.lang.Math.min($n, $cv.length);
         |      for (int $j = 0; $j < $m; $j++) $out[$j] -= $cv[$j];
         |    }
         |  }
         |  $value = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    ev.copy(code = code,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode.variable(
        value, dataType))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ResidualVector = copy(left = newLeft, right = newRight)
}

/**
 * Codegen'd sign-bit LSH signature over a driver-held hyperplane tensor:
 * output[t] = Σₚ (vec · planes[t][p] > 0 ? 1L<<p : 0) — one bucket id per
 * hash table, all tables in one pass over the vector.
 *
 * Why an expression and not `tables` × [[FloatDotProduct]] columns: inlining
 * tables·nPlanes hyperplanes as literal-array expression trees generates
 * O(tables·nPlanes·dim) Java source (8 tables × 6 planes × 64 dims ≈ 3k
 * literals) — Janino compilation of that one projection measured ~0.8 s of
 * fixed cost per query at sf0.1, dwarfing the actual row work. Here the
 * tensor rides along as a reference object and the generated code is three
 * tight loops, independent of tables/planes/dim.
 *
 * Bit-exact parity with the composed [[graft.operators.Similarity.lshBucket]]
 * formulation (double-accumulated float dot, strict `> 0` sign test,
 * min-length truncation; NULL vector → all-zero signature, matching
 * `when(null > 0, …).otherwise(0)`) — pinned by SimilaritySpec.
 */
case class LshSignatures(child: Expression, planes: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_signatures"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT>, got ${t.sql}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    val out = new Array[Long](planes.length)
    if (v != null) {
      val x = v.asInstanceOf[ArrayData]
      val n = x.numElements()
      var t = 0
      while (t < planes.length) {
        val tbl = planes(t)
        var sig = 0L
        var p = 0
        while (p < tbl.length) {
          val plane = tbl(p)
          val m = math.min(n, plane.length)
          var d = 0.0
          var j = 0
          while (j < m) { d += x.getFloat(j).toDouble * plane(j).toDouble; j += 1 }
          if (d > 0) sig |= (1L << p)
          p += 1
        }
        out(t) = sig
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tensor = ctx.addReferenceObj("lshPlanes", planes, "float[][][]")
    val childGen = child.genCode(ctx)
    val (out, x, n, t, tbl, sig, p, plane, m, d, j, outData) = (
      ctx.freshName("lshOut"), ctx.freshName("lshX"), ctx.freshName("lshN"),
      ctx.freshName("lshT"), ctx.freshName("lshTbl"), ctx.freshName("lshSig"),
      ctx.freshName("lshP"), ctx.freshName("lshPlane"), ctx.freshName("lshM"),
      ctx.freshName("lshD"), ctx.freshName("lshJ"), ctx.freshName("lshOutData"))
    val code =
      code"""
         |${childGen.code}
         |long[] $out = new long[$tensor.length];
         |if (!${childGen.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $x = ${childGen.value};
         |  int $n = $x.numElements();
         |  for (int $t = 0; $t < $tensor.length; $t++) {
         |    float[][] $tbl = $tensor[$t];
         |    long $sig = 0L;
         |    for (int $p = 0; $p < $tbl.length; $p++) {
         |      float[] $plane = $tbl[$p];
         |      int $m = java.lang.Math.min($n, $plane.length);
         |      double $d = 0.0;
         |      for (int $j = 0; $j < $m; $j++) {
         |        $d += (double) $x.getFloat($j) * (double) $plane[$j];
         |      }
         |      if ($d > 0) { $sig |= (1L << $p); }
         |    }
         |    $out[$t] = $sig;
         |  }
         |}
         |org.apache.spark.sql.catalyst.util.ArrayData $outData =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .variable(outData, dataType))
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignatures =
    copy(child = newChild)
}

object VectorExpressions {

  /** Σ aᵢ·bᵢ in double precision over two ARRAY<FLOAT> columns (codegen'd). */
  def floatDot(a: Column, b: Column): Column =
    Bridge.column(FloatDotProduct(
      Bridge.expression(a), Bridge.expression(b)))

  def floatNorm(a: Column): Column = sqrt(floatDot(a, a))

  /** 0-based argmax-cosine centroid index for an ARRAY<FLOAT> column against
   * a driver-held centroid matrix (see [[NearestCentroidIndex]] for the
   * ordering contract). */
  def nearestCentroidIndex(vec: Column,
      centroids: Array[Array[Float]], norms: Array[Double]): Column =
    Bridge.column(NearestCentroidIndex(Bridge.expression(vec), centroids, norms))

  /** Max cosine of an ARRAY<FLOAT> column against a driver-held centroid
   * matrix, NaN-wins (see [[MaxCosineSim]] for the ordering contract). */
  def maxCosineSim(vec: Column,
      centroids: Array[Array[Float]], norms: Array[Double]): Column =
    Bridge.column(MaxCosineSim(Bridge.expression(vec), centroids, norms))

  /** The p nearest 0-based centroid indices, nearest first (multi-probe —
   * see [[NearestCentroidIndices]] for the ordering contract). */
  def nearestCentroidIndices(vec: Column,
      centroids: Array[Array[Float]], norms: Array[Double], p: Int): Column =
    Bridge.column(NearestCentroidIndices(Bridge.expression(vec), centroids, norms, p))

  /** Coarse→fine multi-probe nearest cells: score √c coarse groups, probe
   * the best q, emit the p best member fine indices (see
   * [[TwoLevelNearestCellIndices]] for cost and ordering contract). */
  def twoLevelNearestCellIndices(vec: Column,
      coarse: Array[Array[Float]], coarseNorms: Array[Double],
      members: Array[Array[Int]],
      fine: Array[Array[Float]], fineNorms: Array[Double],
      q: Int, p: Int): Column =
    Bridge.column(TwoLevelNearestCellIndices(Bridge.expression(vec),
      coarse, coarseNorms, members, fine, fineNorms, q, p))

  /** vec − centroids[idx] element-wise (see [[ResidualVector]]). */
  def residualVector(vec: Column, idx: Column,
      centroids: Array[Array[Float]]): Column =
    Bridge.column(ResidualVector(Bridge.expression(vec), Bridge.expression(idx), centroids))

  /** Per-table sign-bit LSH bucket ids as ARRAY<BIGINT> (see
   * [[LshSignatures]] for the parity contract). */
  def lshSignatures(vec: Column, planes: Array[Array[Array[Float]]]): Column =
    Bridge.column(LshSignatures(Bridge.expression(vec), planes))
}
