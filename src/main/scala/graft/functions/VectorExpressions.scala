package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared codegen specialization: when one side of a vector op is a
  * foldable literal (the query vector), bake it into the generated class
  * as a primitive `float[]`. A `typedLit(Array[Float])` otherwise lands as
  * `GenericArrayData` whose `getFloat` unboxes a heap `java.lang.Float`
  * per element — ~10× slower than primitive access in the scan hot loop. */
private[functions] object VecCodegen {
  def literalFloats(e: Expression): Option[Array[Float]] = e match {
    case Literal(v: ArrayData, ArrayType(FloatType, _)) if v != null =>
      Some(v.toFloatArray())
    case _ => None
  }

  /** Generate `ev` as a loop over (child array, literal float[]);
    * `step(arr, ref, i)` yields the Java expression added to the double
    * accumulator, `finish(acc)` the final value expression. */
  def genWithLiteral(ctx: CodegenContext, ev: ExprCode, child: Expression,
                     lit: Array[Float],
                     step: (String, String, String) => String,
                     finish: String => String): ExprCode = {
    val ref = ctx.addReferenceObj("queryVec", lit, "float[]")
    val childGen = child.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      double ${ev.value} = 0.0;
      if (!${ev.isNull}) {
        int $n = java.lang.Math.min(${childGen.value}.numElements(), $ref.length);
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += ${step(childGen.value.toString, ref, i)};
        }
        ${ev.value} = ${finish(acc)};
      }""")
  }
}

/** Native Catalyst expressions for float-vector math.
  *
  * The reference computes inner products / L2 distances inside FAISS
  * (`components/core/index_service.py:84-98`, search at `:205-235`); here the
  * same kernels are whole-stage-codegen Spark expressions over
  * `array<float>` columns, so a brute-force k-NN scan stays inside one
  * codegen stage (no boxing, no UDF serialization).
  *
  * Accumulation is in double precision over float elements, sequentially in
  * index order. The correctness oracles replay this exactly with a strict
  * double `list_reduce` fold (`OracleSqlGen.dotFold`); DuckDB's
  * `list_dot_product` on `FLOAT[]` accumulates in float32 and is used only
  * where the operands are already DOUBLE[] (centroid literals, `__emb`
  * CTEs).
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"

  @transient private lazy val rightLit: Option[Array[Float]] =
    VecCodegen.literalFloats(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    rightLit match {
      case Some(q) =>
        val n = math.min(x.numElements(), q.length)
        var sum = 0.0
        var i = 0
        while (i < n) { sum += x.getFloat(i).toDouble * q(i).toDouble; i += 1 }
        sum
      case None =>
        val y = b.asInstanceOf[ArrayData]
        val n = math.min(x.numElements(), y.numElements())
        var sum = 0.0
        var i = 0
        while (i < n) {
          sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
          i += 1
        }
        sum
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    VecCodegen.literalFloats(right) match {
      case Some(lit) =>
        VecCodegen.genWithLiteral(ctx, ev, left, lit,
          (arr, ref, i) => s"(double)$arr.getFloat($i) * (double)$ref[$i]",
          acc => acc)
      case None =>
        nullSafeCodeGen(ctx, ev, (a, b) => {
          val n = ctx.freshName("n")
          val i = ctx.freshName("i")
          val sum = ctx.freshName("sum")
          s"""
             |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
             |double $sum = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  $sum += (double)$a.getFloat($i) * (double)$b.getFloat($i);
             |}
             |${ev.value} = $sum;
           """.stripMargin
        })
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF32 =
    copy(left = newLeft, right = newRight)
}

/** Squared-L2 / L2 distance between two float vectors (see
  * `components/core/index_service.py:88-90` IndexFlatL2 and the
  * `1/(1+d)` similarity transform at
  * `components/core/search_service.py:336-349`). */
case class L2DistanceF32(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_distance_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      sum += d * d
      i += 1
    }
    math.sqrt(sum)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    VecCodegen.literalFloats(right) match {
      case Some(lit) =>
        VecCodegen.genWithLiteral(ctx, ev, left, lit,
          (arr, ref, i) =>
            s"((double)$arr.getFloat($i) - (double)$ref[$i]) * ((double)$arr.getFloat($i) - (double)$ref[$i])",
          acc => s"java.lang.Math.sqrt($acc)")
      case None =>
        nullSafeCodeGen(ctx, ev, (a, b) => {
          val n = ctx.freshName("n")
          val i = ctx.freshName("i")
          val sum = ctx.freshName("sum")
          val d = ctx.freshName("d")
          s"""
             |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
             |double $sum = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  double $d = (double)$a.getFloat($i) - (double)$b.getFloat($i);
             |  $sum += $d * $d;
             |}
             |${ev.value} = java.lang.Math.sqrt($sum);
           """.stripMargin
        })
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistanceF32 =
    copy(left = newLeft, right = newRight)
}

/** Manhattan (L1) distance in double over float elements, sequential
  * index order — FAISS `METRIC_L1` (faiss/utils/extra_distances.h). The
  * oracle replays it as a strict double fold over `abs` terms. */
case class L1DistanceF32(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l1_distance_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += math.abs(x.getFloat(i).toDouble - y.getFloat(i).toDouble)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += java.lang.Math.abs((double)$a.getFloat($i) - (double)$b.getFloat($i));
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L1DistanceF32 =
    copy(left = newLeft, right = newRight)
}

/** Chebyshev (L∞) distance — FAISS `METRIC_Linf`. Max of absolute
  * per-dimension gaps: exact and order-independent (max is associative
  * over exact `abs` terms), so the oracle replays it as `list_max`. */
case class LinfDistanceF32(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "linf_distance_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var m = 0.0
    var i = 0
    while (i < n) {
      val d = math.abs(x.getFloat(i).toDouble - y.getFloat(i).toDouble)
      if (d > m) m = d
      i += 1
    }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = java.lang.Math.abs((double)$a.getFloat($i) - (double)$b.getFloat($i));
         |  if ($d > $m) $m = $d;
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LinfDistanceF32 =
    copy(left = newLeft, right = newRight)
}

/** L2-normalize a float vector — the reference normalizes at encode time so
  * inner product == cosine (`components/core/embedding_service.py:92-102`).
  * Used at ingest (not the per-query hot path), so interpreted eval via
  * CodegenFallback is fine. Zero vectors pass through unchanged. */
case class L2NormalizeF32(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "l2_normalize_f32"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; sum += v * v; i += 1 }
    val norm = math.sqrt(sum)
    val out = new Array[Float](n)
    i = 0
    if (norm > 0) {
      while (i < n) { out(i) = (x.getFloat(i).toDouble / norm).toFloat; i += 1 }
    } else {
      while (i < n) { out(i) = x.getFloat(i); i += 1 }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): L2NormalizeF32 =
    copy(child = newChild)
}

/** Nearest-centroid assignment for IVF cells: argmin over squared L2
  * distance to a (foldable) `array<array<double>>` centroid literal, ties
  * to the lowest cell index. Distances accumulate sequentially in double —
  * deliberately NOT MLlib's norm-based `fastSquaredDistance`, so a SQL
  * oracle's naive `(x-c)^2` sum is bit-for-bit identical and assignment
  * can never diverge on a near-tie. Codegen bakes the centroids in as a
  * primitive `double[][]`, keeping the scan one whole-stage loop. */
case class NearestCentroidF32(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid_f32"

  @transient private lazy val cents: Array[Array[Double]] = right match {
    case Literal(v: ArrayData, ArrayType(ArrayType(DoubleType, _), _)) if v != null =>
      v.toObjectArray(ArrayType(DoubleType))
        .map(_.asInstanceOf[ArrayData].toDoubleArray())
    case other =>
      throw new IllegalArgumentException(
        s"nearest_centroid_f32 needs a foldable array<array<double>> centroid literal, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(x.numElements(), c.length)
      var d2 = 0.0
      var i = 0
      while (i < n) {
        val d = x.getFloat(i).toDouble - c(i)
        d2 += d * d
        i += 1
      }
      if (d2 < bestD) { bestD = d2; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", cents, "double[][]")
    val childGen = left.genCode(ctx)
    val j = ctx.freshName("j")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val d = ctx.freshName("d")
    val d2 = ctx.freshName("d2")
    val best = ctx.freshName("best")
    val bestD = ctx.freshName("bestD")
    val c = ctx.freshName("c")
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = ${childGen.isNull};
      int ${ev.value} = 0;
      if (!${ev.isNull}) {
        int $best = 0;
        double $bestD = Double.MAX_VALUE;
        for (int $j = 0; $j < $ref.length; $j++) {
          double[] $c = $ref[$j];
          int $n = java.lang.Math.min(${childGen.value}.numElements(), $c.length);
          double $d2 = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $d = (double)${childGen.value}.getFloat($i) - $c[$i];
            $d2 += $d * $d;
          }
          if ($d2 < $bestD) { $bestD = $d2; $best = $j; }
        }
        ${ev.value} = $best;
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidF32 =
    copy(left = newLeft, right = newRight)
}

/** Per-row IVF residual: `float(double(x_i) − centroids[cell][i])` for a
  * float vector against its assigned cell's centroid (the IVFADC encode
  * input, FAISS `compute_residual`). Semantically identical to
  * `zip_with(emb, element_at(centLit, cell+1), (x, c) => (x.cast(double)
  * − c).cast(float))` — but `zip_with` is a higher-order function, which
  * Catalyst evaluates interpreted (lambda dispatch per element, boxed
  * rows) and which fences the surrounding whole-stage-codegen span. This
  * form keeps the corpus-wide encode projection (assign → residual →
  * `m` sub-quantizer argmins) inside ONE codegen stage: the centroid
  * table is baked into the generated class as a primitive `double[][]`
  * and the output is built as a primitive `float[]`.
  *
  * `cell` must be a valid index into the centroid table (it comes from
  * [[NearestCentroidF32]]); an out-of-range cell throws, same as the
  * ANSI `element_at` it replaces. */
case class ResidualF32(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "residual_f32"

  @transient private lazy val cents: Array[Array[Double]] = second match {
    case Literal(v: ArrayData, ArrayType(ArrayType(DoubleType, _), _)) if v != null =>
      v.toObjectArray(ArrayType(DoubleType))
        .map(_.asInstanceOf[ArrayData].toDoubleArray())
    case other =>
      throw new IllegalArgumentException(
        s"residual_f32 needs a foldable array<array<double>> centroid literal, got $other")
  }

  override def nullSafeEval(a: Any, b: Any, cell: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val c = cents(cell.asInstanceOf[Int])
    val n = math.min(x.numElements(), c.length)
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = (x.getFloat(i).toDouble - c(i)).toFloat
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", cents, "double[][]")
    val embGen = first.genCode(ctx)
    val cellGen = third.genCode(ctx)
    val c = ctx.freshName("c")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val out = ctx.freshName("out")
    ev.copy(code = code"""
      ${embGen.code}
      ${cellGen.code}
      boolean ${ev.isNull} = ${embGen.isNull} || ${cellGen.isNull};
      ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        double[] $c = $ref[${cellGen.value}];
        int $n = java.lang.Math.min(${embGen.value}.numElements(), $c.length);
        float[] $out = new float[$n];
        for (int $i = 0; $i < $n; $i++) {
          $out[$i] = (float)((double)${embGen.value}.getFloat($i) - $c[$i]);
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      }""")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): ResidualF32 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Asymmetric-distance accumulation over a code word: `Σ_i lut[i][codes[i]]`
  * with the per-query lookup table baked into the generated class as a
  * primitive `double[][]`. One expression serves every product/scalar
  * quantizer search in the engine:
  *
  *  - PQ ADC (FAISS IndexPQ): `lut` is m × ksub — query-slice → centroid
  *    distances ([[graft.operators.PqIndex.adcLut]]).
  *  - SQ8 (FAISS IndexScalarQuantizer): `lut` is dim × 256 — per-dim
  *    `q_i · reconstruct(code)` terms; scalar quantization IS product
  *    quantization with dsub=1, and sharing the kernel keeps both scans
  *    in one whole-stage-codegen span.
  *
  * Accumulates sequentially in index order (left-assoc double adds), the
  * cross-engine-stable order the DuckDB oracles replay. Codes outside
  * `[0, lut(i).length)` throw, same as the ANSI `element_at` chain this
  * replaces. */
case class AdcLut(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_lut"

  @transient private lazy val lut: Array[Array[Double]] = right match {
    case Literal(v: ArrayData, ArrayType(ArrayType(DoubleType, _), _)) if v != null =>
      v.toObjectArray(ArrayType(DoubleType))
        .map(_.asInstanceOf[ArrayData].toDoubleArray())
    case other =>
      throw new IllegalArgumentException(
        s"adc_lut needs a foldable array<array<double>> table literal, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val n = math.min(codes.numElements(), lut.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += lut(i)(codes.getInt(i)); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcLut", lut, "double[][]")
    val codesGen = left.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    ev.copy(code = code"""
      ${codesGen.code}
      boolean ${ev.isNull} = ${codesGen.isNull};
      double ${ev.value} = 0.0;
      if (!${ev.isNull}) {
        int $n = java.lang.Math.min(${codesGen.value}.numElements(), $ref.length);
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += $ref[$i][${codesGen.value}.getInt($i)];
        }
        ${ev.value} = $acc;
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLut =
    copy(left = newLeft, right = newRight)
}

/** [[AdcLut]] with per-cell tables — the IVFADC scan kernel: each row
  * accumulates against its coarse cell's query-residual LUT,
  * `Σ_s luts[cell][s][codes[s]]`. The table literal is indexed BY
  * cell id with empty entries for unprobed cells (the scan's
  * `cell_id IN (probed)` filter guarantees they are never touched);
  * nlist pointers of overhead, only nprobe tables populated. Replaces a
  * per-row map-literal probe + nested generic `element_at` chain with
  * primitive `double[][][]` indexing inside whole-stage codegen. */
case class AdcLutCells(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_lut_cells"

  @transient private lazy val luts: Array[Array[Array[Double]]] = third match {
    case Literal(v: ArrayData, ArrayType(ArrayType(ArrayType(DoubleType, _), _), _))
        if v != null =>
      v.toObjectArray(ArrayType(ArrayType(DoubleType)))
        .map(_.asInstanceOf[ArrayData].toObjectArray(ArrayType(DoubleType))
          .map(_.asInstanceOf[ArrayData].toDoubleArray()))
    case other =>
      throw new IllegalArgumentException(
        s"adc_lut_cells needs a foldable array<array<array<double>>> literal, got $other")
  }

  override def nullSafeEval(a: Any, cell: Any, c: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = luts(cell.asInstanceOf[Int])
    val n = math.min(codes.numElements(), lut.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += lut(i)(codes.getInt(i)); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cellLuts", luts, "double[][][]")
    val codesGen = first.genCode(ctx)
    val cellGen = second.genCode(ctx)
    val lut = ctx.freshName("lut")
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    ev.copy(code = code"""
      ${codesGen.code}
      ${cellGen.code}
      boolean ${ev.isNull} = ${codesGen.isNull} || ${cellGen.isNull};
      double ${ev.value} = 0.0;
      if (!${ev.isNull}) {
        double[][] $lut = $ref[${cellGen.value}];
        int $n = java.lang.Math.min(${codesGen.value}.numElements(), $lut.length);
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += $lut[$i][${codesGen.value}.getInt($i)];
        }
        ${ev.value} = $acc;
      }""")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): AdcLutCells =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** 8-bit scalar quantization (FAISS IndexScalarQuantizer, QT_8bit):
  * `code_i = clamp(floor((x_i − vmin_i) / step_i + 0.5), 0, 255)` per
  * dimension, with per-dim affine bounds trained from the corpus
  * ([[graft.operators.SqIndex]]). `floor(t + 0.5)` instead of a rounding
  * mode: it is the one formulation Java, Spark SQL, and DuckDB evaluate
  * identically, so the oracle can replay encode bit-for-bit. A zero-width
  * dimension (step 0) encodes as 0 and reconstructs to `vmin`. */
case class Sq8EncodeF32(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sq8_encode_f32"

  @transient private lazy val (vmin: Array[Double], step: Array[Double]) = {
    def parse(e: Expression, what: String): Array[Double] = e match {
      case Literal(v: ArrayData, ArrayType(DoubleType, _)) if v != null =>
        v.toDoubleArray()
      case other => throw new IllegalArgumentException(
        s"sq8_encode_f32 needs a foldable array<double> $what literal, got $other")
    }
    (parse(second, "vmin"), parse(third, "step"))
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), vmin.length)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (step(i) == 0.0) 0
        else {
          val t = math.floor((x.getFloat(i).toDouble - vmin(i)) / step(i) + 0.5)
          if (t < 0.0) 0 else if (t > 255.0) 255 else t.toInt
        }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vminRef = ctx.addReferenceObj("sqVmin", vmin, "double[]")
    val stepRef = ctx.addReferenceObj("sqStep", step, "double[]")
    val embGen = first.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val t = ctx.freshName("t")
    val out = ctx.freshName("out")
    ev.copy(code = code"""
      ${embGen.code}
      boolean ${ev.isNull} = ${embGen.isNull};
      ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        int $n = java.lang.Math.min(${embGen.value}.numElements(), $vminRef.length);
        int[] $out = new int[$n];
        for (int $i = 0; $i < $n; $i++) {
          if ($stepRef[$i] == 0.0) { $out[$i] = 0; } else {
            double $t = java.lang.Math.floor(
              ((double)${embGen.value}.getFloat($i) - $vminRef[$i]) / $stepRef[$i] + 0.5);
            $out[$i] = $t < 0.0 ? 0 : ($t > 255.0 ? 255 : (int)$t);
          }
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      }""")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Sq8EncodeF32 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** 4-bit scalar-quantizer encode with nibble packing — FAISS
  * `ScalarQuantizer` QT_4bit (faiss/impl/ScalarQuantizer.cpp), the 8×
  * compression point of the family (float32 → SQ8 4× → SQ4 8× → PQ8
  * 32×): per-dim affine code `clamp(⌊(x−vmin)/step + 0.5⌋, 0, 15)`
  * against trained bounds (`step = (vmax−vmin)/15`), and TWO codes
  * packed per output int (`out[j] = c_{2j}·16 + c_{2j+1}`, odd tail's
  * low nibble 0) — so the at-rest code row is ⌈d/2⌉ small ints, half of
  * SQ8's, and the [[AdcLut]] scan reads one packed byte per PAIR of
  * dims (a 256-entry paired LUT per position; see
  * `SqIndex.reconDotLut4`).
  *
  * One codegen kernel for encode+pack (vs `sq8_encode_f32` → a packing
  * HOF) for the family's standing reason: encode runs corpus-wide at
  * ingest and in the streaming leg, and a `transform` lambda there
  * fences whole-stage codegen. Bounds bake into the generated class as
  * primitive `double[]`. Untrained corpora take the all-zero-codes
  * contract via `SqIndex.encode4`, not this kernel. */
case class Sq4EncodePackedF32(first: Expression, second: Expression,
                              third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sq4_encode_packed_f32"

  @transient private lazy val (vmin: Array[Double], step: Array[Double]) = {
    def parse(e: Expression, what: String): Array[Double] = e match {
      case Literal(v: ArrayData, ArrayType(DoubleType, _)) if v != null =>
        v.toDoubleArray()
      case other => throw new IllegalArgumentException(
        s"sq4_encode_packed_f32 needs a foldable array<double> $what literal, got $other")
    }
    (parse(second, "vmin"), parse(third, "step"))
  }

  private def codeAt(x: ArrayData, i: Int): Int =
    if (step(i) == 0.0) 0
    else {
      val t = math.floor((x.getFloat(i).toDouble - vmin(i)) / step(i) + 0.5)
      if (t < 0.0) 0 else if (t > 15.0) 15 else t.toInt
    }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), vmin.length)
    val out = new Array[Int]((n + 1) / 2)
    var j = 0
    while (j < out.length) {
      val hi = codeAt(x, 2 * j)
      val lo = if (2 * j + 1 < n) codeAt(x, 2 * j + 1) else 0
      out(j) = hi * 16 + lo
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vminRef = ctx.addReferenceObj("sq4Vmin", vmin, "double[]")
    val stepRef = ctx.addReferenceObj("sq4Step", step, "double[]")
    val embGen = first.genCode(ctx)
    val n = ctx.freshName("n")
    val j = ctx.freshName("j")
    val d = ctx.freshName("d")
    val t = ctx.freshName("t")
    val hi = ctx.freshName("hi")
    val lo = ctx.freshName("lo")
    val out = ctx.freshName("out")
    // One helper call per dim keeps the generated method under the JIT
    // inline budget at any d (the PcaProjectF32 posture).
    val codeFn = ctx.freshName("sq4Code")
    ctx.addNewFunction(codeFn,
      s"""private int $codeFn(ArrayData x, int $d) {
         |  if ($stepRef[$d] == 0.0) return 0;
         |  double $t = java.lang.Math.floor(
         |    ((double)x.getFloat($d) - $vminRef[$d]) / $stepRef[$d] + 0.5);
         |  return $t < 0.0 ? 0 : ($t > 15.0 ? 15 : (int)$t);
         |}""".stripMargin)
    ev.copy(code = code"""
      ${embGen.code}
      boolean ${ev.isNull} = ${embGen.isNull};
      ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        int $n = java.lang.Math.min(${embGen.value}.numElements(), $vminRef.length);
        int[] $out = new int[($n + 1) / 2];
        for (int $j = 0; $j < $out.length; $j++) {
          int $hi = $codeFn(${embGen.value}, 2 * $j);
          int $lo = 2 * $j + 1 < $n ? $codeFn(${embGen.value}, 2 * $j + 1) : 0;
          $out[$j] = $hi * 16 + $lo;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      }""")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Sq4EncodePackedF32 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** PCA projection of a float vector against trained (mean, components)
  * literals — FAISS `PCAMatrix::apply` (faiss/VectorTransform.cpp):
  * `y_j = float( Σ_i comps[j][i] · (x_i − mean[i]) )`, components rows in
  * descending-eigenvalue order. The per-output-dim accumulation is a
  * sequential double left fold over input dims — the order the generated
  * DuckDB oracle replays with `list_reduce`, so the float cast lands on
  * a bit-identical double on both engines.
  *
  * A dedicated codegen kernel (vs composing `aggregate`/`transform`
  * HOFs) for the same reason as [[ResidualF32]]: HOFs evaluate
  * interpreted and fence whole-stage codegen, and this projection runs
  * corpus-wide at ingest — the matrix is baked into the generated class
  * as primitive `double[][]`. */
case class PcaProjectF32(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pca_project_f32"

  @transient private lazy val mean: Array[Double] = second match {
    case Literal(v: ArrayData, ArrayType(DoubleType, _)) if v != null =>
      v.toDoubleArray()
    case other => throw new IllegalArgumentException(
      s"pca_project_f32 needs a foldable array<double> mean literal, got $other")
  }

  @transient private lazy val comps: Array[Array[Double]] = third match {
    case Literal(v: ArrayData, ArrayType(ArrayType(DoubleType, _), _)) if v != null =>
      v.toObjectArray(ArrayType(DoubleType))
        .map(_.asInstanceOf[ArrayData].toDoubleArray())
    case other => throw new IllegalArgumentException(
      s"pca_project_f32 needs a foldable array<array<double>> components literal, got $other")
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val out = new Array[Float](comps.length)
    var j = 0
    while (j < comps.length) {
      val row = comps(j)
      val n = math.min(math.min(x.numElements(), row.length), mean.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += row(i) * (x.getFloat(i).toDouble - mean(i)); i += 1 }
      out(j) = acc.toFloat
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meanRef = ctx.addReferenceObj("pcaMean", mean, "double[]")
    val compRef = ctx.addReferenceObj("pcaComps", comps, "double[][]")
    val embGen = first.genCode(ctx)
    val j = ctx.freshName("j")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val acc = ctx.freshName("acc")
    val row = ctx.freshName("row")
    val out = ctx.freshName("out")
    ev.copy(code = code"""
      ${embGen.code}
      boolean ${ev.isNull} = ${embGen.isNull};
      ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        float[] $out = new float[$compRef.length];
        for (int $j = 0; $j < $compRef.length; $j++) {
          double[] $row = $compRef[$j];
          int $n = java.lang.Math.min(
            java.lang.Math.min(${embGen.value}.numElements(), $row.length),
            $meanRef.length);
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += $row[$i] * ((double)${embGen.value}.getFloat($i) - $meanRef[$i]);
          }
          $out[$j] = (float)$acc;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray($out);
      }""")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PcaProjectF32 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Sign-binarize a float vector into a packed binary code of ⌈d/64⌉
  * 64-bit words: bit `i % 64` of word `i / 64` is set iff `vec(i) > 0`.
  * This is the FAISS `IndexLSH` binarization with the default zero
  * thresholds and no rotation (faiss/IndexLSH.cpp `fvecs2bitvecs`),
  * producing the input representation of the binary index family
  * (`IndexBinaryFlat`), which packs ALL d bits (d/8 bytes per code —
  * the reference's 768-d vectors become 12 words = 96 B against 3 KB of
  * floats, the same 32× scan-size reduction at any dimension).
  *
  * Hamming distance between two codes is the summed per-word
  * `Long.bitCount(a ^ b)` — the [[HammingWords]] kernel.
  */
case class SignPackF32(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_pack"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val words = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (x.getFloat(i) > 0f) words(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val words = ctx.freshName("words")
      s"""
         |int $n = $a.numElements();
         |long[] $words = new long[($n + 63) >>> 6];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getFloat($i) > 0f) $words[$i >>> 6] |= (1L << ($i & 63));
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($words);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignPackF32 =
    copy(child = newChild)
}

/** Hamming distance between two multi-word binary codes
  * (`array<bigint>` from [[SignPackF32]]): summed `Long.bitCount(a ^ b)`
  * per word, with the shorter code zero-extended (a missing word
  * contributes the longer code's set bits — the sign pattern of absent
  * dims vs present ones). The query side of a scan is a foldable
  * literal, baked into the generated class as a primitive `long[]` (the
  * [[VecCodegen]] posture — `GenericArrayData.getLong` boxing would
  * dominate an 8–96 B/row kernel).
  */
case class HammingWords(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hamming_words"

  @transient private lazy val rightLit: Option[Array[Long]] = right match {
    case Literal(v: ArrayData, ArrayType(LongType, _)) if v != null =>
      Some(v.toLongArray())
    case _ => None
  }

  private def dist(x: ArrayData, nx: Int, q: Array[Long]): Long = {
    var d = 0L
    var i = 0
    val shared = math.min(nx, q.length)
    while (i < shared) { d += java.lang.Long.bitCount(x.getLong(i) ^ q(i)); i += 1 }
    while (i < nx) { d += java.lang.Long.bitCount(x.getLong(i)); i += 1 }
    while (i < q.length) { d += java.lang.Long.bitCount(q(i)); i += 1 }
    d
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    rightLit match {
      case Some(q) => dist(x, x.numElements(), q)
      case None =>
        // no toLongArray copy: read both sides element-wise
        val y = b.asInstanceOf[ArrayData]
        val nx = x.numElements()
        val ny = y.numElements()
        val shared = math.min(nx, ny)
        var d = 0L
        var i = 0
        while (i < shared) {
          d += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1
        }
        while (i < nx) { d += java.lang.Long.bitCount(x.getLong(i)); i += 1 }
        while (i < ny) { d += java.lang.Long.bitCount(y.getLong(i)); i += 1 }
        d
    }
  }

  /** `get(arr, i)` yields the i-th word as a Java expression — a baked
    * `long[]` index on the literal path, `ArrayData.getLong` on the
    * column path (NO per-row array copy: the batch scan evaluates this
    * n_queries × n_corpus times). */
  private def genLoop(a: String, bLen: String, getB: String => String,
                      ctx: CodegenContext): (String, String) = {
    val n = ctx.freshName("n")
    val shared = ctx.freshName("shared")
    val i = ctx.freshName("i")
    val d = ctx.freshName("d")
    (s"""
        |int $n = $a.numElements();
        |int $shared = java.lang.Math.min($n, $bLen);
        |long $d = 0L;
        |int $i = 0;
        |for (; $i < $shared; $i++) {
        |  $d += java.lang.Long.bitCount($a.getLong($i) ^ ${getB(i)});
        |}
        |for (; $i < $n; $i++) { $d += java.lang.Long.bitCount($a.getLong($i)); }
        |for (; $i < $bLen; $i++) { $d += java.lang.Long.bitCount(${getB(i)}); }
     """.stripMargin, d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    rightLit match {
      case Some(q) =>
        val ref = ctx.addReferenceObj("queryCode", q, "long[]")
        nullSafeCodeGen(ctx, ev, (a, _) => {
          val (loop, d) = genLoop(a, s"$ref.length", i => s"$ref[$i]", ctx)
          s"$loop\n${ev.value} = $d;"
        })
      case None =>
        nullSafeCodeGen(ctx, ev, (a, b) => {
          val (loop, d) = genLoop(a, s"$b.numElements()", i => s"$b.getLong($i)", ctx)
          s"$loop\n${ev.value} = $d;"
        })
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingWords =
    copy(left = newLeft, right = newRight)
}

/** Euclidean norm of a float vector. */
case class NormF32(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "norm_f32"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; sum += v * v; i += 1 }
    math.sqrt(sum)
  }

  override protected def withNewChildInternal(newChild: Expression): NormF32 =
    copy(child = newChild)
}

/** Route a float vector through a perfect binary tree of hyperplane
  * splits to its leaf index (the RP-forest / Annoy assignment kernel,
  * [[graft.operators.RpForest]]). `second` is the heap-ordered plane
  * table (node i at index i−1, children 2i/2i+1; `array<array<double>>`
  * literal), `third` the matching thresholds. At node i the side is
  * `Σ_j double(x_j)·w_j ≥ θ_i` — the dot accumulates sequentially in
  * double (the `dot_f32` order the oracles replay with the strict
  * fold); ties go right. Returns the leaf ordinal in [0, 2^depth).
  *
  * Whole-tree routing in ONE codegen expression keeps the corpus-wide
  * ingest projection (route per tree → assignment row) inside a single
  * whole-stage span with the planes baked in as primitive `double[][]` —
  * depth narrow-map work per row, no shuffle, the property that makes
  * tree indexing an ingest-time O(depth) scan at 100 TB. */
case class TreeRouteF32(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "tree_route_f32"

  @transient private lazy val planes: Array[Array[Double]] = second match {
    case Literal(v: ArrayData, ArrayType(ArrayType(DoubleType, _), _)) if v != null =>
      v.toObjectArray(ArrayType(DoubleType))
        .map(_.asInstanceOf[ArrayData].toDoubleArray())
    case other =>
      throw new IllegalArgumentException(
        s"tree_route_f32 needs a foldable array<array<double>> plane literal, got $other")
  }

  @transient private lazy val thetas: Array[Double] = third match {
    case Literal(v: ArrayData, ArrayType(DoubleType, _)) if v != null =>
      v.toDoubleArray()
    case other =>
      throw new IllegalArgumentException(
        s"tree_route_f32 needs a foldable array<double> threshold literal, got $other")
  }

  // planes.length = 2^depth − 1 for a complete tree
  @transient private lazy val depth: Int = {
    require(planes.length == thetas.length,
      s"plane/threshold size mismatch: ${planes.length} vs ${thetas.length}")
    val d = java.lang.Integer.numberOfTrailingZeros(planes.length + 1)
    require((1 << d) - 1 == planes.length,
      s"tree_route_f32 needs a complete heap (2^d - 1 splits), got ${planes.length}")
    d
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var node = 1
    var lvl = 0
    while (lvl < depth) {
      val w = planes(node - 1)
      val n = math.min(x.numElements(), w.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getFloat(i).toDouble * w(i); i += 1 }
      node = 2 * node + (if (s >= thetas(node - 1)) 1 else 0)
      lvl += 1
    }
    node - (1 << depth)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("planes", planes, "double[][]")
    val t = ctx.addReferenceObj("thetas", thetas, "double[]")
    val embGen = first.genCode(ctx)
    val node = ctx.freshName("node")
    val lvl = ctx.freshName("lvl")
    val w = ctx.freshName("w")
    val n = ctx.freshName("n")
    val s = ctx.freshName("s")
    val i = ctx.freshName("i")
    val d = depth // force validation at codegen time
    ev.copy(code = code"""
      ${embGen.code}
      boolean ${ev.isNull} = ${embGen.isNull};
      int ${ev.value} = 0;
      if (!${ev.isNull}) {
        int $node = 1;
        for (int $lvl = 0; $lvl < $d; $lvl++) {
          double[] $w = $p[$node - 1];
          int $n = java.lang.Math.min(${embGen.value}.numElements(), $w.length);
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $s += (double)${embGen.value}.getFloat($i) * $w[$i];
          }
          $node = 2 * $node + (($s >= $t[$node - 1]) ? 1 : 0);
        }
        ${ev.value} = $node - ${1 << d};
      }""")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): TreeRouteF32 =
    copy(first = newFirst, second = newSecond, third = newThird)
}
