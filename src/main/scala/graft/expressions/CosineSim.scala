package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two equal-length
  * `array<float>` columns.
  *
  * This is the hot inner loop of the similarity/dedup operators
  * ([[graft.operators.Similarity]]): the composed form
  * (`aggregate(zip_with(...))`, [[graft.functions.VectorOps.cosine]])
  * is semantically identical but Spark evaluates higher-order-function
  * lambdas interpreted per element; this expression compiles to a tight
  * Java loop inside whole-stage codegen. Preference order per SURVEY §7.3:
  * compose built-ins first, drop to a native `Expression` only for a
  * measured hot path — this is that case.
  *
  * Math is sequential double accumulation, `dot / (√Σa²·√Σb²)`, exactly
  * matching the composed form and DuckDB's `list_cosine_similarity` over
  * `DOUBLE[]`, so differential oracles stay bit-stable. NULL results for:
  * zero-norm inputs, length-mismatched vectors, or a NULL element on
  * either side — the same outcomes the composed `zip_with`/`aggregate`
  * form produces (NULL pads/elements propagate through the lambdas), so
  * [[graft.rules.CosineFusion]] is a true semantics-preserving rewrite.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_cosine requires array<float> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) null else dot / nn
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val nn = ctx.freshName("nn")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  double $na = 0.0;
         |  double $nb = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      double $x = (double) $a.getFloat($i);
         |      double $y = (double) $b.getFloat($i);
         |      $dot += $x * $y;
         |      $na += $x * $x;
         |      $nb += $y * $y;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    double $nn = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    if ($nn == 0.0) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} = $dot / $nn;
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
