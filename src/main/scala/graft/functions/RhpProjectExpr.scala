package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Johnson–Lindenstrauss random projection to `outDim` dimensions using
  * the SAME deterministic ±1 hyperplane table as [[RhpSignature]]
  * (Achlioptas, "Database-friendly random projections", PODS 2001: ±1
  * entries preserve pairwise distances in expectation like Gaussian
  * planes, and here they make the projection exactly replayable from
  * the hash chain — no stored model). Output j = (Σ_i v_i·h_j[i]) /
  * sqrt(outDim), the scaling that keeps E‖proj‖² = ‖v‖².
  *
  * The pre-ANN compression step of an embedding pipeline: project
  * 1k–4k-dim embeddings to 32–128 dims map-side, then run the LSH /
  * IVF / PQ machinery on the short vectors — at 100 TB the projection
  * is free (multiply-adds inside whole-stage codegen, plane table
  * materialized once per executor) and the downstream index shrinks by
  * dim_out/dim_in. Sign bits of this exact projection are
  * [[RhpSignature]] — the two stay consistent by construction (shared
  * [[RhpPlanes]]).
  */
case class RhpProject(child: Expression, outDim: Int, seed: Int)
    extends UnaryExpression {

  require(outDim >= 1, s"outDim must be >= 1: $outDim")

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rhp_project needs array<float|double>, got ${other.catalogString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val planesHolder = new RhpPlanes(seed, outDim)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val p = planesHolder.planes(n)
    val fl = isFloat
    val scale = math.sqrt(outDim.toDouble)
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
      val row = p(j)
      var s = 0.0
      var i = 0
      while (i < n) {
        val x = if (fl) arr.getFloat(i).toDouble else arr.getDouble(i)
        s += x * row(i)
        i += 1
      }
      out(j) = s / scale
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val planesRef =
      ctx.addReferenceObj("rhpPlanes", new RhpPlanes(seed, outDim),
        classOf[RhpPlanes].getName)
    val get = if (isFloat) "getFloat" else "getDouble"
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val row = ctx.freshName("row")
      val out = ctx.freshName("out")
      val scale = ctx.freshName("scale")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |double[][] $p = $planesRef.planes($n);
         |double $scale = Math.sqrt((double) $outDim);
         |double[] $out = new double[$outDim];
         |for (int $j = 0; $j < $outDim; $j++) {
         |  double[] $row = $p[$j];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ((double) $a.$get($i)) * $row[$i];
         |  }
         |  $out[$j] = $s / $scale;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : RhpProject = copy(child = newChild)
}

object RhpProject {
  def apply(vec: Column, outDim: Int, seed: Int): Column =
    ColumnBridge.column(
      RhpProject(ColumnBridge.expression(vec), outDim, seed))
}
