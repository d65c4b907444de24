package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expressions for physical-layout keys.
  *
  * [[HilbertIndex]] is the codegen form of the Hilbert xy→d transform
  * that `Relational26.withHilbert` expresses as `bits` chained CASE/mask
  * projections (chained there because the oracle must run the SAME
  * dialect-neutral SQL text in DuckDB). At scan time the chained form
  * pays `bits` projection nodes per row; this expression generates ONE
  * tight Java loop inside WholeStageCodegen — the §2.9 scalar-tier
  * ladder (compose built-ins → native Expression) applied to layout
  * clustering. Bit-identical to the SQL chain by construction: same
  * reflect-and-swap rotation, same Gray-code quadrant term, proven
  * equal on the full grid by LayoutExpressionsSpec.
  */
object LayoutExpressions {

  /** hilbert_d(x, y) over a 2^bits × 2^bits grid → curve position in
    * [0, 4^bits). Inputs must already be clamped to the grid; values
    * outside [0, 2^bits) yield an undefined (but non-crashing) index,
    * matching the SQL chain's behavior on the same inputs. */
  case class HilbertIndex(left: Expression, right: Expression, bits: Int)
      extends BinaryExpression {

    require(bits > 0 && bits <= 31, s"hilbert bits out of range: $bits")

    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = {
      def ok(t: DataType) = t == LongType || t == IntegerType
      if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"hilbert_d expects integral (x, y), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    }

    private def n: Long = 1L << bits

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      var hx = a match { case i: Int => i.toLong; case l: Long => l }
      var hy = b match { case i: Int => i.toLong; case l: Long => l }
      var d = 0L
      var s = n >> 1
      while (s > 0) {
        val rx = if ((hx & s) > 0) 1 else 0
        val ry = if ((hy & s) > 0) 1 else 0
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { hx = n - 1 - hx; hy = n - 1 - hy }
          val t = hx; hx = hy; hy = t
        }
        s >>= 1
      }
      d
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val hx = ctx.freshName("hx")
        val hy = ctx.freshName("hy")
        val d = ctx.freshName("d")
        val s = ctx.freshName("s")
        val rx = ctx.freshName("rx")
        val ry = ctx.freshName("ry")
        val t = ctx.freshName("t")
        s"""
           |long $hx = (long) $a;
           |long $hy = (long) $b;
           |long $d = 0L;
           |for (long $s = ${n >> 1}L; $s > 0L; $s >>= 1) {
           |  int $rx = (($hx & $s) > 0L) ? 1 : 0;
           |  int $ry = (($hy & $s) > 0L) ? 1 : 0;
           |  $d += $s * $s * (long) ((3 * $rx) ^ $ry);
           |  if ($ry == 0) {
           |    if ($rx == 1) { $hx = ${n}L - 1L - $hx; $hy = ${n}L - 1L - $hy; }
           |    long $t = $hx; $hx = $hy; $hy = $t;
           |  }
           |}
           |${ev.value} = $d;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): HilbertIndex =
      copy(left = newLeft, right = newRight)
  }

  /** Column-API entry point. */
  def hilbertD(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(
      HilbertIndex(ColumnBridge.expr(x), ColumnBridge.expr(y), bits))
}
