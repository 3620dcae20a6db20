package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType,
  DoubleType}

/** Native vector arithmetic for the similarity hot path.
  *
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is semantically a dot
  * product, but Spark's higher-order functions are `CodegenFallback`:
  * every element evaluates a closure through the interpreted expression
  * walker — the innermost loop of every ANN query running ~64× per row
  * per projection. [[DotProduct]] is the brief's next tier (a custom
  * Catalyst `Expression` with `doGenCode`): one fused Java loop inside
  * whole-stage codegen, no per-element closure dispatch, identical
  * IEEE summation order (index order, like the HOF form) so oracle
  * hashes are unchanged.
  *
  * Registered through `SparkSessionExtensions`
  * ([[graft.GraftExtensions]]) for sessions built by
  * [[graft.Session.build]], and idempotently per-session via
  * [[VecOps.ensureRegistered]] so the `SparkEntry.queries` contract
  * (any caller-built session) keeps holding.
  */
object VecOps {

  /** dot(a, b) = Σ a(i)·b(i) over the common prefix, summed in index
    * order. A null ARRAY yields null via the BinaryExpression null
    * contract, and a null ELEMENT in the folded prefix yields null
    * too — matching the `aggregate(zip_with(...))` form this replaces
    * (ArrayData.getDouble would otherwise silently read a zeroed
    * slot). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override def checkInputDataTypes(): TypeCheckResult = {
      def ok(t: DataType) = t match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two array<double> arguments, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

    override def nullable: Boolean = true

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($x.isNullAt($i) || $y.isNullAt($i)) {
           |    ${ev.isNull} = true;
           |    break;
           |  }
           |  $s += $x.getDouble($i) * $y.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  private val name = FunctionIdentifier("vec_dot")
  private def builder(args: Seq[Expression]): Expression = {
    require(args.length == 2, s"vec_dot takes 2 arguments, got ${args.length}")
    DotProduct(args(0), args(1))
  }

  /** Descriptor for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (name, new ExpressionInfo(classOf[DotProduct].getCanonicalName,
      "vec_dot"), builder _)

  /** Register on a caller-built session that didn't go through
    * [[graft.Session.build]]'s extensions. Idempotent. */
  def ensureRegistered(s: SparkSession): Unit = {
    val reg = s.sessionState.functionRegistry
    if (!reg.functionExists(name))
      reg.createOrReplaceTempFunction("vec_dot", builder, "built-in")
  }

  /** Column-level entry point (resolves through the registry). */
  def vecDot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
}
