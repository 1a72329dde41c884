package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the openGemini IP scalar functions
  * (`query/string_functions.go` registry; SURVEY §2.8).
  *
  * Why expressions and not column math: the pure-Column spelling of
  * these functions (split + guarded casts + bit ops) is semantically
  * fine but expands to a HUGE tree once a query composes them —
  * `ip_subnet_min(ip_prefix(ip, 16))` inlines the whole prefix tree
  * into the subnet tree after CollapseProject, and q38's five-function
  * projection weighed in at ~16 ms of task DESERIALIZATION per task
  * plus an outsized codegen unit. Each of these is ONE tree node whose
  * codegen is a single static call; eval delegates to the same Scala
  * closures the SQL UDF surface used (`GeminiFunctions.ipMask` etc.),
  * so values are identical by construction.
  *
  * Null semantics match the UDFs: null/malformed input → null result.
  */
object IpOps {
  import graft.functions.GeminiFunctions._

  private def u(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)

  def mask(ip: UTF8String, prefix: Int): UTF8String =
    u(ipMask(ip.toString, prefix))
  def prefix(ip: UTF8String, prefixLen: Int): UTF8String =
    u(ipPrefix(ip.toString, prefixLen))
  def subnetMin(cidr: UTF8String): UTF8String = u(ipSubnetMin(cidr.toString))
  def subnetMax(cidr: UTF8String): UTF8String = u(ipSubnetMax(cidr.toString))
  def subnetRange(cidr: UTF8String): UTF8String =
    u(ipSubnetRange(cidr.toString))
  def toDomain(ip: UTF8String): UTF8String = u(ipToDomain(ip.toString))
  /** boxed: null when either side is malformed (the UDF contract). */
  def subnetOf(cidr: UTF8String, ip: UTF8String): java.lang.Boolean =
    isSubnetOf(cidr.toString, ip.toString)
}

/** (string ip, int prefix) → string; `slash` selects ip_prefix's
  * "<net>/<p>" rendering over ip_mask's bare network. */
case class IpMaskExpr(left: Expression, right: Expression, slash: Boolean)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && (right.dataType == IntegerType ||
        right.dataType == LongType || right.dataType == ShortType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ip_mask/ip_prefix expects (string, int), got " +
        s"${left.dataType}, ${right.dataType}")
  private def fn: String = if (slash) "prefix" else "mask"
  override def nullSafeEval(ip: Any, p: Any): Any =
    if (slash) IpOps.prefix(ip.asInstanceOf[UTF8String],
      p.asInstanceOf[Number].intValue)
    else IpOps.mask(ip.asInstanceOf[UTF8String],
      p.asInstanceOf[Number].intValue)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.expressions.IpOps.$fn($a, (int) $b);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** (string cidr) → string; one of subnetMin/subnetMax/subnetRange/
  * toDomain selected by `fn` (all share the unary string→string shape). */
case class IpUnaryExpr(child: Expression, fn: String)
    extends UnaryExpression {
  require(Set("subnetMin", "subnetMax", "subnetRange", "toDomain")(fn))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ip $fn expects a string, got ${child.dataType}")
  override def nullSafeEval(c: Any): Any = fn match {
    case "subnetMin" => IpOps.subnetMin(c.asInstanceOf[UTF8String])
    case "subnetMax" => IpOps.subnetMax(c.asInstanceOf[UTF8String])
    case "subnetRange" => IpOps.subnetRange(c.asInstanceOf[UTF8String])
    case "toDomain" => IpOps.toDomain(c.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.expressions.IpOps.$fn($a);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (string cidr, string ip) → boolean — is_subnet_of / ip_in_range. */
case class IpSubnetOfExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"is_subnet_of expects (string, string), got " +
        s"${left.dataType}, ${right.dataType}")
  override def nullSafeEval(cidr: Any, ip: Any): Any = {
    val r = IpOps.subnetOf(cidr.asInstanceOf[UTF8String],
      ip.asInstanceOf[UTF8String])
    if (r == null) null else r.booleanValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("boxed")
      s"""
      java.lang.Boolean $boxed = graft.expressions.IpOps.subnetOf($a, $b);
      ${ev.isNull} = $boxed == null;
      ${ev.value} = $boxed == null ? false : $boxed.booleanValue();
    """
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
