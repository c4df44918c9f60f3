package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F5 percent-encoding, the GENERAL form: keep the RFC-3986 unreserved
  * set `[A-Za-z0-9._~-]`, encode every other UTF-8 BYTE as uppercase
  * %XX — multi-byte characters encode per byte
  * (/root/reference/src/util/URLHelper.cpp:75-91). One pass over the
  * bytes inside whole-stage codegen; no regex, no UDF. */
object UrlCodec {
  private val hexDigits = "0123456789ABCDEF".toCharArray
  private val unreserved: Array[Boolean] = {
    val a = new Array[Boolean](128)
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('.', '_', '~', '-'))
      .foreach(c => a(c) = true)
    a
  }

  /** Static form called from generated code. */
  def encode(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val sb = new java.lang.StringBuilder(bytes.length * 3)
    var i = 0
    while (i < bytes.length) {
      val ub = bytes(i) & 0xFF
      if (ub < 128 && unreserved(ub)) sb.append(ub.toChar)
      else sb.append('%').append(hexDigits(ub >> 4)).append(hexDigits(ub & 0xF))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def encode(s: String): String = encode(UTF8String.fromString(s)).toString

  def percentEncode(c: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(PercentEncodeExpr(
      org.apache.spark.sql.GraftSqlShim.expression(c)))
}

case class PercentEncodeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "percent_encode"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UrlCodec.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCodec.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): PercentEncodeExpr =
    copy(child = newChild)
}
