package graft.functions

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HMAC-SHA256 masking as a native Catalyst expression.
  *
  * The reference's PHI strategy (`src/transform/masking.py:151-177`) is a
  * deterministic keyed token so masked values still join across tables.
  * Spark has no HMAC built-in (SURVEY §7.4 — the one true gap), so this is
  * a codegen-participating `BinaryExpression` rather than a Scala UDF: the
  * generated code calls the static [[HmacSha256.compute]] helper directly,
  * keeping the whole stage inside Tungsten codegen with no
  * serialization/closure overhead on the 100 TB path.
  */
case class HmacSha256(data: Expression, key: Expression)
    extends BinaryExpression {

  override def left: Expression = data
  override def right: Expression = key
  override def dataType: DataType = StringType
  override def prettyName: String = "hmac_sha256"

  override def checkInputDataTypes(): TypeCheckResult =
    if (data.dataType == StringType && key.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${data.dataType.simpleString}, ${key.dataType.simpleString})")

  override def nullSafeEval(d: Any, k: Any): Any =
    UTF8String.fromString(HmacSha256.compute(d.toString, k.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, k) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.HmacSha256.compute($d.toString(), $k.toString()))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(data = newLeft, key = newRight)
}

object HmacSha256 {
  // Mac is not thread-safe and init is costly; cache one per thread+key.
  private val macCache = new ThreadLocal[java.util.HashMap[String, Mac]] {
    override def initialValue() = new java.util.HashMap[String, Mac]()
  }

  /** Hex HMAC-SHA256, matching the reference's
    * `hmac.new(key, value, sha256).hexdigest()` exactly. */
  def compute(data: String, key: String): String = {
    val cache = macCache.get()
    var mac = cache.get(key)
    if (mac == null) {
      mac = Mac.getInstance("HmacSHA256")
      mac.init(new SecretKeySpec(key.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
      cache.put(key, mac)
    }
    val out = mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
    // hex via lookup table: String.format allocates a Formatter and boxes
    // per BYTE — 32 allocations per masked value on the codegen hot path
    val chars = new Array[Char](out.length * 2)
    var i = 0
    while (i < out.length) {
      val v = out(i) & 0xff
      chars(i * 2) = HexDigits(v >>> 4)
      chars(i * 2 + 1) = HexDigits(v & 0x0f)
      i += 1
    }
    new String(chars)
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Column-API entry point. */
  def hmac_sha256(data: Column, key: Column): Column =
    ColumnBridge.column(HmacSha256(
      ColumnBridge.expression(data), ColumnBridge.expression(key)))
}
