package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression.
  *
  * A multi-source text corpus carries the same logical string under
  * different code-point sequences — composed é (U+00E9) vs decomposed
  * e+◌́ (U+0065 U+0301) being the canonical example — and byte-level
  * fingerprints (d01/t04/p20) treat them as DIFFERENT documents, so
  * exact dedup silently under-counts cross-source duplicates. Spark has
  * no normalization built-in; like [[HmacSha256]], this is a
  * codegen-participating `UnaryExpression` over `java.text.Normalizer`
  * (Form.NFC — the form DuckDB's `nfc_normalize` implements, which is
  * what lets the d21 oracle replay it), with a fast-path: `Normalizer
  * .isNormalized` is a cheap scan that avoids allocating for the
  * overwhelmingly-ASCII common case.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.computeUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize.computeUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** NFC form, with the no-allocation fast path for already-normalized
    * (e.g. pure-ASCII) input. Assumes valid UTF-8, as all Spark string
    * data is; an invalid byte sequence would decode to U+FFFD in the
    * java.lang.String round-trip (standard JVM replacement semantics). */
  def compute(s: String): String =
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)

  /** UTF8String form used by both eval paths: already-normalized input
    * passes the ORIGINAL UTF8String through untouched (one decode to
    * check, no re-encode) — the common case on an ASCII-dominated
    * corpus pays a single scan, not two allocations. */
  def computeUtf8(u: UTF8String): UTF8String = {
    val s = u.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  /** Column-API entry point. */
  def nfc_normalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
