package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.{BinaryType, StringType}
import graft.functions.{HmacSha256, MaskRules}

/** Catalyst integration: SQL-callable graft functions and a plan rule that
  * auto-masks columns tagged with masking metadata (SURVEY §7.4's optional
  * `SparkSessionExtensions` convenience, made real).
  *
  * Columns whose `StructField.metadata` carries `"graft.mask": "pii"` are
  * rewritten to `sha2(col, 256)` and `"phi"` to `hmac_sha256(col, key)` at
  * the moment the relation is scanned — queries cannot observe unmasked
  * values no matter what projection they ask for. The wrapping Project
  * reuses each attribute's exprId, so operators above the leaf resolve
  * unchanged.
  *
  * Two installation paths:
  *  - config: `spark.sql.extensions=graft.plans.GraftExtensions` (class);
  *  - runtime: [[GraftExtensions.install]] for an existing session
  *    (function registry + experimental optimizer rules).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectOptimizerRule(_ => AutoMaskRule)
  }
}

object GraftExtensions {
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("hmac_sha256",
      new ExpressionInfo(classOf[HmacSha256].getName, "hmac_sha256"),
      (args: Seq[Expression]) => HmacSha256(args(0), args(1))),
    ("float_vec_dot",
      new ExpressionInfo(classOf[graft.functions.FloatVecDot].getName, "float_vec_dot"),
      (args: Seq[Expression]) => graft.functions.FloatVecDot(args(0), args(1))),
    ("decimal_vec_dot",
      new ExpressionInfo(classOf[graft.functions.DecimalVecDot].getName, "decimal_vec_dot"),
      (args: Seq[Expression]) => graft.functions.DecimalVecDot(args(0), args(1))),
    ("nfc_normalize",
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => graft.functions.NfcNormalize(args(0))),
    ("edit_within1",
      new ExpressionInfo(classOf[graft.functions.EditWithin1].getName, "edit_within1"),
      (args: Seq[Expression]) => graft.functions.EditWithin1(args(0), args(1))))

  /** Runtime installation into an already-built session. */
  def install(spark: SparkSession): Unit = {
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    if (!spark.experimental.extraOptimizations.contains(AutoMaskRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AutoMaskRule
  }
}

/** Rewrites leaf relations so that metadata-tagged columns come out masked. */
object AutoMaskRule extends Rule[LogicalPlan] {
  val MetadataKey = "graft.mask"
  val KeyMetadataKey = "graft.mask.key"
  private val MaskedTag = TreeNodeTag[Boolean]("graft.masked")

  private def maskKind(a: Attribute): Option[String] =
    if (a.metadata.contains(MetadataKey)) Some(a.metadata.getString(MetadataKey))
    else None

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case r: LeafNode if r.resolved && r.getTagValue(MaskedTag).isEmpty &&
        r.output.exists(a => maskKind(a).isDefined) =>
      r.setTagValue(MaskedTag, true)
      val projections = r.output.map { a =>
        maskKind(a) match {
          case Some("pii") =>
            Alias(Sha2(Cast(a, BinaryType), Literal(256)), a.name)(
              exprId = a.exprId, qualifier = a.qualifier)
          case Some("phi") =>
            val key =
              if (a.metadata.contains(KeyMetadataKey))
                a.metadata.getString(KeyMetadataKey)
              else MaskRules.DefaultKey
            Alias(HmacSha256(Cast(a, StringType), Literal(key)), a.name)(
              exprId = a.exprId, qualifier = a.qualifier)
          case _ => a
        }
      }
      Project(projections, r)
  }
}
