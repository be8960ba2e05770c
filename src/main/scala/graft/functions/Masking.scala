package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Field classification + masking strategy application.
  *
  * Mirrors the reference semantics:
  *  - classification is substring match of the column name against PII/PHI
  *    field lists, PHI checked first because it is more sensitive
  *    (`src/transform/masking.py:67-92`, rules `config/masking-rules.yaml:6-19`);
  *  - PII → SHA-256 hex (`masking.py:126-148`) = Spark built-in `sha2`;
  *  - PHI → HMAC-SHA256 hex keyed token (`masking.py:151-177`) = our
  *    [[HmacSha256]] Catalyst expression;
  *  - missing HMAC key falls back to "default-secret-key"
  *    (`masking.py:206-207`) — kept for golden-test parity, override in
  *    production config;
  *  - NULL passes through, empty string is hashed (`masking.py:139-141`).
  *
  * Classification happens at PLAN BUILD TIME on the driver (the schema is
  * known), so per-row dispatch never reaches the executors — each column
  * compiles to exactly one codegen'd expression.
  */
final case class MaskRules(
    piiFields: Seq[String] = Seq("email", "phone", "address", "name", "ssn"),
    phiFields: Seq[String] = Seq("medical", "diagnosis", "prescription", "health"),
    hmacKey: String = MaskRules.DefaultKey) {

  sealed trait Classification
  case object Phi extends Classification
  case object Pii extends Classification
  case object Passthrough extends Classification

  /** PHI first — more sensitive wins (`masking.py:80-88`). */
  def classify(columnName: String): Classification = {
    val n = columnName.toLowerCase
    if (phiFields.exists(n.contains)) Phi
    else if (piiFields.exists(n.contains)) Pii
    else Passthrough
  }

  /** The masking expression for one column. */
  def maskExpr(name: String): Column = classify(name) match {
    case Phi => HmacSha256.hmac_sha256(col(name).cast("string"), lit(hmacKey)).as(name)
    case Pii => sha2(col(name).cast("string"), 256).as(name)
    case Passthrough => col(name)
  }

  /** Apply masking across a whole DataFrame (`masking.py:180-215`). */
  def apply(df: DataFrame): DataFrame =
    df.select(df.columns.map(maskExpr).toIndexedSeq: _*)
}

object MaskRules {
  /** Reference fallback key (`src/transform/masking.py:206-207`). */
  val DefaultKey = "default-secret-key"

  /** Load rules from the reference's `masking-rules.yaml` shape
    * (`config/masking-rules.yaml`): top-level `pii_fields:` /
    * `phi_fields:` list blocks of `- pattern` entries. The HMAC key is
    * NEVER read from the file — it comes from the `CDC_PHI_KEY`
    * environment variable (`masking-rules.yaml:29-31` loads from env),
    * falling back to the reference default. Restricted line-based parse:
    * the config grammar is flat lists, no YAML engine needed (and no
    * extra dependency).
    */
  def fromYaml(path: String,
      env: String => Option[String] = sys.env.get): MaskRules = {
    val lines = scala.io.Source.fromFile(path, "UTF-8")
    try {
      var section = ""
      val pii = Seq.newBuilder[String]
      val phi = Seq.newBuilder[String]
      val sectionRe = """^(\w+):\s*(#.*)?$""".r
      val itemRe = """^\s+-\s+("?)([^"#]+)\1\s*(#.*)?$""".r
      lines.getLines().foreach {
        case sectionRe(name, _) => section = name
        case itemRe(_, item, _) =>
          section match {
            case "pii_fields" => pii += item.trim
            case "phi_fields" => phi += item.trim
            case _ =>
          }
        case _ =>
      }
      val (p, h) = (pii.result(), phi.result())
      // fail LOUDLY when nothing parsed: a rules file whose shape falls
      // outside the restricted grammar (unindented items, renamed
      // sections) would otherwise silently disable ALL masking — a
      // security config must not fail open. A deployment that truly
      // wants no masking passes no rules file at all.
      require(p.nonEmpty || h.nonEmpty,
        s"masking rules file '$path' yielded no pii_fields/phi_fields — " +
          "check its shape (expected 'pii_fields:'/'phi_fields:' sections " +
          "with indented '- item' entries)")
      MaskRules(p, h, env("CDC_PHI_KEY").getOrElse(DefaultKey))
    } finally lines.close()
  }
}
