package graft

import org.apache.spark.sql.functions._
import graft.functions.{HmacSha256, MaskRules}

/** Masking goldens mirroring the reference unit suite
  * (`tests/unit/test_masking.py:18-93`): SHA-256 determinism and exact
  * digests, HMAC keyed determinism, classification precedence. */
class MaskingSpec extends SparkSpec {
  import spark.implicits._

  test("sha2 masking matches known SHA-256 digest of an email") {
    val got = Seq("user@example.com").toDF("email")
      .select(sha2($"email", 256)).as[String].head()
    // printf '%s' 'user@example.com' | sha256sum
    assert(got == "b4c9a289323b21a01c3e940f150eb9b8c542587f1abfd8f0e1cc1ffc5e475514")
    assert(got.length == 64)
  }

  test("empty string is hashed, null passes through") {
    val got = Seq(Some(""), None).toDF("email")
      .select(sha2($"email", 256)).as[Option[String]].collect()
    assert(got(0).get == "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
    assert(got(1).isEmpty)
  }

  test("hmac_sha256 expression matches javax.crypto reference and is deterministic") {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      "default-secret-key".getBytes("UTF-8"), "HmacSHA256"))
    val want = mac.doFinal("patient-123".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

    val got = Seq("patient-123", "patient-123").toDF("v")
      .select(HmacSha256.hmac_sha256($"v", lit("default-secret-key")))
      .as[String].collect()
    assert(got(0) == want)
    assert(got(0) == got(1)) // deterministic → joinable across tables
    assert(got(0).length == 64)
  }

  test("different HMAC keys give different tokens") {
    val got = Seq("x").toDF("v").select(
      HmacSha256.hmac_sha256($"v", lit("k1")),
      HmacSha256.hmac_sha256($"v", lit("k2"))).as[(String, String)].head()
    assert(got._1 != got._2)
  }

  test("classification: PHI beats PII; passthrough otherwise") {
    val rules = MaskRules()
    assert(rules.classify("medical_email") == rules.Phi) // PHI checked first
    assert(rules.classify("user_email") == rules.Pii)
    assert(rules.classify("order_total") == rules.Passthrough)
  }

  test("apply masks a frame per-column by classification") {
    val rules = MaskRules()
    val df = Seq(("a@b.c", "flu", 7)).toDF("email", "diagnosis", "n")
    val row = rules(df).as[(String, String, Int)].head()
    assert(row._1.length == 64 && row._1 != "a@b.c")
    assert(row._2.length == 64 && row._2 != "flu")
    assert(row._3 == 7)
  }

  test("fromYaml parses the reference masking-rules.yaml; key comes from env only") {
    val yaml = java.nio.file.Files.createTempFile("rules", ".yaml")
    java.nio.file.Files.write(yaml,
      """# comment
        |pii_fields:
        |  - email
        |  - phone
        |  - ssn
        |
        |phi_fields:
        |  - medical_record_number
        |  - diagnosis
        |
        |masking:
        |  phi_key_id: "primary"
        |""".stripMargin.getBytes("UTF-8"))
    val rules = MaskRules.fromYaml(yaml.toString,
      env = { case "CDC_PHI_KEY" => Some("env-key"); case _ => None })
    assert(rules.piiFields == Seq("email", "phone", "ssn"))
    assert(rules.phiFields == Seq("medical_record_number", "diagnosis"))
    assert(rules.hmacKey == "env-key") // never from the file
    val noEnv = MaskRules.fromYaml(yaml.toString, env = _ => None)
    assert(noEnv.hmacKey == MaskRules.DefaultKey)
  }
}
