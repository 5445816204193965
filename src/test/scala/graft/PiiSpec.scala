package graft

import org.apache.spark.sql.functions._

import graft.text.Pii

/** PII detection/redaction — unit layer under the oracle-checked
  * `pii_scrub` query. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  private def counts(text: String): Map[String, Int] =
    Pii.detectors.map { case (name, _, _) =>
      name -> one(text).select(Pii.countMatches(col("text"), name)).head().getInt(0)
    }.toMap

  private def redacted(text: String): String =
    one(text).select(Pii.redact(col("text"))).head().getString(0)

  test("each detector class finds its shape and nothing else") {
    assert(counts("mail me at a.user+tag@sub.example.org today") ===
      Map("email" -> 1, "ssn" -> 0, "phone" -> 0, "ipv4" -> 0))
    assert(counts("call 555-867-5309 or 555 123 4567") ===
      Map("email" -> 0, "ssn" -> 0, "phone" -> 2, "ipv4" -> 0))
    assert(counts("host 192.168.0.1 and 10.0.0.255") ===
      Map("email" -> 0, "ssn" -> 0, "phone" -> 0, "ipv4" -> 2))
    assert(counts("ssn 123-45-6789") ===
      Map("email" -> 0, "ssn" -> 1, "phone" -> 0, "ipv4" -> 0))
    // plain prose and bare numbers trigger nothing
    assert(counts("the quick brown fox 12345 6789 v1.2 jumps").values.sum === 0)
  }

  test("ssn and phone shapes do not cross-match") {
    // 3-2-4 is not a phone (needs 3-3-4); 3-3-4 is not an ssn (needs 3-2-4)
    assert(counts("123-45-6789")("phone") === 0)
    assert(counts("555-123-4567")("ssn") === 0)
  }

  test("redact replaces every span with a digit-free token, idempotently") {
    val t = "u7@ex3.com then 555-123-4567 from 10.1.2.3 ssn 245-55-2045 end"
    val r = redacted(t)
    assert(r === "[EMAIL] then [PHONE] from [IP] ssn [SSN] end")
    assert(redacted(r) === r) // tokens never re-trigger a detector
    val clean = "no pii here at all"
    assert(redacted(clean) === clean)
  }

  test("hasPii is the disjunction of the classes") {
    val df = Seq(
      (1L, "write to x@y.io"), (2L, "nothing"), (3L, "ip 8.8.8.8")
    ).toDF("id", "text")
    val flagged = df.where(Pii.hasPii(col("text"))).select("id")
      .as[Long].collect().sorted
    assert(flagged === Array(1L, 3L))
  }

  test("unknown class is a contract error") {
    intercept[IllegalArgumentException](Pii.countMatches(col("text"), "dna"))
  }
}
