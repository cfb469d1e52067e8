package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PiiFunctions

class PiiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def redactOne(s: String): (Int, Int, Int, String) = {
    val r = Seq(s).toDF("t").select(
      PiiFunctions.emailCount(col("t")),
      PiiFunctions.ipv4Count(col("t")),
      PiiFunctions.phoneCount(col("t")),
      PiiFunctions.redact(col("t"))).collect().head
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))
  }

  test("each class detected and masked") {
    val (e, i, p, red) = redactOne(
      "mail bob.smith+x@corp.example.org from 192.168.0.17 at 415-555-0199 ok")
    assert((e, i, p) === (1, 1, 1))
    assert(red === "mail <EMAIL> from <IP> at <PHONE> ok")
  }

  test("clean text passes through untouched") {
    val (e, i, p, red) = redactOne("no personal data in this row")
    assert((e, i, p) === (0, 0, 0))
    assert(red === "no personal data in this row")
  }

  test("email pass consumes IPv4-shaped spans inside a domain") {
    val (e, i, _, red) = redactOne("ping admin@mail10.0.0.8.com now")
    assert(e === 1)
    // the IP count sees the span pre-redaction (counts are independent
    // detections), but the redacted text masks the WHOLE address
    assert(red === "ping <EMAIL> now")
    assert(i === 1)
  }

  test("multiple hits of one class all masked") {
    val (_, i, _, red) = redactOne("hop 10.0.0.1 then 10.0.0.2")
    assert(i === 2 && red === "hop <IP> then <IP>")
  }

  test("phone requires exact 3-3-4 grouping") {
    val (_, _, p, red) = redactOne("order 12-345-6789 ref 123-456-78901")
    // 12-345-6789 has a 2-digit area -> no match; 123-456-78901: the
    // pattern is unanchored, so its first 12 chars DO match (an honest
    // recall>precision trade every unanchored scrubber makes)
    assert(p === 1 && red === "order 12-345-6789 ref <PHONE>1")
  }
}
