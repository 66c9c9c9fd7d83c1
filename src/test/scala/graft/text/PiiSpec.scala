package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestFixtures.spark

class PiiSpec extends AnyFunSuite {
  import spark.implicits._

  private def redact(text: String): String =
    Seq(text).toDF("t").select(Pii.redactAll(col("t")).as("r"))
      .head.getString(0)

  test("emails, IPv4s, and phones are replaced; everything else survives") {
    assert(redact("mail bob.smith+tag@sub.example.co.uk now") ==
      "mail <EMAIL> now")
    assert(redact("server at 192.168.001.1 responded") ==
      "server at <IP> responded")
    assert(redact("call 555-867-5309 or 555 867 5309 or 555.867.5309") ==
      "call <PHONE> or <PHONE> or <PHONE>")
    assert(redact("no pii in this sentence at all") ==
      "no pii in this sentence at all")
  }

  test("email runs before IP so dotted-digit local parts don't get carved") {
    assert(redact("x 10.0.0.1@example.com y") == "x <EMAIL> y")
  }

  test("multiple hits per row all redact (Spark regexp_replace is global)") {
    assert(redact("a@b.co c@d.org 1.2.3.4 5.6.7.8") ==
      "<EMAIL> <EMAIL> <IP> <IP>")
  }

  test("redaction is idempotent: a second pass changes nothing") {
    val once = redact("bob@example.com at 10.1.2.3 call 555-123-4567")
    assert(redact(once) == once)
  }

  test("word boundaries: version-like and decimal-like strings survive") {
    // 1.2.3 has only three octets; 1.2.3.4.5 — RE2/Java both match the
    // leftmost four octets, so a 5-part string IS partially redacted
    assert(redact("v1.2.3 released") == "v1.2.3 released")
    assert(redact("pi is 3.14159") == "pi is 3.14159")
  }

  test("piiCounts audits the original text per kind") {
    val (e, i, p) = Pii.piiCounts(col("t"))
    val row = Seq("a@b.co c@d.org 1.2.3.4 call 555-123-4567 done")
      .toDF("t").select(e.as("e"), i.as("i"), p.as("p")).head
    assert((row.getInt(0), row.getInt(1), row.getInt(2)) == ((2, 1, 1)))
  }
}
