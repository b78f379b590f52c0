package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

class LuhnCheckSpec extends SparkSpec {
  import spark.implicits._

  private def ok(s: String): Boolean = LuhnCheck.valid(UTF8String.fromString(s))

  test("known-valid PANs pass, their off-by-one twins fail") {
    assert(ok("4539578763621486"))
    assert(ok("4111111111111111"))   // the classic test Visa
    assert(ok("1234567812345670"))
    assert(!ok("4539578763621487"))  // last digit bumped
    assert(!ok("4111111111111112"))
    assert(!ok("1234567812345678"))
  }

  test("separators are transparent to the checksum") {
    assert(ok("4539-5787-6362-1486"))
    assert(ok("4539 5787 6362 1486"))
    assert(ok("4539-5787 6362-1486")) // mixed
    assert(!ok("4539-5787-6362-1487"))
  }

  test("the PAN length envelope binds: 13-19 digits only") {
    // mod-10-CLEAN strings outside the envelope are still rejected — the
    // length bound is what fires, not the checksum
    assert(!ok("59"))                        // 9 + 2·5→1 = 10, but 2 digits
    assert(!ok("26"))                        // 6 + 2·2 = 10, but 2 digits
    assert(!ok("123456781234567812345676"))  // mod-10-clean, 24 digits
    assert(ok("4222222222222"))              // 13-digit Visa test number
  }

  test("anything but digits and separators is rejected, not skipped") {
    assert(!ok("4539a578763621486"))
    assert(!ok("4539578763621486x"))
    assert(!ok(""))
    assert(!ok("----"))
    assert(!ok("carte 4539578763621486")) // the regex's job, not the checksum's
  }

  test("codegen and interpreted eval agree; null propagates") {
    val rows = Seq(Some("4539578763621486"), Some("4539578763621487"),
      Some("4539-5787-6362-1486"), Some("not a pan"), None)
    val viaCodegen = rows.toDF("s").selectExpr("graft_luhn(s) AS v").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    val viaEval = rows.map(_.map(ok))
    assert(viaCodegen.toSeq == viaEval)
    intercept[Exception] {
      Seq(1).toDF("x").selectExpr("graft_luhn(x)").collect()
    }
  }
}
