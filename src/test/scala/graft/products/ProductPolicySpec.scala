package graft.products

import org.scalatest.funsuite.AnyFunSuite

/** Accept/reject matrix of the data-product read orchestration — mirrors
  * the reference semantics of `_validate_data_product_status`,
  * `_check_data_product_version`, and `_select_data_product`
  * (dc43 `spark/io/validation.py:261-533`). */
class ProductPolicySpec extends AnyFunSuite {

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_pp").toString

  private def backendWith(ps: DataProduct*): DataProductBackend = {
    val be = new DataProductBackend(tmp())
    ps.foreach(be.put)
    be
  }

  private val retired = DataProduct("dp.a", status = "retired", version = Some("0.9.0"),
    inputPorts = Seq(InputPort("in", "0.9.0", "c.a")))
  private val active = DataProduct("dp.a", status = "active", version = Some("1.0.0"),
    inputPorts = Seq(InputPort("in", "1.0.0", "c.a")))
  private val draft = DataProduct("dp.a", status = "draft", version = Some("1.1.0"),
    inputPorts = Seq(InputPort("in", "1.1.0", "c.a")))

  test("status policy: allowed set, case folding, missing-status handling") {
    val p = ProductStatusPolicy()
    assert(p.validate(active.copy(status = "Active"), enforce = true, "read").isEmpty)
    intercept[IllegalStateException](p.validate(draft, enforce = true, "read"))
    assert(p.validate(draft, enforce = false, "read").nonEmpty)
    // blank status passes only under allowMissing
    assert(p.validate(active.copy(status = " "), enforce = true, "read").isEmpty)
    intercept[IllegalStateException](
      p.copy(allowMissing = false).validate(active.copy(status = ""), enforce = true, "read"))
    // case-sensitive mode rejects a case-mismatched status
    intercept[IllegalStateException](
      p.copy(caseInsensitive = false).validate(active.copy(status = "Active"), enforce = true, "read"))
    // custom failure message replaces the default
    assert(p.copy(failureMessage = Some("nope"))
      .validate(draft, enforce = false, "read").contains("nope"))
  }

  test("checkVersion: pins, bounds, unknown and incomparable versions") {
    assert(ProductPolicy.checkVersion(None, Some("1.0.0"), "dp.a", enforce = true))
    assert(ProductPolicy.checkVersion(Some("==1.0.0"), Some("1.0.0"), "dp.a", enforce = true))
    assert(ProductPolicy.checkVersion(Some("1.0.0"), Some("1.0.0"), "dp.a", enforce = true))
    assert(ProductPolicy.checkVersion(Some(">=0.9.0"), Some("1.0.0"), "dp.a", enforce = true))
    assert(!ProductPolicy.checkVersion(Some(">=1.1.0"), Some("1.0.0"), "dp.a", enforce = false))
    intercept[IllegalArgumentException](
      ProductPolicy.checkVersion(Some(">=1.1.0"), Some("1.0.0"), "dp.a", enforce = true))
    // actual version unknown but a spec is set
    intercept[IllegalArgumentException](
      ProductPolicy.checkVersion(Some("==2.0.0"), None, "dp.a", enforce = true))
    // a >= bound with a non-semver operand is incomparable, not silently equal
    intercept[IllegalArgumentException](
      ProductPolicy.checkVersion(Some(">=1.0.0"), Some("weird"), "dp.a", enforce = true))
    // an empty >= bound is unconstrained
    assert(ProductPolicy.checkVersion(Some(">="), Some("weird"), "dp.a", enforce = true))
  }

  test("select walks newest-first, skipping disallowed statuses when enforcing") {
    val be = backendWith(retired, active, draft)
    // enforcing: draft 1.1.0 skipped, active 1.0.0 serves
    assert(ProductPolicy.select(be, "dp.a", enforce = true)
      .flatMap(_.version).contains("1.0.0"))
    // warn-only: the newest (draft) revision wins, with a warning
    assert(ProductPolicy.select(be, "dp.a").flatMap(_.version).contains("1.1.0"))
    // a >= bound only the (skipped) draft satisfies: enforcing throws
    intercept[Exception](
      ProductPolicy.select(be, "dp.a", Some(">=1.1.0"), enforce = true))
    // exact pin on the draft: status rejects when enforcing, passes when not
    intercept[IllegalStateException](
      ProductPolicy.select(be, "dp.a", Some("==1.1.0"), enforce = true))
    assert(ProductPolicy.select(be, "dp.a", Some("==1.1.0")).map(_.status).contains("draft"))
    // statusEnforce overrides enforce for the status check only
    assert(ProductPolicy.select(be, "dp.a", Some("==1.1.0"), enforce = true,
      statusEnforce = Some(false)).map(_.status).contains("draft"))
    // a different allowed set serves the retired revision
    assert(ProductPolicy.select(be, "dp.a",
      policy = ProductStatusPolicy(Seq("retired")), enforce = true)
      .flatMap(_.version).contains("0.9.0"))
    // missing pinned revision
    intercept[IllegalArgumentException](
      ProductPolicy.select(be, "dp.a", Some("==9.9.9"), enforce = true))
    assert(ProductPolicy.select(be, "dp.a", Some("==9.9.9")).isEmpty)
  }

  test("select: no selectable revisions errors under enforce instead of silent None") {
    val empty = new DataProductBackend(tmp())
    intercept[IllegalArgumentException](
      ProductPolicy.select(empty, "dp.unknown", enforce = true))
    assert(ProductPolicy.select(empty, "dp.unknown").isEmpty) // warn-only: None
    // only non-semver-parseable revisions stored: same contract
    val odd = backendWith(DataProduct("dp.a", status = "active", version = Some("v1")))
    intercept[IllegalArgumentException](ProductPolicy.select(odd, "dp.a", enforce = true))
  }

  test("select: every revision disallowed") {
    val be = backendWith(draft)
    // enforcing: combined error naming the rejections
    val e = intercept[IllegalStateException](ProductPolicy.select(be, "dp.a", enforce = true))
    assert(e.getMessage.contains("does not have an allowed version"))
    // status-enforced but overall non-enforcing: warn and return None
    assert(ProductPolicy.select(be, "dp.a", statusEnforce = Some(true)).isEmpty)
    // fully relaxed: draft serves with a warning
    assert(ProductPolicy.select(be, "dp.a").nonEmpty)
  }
}
