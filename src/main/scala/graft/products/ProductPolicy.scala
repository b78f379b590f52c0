package graft.products

import graft.contracts.SemVer

/** Data-product status policy — twin of the reference's
  * `_validate_data_product_status` (dc43
  * `spark/io/validation.py:330-395`): a product may serve an operation
  * only while its lifecycle status is in the allowed set; a missing/blank
  * status passes only when `allowMissing`. `enforce = false` downgrades
  * violations to warnings (the reference's default posture), `true` makes
  * them errors. */
final case class ProductStatusPolicy(
    allowedStatuses: Seq[String] = Seq("active"),
    allowMissing: Boolean = true,
    caseInsensitive: Boolean = true,
    failureMessage: Option[String] = None) {

  private def message(p: DataProduct, operation: String, status: String): String =
    failureMessage.getOrElse(
      s"data product ${p.id}@${p.version.getOrElse("")} status '$status' " +
        s"is not allowed for $operation operations")

  /** None when the status passes; Some(message) when it violates the
    * policy (already logged as a warning). Throws instead when `enforce`. */
  def validate(p: DataProduct, enforce: Boolean, operation: String): Option[String] = {
    val status = Option(p.status).map(_.trim).getOrElse("")
    if (status.isEmpty && allowMissing) None
    else {
      val allowed =
        if (caseInsensitive) allowedStatuses.map(_.toLowerCase).toSet
        else allowedStatuses.toSet
      val candidate = if (caseInsensitive) status.toLowerCase else status
      if (status.nonEmpty && allowed.contains(candidate)) None
      else {
        val msg = message(p, operation, status)
        if (enforce) throw new IllegalStateException(msg)
        ProductPolicy.log.warn(msg)
        Some(msg)
      }
    }
  }
}

/** Read-path version/status orchestration for data products — the
  * product-side sibling of [[graft.contracts.VersionPolicy]], mirroring
  * dc43 `spark/io/validation.py:261-533` (`_check_data_product_version`,
  * `_select_data_product`). Contract pinning resolves WHICH schema governs
  * a dataset; this resolves WHICH revision of a data product may serve a
  * port binding at all. */
object ProductPolicy {

  private[products] lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Does `actual` satisfy the optional version spec (`==v`, `>=v`, or
    * bare exact)? On violation: throw when `enforce`, else warn and return
    * false. Unlike the contract-side `VersionPolicy.satisfies`, a `>=`
    * bound with a non-semver operand is an error (the reference raises on
    * incomparable versions rather than guessing). */
  def checkVersion(expected: Option[String], actual: Option[String],
                   productId: String, enforce: Boolean,
                   subject: String = "data product"): Boolean = {
    def fail(msg: String): Boolean =
      if (enforce) throw new IllegalArgumentException(msg)
      else { log.warn(msg); false }
    expected.map(_.trim).filter(_.nonEmpty) match {
      case None => true
      case Some(req) =>
        actual.map(_.trim).filter(_.nonEmpty) match {
          case None =>
            fail(s"$subject version for data product $productId is unknown; expected $req")
          case Some(a) =>
            if (req.startsWith("==")) {
              a == req.drop(2).trim ||
                fail(s"$subject version $a does not satisfy $req for data product $productId")
            } else if (req.startsWith(">=")) {
              val bound = req.drop(2).trim
              if (bound.isEmpty) true
              else (SemVer.tryParse(a), SemVer.tryParse(bound)) match {
                case (Some(av), Some(bv)) =>
                  av >= bv ||
                    fail(s"$subject version $a does not satisfy $req for data product $productId")
                case _ =>
                  fail(s"unable to compare versions '$a' and '$bound' for data product $productId")
              }
            } else {
              a == req ||
                fail(s"$subject version $a does not satisfy $req for data product $productId")
            }
        }
    }
  }

  /** Resolve a data product honouring the status policy and version spec
    * (reference `_select_data_product`):
    *
    *  - An exact pin (`==v` / bare `v`) loads that revision directly, then
    *    status-validates it (`statusEnforce`, defaulting to `enforce`).
    *  - A `>=` or unset spec walks revisions newest-first. With status
    *    enforcement on, disallowed-status revisions are SKIPPED (their
    *    errors collected) so an older allowed revision can still serve;
    *    with it off they only produce warnings and the newest revision
    *    wins. The first surviving revision must also satisfy the spec.
    *
    * Returns None (after warnings) when nothing qualifies and `enforce`
    * is off; throws when it is on. */
  def select(backend: DataProductService, productId: String,
             versionSpec: Option[String] = None,
             policy: ProductStatusPolicy = ProductStatusPolicy(),
             enforce: Boolean = false,
             operation: String = "read",
             statusEnforce: Option[Boolean] = None): Option[DataProduct] = {
    val requirement = versionSpec.map(_.trim).filter(_.nonEmpty)
    val policyEnforce = statusEnforce.getOrElse(enforce)
    val direct = requirement.filterNot(_.startsWith(">="))
      .map(r => if (r.startsWith("==")) r.drop(2).trim else r).filter(_.nonEmpty)

    direct match {
      case Some(v) =>
        backend.get(productId, v) match {
          case None =>
            val msg = s"data product $productId version $v could not be retrieved"
            if (enforce) throw new IllegalArgumentException(msg)
            log.warn(msg); None
          case Some(p) =>
            policy.validate(p, policyEnforce, operation) // throws when enforcing
            if (checkVersion(requirement, p.version, productId, enforce)) Some(p) else None
        }
      case None =>
        val newestFirst = backend.listVersions(productId)
          .flatMap(v => SemVer.tryParse(v).map(_ -> v))
          .sortBy(_._1).reverse.map(_._2)
        var errors = Vector.empty[String]
        val found = newestFirst.iterator
          .flatMap(v => backend.get(productId, v))
          .find { p =>
            val violation = policy.validate(p, enforce = false, operation)
            if (violation.isDefined && policyEnforce) {
              errors ++= violation; false
            } else
              // throws (enforce) on the newest allowed revision failing a
              // `>=` bound — all older revisions would fail it too
              checkVersion(requirement, p.version, productId, enforce)
          }
        if (found.isEmpty && errors.nonEmpty) {
          val msg = s"data product $productId does not have an allowed version " +
            s"for $operation operations"
          if (enforce)
            throw new IllegalStateException(s"$msg: ${errors.distinct.mkString("; ")}")
          log.warn(s"$msg: ${errors.distinct.mkString("; ")}")
        } else if (found.isEmpty) {
          // no revisions at all (or none semver-parseable): an enforcing
          // caller gets an error, not a silent None
          val msg = s"data product $productId has no selectable revisions " +
            s"(stored: ${backend.listVersions(productId).mkString(", ")})"
          if (enforce) throw new IllegalArgumentException(msg)
          log.warn(msg)
        }
        found
    }
  }
}
