package graft.contracts

/** Read-side contract version pinning — the policy surface of the
  * reference's `spark/io/validation.py:54-127,214-259`: a version spec is
  * either empty (latest), `"==x.y.z"` (exact), `">=x.y.z"` (minimum —
  * resolve to the HIGHEST stored version satisfying it), or a bare version
  * string (exact). Ordering is [[SemVer]]'s (numeric triples, release >
  * pre-release — the same ordering `ContractStore.latest` uses, so pinned
  * and unpinned resolution can never disagree about which of two versions
  * is newer). Non-semver store entries are skipped during `>=` selection
  * unless they match the bound exactly, as in the reference's
  * `_select_version`. */
object VersionPolicy {

  /** Does `actual` satisfy `spec` (`==v`, `>=v`, or exact string)?
    * `>=` compares with SemVer ordering (so 1.2.0-rc1 does NOT satisfy
    * >=1.2.0); non-semver operands fall back to exact equality. */
  def satisfies(actual: String, spec: String): Boolean = {
    val s = spec.trim
    if (s.startsWith("==")) actual == s.drop(2).trim
    else if (s.startsWith(">=")) {
      val bound = s.drop(2).trim
      if (bound.isEmpty) true
      else (SemVer.tryParse(actual), SemVer.tryParse(bound)) match {
        case (Some(a), Some(b)) => a >= b
        case _ => actual == bound
      }
    } else actual == s
  }

  /** Throws if `actual` does not satisfy the expected constraint
    * (reference `_check_contract_version`). */
  def check(expected: Option[String], actual: String): Unit =
    expected.map(_.trim).filter(_.nonEmpty).foreach { spec =>
      if (!satisfies(actual, spec))
        throw new IllegalArgumentException(
          s"contract version $actual does not satisfy $spec")
    }

  /** Resolve a version spec against a store: latest when unset, exact for
    * `==`/bare specs, highest-satisfying for `>=` (reference
    * `_resolve_contract`/`_select_version`). Throws when nothing
    * satisfies or the `>=` bound is not a version. */
  def resolve(store: ContractStore, contractId: String, spec: Option[String] = None): Contract = {
    val normalized = spec.map(_.trim).filter(_.nonEmpty)
    normalized match {
      case None =>
        store.latest(contractId).getOrElse(
          throw new IllegalArgumentException(s"no versions available for contract $contractId"))
      case Some(s) if s.startsWith(">=") =>
        val bound = s.drop(2).trim
        val boundVer = SemVer.tryParse(bound).getOrElse(
          throw new IllegalArgumentException(s"invalid minimum version: $bound"))
        val versions = store.listVersions(contractId)
        // reference `_select_version` semantics: non-semver store entries
        // (e.g. "1.2.3.4", "draft-x") cannot satisfy a `>=` bound — they
        // are skipped, matching SemVer.parse/ValueError there. Pin such
        // versions with an exact (`==`/bare) spec instead.
        val version = versions
          .flatMap(v => SemVer.tryParse(v).map(_ -> v))
          .filter { case (ver, _) => ver >= boundVer }
          .sortBy(_._1)
          .lastOption.map(_._2)
          .getOrElse(throw new IllegalArgumentException(
            s"no versions of $contractId satisfy >= $bound (have: ${versions.mkString(", ")})"))
        store.get(contractId, version).getOrElse(
          throw new IllegalArgumentException(s"contract $contractId:$version vanished from the store"))
      case Some(s) =>
        val version = if (s.startsWith("==")) s.drop(2).trim else s
        store.get(contractId, version).getOrElse(
          throw new IllegalArgumentException(s"contract $contractId:$version not found"))
    }
  }
}
