package graft.contracts

/** Read-side contract version pinning — the policy surface of the
  * reference's `spark/io/validation.py:54-127,214-259`: a version spec is
  * either empty (latest), `"==x.y.z"` (exact), `">=x.y.z"` (minimum —
  * resolve to the HIGHEST stored version satisfying it), or a bare version
  * string (exact). Non-semver store entries are skipped during `>=`
  * selection unless they match the bound exactly, as in the reference's
  * `_select_version`. */
object VersionPolicy {

  private val Sem = """(\d+)\.(\d+)\.(\d+).*""".r

  /** Numeric (major, minor, patch) key, or None for non-semver strings. */
  def semverKey(v: String): Option[(Int, Int, Int)] = v.trim match {
    case Sem(a, b, c) => Some((a.toInt, b.toInt, c.toInt))
    case _ => None
  }

  /** Does `actual` satisfy `spec` (`==v`, `>=v`, or exact string)? */
  def satisfies(actual: String, spec: String): Boolean = {
    val s = spec.trim
    if (s.startsWith("==")) actual == s.drop(2).trim
    else if (s.startsWith(">=")) {
      val bound = s.drop(2).trim
      if (bound.isEmpty) true
      else (semverKey(actual), semverKey(bound)) match {
        case (Some(a), Some(b)) => implicitly[Ordering[(Int, Int, Int)]].gteq(a, b)
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
    * satisfies. */
  def resolve(store: ContractStore, contractId: String, spec: Option[String] = None): Contract = {
    val normalized = spec.map(_.trim).filter(_.nonEmpty)
    normalized match {
      case None =>
        store.latest(contractId).getOrElse(
          throw new IllegalArgumentException(s"no versions available for contract $contractId"))
      case Some(s) if s.startsWith(">=") =>
        val bound = s.drop(2).trim
        val boundKey = semverKey(bound).getOrElse(
          throw new IllegalArgumentException(s"invalid minimum version: $bound"))
        val versions = store.listVersions(contractId)
        // reference `_select_version`: an unparseable candidate is eligible
        // only when it equals the bound exactly (early return there)
        val version = versions.find(v => semverKey(v).isEmpty && v == bound).getOrElse {
          versions
            .flatMap(v => semverKey(v).map(_ -> v))
            .filter { case (k, _) => implicitly[Ordering[(Int, Int, Int)]].gteq(k, boundKey) }
            .sortBy(_._1)
            .lastOption.map(_._2)
            .getOrElse(throw new IllegalArgumentException(
              s"no versions of $contractId satisfy >= $bound (have: ${versions.mkString(", ")})"))
        }
        store.get(contractId, version).getOrElse(
          throw new IllegalArgumentException(s"contract $contractId:$version vanished from the store"))
      case Some(s) =>
        val version = if (s.startsWith("==")) s.drop(2).trim else s
        store.get(contractId, version).getOrElse(
          throw new IllegalArgumentException(s"contract $contractId:$version not found"))
    }
  }
}
