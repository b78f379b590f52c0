package graft.quality

import graft.contracts.Contract

/** Contract expectations exported as Delta Live Tables decorator maps —
  * the Spark-native twin of the reference's `DLTExpectations`
  * (`dc43-integrations/spark/dlt.py:29-117`):
  *
  *  - `enforced` → `dlt.expect_all_or_drop` (required expectations)
  *  - `observed` → `dlt.expect_all` (optional expectations; violations warn)
  *
  * Both maps are `key → SQL predicate`, predicate strings coming from
  * [[Expectations.sqlPredicate]] — the exact predicates graft itself
  * validates with, so a DLT pipeline and a graft batch job enforce
  * identical rules. Specs without a row-level predicate (uniqueness,
  * custom `query` metrics) are skipped, matching the reference's
  * `from_expectation_plan`, which drops plan entries lacking a
  * `predicate`. */
final case class DltExpectations(
    enforced: Map[String, String],
    observed: Map[String, String]) {

  def isEmpty: Boolean = enforced.isEmpty && observed.isEmpty

  /** Imperative registration, mirroring `DLTExpectations.apply`: hand the
    * two maps to the `dlt` module's functions (passed as callbacks, since
    * the dlt runtime is Python-side). */
  def apply(expectAllOrDrop: Map[String, String] => Unit,
            expectAll: Map[String, String] => Unit): Unit = {
    if (enforced.nonEmpty) expectAllOrDrop(enforced)
    if (observed.nonEmpty) expectAll(observed)
  }
}

object DltExpectations {

  /** Reference `DLTExpectations.from_predicates` (`dlt.py:75`): raw
    * predicates become enforced when `drop = true`, observed otherwise. */
  def fromPredicates(predicates: Map[String, String], drop: Boolean = false): DltExpectations =
    if (drop) DltExpectations(predicates, Map.empty)
    else DltExpectations(Map.empty, predicates)

  /** Reference `DLTExpectations.from_expectation_plan` (`dlt.py:82`):
    * optional specs are observed, required ones enforced; entries with no
    * expressible predicate are dropped. */
  def fromSpecs(specs: Seq[ExpectationSpec]): DltExpectations = {
    val withPred = specs.flatMap(s => Expectations.sqlPredicate(s).map(p => (s.key, p, s.optional)))
    DltExpectations(
      enforced = withPred.collect { case (k, p, false) => k -> p }.toMap,
      observed = withPred.collect { case (k, p, true) => k -> p }.toMap)
  }

  def fromContract(contract: Contract): DltExpectations =
    fromSpecs(Expectations.fromContract(contract))
}
