package graft.contracts

/** Schema-evolution compatibility: classify the changes between two
  * contract versions and say whether data written under the OLD
  * contract is still readable/valid under the NEW one — the pre-publish
  * gate a governance flow runs before accepting a draft (the question
  * behind every `bump` the Drafter picks). Breaking (for consumers of
  * the new contract over existing data):
  *
  * - column REMOVED (consumers lose a field),
  * - column added as REQUIRED (existing rows have no value for it),
  * - type changed other than a lossless widening
  *   ([[OdcsTypes.losslesslyWidensTo]] — the align layer's own rule),
  * - requiredness or uniqueness TIGHTENED (old data was never held to
  *   it).
  *
  * Loosening (dropping required/unique, widening a type, adding an
  * optional column) is non-breaking. Quality-rule changes are reported
  * as changes but never breaking here: rules gate VALIDATION verdicts,
  * not readability — the Split/Flag strategies exist precisely to
  * handle rows an added rule rejects. */
object Compat {

  sealed trait SchemaChange {
    def column: String
    def breaking: Boolean
    def describe: String
  }
  final case class ColumnAdded(column: String, required: Boolean)
      extends SchemaChange {
    def breaking: Boolean = required
    def describe: String =
      s"column '$column' added${if (required) " as REQUIRED (breaking)" else " (optional)"}"
  }
  final case class ColumnRemoved(column: String) extends SchemaChange {
    def breaking = true
    def describe = s"column '$column' removed (breaking)"
  }
  final case class TypeChanged(column: String, from: String, to: String)
      extends SchemaChange {
    def breaking: Boolean =
      from != to && !OdcsTypes.losslesslyWidensTo(from, to)
    def describe: String =
      s"column '$column' type $from -> $to" +
        (if (breaking) " (breaking narrow/incompatible)" else " (lossless widening)")
  }
  final case class RequirednessChanged(column: String, nowRequired: Boolean)
      extends SchemaChange {
    def breaking: Boolean = nowRequired
    def describe: String =
      s"column '$column' ${if (nowRequired) "now REQUIRED (breaking)" else "no longer required"}"
  }
  final case class UniquenessChanged(column: String, nowUnique: Boolean)
      extends SchemaChange {
    def breaking: Boolean = nowUnique
    def describe: String =
      s"column '$column' ${if (nowUnique) "now UNIQUE (breaking)" else "no longer unique"}"
  }
  final case class RulesChanged(column: String, added: Int, removed: Int)
      extends SchemaChange {
    def breaking = false
    def describe = s"column '$column' quality rules: +$added/-$removed (validation-only)"
  }

  /** Ordered change list between two contract versions (first-wins
    * property semantics, as the engine reads them). */
  def diff(oldC: Contract, newC: Contract): Seq[SchemaChange] = {
    val o = oldC.properties.map(f => f.name -> f).toMap
    val n = newC.properties.map(f => f.name -> f).toMap
    val oldOrder = oldC.properties.map(_.name)
    val added = newC.properties.filterNot(f => o.contains(f.name))
      .map(f => ColumnAdded(f.name, f.required))
    val removed = oldOrder.filterNot(n.contains).map(ColumnRemoved)
    val common = oldOrder.filter(n.contains).flatMap { name =>
      val of = o(name); val nf = n(name)
      val t =
        if (of.odcsType != nf.odcsType)
          Seq(TypeChanged(name, of.odcsType, nf.odcsType)) else Nil
      val r =
        if (of.required != nf.required)
          Seq(RequirednessChanged(name, nf.required)) else Nil
      val u =
        if (of.unique != nf.unique)
          Seq(UniquenessChanged(name, nf.unique)) else Nil
      val q = {
        val addedRules = nf.quality.diff(of.quality).size
        val removedRules = of.quality.diff(nf.quality).size
        if (addedRules + removedRules > 0)
          Seq(RulesChanged(name, addedRules, removedRules)) else Nil
      }
      t ++ r ++ u ++ q
    }
    removed ++ common ++ added
  }

  /** Old-contract data readable and type-valid under the new one? */
  def isCompatible(oldC: Contract, newC: Contract): Boolean =
    !diff(oldC, newC).exists(_.breaking)

  /** SemVer bump the change set warrants: breaking → major, any other
    * schema/rule change → minor, none → patch (the Drafter's bump
    * levels made decidable from the diff instead of hand-picked). */
  def recommendedBump(changes: Seq[SchemaChange]): String =
    if (changes.exists(_.breaking)) "major"
    else if (changes.nonEmpty) "minor"
    else "patch"
}
