package graft.contracts

import org.scalatest.funsuite.AnyFunSuite

class CompatSpec extends AnyFunSuite {

  private def c(fields: FieldDef*): Contract =
    Contract("c", "1.0.0", schema = Seq(SchemaObjectDef("t", fields.toSeq)))

  private val id = FieldDef("id", physicalType = Some("bigint"),
    required = true, unique = true)
  private val name = FieldDef("name", physicalType = Some("string"))

  test("identical contracts diff empty, bump patch, compatible") {
    val changes = Compat.diff(c(id, name), c(id, name))
    assert(changes.isEmpty)
    assert(Compat.recommendedBump(changes) == "patch")
    assert(Compat.isCompatible(c(id, name), c(id, name)))
  }

  test("optional add and lossless widen are minor; required add and remove are major") {
    val widened = name.copy(physicalType = Some("string"))
    val newOpt = c(id, name, FieldDef("tag", physicalType = Some("string")))
    val ch1 = Compat.diff(c(id, name), newOpt)
    assert(ch1 == Seq(Compat.ColumnAdded("tag", required = false)))
    assert(Compat.recommendedBump(ch1) == "minor")

    val intF = FieldDef("n", physicalType = Some("int"))
    val widenedC = Compat.diff(c(id, intF),
      c(id, intF.copy(physicalType = Some("bigint"))))
    assert(widenedC.forall(!_.breaking) &&
      Compat.recommendedBump(widenedC) == "minor")

    val reqAdd = Compat.diff(c(id),
      c(id, FieldDef("must", physicalType = Some("string"), required = true)))
    assert(reqAdd.exists(_.breaking) && Compat.recommendedBump(reqAdd) == "major")

    val rem = Compat.diff(c(id, name), c(id))
    assert(rem == Seq(Compat.ColumnRemoved("name")))
    assert(Compat.recommendedBump(rem) == "major")
  }

  test("narrowing, tightening requiredness/uniqueness break; loosening does not") {
    val big = FieldDef("n", physicalType = Some("bigint"))
    val narrow = Compat.diff(c(big), c(big.copy(physicalType = Some("int"))))
    assert(narrow.exists(_.breaking), "bigint -> int must break")

    val tighten = Compat.diff(c(name), c(name.copy(required = true)))
    assert(tighten.exists(_.breaking))
    val loosen = Compat.diff(c(id), c(id.copy(required = false, unique = false)))
    assert(loosen.nonEmpty && loosen.forall(!_.breaking))
    assert(Compat.recommendedBump(loosen) == "minor")

    val uniq = Compat.diff(c(name), c(name.copy(unique = true)))
    assert(uniq.exists(_.breaking), "new uniqueness holds old data to a new bar")
  }

  test("quality-rule changes are validation-only: reported, never breaking") {
    val rule = QualityRule(rule = Some("enum"), values = Seq("a", "b"))
    val ch = Compat.diff(c(name), c(name.copy(quality = Seq(rule))))
    assert(ch == Seq(Compat.RulesChanged("name", added = 1, removed = 0)))
    assert(ch.forall(!_.breaking))
    assert(Compat.recommendedBump(ch) == "minor")
  }

  test("type alias spellings canonicalise before comparison") {
    val longF = FieldDef("n", physicalType = Some("long"))
    val bigF = FieldDef("n", physicalType = Some("bigint"))
    assert(Compat.diff(c(longF), c(bigF)).isEmpty,
      "long and bigint are the same canonical type")
  }
}
