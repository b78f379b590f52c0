package graft.align

import graft.contracts.{Contract, FieldDef, OdcsTypes}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DataFrame ↔ contract schema alignment.
  *
  * One declarative `select` of cast/aliased columns (reference:
  * dc43 `spark/validation.py:20-60`): contract columns in contract order,
  * auto-cast to the declared type, columns missing from the frame added as
  * typed nulls. Because it is a plain projection, Catalyst prunes the
  * parquet `ReadSchema` down to the contract columns — at 100 TB the scan
  * only reads what the contract declares.
  */
object ApplyContract {

  def sparkType(f: FieldDef): DataType =
    if (f.fields.nonEmpty)
      StructType(f.fields.map(c => StructField(c.name, sparkType(c), nullable = !c.required)))
    else if (f.items.isDefined)
      ArrayType(sparkType(f.items.get), containsNull = !f.items.get.required)
    else f.odcsType match {
      case "bigint"    => LongType
      case "int"       => IntegerType
      case "smallint"  => ShortType
      case "tinyint"   => ByteType
      case "float"     => FloatType
      case "double"    => DoubleType
      case "decimal"   => DecimalType(38, 18)
      case "boolean"   => BooleanType
      case "date"      => DateType
      case "timestamp" => TimestampType
      case "binary"    => BinaryType
      case _           => StringType
    }

  /** Contract → Spark StructType (reference `contracts.py:242-254`). */
  def toStructType(contract: Contract): StructType =
    StructType(contract.properties.map(f => StructField(f.name, sparkType(f), nullable = !f.required)))

  /** Align `df` to the contract: select contract columns (casting when
    * `autoCast`), materialise missing columns as typed nulls; extra columns
    * dropped unless `keepExtraColumns`. */
  def align(
      df: DataFrame,
      contract: Contract,
      autoCast: Boolean = true,
      keepExtraColumns: Boolean = false
  ): DataFrame = {
    val present = df.columns.toSet
    val fields = contract.properties
    if (fields.isEmpty) return df
    val q = graft.quality.Expectations.qcol _
    val contractCols: Seq[Column] = fields.map { f =>
      val target = sparkType(f)
      if (present.contains(f.name)) {
        if (autoCast) q(f.name).cast(target).alias(f.name) else q(f.name)
      } else lit(null).cast(target).alias(f.name)
    }
    if (keepExtraColumns) {
      val names = fields.map(_.name).toSet
      val extras = df.columns.filterNot(names.contains).map(q).toSeq
      df.select(contractCols ++ extras: _*)
    } else df.select(contractCols: _*)
  }
}
