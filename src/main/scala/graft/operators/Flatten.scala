package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Strings

/** Recursive schema flattening (SURVEY §2.2 P2): nested records become flat
  * dotted columns, mirroring the reference's CSV converter
  * (format/CsvAvroDataConverter.kt:42-87).
  *
  * Map/array handling follows SURVEY §1.3's plan:
  *  - default: JSON-encode maps and arrays into a single column (schema is a
  *    pure function of the Avro schema — stable headers at any scale);
  *  - `explodeArrays`: additionally turn arrays into per-index columns
  *    `prefix.0..prefix.(n-1)` using a DATA-DEPENDENT max length computed in
  *    one aggregate pass — the two-pass schema-union equivalent of the
  *    reference's first-record-defined header
  *    (format/RecordConverterFactory.kt:115-127).
  *
  * Binary columns become unpadded base64 strings (F8).
  */
object Flatten {

  /** Flat dotted projection of every leaf in `schema`. Pure plan-time
    * function of the schema: all work happens inside whole-stage codegen. */
  def flattenColumns(schema: StructType, prefix: String = ""): Seq[Column] =
    schema.fields.toSeq.flatMap { f =>
      val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      val path = col(quote(name))
      f.dataType match {
        case s: StructType => flattenStruct(path, s, name)
        case _             => Seq(leaf(path, f.dataType, name))
      }
    }

  private def flattenStruct(parent: Column, s: StructType, prefix: String): Seq[Column] =
    s.fields.toSeq.flatMap { f =>
      val name = s"$prefix.${f.name}"
      val child = parent.getField(f.name)
      f.dataType match {
        case n: StructType => flattenStruct(child, n, name)
        case dt            => Seq(leaf(child, dt, name))
      }
    }

  private def leaf(c: Column, dt: DataType, name: String): Column = dt match {
    case BinaryType               => Strings.base64Unpadded(c).as(name)
    case _: MapType | _: ArrayType => to_json(c).as(name)
    case _                        => c.as(name)
  }

  /** Dotted column names a flatten of `schema` will produce, in order. */
  def flattenedNames(schema: StructType, prefix: String = ""): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case s: StructType => flattenedNames(s, name)
        case _             => Seq(name)
      }
    }

  /** Apply the flatten to a DataFrame. */
  def flatten(df: DataFrame): DataFrame =
    df.select(flattenColumns(df.schema): _*)

  /** Array columns -> per-index columns `name.0..name.(maxLen-1)`, with the
    * max length measured from the data in one aggregate pass (two-pass
    * schema union; SURVEY §7.4 hard part 2). Run BEFORE flatten when the
    * reference's per-index CSV layout is required. */
  def explodeArraysByIndex(df: DataFrame): DataFrame = {
    val arrayCols = df.schema.fields.filter(_.dataType.isInstanceOf[ArrayType])
    if (arrayCols.isEmpty) df
    else {
      val maxLens = df
        .agg(
          max(size(col(quote(arrayCols.head.name)))).as(arrayCols.head.name),
          arrayCols.tail.map(f => max(size(col(quote(f.name)))).as(f.name)).toSeq: _*)
        .head()
      arrayCols.foldLeft(df) { (d, f) =>
        val n = math.max(maxLens.getAs[Int](f.name), 0)
        val elem = f.dataType.asInstanceOf[ArrayType].elementType
        val cols = (0 until n).map { i =>
          val c = element_at(col(quote(f.name)), i + 1)
          (elem match {
            case _: StructType => c
            case BinaryType    => Strings.base64Unpadded(c)
            case _             => c
          }).as(s"${f.name}.$i")
        }
        val others = d.columns.filterNot(_ == f.name).map(c => col(quote(c)))
        d.select(others.toSeq ++ cols: _*)
      }
    }
  }

  private def quote(name: String): String = s"`$name`"
}
