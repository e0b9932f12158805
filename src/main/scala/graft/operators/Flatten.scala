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
    // a null-only avro union maps to NullType; a raw void column cannot be
    // written to CSV (csvColumns' twin already casts — keep them aligned)
    case NullType                 => c.cast(StringType).as(name)
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

  /** Data-dependent CSV layout (format/RecordConverterFactory.kt:115-127):
    * the reference names map-key columns `prefix.<key>` and array-element
    * columns `prefix.<index>` from the DATA — keys in first-seen order,
    * indices up to the observed length. `mapKeys`/`arrayLens` are keyed by
    * the dotted path of the container column. */
  final case class CsvLayout(mapKeys: Map[String, Seq[String]], arrayLens: Map[String, Int])

  /** Measure the CSV layout of `df` in a schema-derivation pass: max
    * observed length per array path, first-seen-ordered distinct keys per
    * map path. The result is metadata-sized (keys + lengths), and the pass
    * costs one tiny aggregate job for all struct-reachable arrays plus one
    * per map path — fine at any scale, since each reduces to a handful of
    * grouped values regardless of row count.
    *
    * `orderCol` pins "first-seen": rows are ordered by it before key order
    * is taken (use the record offset); without it, encounter order within
    * the scan (partition-ordered) is used — stable for a single input file,
    * which is the reference's own granularity (header = first record of the
    * file).
    *
    * Containers nested INSIDE map values / array elements are measured
    * recursively per expanded path (rare in practice; each adds one tiny
    * job). */
  def csvLayout(df: DataFrame, orderCol: Option[String] = None): CsvLayout = {
    val base = df.withColumn("__csv_ord",
      orderCol.map(c => col(quote(c)).cast(LongType)).getOrElse(monotonically_increasing_id()))
    val mapKeys = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
    val arrLens = scala.collection.mutable.LinkedHashMap.empty[String, Int]

    // container paths reachable through structs only, with their extractors
    def reach(expr: Column, dt: DataType, name: String,
              maps: scala.collection.mutable.ArrayBuffer[(String, Column, MapType)],
              arrs: scala.collection.mutable.ArrayBuffer[(String, Column, ArrayType)]): Unit =
      dt match {
        case s: StructType =>
          s.fields.foreach(f => reach(expr.getField(f.name), f.dataType, s"$name.${f.name}", maps, arrs))
        case m: MapType   => maps += ((name, expr, m))
        case a: ArrayType => arrs += ((name, expr, a))
        case _            =>
      }

    def measure(exprs: Seq[(Column, DataType, String)]): Unit = {
      val maps = scala.collection.mutable.ArrayBuffer.empty[(String, Column, MapType)]
      val arrs = scala.collection.mutable.ArrayBuffer.empty[(String, Column, ArrayType)]
      exprs.foreach { case (e, dt, n) => reach(e, dt, n, maps, arrs) }
      if (arrs.nonEmpty) {
        val row = base
          .agg(max(size(arrs.head._2)).as("0"),
            arrs.tail.toSeq.zipWithIndex.map { case ((_, e, _), i) => max(size(e)).as(s"${i + 1}") }: _*)
          .head()
        arrs.toSeq.zipWithIndex.foreach { case ((name, _, _), i) =>
          arrLens(name) = if (row.isNullAt(i)) 0 else math.max(row.getInt(i), 0)
        }
      }
      maps.foreach { case (name, e, _) => mapKeys(name) = orderedKeys(base, e) }
      // recurse into containers nested inside the measured containers
      maps.foreach { case (name, e, m) =>
        if (hasContainer(m.valueType))
          measure(mapKeys(name).map(k => (e.getItem(k), m.valueType, s"$name.$k")))
      }
      arrs.foreach { case (name, e, a) =>
        if (hasContainer(a.elementType))
          measure((0 until arrLens(name)).map(i => (try_element_at(e, lit(i + 1)), a.elementType, s"$name.$i")))
      }
    }

    measure(df.schema.fields.toSeq.map(f => (col(quote(f.name)), f.dataType, f.name)))
    CsvLayout(mapKeys.toMap, arrLens.toMap)
  }

  private def hasContainer(dt: DataType): Boolean = dt match {
    case s: StructType => s.fields.exists(f => hasContainer(f.dataType))
    case _: MapType | _: ArrayType => true
    case _ => false
  }

  /** Distinct keys of a map column in first-appearance order (row order,
    * then position within the map). */
  private def orderedKeys(base: DataFrame, mapExpr: Column): Seq[String] = {
    base
      .select(col("__csv_ord").as("__o"), posexplode(map_keys(mapExpr)).as(Seq("__p", "__k")))
      .groupBy(col("__k")).agg(min(struct(col("__o"), col("__p"))).as("__first"))
      .orderBy(col("__first"))
      .select(col("__k").cast(StringType))
      .collect().map(_.getString(0)).toSeq
  }

  /** Flatten with the reference's data-dependent CSV header semantics:
    * leaves appear in schema order with maps/arrays expanded IN PLACE —
    * `a, …, i.some, i.other, j.0, j.1, k, l.la, m` for the full-type
    * fixture (format/CsvAvroConverterTest.kt:54-56) — keys/indices taken
    * from `layout`. Missing keys / short arrays yield null (empty CSV
    * cell), the schema-union reading of the reference's roll-to-new-file
    * behavior (worker/RestructureWorker.kt:148-163). */
  def flattenForCsv(df: DataFrame, layout: CsvLayout): DataFrame =
    df.select(csvColumns(df.schema, layout): _*)

  /** The expansion columns of [[flattenForCsv]], for callers that combine
    * them with other columns (the restructure writer's partition keys). */
  def csvColumns(schema: StructType, layout: CsvLayout): Seq[Column] = {
    def expand(expr: Column, dt: DataType, name: String): Seq[Column] = dt match {
      case s: StructType =>
        s.fields.toSeq.flatMap(f => expand(expr.getField(f.name), f.dataType, s"$name.${f.name}"))
      case m: MapType =>
        layout.mapKeys.getOrElse(name, Seq.empty)
          .flatMap(k => expand(expr.getItem(k), m.valueType, s"$name.$k"))
      case a: ArrayType =>
        (0 until layout.arrayLens.getOrElse(name, 0))
          .flatMap(i => expand(try_element_at(expr, lit(i + 1)), a.elementType, s"$name.$i"))
      case BinaryType => Seq(Strings.base64Unpadded(expr).as(name))
      case NullType   => Seq(expr.cast(StringType).as(name))
      case _          => Seq(expr.as(name))
    }
    schema.fields.toSeq.flatMap(f => expand(col(quote(f.name)), f.dataType, f.name))
  }

  /** True if `dt` contains a map or array anywhere under struct nesting —
    * callers skip the layout pass entirely for container-free schemas. */
  def needsCsvLayout(dt: DataType): Boolean = hasContainer(dt)

  /** Measure + project in one call. */
  def flattenForCsv(df: DataFrame): DataFrame = flattenForCsv(df, csvLayout(df))

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
          // try_element_at, not element_at: under ANSI mode (Spark 4's
          // default) element_at THROWS past the end, and a ragged array
          // shorter than the data-wide max is exactly the case this
          // null-padding expansion exists for (csvColumns' twin already
          // uses it)
          val c = try_element_at(col(quote(f.name)), lit(i + 1))
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
