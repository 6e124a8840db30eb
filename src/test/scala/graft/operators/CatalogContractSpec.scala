package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Catalog-wide output-shape contract: the driver's pandas-based checker
  * sorts result rows column-by-column, and a top-level array (or map, or
  * struct) column kills that sort with "unhashable type: numpy.ndarray" —
  * the query then gets ZERO driver signal, not even the rows-only count
  * (round-7 q78/q94 regression). Every catalog query must therefore leave
  * the engine with scalar-only top-level columns: vectors become y0..yN
  * scalar columns (q78), posting lists serialize to a canonical string
  * (q94). This spec pins that contract for all current AND future entries.
  */
class CatalogContractSpec extends SparkSpec {

  test("every catalog query emits scalar-only top-level columns") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val bad = q(spark, sf0001).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType]
            || f.dataType.isInstanceOf[MapType]
            || f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
        bad
    }
    assert(offenders.isEmpty,
      s"driver-unsortable top-level columns:\n  ${offenders.mkString("\n  ")}")
  }
}
