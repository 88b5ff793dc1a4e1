package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of several
  * clustering columns into one sort key, range-partition and sort files
  * by it, and every interleaved dimension gets NARROW per-file min/max
  * ranges — so a filter on ANY of the dimensions prunes files/row-groups
  * at the scan, not just a filter on the leading sort column.
  *
  * This is the standard multi-dimensional clustering story (the same
  * curve Delta Lake's OPTIMIZE ZORDER BY and Iceberg's sort orders use):
  * a single-column sort gives perfect pruning on that column and none on
  * the others; the Z-curve trades a little of the leading column's
  * locality for bounded locality in all of them. At 100 TB this is a
  * write-time layout decision — the query side is unchanged parquet
  * pruning against file statistics.
  */
object ZOrder {
  /** The Morton value of two non-negative ints, `bits` bits each: bit i
    * of `a` lands at position 2i, bit i of `b` at 2i+1. Pure integer
    * column arithmetic — codegen'd, no UDF.
    */
  def zvalue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Write `df` to `out` as parquet, clustered along the Z-curve of the
    * two given columns (low `bits` bits of each). Range partitioning by
    * the z value balances files by data volume; the within-partition
    * sort makes per-file column statistics tight.
    */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, bits: Int,
      numFiles: Int, out: String): Unit =
    df.withColumn("__z", zvalue(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(out)
}
