package graft

import java.io.File

import graft.pipelines.Ercot
import graft.sources.XlsBinary

/** Binary .xls reader (S5) against the reference's REAL workbook, with
  * the goldens from 01-data-extraction-fundamentals/excel_csv.py:
  * 8 stations, FAR_WEST max 2281.2722140000024 at 2013-06-26 hour 17.
  */
class ErcotXlsSpec extends SparkSpec {

  private def xls = Ercot.defaultXls
  private def available = new File(xls).exists()

  test("S5 OLE2+BIFF8 parse: grid shape and header (excel_csv.py:22-31)") {
    assume(available, s"reference workbook not mounted at $xls")
    val grid = XlsBinary.readGrid(xls)
    assert(grid.length == 7296 && grid.head.length == 10)
    assert(grid.head.flatten == Seq("Hour_End", "COAST", "EAST", "FAR_WEST",
      "NORTH", "NORTH_C", "SOUTHERN", "SOUTH_C", "WEST", "ERCOT"))
    // numeric grid is dense: every data row has all 10 values
    assert(grid.drop(1).forall(r => r.flatten.length == 10))
  }

  test("S5 max-loads pipeline matches excel_csv.py's asserted answer") {
    assume(available, s"reference workbook not mounted at $xls")
    val out = Ercot.maxLoads(Ercot.melt(spark)).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("COAST", "EAST", "FAR_WEST",
      "NORTH", "NORTH_C", "SOUTHERN", "SOUTH_C", "WEST"))
    val fw = out.find(_.getString(0) == "FAR_WEST").get
    assert(math.abs(fw.getDouble(5) - 2281.2722140000024) < 1e-9)
    assert((fw.getLong(1), fw.getLong(2), fw.getLong(3), fw.getLong(4)) ==
      ((2013L, 6L, 26L, 17L)))
  }

  test("distributed readMany yields the same cells as the local parse") {
    assume(available, s"reference workbook not mounted at $xls")
    val local = XlsBinary.readCells(xls)
    val dist = XlsBinary.readMany(spark, xls)
    assert(dist.count() == local.length.toLong)
    import org.apache.spark.sql.functions._
    val sums = dist.agg(
      sum(when(col("str").isNull, col("num")).otherwise(lit(0.0))),
      count(when(col("str").isNotNull, lit(1)))).collect()(0)
    val localNumSum = local.collect { case XlsBinary.Cell(_, _, d: Double) => d }.sum
    val localStrCount = local.count(_.value.isInstanceOf[String])
    assert(math.abs(sums.getDouble(0) - localNumSum) < 1e-6)
    assert(sums.getLong(1) == localStrCount.toLong)
  }
}
