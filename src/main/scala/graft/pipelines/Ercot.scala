package graft.pipelines

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Clean
import graft.sources.XlsBinary

/** The reference's binary-Excel pipeline (S5 + A11/K2,
  * 01-data-extraction-fundamentals/excel_csv.py + ercot_coast_stats
  * .py): read the 2013 ERCOT hourly-load workbook, find the time and
  * value of max load per region.
  *
  * The .xls grid is parsed driver-side (a workbook is one unsplittable
  * blob; XlsBinary.readMany is the many-files distributed path) and
  * immediately becomes a melted (station, serial, load) DataFrame —
  * everything after the 65k-cell parse is ordinary distributed Spark.
  */
object Ercot {

  val defaultXls: String = sys.env.getOrElse("SPARK_GRAFT_ERCOT_XLS",
    "/root/reference/01-data-extraction-fundamentals/2013_ERCOT_Hourly_Load_Data.xls")

  val root: String = sys.env.getOrElse("SPARK_GRAFT_ERCOT_DIR", "/root/repo/data/ercot")
  def meltedPath: String = s"$root/hourly_loads.parquet"

  /** Workbook grid → melted (station, serial, load) rows. Column 0 is
    * the Hour_End serial date; every other header cell names a region
    * series (the reference iterates range(1, len(header)-1), i.e. it
    * EXCLUDES the final ERCOT total column — replicated here).
    */
  def melt(spark: SparkSession, xlsPath: String = defaultXls): DataFrame = {
    import spark.implicits._
    val grid = XlsBinary.readGrid(xlsPath)
    val header = grid.head.map(_.fold("")(_.toString))
    val rows = for {
      r <- grid.iterator.drop(1)
      serial <- r.headOption.flatten.collect { case d: Double => d }.iterator
      c <- (1 until header.length - 1).iterator // drop trailing total col
      load <- r(c).collect { case d: Double => d }.iterator
    } yield (header(c), serial, load)
    rows.toSeq.toDF("station", "serial", "load")
  }

  /** Per-region max load + its (first) occurrence time, shaped like
    * excel_csv.py's output table: Station|Year|Month|Day|Hour|Max Load.
    * First-occurrence tiebreak = min serial among max rows (the
    * reference uses list.index(max)).
    */
  def maxLoads(melted: DataFrame): DataFrame = {
    val m = melted.groupBy("station").agg(max(col("load")).as("max_load"))
    val firstAt = melted.as("e")
      .join(m.as("m"), col("e.station") === col("m.station") &&
        col("e.load") === col("m.max_load"))
      .groupBy(col("e.station").as("station"))
      .agg(min(col("e.serial")).as("serial"), max(col("e.load")).as("max_load"))
    val ts = Clean.excelSerialToTimestamp(col("serial")).cast("timestamp_ntz")
    firstAt.select(col("station"),
        year(ts).cast("long").as("year"),
        month(ts).cast("long").as("month"),
        dayofmonth(ts).cast("long").as("day"),
        hour(ts).cast("long").as("hour"),
        col("max_load"))
      .orderBy("station")
  }

  @volatile private var ready = false

  /** Persist the melted table for the declared s5 query + its DuckDB
    * mirror (both read this parquet). No-op if the reference workbook
    * is absent AND a previously-built fixture exists.
    */
  def ensure(spark: SparkSession): Unit = if (!ready) synchronized {
    if (ready) return
    if (!new File(s"$meltedPath/_SUCCESS").exists()) {
      require(new File(defaultXls).exists(), s"no ERCOT workbook at $defaultXls")
      melt(spark).repartition(4).write.mode("overwrite").parquet(meltedPath)
    }
    ready = true
  }
}
