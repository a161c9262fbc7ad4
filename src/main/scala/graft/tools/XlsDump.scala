package graft.tools

import graft.sources.XlsBinary

/** Debug dump for the binary .xls reader: dims, header row, sample rows. */
object XlsDump {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse(
      "/root/reference/01-data-extraction-fundamentals/2013_ERCOT_Hourly_Load_Data.xls")
    val grid = XlsBinary.readGrid(path)
    println(s"rows=${grid.length} cols=${grid.headOption.map(_.length).getOrElse(0)}")
    println("header: " + grid.head.map(_.getOrElse("∅")).mkString(" | "))
    for (r <- Seq(1, 2, grid.length - 1))
      println(s"row $r: " + grid(r).map(_.getOrElse("∅")).mkString(" | "))
    // spot stats: max of each non-first column
    val header = grid.head
    for (c <- 1 until header.length) {
      val vals = grid.drop(1).flatMap(_(c)).collect { case d: Double => d }
      if (vals.nonEmpty)
        println(f"col $c (${header(c).getOrElse("?")}): n=${vals.length} max=${vals.max}%.6f")
    }
  }
}
