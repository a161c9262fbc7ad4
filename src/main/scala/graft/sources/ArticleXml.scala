package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** F23: authors-shaped nested XML extraction
  * (02-data-in-more-complex-formats/authors.py:18-32).
  *
  * The reference walks `./fm/bibl/aug/au` with ElementTree and collects
  * per-author `fnm`/`snm`/`email` child texts plus the REPEATED
  * `insr/@iid` attributes into a list. The Spark-first equivalent: read
  * the article with the built-in XML source (rowTag = the document
  * root), then the multi-level path is one nested-struct access —
  * `fm.bibl.aug.au` is an array column — and the repeated attribute is
  * a `transform` over the child-struct array. Document order (the
  * reference's list order) is preserved by `posexplode`.
  *
  * At scale this is one narrow projection per article file — the XML
  * source splits files across executors and the extraction is pure
  * expression work (no UDF, no driver-side tree walk).
  */
object ArticleXml {

  /** One row per author in document order:
    * (ord, fnm, snm, email, insr: array<string>).
    */
  def authors(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("rowTag", "art")
      .option("attributePrefix", "_")
      .xml(path)
      .select(posexplode(col("fm.bibl.aug.au")).as(Seq("ord", "au")))
      .select(
        col("ord"),
        col("au.fnm").as("fnm"),
        col("au.snm").as("snm"),
        col("au.email").as("email"),
        transform(col("au.insr"), i => i.getField("_iid")).as("insr"))
}
