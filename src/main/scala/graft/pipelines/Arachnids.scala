package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Clean

/** DBpedia arachnid infobox cleaning pipeline
  * (04/processing.py:45-105; SURVEY §2.9 R4 + §2.2 K6/J1).
  *
  * Output shape (04-working-with-mongodb/processing.py:69-74):
  *   label, uri, description, name,
  *   synonym array<string>,
  *   classification struct<kingdom,family,order,phylum,genus,class>
  * Cleaning rules: `_label`-suffixed taxonomy fields route into the
  * `classification` sub-document; `NULL`/empty → null; values trimmed;
  * `name` falls back to `label` minus its parenthesized qualifier when
  * not alphanumeric (processing.py:79-84); synonym decodes the `{a|b}`
  * encoding (processing.py:93-97).
  */
object Arachnids {

  private val classificationFields =
    Seq("kingdom", "family", "order", "phylum", "genus", "class")

  private def cleanVal(c: Column): Column =
    Clean.nullifySentinels(trim(c))

  def clean(df: DataFrame): DataFrame = {
    val nameCol = {
      val rawName = cleanVal(col("name"))
      val label = col("`rdf-schema#label`")
      when(rawName.isNotNull && Clean.isAlnum(rawName), rawName)
        .otherwise(Clean.stripParenSuffix(label))
    }
    df.select(
      col("`rdf-schema#label`").as("label"),
      col("URI").as("uri"),
      cleanVal(col("description")).as("description"),
      nameCol.as("name"),
      when(cleanVal(col("synonym")).isNotNull,
        Clean.decodeEncodedArray(col("synonym"))).as("synonym"),
      struct(classificationFields.map(f =>
        cleanVal(col(s"${f}_label")).as(f)): _*).as("classification"))
  }

  /** K6/J1: add `classification.binomialAuthority` from a (label →
    * authority) lookup, as a broadcast left join + struct rebuild —
    * the distributed form of the reference's per-document point update
    * (04/update.py:56-76).
    */
  def addBinomialAuthority(docs: DataFrame, lookup: DataFrame): DataFrame = {
    val lk = broadcast(lookup.select(col("label").as("__lk_label"),
      col("authority").as("__lk_authority")))
    docs.join(lk, docs("label") === lk("__lk_label"), "left")
      .withColumn("classification",
        struct((classificationFields.map(f =>
          col(s"classification.$f").as(f)) :+
          col("__lk_authority").as("binomialAuthority")): _*))
      .drop("__lk_label", "__lk_authority")
  }
}
