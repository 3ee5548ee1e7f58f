package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ScalarFunctions

/** Oracle-checkable queries over the normalize-stage scalar functions
  * (SURVEY §2.8): deterministic inputs derived from the driver tables so
  * DuckDB can compute the identical expected output.
  */
object NormOps {

  private def keys(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/part.parquet").select(col("p_partkey").as("k"))

  /** C5 slugify over part names (ASCII builtin-chain form). */
  def slugify(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey").as("k"),
        ScalarFunctions.slugifyCol(col("p_name")).as("slug"))

  /** C11 OpenSCAD dims: synthetic cube/cylinder strings per key. */
  def openscadDims(spark: SparkSession, sfDir: String): DataFrame = {
    val shape = when(pmod(col("k"), lit(2)) === 0,
      concat(lit("cube(size=["), pmod(col("k"), lit(500)).cast("string"), lit(","),
        pmod(col("k"), lit(300)).cast("string"), lit(","),
        pmod(col("k"), lit(150)).cast("string"), lit("])")))
      .otherwise(concat(lit("cylinder(h="), pmod(col("k"), lit(90)).cast("string"),
        lit(",r="), pmod(col("k"), lit(40)).cast("string"), lit(")")))
    val unit = element_at(array(lit("mm"), lit("cm"), lit("m")),
      (pmod(col("k"), lit(3)) + 1).cast("int"))
    val dims = ScalarFunctions.openScadDimsUdf(col("openscad"), col("unit"))
    keys(spark, sfDir)
      .withColumn("openscad", shape)
      .withColumn("unit", unit)
      .withColumn("d", dims)
      .select(col("k"), col("openscad"), col("unit"),
        floor(col("d.width")).cast("long").as("width_mm"),
        floor(col("d.height")).cast("long").as("height_mm"),
        floor(col("d.depth")).cast("long").as("depth_mm"))
  }

  /** C12 SPDX split: four expression shapes incl. the WITH-quirk case,
    * exploded with position columns.
    */
  def spdxSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val expr0 = element_at(array(
      lit("MIT"),
      lit("MIT AND CC-BY-4.0"),
      lit("GPL-3.0-or-later OR MIT"),
      lit("GPL-2.0-only WITH Classpath-exception-2.0")),
      (pmod(col("k"), lit(4)) + 1).cast("int"))
    keys(spark, sfDir)
      .withColumn("expression", expr0)
      .select(col("k"), col("expression"),
        posexplode(ScalarFunctions.spdxSplitUdf(col("expression"))).as(Seq("pos", "token")))
      .withColumn("pos", col("pos").cast("long"))
  }

  /** C21 person parse over synthetic licensor strings. */
  def personParse(spark: SparkSession, sfDir: String): DataFrame = {
    val user = when(pmod(col("k"), lit(3)) === 0, concat(lit("User "), col("k").cast("string")))
      .when(pmod(col("k"), lit(3)) === 1,
        concat(lit("User "), col("k").cast("string"), lit(" <u"), col("k").cast("string"),
          lit("@x.org>")))
      .otherwise(concat(lit("User "), col("k").cast("string"), lit(" (Org"),
        pmod(col("k"), lit(5)).cast("string"), lit(")<u"), col("k").cast("string"),
        lit("@x.org>")))
    val p = ScalarFunctions.parsePersonUdf(col("user"))
    keys(spark, sfDir)
      .withColumn("user", user)
      .select(col("k"), col("user"),
        p.getField("name").as("name"),
        p.getField("org").as("org"),
        p.getField("email").as("email"))
  }

  /** C9 datetime parse: format each order date to an ISO string, parse back
    * with the engine parser, compare as a formatted string.
    */
  def datetimeParse(spark: SparkSession, sfDir: String): DataFrame = {
    val iso = date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss+00:00")
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), iso.as("iso"))
      .withColumn("parsed",
        date_format(ScalarFunctions.strToTimestampUdf(col("iso")), "yyyy-MM-dd HH:mm:ss"))
      .select(col("o_orderkey"), col("iso"), col("parsed"))
  }

  /** C10/J5: mime-type + file-category broadcast joins over synthetic file
    * names.
    */
  def mimeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val exts = Seq("stl", "scad", "png", "md", "kicad_pcb", "zip", "xyz")
    val ext = element_at(array(exts.map(lit): _*), (pmod(col("k"), lit(7)) + 1).cast("int"))
    keys(spark, sfDir)
      .withColumn("ext", ext)
      .join(broadcast(ScalarFunctions.mimeTypesDf(spark))
        .withColumnRenamed("extension", "m_ext"), col("ext") === col("m_ext"), "left_outer")
      .join(broadcast(ScalarFunctions.fileFormatsDf(spark)),
        col("ext") === col("extension"), "left_outer")
      .select(col("k"), col("ext"), col("mime_type"), col("file_type"), col("category"))
  }
}
