package graft.io

import graft.core.NatOrder
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.io.Source

/** Genome-assembly metadata database (reference `io/assembly.py:26-184`,
  * data files under `io/data/`). The registry and per-assembly seqinfo /
  * cytoband tables ship as packaged TSV resources — no network, mirroring
  * the reference's packaged YAML/TSV. These are small dimension tables:
  * they are parsed driver-side and surfaced as DataFrames so they can be
  * broadcast-joined against interval relations.
  */
object Assembly {

  /** @param seqinfo   (name, length, role, molecule, unit, aliases)
    * @param cytobands (chrom, start, end, band, stain) when packaged
    * @param aliasMap  every alias (and name) -> canonical sequence name
    */
  case class GenomeAssembly(
      organism: String, provider: String, providerBuild: String,
      releaseYear: String, seqinfo: DataFrame,
      cytobands: Option[DataFrame], url: Option[String],
      aliasMap: Map[String, String]) {

    def chromsizes: DataFrame =
      seqinfo.select(col("name").as("chrom"), col("length"))

    def chromnames: Seq[String] =
      seqinfo.select("name").collect().map(_.getString(0)).toSeq

    /** The assembly as a viewframe `[0, length)` per sequence, in seqinfo
      * (natural) order. */
    def viewframe: DataFrame =
      seqinfo.select(col("name").as("chrom"), lit(0L).as("start"),
        col("length").as("end"), col("name").as("name"))
  }

  private val root = "/graft/assemblies/"

  private def resourceLines(file: String): Seq[String] = {
    val in = getClass.getResourceAsStream(root + file)
    require(in != null, s"packaged assembly resource not found: $file")
    try Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  private def tsv(spark: SparkSession, file: String): DataFrame = {
    val lines = resourceLines(file)
    val header = lines.head.split("\t", -1).toSeq
    val rows = lines.tail.map { l =>
      org.apache.spark.sql.Row.fromSeq(l.split("\t", -1).toSeq.padTo(header.size, ""))
    }
    val schema = org.apache.spark.sql.types.StructType(header.map(n =>
      org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** The registry of packaged assemblies (reference
    * `assemblies_available`, `io/assembly.py:69-82`). */
  def assembliesAvailable(spark: SparkSession): DataFrame =
    tsv(spark, "_assemblies.tsv")

  /** Look up one assembly: `"hg38"` (build) or `"ucsc.hg38"`
    * (provider-qualified). `roles`/`units` filter seqinfo rows; `None`
    * applies the assembly's defaults, `Some(Seq("all"))` keeps everything
    * (reference `assembly_info`, `io/assembly.py:85-184`). */
  def assemblyInfo(spark: SparkSession, name: String,
                   roles: Option[Seq[String]] = None,
                   units: Option[Seq[String]] = None): GenomeAssembly = {
    val (provider, build) = name.split("\\.", 2) match {
      case Array(p, b) => (Some(p.toLowerCase), b)
      case _           => (None, name)
    }
    val registry = resourceLines("_assemblies.tsv")
    val header = registry.head.split("\t", -1)
    val idx = header.zipWithIndex.toMap
    val hits = registry.tail.map(_.split("\t", -1).padTo(header.length, ""))
      .filter { f =>
        f(idx("provider_build")) == build &&
          provider.forall(_ == f(idx("provider")))
      }
    require(hits.nonEmpty, s"Assembly not found: $name")
    require(hits.size == 1, s"Assembly identifier not unique: $name " +
      s"(matches ${hits.map(f => f(idx("provider"))).mkString(", ")})")
    val a = hits.head
    def field(n: String) = a(idx(n))

    val defaultRoles = field("default_roles").split(",").toSeq
    val defaultUnits = field("default_units").split(",").toSeq
    val keepRoles = roles.getOrElse(defaultRoles)
    val keepUnits = units.getOrElse(defaultUnits)

    var seqinfo = tsv(spark, field("seqinfo"))
      .withColumn("length", col("length").cast("long"))
    if (!keepRoles.contains("all"))
      seqinfo = seqinfo.filter(col("role").isin(keepRoles: _*))
    if (!keepUnits.contains("all"))
      seqinfo = seqinfo.filter(col("unit").isin(keepUnits: _*))

    val aliasMap = seqinfo.select("name", "aliases").collect().flatMap { r =>
      val nm = r.getString(0)
      val aliases = Option(r.getString(1)).toSeq
        .flatMap(_.split(",")).filter(_.nonEmpty)
      (nm -> nm) +: aliases.map(_ -> nm)
    }.toMap

    val cyto = Option(field("cytobands")).filter(_.nonEmpty).map { file =>
      tsv(spark, file)
        .withColumn("start", col("start").cast("long"))
        .withColumn("end", col("end").cast("long"))
    }

    GenomeAssembly(field("organism"), field("provider"),
      field("provider_build"), field("release_year"), seqinfo, cyto,
      Option(field("url")).filter(_.nonEmpty), aliasMap)
  }
}
