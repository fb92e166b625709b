package graft.osm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** End-to-end pipeline equivalent of the reference CLI
  * (`src/planet-dump.cpp:27-114` option surface): one dump file in,
  * any combination of planet/history/changesets/discussions XML outputs,
  * each optionally anonymized.
  */
object PlanetDump {

  sealed trait Kind
  case object XmlPlanet extends Kind // latest visible versions (history_filter)
  case object XmlHistory extends Kind // every version
  case object XmlChangesets extends Kind // changesets only (changeset_filter)
  case object XmlDiscussions extends Kind // changesets + <discussion>
  case object PbfPlanet extends Kind // latest visible versions, OSMPBF
  case object PbfHistory extends Kind // every version, OSMPBF
  case object PbfPlanetParallel extends Kind // scale path: parallel block encoding
  case object PbfHistoryParallel extends Kind

  final case class Output(kind: Kind, path: String, anon: Boolean = false)

  /** Run the load once, assemble shared DataFrames once, write every
    * requested output from the shared plans (mirrors the reference's
    * single-pass multi-writer design, `src/planet-dump.cpp:180-249`).
    */
  def run(spark: SparkSession, dumpFile: String, workDir: String,
          outputs: Seq[Output], generator: String): Unit = {
    val maxTime = Load.run(spark, dumpFile, workDir)
    val db = OsmDb(spark, s"$workDir/tables")

    val cs = Assemble.changesets(db).persist(StorageLevel.MEMORY_AND_DISK)
    // every kind except the changeset-only XML outputs touches elements
    val needElements = outputs.exists(o =>
      o.kind != XmlChangesets && o.kind != XmlDiscussions)
    lazy val nodesH = Assemble.nodes(db).persist(StorageLevel.MEMORY_AND_DISK)
    lazy val waysH = Assemble.ways(db).persist(StorageLevel.MEMORY_AND_DISK)
    lazy val relsH = Assemble.relations(db).persist(StorageLevel.MEMORY_AND_DISK)

    outputs.foreach { o =>
      val anon = o.anon
      o.kind match {
        case PbfPlanet =>
          PlanetPbf.write(o.path, generator, history = false, anon, maxTime,
            Assemble.current(nodesH), Assemble.current(waysH), Assemble.current(relsH))
        case PbfHistory =>
          PlanetPbf.write(o.path, generator, history = true, anon, maxTime,
            nodesH, waysH, relsH)
        case PbfPlanetParallel =>
          PlanetPbf.writeParallel(o.path, generator, history = false, anon, maxTime,
            Assemble.current(nodesH), Assemble.current(waysH), Assemble.current(relsH))
        case PbfHistoryParallel =>
          PlanetPbf.writeParallel(o.path, generator, history = true, anon, maxTime,
            nodesH, waysH, relsH)
        case xmlKind =>
          val header = XmlFormat.header(generator, maxTime)
          val sections = xmlKind match {
            case XmlChangesets =>
              Seq(PlanetXml.renderChangesets(cs, anon, discussions = false, maxTime))
            case XmlDiscussions =>
              Seq(PlanetXml.renderChangesets(cs, anon, discussions = true, maxTime))
            case XmlHistory =>
              Seq(PlanetXml.renderChangesets(cs, anon, discussions = false, maxTime),
                PlanetXml.renderNodes(nodesH, anon, history = true),
                PlanetXml.renderWays(waysH, anon, history = true),
                PlanetXml.renderRelations(relsH, anon, history = true))
            case _ =>
              Seq(PlanetXml.renderChangesets(cs, anon, discussions = false, maxTime),
                PlanetXml.renderNodes(Assemble.current(nodesH), anon, history = false),
                PlanetXml.renderWays(Assemble.current(waysH), anon, history = false),
                PlanetXml.renderRelations(Assemble.current(relsH), anon, history = false))
          }
          XmlSink.write(o.path, header, sections)
      }
    }

    cs.unpersist()
    if (needElements) { nodesH.unpersist(); waysH.unpersist(); relsH.unpersist() }
  }

  /** CLI mirroring the reference option names (XML surface; PBF TBD). */
  def main(args: Array[String]): Unit = {
    var dumpFile: Option[String] = None
    var workDir = "planet-dump-work"
    var generator = "graft-spark"
    val outputs = scala.collection.mutable.ArrayBuffer[Output]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--dump-file" | "-f" => dumpFile = Some(args(i + 1)); i += 2
        case "--work-dir" => workDir = args(i + 1); i += 2
        case "--generator" => generator = args(i + 1); i += 2
        case "--xml" | "-x" => outputs += Output(XmlPlanet, args(i + 1)); i += 2
        case "--xml-no-userinfo" => outputs += Output(XmlPlanet, args(i + 1), anon = true); i += 2
        case "--history-xml" | "-X" => outputs += Output(XmlHistory, args(i + 1)); i += 2
        case "--history-xml-no-userinfo" => outputs += Output(XmlHistory, args(i + 1), anon = true); i += 2
        case "--changesets" | "-C" => outputs += Output(XmlChangesets, args(i + 1)); i += 2
        case "--changesets-no-userinfo" => outputs += Output(XmlChangesets, args(i + 1), anon = true); i += 2
        case "--pbf" | "-p" => outputs += Output(PbfPlanet, args(i + 1)); i += 2
        case "--pbf-parallel" => outputs += Output(PbfPlanetParallel, args(i + 1)); i += 2
        case "--history-pbf-parallel" => outputs += Output(PbfHistoryParallel, args(i + 1)); i += 2
        case "--pbf-no-userinfo" => outputs += Output(PbfPlanet, args(i + 1), anon = true); i += 2
        case "--history-pbf" | "-P" => outputs += Output(PbfHistory, args(i + 1)); i += 2
        case "--history-pbf-no-userinfo" => outputs += Output(PbfHistory, args(i + 1), anon = true); i += 2
        case "--changeset-discussions" | "-D" => outputs += Output(XmlDiscussions, args(i + 1)); i += 2
        case "--changeset-discussions-no-userinfo" =>
          outputs += Output(XmlDiscussions, args(i + 1), anon = true); i += 2
        case other => throw new IllegalArgumentException(s"unknown option $other")
      }
    }
    require(dumpFile.isDefined, "--dump-file is required")
    require(outputs.nonEmpty, "at least one output is required")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("planet-dump")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, dumpFile.get, workDir, outputs.toSeq, generator)
    finally spark.stop()
  }
}
