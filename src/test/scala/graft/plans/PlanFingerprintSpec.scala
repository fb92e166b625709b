package graft.plans

import graft.PlanFingerprint
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** CI gate over the committed plan fingerprints: every gate query's
  * physical-plan structure (scans per table, shuffles, broadcasts,
  * sorts, aggregates, joins) must match `plan_fingerprints.json`. A
  * failing diff means a change ALTERED a query plan — if intentional,
  * regenerate with `sbt "runMain graft.PlanFingerprint"` and commit
  * the reviewable diff; if not, the test just caught a silent
  * double-scan / extra-shuffle regression.
  */
class PlanFingerprintSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("plan-fingerprint-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("every gate query's physical plan matches the committed fingerprint") {
    val path = java.nio.file.Paths.get(PlanFingerprint.SnapshotPath)
    assert(java.nio.file.Files.exists(path),
      s"${PlanFingerprint.SnapshotPath} missing — generate it with " +
        """sbt "runMain graft.PlanFingerprint"""")
    val committed = PlanFingerprint.parseJson(java.nio.file.Files.readString(path))
    val current = PlanFingerprint.computeAll(spark)
    val diffs = current.flatMap { case (name, fp) =>
      committed.get(name) match {
        case None => Some(s"$name: NEW query, no committed fingerprint")
        case Some(c) if c != fp => Some(s"$name: committed=$c current=$fp")
        case _ => None
      }
    } ++ (committed.keySet -- current.map(_._1).toSet).toSeq.sorted
      .map(n => s"$n: committed fingerprint for a query that no longer exists")
    assert(diffs.isEmpty,
      s"""plan fingerprints drifted (intentional change? regenerate with sbt "runMain graft.PlanFingerprint"):
         |${diffs.mkString("\n")}""".stripMargin)
  }
}
