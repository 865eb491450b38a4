package graft.dev

import java.nio.file.{Files, Paths}

/** The three ledger numbers that drifted across files in past rounds
  * (r8 shipped a stale TESTRUN count): gate count, test count, sf1
  * oracle coverage. This check prints all three and FAILS when the
  * live gate count or the newest TESTRUN_r*.txt disagrees with the
  * committed expectation in dev/ledger.json — run it before the
  * round-final commit.
  *
  *   sbt "runMain graft.dev.Ledger"
  */
object Ledger {
  def main(args: Array[String]): Unit = {
    val gates = graft.SparkEntry.queries.size
    val oracles = graft.SparkEntry.oracleSql.size

    // cwd-relative on purpose, but fail actionably from anywhere else
    // (ADVICE r11: a wrong cwd used to read as 'no TESTRUN' drift)
    val ledgerPath = Paths.get("dev/ledger.json")
    if (!Files.exists(ledgerPath)) sys.error(
      s"dev/ledger.json not found under ${Paths.get("").toAbsolutePath}" +
        " — run from the repo root")
    val ledger = Files.readString(ledgerPath)
    def field(k: String): Int =
      s""""$k"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(ledger)
        .map(_.group(1).toInt)
        .getOrElse(sys.error(s"dev/ledger.json: missing field $k"))
    val expGates = field("gates")
    val expTests = field("tests")
    val expSf1 = field("sf1_verified")

    // newest TESTRUN_r*.txt carries the last recorded full-suite count
    import scala.jdk.CollectionConverters._
    val re = "TESTRUN_r(\\d+)\\.txt".r
    val testrun = scala.util.Using.resource(Files.list(Paths.get("."))) {
      _.iterator().asScala
        .flatMap(p => re.findFirstMatchIn(p.getFileName.toString)
          .map(m => (m.group(1).toInt, p)))
        .toSeq
    }.sortBy(-_._1).headOption
    val tests = testrun.flatMap { case (_, p) =>
      "Tests: succeeded (\\d+), failed (\\d+)".r
        .findFirstMatchIn(Files.readString(p))
        .map(m => (m.group(1).toInt, m.group(2).toInt))
    }

    println(s"gates:        $gates live (${oracles} oracle-gated), " +
      s"$expGates expected")
    println(s"tests:        ${tests.map(_._1).getOrElse(-1)} recorded in " +
      s"${testrun.map(_._2.getFileName).getOrElse("<none>")}, " +
      s"$expTests expected")
    println(s"sf1_verified: $expSf1 (recorded; see PLANS.md sweep notes)")

    var drift = List.empty[String]
    if (gates != expGates)
      drift ::= s"live gate count $gates != ledger $expGates"
    if (gates != oracles)
      drift ::= s"queries $gates != oracleSql $oracles (a gate without " +
        "an oracle, or vice versa)"
    tests match {
      case Some((ok, failed)) =>
        if (failed != 0) drift ::= s"recorded TESTRUN has $failed failures"
        if (ok != expTests)
          drift ::= s"recorded test count $ok != ledger $expTests"
      case None => drift ::= "no TESTRUN_r*.txt with a parseable count"
    }
    if (drift.nonEmpty) {
      drift.foreach(d => System.err.println(s"[ledger] DRIFT: $d"))
      sys.exit(1)
    }
    println("[ledger] in sync")
  }
}
