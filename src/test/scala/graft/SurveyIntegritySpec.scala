package graft

import org.scalatest.funsuite.AnyFunSuite

/** STRUCTURAL artifact-citation integrity for SURVEY.md's status
  * sections (§8*) — the r10 verdict's prescription #2. Two rounds in a
  * row, a §8 status bullet claimed a scale artifact as "committed"
  * that was never produced (EMB_SCALE_r9.json, then EMB_SCALE_r10.json
  * after its run died on disk exhaustion and the text was not
  * amended). A claim a `ls` can falsify must be falsified BY THE
  * BUILD, not by the judge a round later:
  *
  *   - every artifact filename §8 cites (UPPERCASE_NAME[.rN].json/.md,
  *     the repo's evidence-artifact convention) must exist in the
  *     working tree, unless the citing line itself says the file was
  *     never produced (the honest historical corrections in §8g/§8h);
  *   - no TO-FILL placeholder may survive anywhere in SURVEY.md — a
  *     placeholder in the canonical status section IS an unverifiable
  *     claim.
  */
class SurveyIntegritySpec extends AnyFunSuite {

  // sbt runs tests with cwd = the project root; keep a fallback for
  // forked JVMs launched elsewhere in the repo
  private def surveyPath: java.nio.file.Path = {
    val candidates = Seq("SURVEY.md", "../SURVEY.md", "../../SURVEY.md")
      .map(java.nio.file.Paths.get(_))
    candidates.find(java.nio.file.Files.exists(_)).getOrElse(
      fail("SURVEY.md not found relative to the test working directory"))
  }

  test("SURVEY.md carries no TO-FILL placeholder") {
    val survey = java.nio.file.Files.readString(surveyPath)
    val offenders = survey.linesIterator.zipWithIndex
      .filter(_._1.contains("TO-FILL")).map(_._2 + 1).toSeq
    assert(offenders.isEmpty,
      s"SURVEY.md has TO-FILL placeholders at line(s) $offenders — " +
        "fill them with measured values or delete the claim")
  }

  test("headline artifact NUMBERS cited in §8 match the committed artifacts") {
    // the r12 verdict's drift finding, mechanized: SURVEY §8j cited
    // 351 B/AddFile while the committed DELTA_METADATA_r12.json said
    // 345 — different runs, no lie, but drift compounds. For each
    // headline scale artifact, at least one §8 paragraph citing the
    // file must cite the artifact's OWN value; refreshing the artifact
    // without amending the prose now fails the build.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = surveyPath.toAbsolutePath.getParent
    val survey = java.nio.file.Files.readString(surveyPath)
    val sect = survey.substring(survey.indexOf("## §8"))
    val paras = sect.split("\n\n").toSeq
    def check(file: String, key: String, render: Double => String): Unit = {
      val p = root.resolve(file)
      assert(java.nio.file.Files.exists(p), s"$file missing from the tree")
      val v = render(mapper.readTree(p.toFile).get(key).asDouble)
      val citing = paras.filter(_.contains(file))
      assert(citing.nonEmpty, s"SURVEY §8 never cites $file")
      assert(citing.exists(_.contains(v)),
        s"no §8 paragraph citing $file carries its $key = $v — " +
          "the prose drifted from the committed artifact")
    }
    check("DELTA_METADATA_r12.json", "measured_bytes_per_addfile",
      d => f"$d%.0f")
    check("ICEBERG_METADATA_r13.json", "measured_bytes_per_entry",
      d => f"$d%.0f")
    check("TDIGEST_SCALE_r12.json", "decade_ratio", _.toString)
  }

  test("every artifact file cited in SURVEY §8 exists in the tree") {
    val root = surveyPath.toAbsolutePath.getParent
    val survey = java.nio.file.Files.readString(surveyPath)
    val statusStart = survey.indexOf("## §8")
    assert(statusStart >= 0, "SURVEY.md has no §8 status section")
    val artifact = "\\b[A-Z][A-Z0-9_]*(?:_r\\d+[a-z]?)?\\.(?:json|md)\\b".r
    val cited = survey.substring(statusStart).linesIterator
      // the one legitimate way to name a missing file: the same line
      // states it was never produced (the §8g/§8h corrections)
      .filterNot(_.toLowerCase.contains("never produced"))
      .flatMap(l => artifact.findAllIn(l)).toSet
    assert(cited.nonEmpty, "citation extraction matched nothing — regex drift?")
    val missing = cited.filterNot(n =>
      java.nio.file.Files.exists(root.resolve(n)))
    assert(missing.isEmpty,
      s"SURVEY §8 cites artifact(s) absent from the tree: " +
        s"${missing.toSeq.sorted.mkString(", ")} — produce the file or " +
        "amend the claim (a 'committed' citation must be ls-verifiable)")
  }
}
