package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wires tools/artifact_lint.py into `sbt test` (r14 verdict task 8):
  * a rung artifact whose header (n/pass/rows_only/excluded/fail)
  * disagrees with its queries map now fails the suite, not just the
  * next judge pass. The second test proves the tripwire actually
  * fires by linting a deliberately drifted artifact in a temp dir.
  */
class ArtifactLintSpec extends AnyFunSuite {

  private val repoRoot = {
    // tests run with cwd = repo root under sbt; fall back to the
    // compiled classes' ancestor if not.
    val cwd = new java.io.File(".").getCanonicalFile
    if (new java.io.File(cwd, "tools/artifact_lint.py").isFile) Some(cwd)
    else None
  }

  private def lint(args: Seq[String]): (Int, String) = {
    val cmd = Seq("python3", "tools/artifact_lint.py") ++ args
    val pb = new ProcessBuilder(cmd: _*)
    repoRoot.foreach(pb.directory)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    p.waitFor()
    (p.exitValue(), out)
  }

  private def havePython: Boolean =
    try {
      new ProcessBuilder("python3", "--version").start().waitFor() == 0
    } catch { case _: java.io.IOException => false }

  test("checked-in CORRECTNESS_* artifact headers are consistent") {
    assume(repoRoot.isDefined && havePython)
    val (code, out) = lint(Nil)
    assert(code == 0, s"artifact_lint drift:\n$out")
  }

  test("the linter goes red on a deliberately drifted artifact") {
    assume(repoRoot.isDefined && havePython)
    val dir = java.nio.file.Files.createTempDirectory("lintspec").toFile
    val art = new java.io.File(dir, "CORRECTNESS_sfX.json")
    val drifted =
      """{"sf": "/tmp/x", "n": 2, "pass": 2, "rows_only": 0,
        | "excluded": 0, "fail": 0,
        | "queries": {"q1": {"status": "pass"}}}""".stripMargin
    java.nio.file.Files.write(art.toPath, drifted.getBytes("UTF-8"))
    val (code, out) = lint(Seq("--root", dir.getAbsolutePath))
    assert(code == 1 && out.contains("DRIFT"),
      s"expected DRIFT exit 1, got exit $code:\n$out")
  }
}
