package graft.tools

import graft.SparkTestBase

/** The distributed-shell parity tool: every slot runs the command exactly
  * once and reports (slot, host, exitCode, output), like the reference's
  * ShellExecutor + result aggregator. */
class DistributedShellSpec extends SparkTestBase {

  test("runs the command once per slot and aggregates results") {
    val out = DistributedShell.run(spark, Seq("echo", "gp-ok"), slots = 3)
      .collect().map(r => (r.getInt(0), r.getInt(2), r.getString(3)))
    assert(out.length == 3)
    assert(out.map(_._1).sorted.toSeq == Seq(0, 1, 2), "one result per slot")
    assert(out.forall(_._2 == 0), "echo exits 0")
    assert(out.forall(_._3 == "gp-ok"), s"unexpected output: ${out.mkString}")
  }

  test("a failing command reports a nonzero exit code, not an exception") {
    val out = DistributedShell.run(spark, Seq("false"), slots = 2).collect()
    assert(out.length == 2)
    assert(out.forall(_.getInt(2) != 0))
  }
}
