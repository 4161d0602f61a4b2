package graft.tools

/** One-shot plan dump for q_tstz_compare (pushdown audit). */
object TstzDiag {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local(cores = 4, appName = "tstz-diag")
    graft.Queries.tstzCompare(s, "/root/testdata/sf0.01").explain("formatted")
    s.stop()
  }
}
