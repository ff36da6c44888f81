package graft.queries
import graft.Q
object DedupQs {
  val defs: Seq[Q] = Seq()
}
