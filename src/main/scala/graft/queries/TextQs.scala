package graft.queries
import graft.Q
object TextQs {
  val defs: Seq[Q] = Seq()
}
