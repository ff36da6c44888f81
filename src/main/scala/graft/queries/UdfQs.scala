package graft.queries
import graft.Q
object UdfQs {
  val defs: Seq[Q] = Seq()
}
