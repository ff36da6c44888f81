package graft.queries
import graft.Q
object MovieQs {
  val defs: Seq[Q] = Seq()
}
