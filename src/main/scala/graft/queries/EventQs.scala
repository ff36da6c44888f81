package graft.queries
import graft.Q
object EventQs {
  val defs: Seq[Q] = Seq()
}
