package graft.queries
import graft.Q
object VectorQs {
  val defs: Seq[Q] = Seq()
}
