package graft.operators

import graft.QueryDef

object VectorQueries {
  val defs: Seq[QueryDef] = Seq()
}
