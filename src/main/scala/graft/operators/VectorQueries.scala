package graft.operators

import graft.QueryDef

object VectorQueries {
  lazy val defs: Seq[QueryDef] = Seq()
}
