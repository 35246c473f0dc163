package graft.operators

import graft.QueryDef

object EventQueries {
  val defs: Seq[QueryDef] = Seq()
}
