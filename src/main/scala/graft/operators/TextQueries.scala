package graft.operators

import graft.QueryDef

object TextQueries {
  val defs: Seq[QueryDef] = Seq()
}
