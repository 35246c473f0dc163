package graft.operators

import graft.QueryDef

object TextQueries {
  lazy val defs: Seq[QueryDef] = Seq()
}
