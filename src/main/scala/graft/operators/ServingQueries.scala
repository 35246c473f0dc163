package graft.operators

import graft.QueryDef

object ServingQueries {
  lazy val defs: Seq[QueryDef] = Seq()
}
