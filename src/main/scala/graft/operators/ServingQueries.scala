package graft.operators

import graft.QueryDef

object ServingQueries {
  val defs: Seq[QueryDef] = Seq()
}
