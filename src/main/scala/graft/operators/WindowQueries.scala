package graft.operators

import graft.QueryDef

object WindowQueries {
  val defs: Seq[QueryDef] = Seq()
}
