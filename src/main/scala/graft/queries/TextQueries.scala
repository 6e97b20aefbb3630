package graft.queries

import graft.QueryDef

object TextQueries {
  val defs: Seq[QueryDef] = Seq()
}
