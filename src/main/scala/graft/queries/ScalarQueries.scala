package graft.queries

import graft.QueryDef

object ScalarQueries {
  val defs: Seq[QueryDef] = Seq()
}
