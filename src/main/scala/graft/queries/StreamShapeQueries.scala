package graft.queries

import graft.QueryDef

object StreamShapeQueries {
  val defs: Seq[QueryDef] = Seq()
}
