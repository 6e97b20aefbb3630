package graft.queries

import graft.QueryDef

object PipelineQueries {
  val defs: Seq[QueryDef] = Seq()
}
