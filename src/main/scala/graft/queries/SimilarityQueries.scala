package graft.queries

import graft.QueryDef

object SimilarityQueries {
  val defs: Seq[QueryDef] = Seq()
}
