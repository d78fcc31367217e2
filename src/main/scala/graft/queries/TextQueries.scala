package graft.queries
import graft.QueryDef
object TextQueries { def defs: Seq[QueryDef] = Seq() }
