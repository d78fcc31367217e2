package graft.queries
import graft.QueryDef
object PipelineQueries { def defs: Seq[QueryDef] = Seq() }
