package graft.queries

/** All registered query specs, keyed by name. SparkEntry derives its
  * `queries`/`oracleSql` maps from here. */
object Registry {
  val all: Seq[QuerySpec] =
    EtlQueries.specs ++ MoreEtlQueries.specs ++ TextQueries.specs ++
      VectorQueries.specs ++ MediaQueries.specs ++ PipelineQueries.specs

  require(all.map(_.name).distinct.size == all.size,
    "duplicate query names in registry")
}
