package graft.queries

/** The full declared query surface (SURVEY.md §2.2), one [[QueryDef]] per
  * operator, collected from the per-area query files. `SparkEntry` exposes
  * exactly this list to the driver's correctness/bench harnesses.
  */
object Registry {
  val all: Seq[QueryDef] =
    ChangelogQueries.all ++
      RelationalQueries.all ++
      StreamingQueries.all ++
      PipelineQueries.all

  def byName(name: String): QueryDef =
    all.find(_.name == name).getOrElse(sys.error(s"unknown query: $name"))

  /** Headline queries timed by Bench. */
  def headline: Seq[QueryDef] = all.filter(_.headline)
}
