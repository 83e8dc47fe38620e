package graft.queries

/** Single place that collects every declared query (SURVEY.md §2.4). */
object Registry {
  def all: Seq[Q] =
    GroupABC.all ++ GroupD.all ++ GroupE.all ++ GroupF.all ++ GroupG.all ++
      GroupH.all ++ GroupH2.all ++ GroupH3.all
}
