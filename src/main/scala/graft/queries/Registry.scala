package graft.queries

/** Single place that collects every declared query (SURVEY.md §2.4). */
object Registry {
  def all: Seq[Q] = {
    val qs = GroupABC.all ++ GroupD.all ++ GroupE.all ++ GroupF.all ++
      GroupG.all ++ GroupH.all ++ GroupH2.all ++ GroupH3.all ++ GroupH4.all ++
      GroupH5.all ++ GroupH6.all ++ GroupH7.all ++ GroupH8.all ++
      GroupH9.all ++ GroupH10.all ++ GroupH11.all ++ GroupH12.all ++
      GroupH13.all ++ GroupH14.all ++ GroupH15.all ++ GroupH16.all
    // SparkEntry.queries folds this into a Map — a duplicate name would be
    // silently dropped there, so fail loudly at the source instead
    val names = qs.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct.mkString(",")}")
    qs
  }
}
