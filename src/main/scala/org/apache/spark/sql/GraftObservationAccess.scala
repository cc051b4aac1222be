package org.apache.spark.sql

/** Bridge to [[Observation.getOrEmpty]], which is `private[sql]`: the
  * NON-BLOCKING metrics read (a `Try` around the completed future, empty
  * map when nothing arrived) used where the observed action has ALREADY
  * completed — metrics either arrived or never will (Catalyst pruned the
  * CollectMetrics node, e.g. empty-relation propagation). The blocking
  * `Observation.get` terminates in that case only because
  * ObservationManager posts `Row.empty` for pruned nodes, a Spark internal
  * that could change (the r14 advisory); callers pair this read with an
  * exact fallback aggregate instead. Uses public Spark classes only.
  */
object GraftObservationAccess {
  def getOrEmpty(o: Observation): Map[String, Any] =
    // not Observation.getOrEmpty itself: that helper NPEs on exactly the
    // case it exists for — a pruned CollectMetrics node posts Row.empty,
    // whose schema is null, and getOrEmpty maps over it (Spark 4.1.2,
    // Observation.scala:116). Read the row and guard the schema here.
    o.getRowOrEmpty match {
      case Some(row) if row.schema != null =>
        row.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> row.get(i) }.toMap
      case _ => Map.empty
    }
}
