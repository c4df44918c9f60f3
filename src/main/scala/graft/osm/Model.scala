package graft.osm

import java.sql.Timestamp

/** Typed model of the OsmChange stream (SURVEY.md §1.1, FIXTURES.md §3).
  * Mirrors /root/reference/include/osm/{Node,Way,Relation}.h and the
  * `<osmChange>` sections of include/osm/OsmChangeHandler.h:32-41 —
  * re-expressed as one flat case class so a whole change batch is a
  * single `Dataset[ChangeOp]`.
  */
case class RelMember(ref: Long, mtype: String, role: String)

case class ChangeOp(
    seq: Int,                       // change-file sequence number
    action: String,                 // create | modify | delete
    kind: String,                   // node | way | relation
    id: Long,
    version: Int,
    ts: Timestamp,
    visible: Boolean,
    lon: Option[Double],            // nodes
    lat: Option[Double],
    nodeRefs: Seq[Long],            // ways (ordered)
    members: Seq[RelMember],        // relations (ordered)
    tags: Map[String, String])
