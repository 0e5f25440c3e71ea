package graft.graph

/** Logical write operations — the engine's WAL entry type, mirroring the
  * reference's `Entry` (/root/reference/library/GraphDB/Persistent/Log.hs:20-28).
  * Because our node handles are stable global ids (not tx-local ordinals),
  * only the 5 mutating ops need logging — the reference must additionally
  * log `GetRoot`/`GetTargets` to re-derive its ordinals on replay
  * (Persistent.hs:126-171); a documented simplification with identical
  * observable state.
  */
sealed trait GraphOp[V]
object GraphOp {
  final case class NewNode[V](id: Long, v: V) extends GraphOp[V]
  final case class SetValue[V](id: Long, v: V) extends GraphOp[V]
  final case class AddTarget[V](src: Long, dst: Long) extends GraphOp[V]
  final case class RemoveTarget[V](src: Long, dst: Long) extends GraphOp[V]
  final case class RemoveNode[V](id: Long) extends GraphOp[V]
}
