package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed-pipeline aggregator (SURVEY §1.3 / §2.12): per-event-type
  * stats through the case-class `Dataset[Ev]` surface. Values are
  * folded as integer cents (floor(v·100 + 0.5) per event), so the
  * reduce/merge association is irrelevant — exactly the rule the SQL
  * path uses for cross-engine float parity.
  *
  * The distinct-user set is exact here (fixture user space is small);
  * at 100 TB the `users` field becomes an HLL sketch with the same
  * reduce/merge contract — the Aggregator shape doesn't change, which
  * is the point of declaring this form.
  */
object TypedEventStats {
  case class Ev(event_id: Long, user_id: Long, event_type: String,
                value: Double)
  case class Buf(n: Long, cents: Long, users: Set[Long])

  val agg = new Aggregator[Ev, Buf, Buf] {
    override def zero: Buf = Buf(0L, 0L, Set.empty)
    override def reduce(b: Buf, e: Ev): Buf =
      Buf(b.n + 1, b.cents + math.floor(e.value * 100 + 0.5).toLong,
          b.users + e.user_id)
    override def merge(a: Buf, b: Buf): Buf =
      Buf(a.n + b.n, a.cents + b.cents, a.users ++ b.users)
    override def finish(b: Buf): Buf = b
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  }.toColumn
}
