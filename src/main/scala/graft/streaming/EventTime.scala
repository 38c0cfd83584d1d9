package graft.streaming

import java.sql.Timestamp

/** Shared event-time arithmetic for the stateful streaming operators. */
private[streaming] object EventTime {
  /** Full-precision epoch micros of a Timestamp (getTime alone is ms;
    * the nanos field carries the sub-ms digits).
    */
  def toUs(t: Timestamp): Long = t.getTime * 1000 + (t.getNanos / 1000) % 1000
}
