package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{Auction, Person}

/** Unbounded incremental symmetric hash join — Nexmark Q3's
  * `JoinPersonsWithAuctions` (reference
  * examples/src/main/java/Nexmark/queries/Query3.java:110-155; MapState
  * variant Query3Stateful.java:117-185).
  *
  * Structured Streaming forbids an unbounded stream-stream inner join
  * without watermark bounds, so — as in the reference — the join is a
  * keyed stateful operator over a union of the two inputs: per key
  * (person id = auction seller) the state holds the person (if seen)
  * plus a buffer of auctions awaiting their person; each side probes
  * the other on arrival. The reference's person MapState `put` makes a
  * re-arriving person overwrite (we keep that), and auctions drain once
  * joined.
  */
object SymmetricJoin {

  case class PersonLite(id: Long, name: String, city: String, state: String)
  case class JoinedEntry(name: String, city: String, state: String,
      auctionId: Long)

  /** Union-of-either input row. */
  case class Either3(key: Long, person: Option[PersonLite],
      auctionId: Option[Long])

  case class JoinState(person: Option[PersonLite],
      pendingAuctions: List[Long])

  def join(persons: Dataset[Person], auctions: Dataset[Auction],
      states: Seq[String] = Seq("OR", "ID", "CA")): Dataset[JoinedEntry] = {
    val spark = persons.sparkSession
    import spark.implicits._

    val p = persons.filter(p => states.contains(p.state))
      .map(p => Either3(p.id, Some(PersonLite(p.id, p.name, p.city, p.state)), None))
    val a = auctions.map(a => Either3(a.seller, None, Some(a.id)))

    p.union(a)
      .groupByKey(_.key)
      .flatMapGroupsWithState[JoinState, JoinedEntry](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[JoinState]) =>
          var st = state.getOption.getOrElse(JoinState(None, Nil))
          val out = List.newBuilder[JoinedEntry]
          rows.foreach { r =>
            (r.person, r.auctionId) match {
              case (Some(person), _) =>
                // person arrival: store (overwrite), drain buffer
                st.pendingAuctions.reverse.foreach { aid =>
                  out += JoinedEntry(person.name, person.city, person.state, aid)
                }
                st = JoinState(Some(person), Nil)
              case (_, Some(aid)) =>
                st.person match {
                  case Some(person) =>
                    out += JoinedEntry(person.name, person.city, person.state, aid)
                  case None =>
                    st = st.copy(pendingAuctions = aid :: st.pendingAuctions)
                }
              case _ =>
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
