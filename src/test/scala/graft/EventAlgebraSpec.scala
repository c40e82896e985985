package graft

import graft.bitemporal.EventAlgebra
import graft.bitemporal.EventAlgebra.{Event, Rect}
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed bitemporal resolution cases mirroring the reference's
  * Ceiling/Polygon behavior (reference:
  * core/src/main/kotlin/xtdb/bitemporal/PolygonCalculator.kt,
  * src/test/clojure/xtdb/as_of_test.clj scenarios). Times are small longs
  * (micros are opaque to the algebra). */
class EventAlgebraSpec extends AnyFunSuite {

  private val INF = Long.MaxValue

  test("single put is visible forever") {
    val r = EventAlgebra.resolve(Seq(Event(100, 10, INF, "put", 0)))
    assert(r == Seq(Rect(10, INF, 100, INF, 0)))
  }

  test("newer put supersedes the overlap, splits the old version") {
    val r = EventAlgebra.resolve(Seq(
      Event(100, 10, INF, "put", 0),
      Event(200, 20, INF, "put", 1))).sortBy(x => (x.systemFrom, x.validFrom))
    assert(r == Seq(
      Rect(10, 20, 100, INF, 0),   // old doc before new valid-from: untouched
      Rect(20, INF, 100, 200, 0),  // overlap: closed at new system time
      Rect(20, INF, 200, INF, 1))) // new version
  }

  test("delete closes system time over its valid range, yields no row") {
    val r = EventAlgebra.resolve(Seq(
      Event(100, 10, INF, "put", 0),
      Event(200, 20, INF, "put", 1),
      Event(300, 30, INF, "delete", 2))).sortBy(x => (x.systemFrom, x.validFrom))
    assert(r == Seq(
      Rect(10, 20, 100, INF, 0),
      Rect(20, INF, 100, 200, 0),
      Rect(20, 30, 200, INF, 1),   // new version survives before delete range
      Rect(30, INF, 200, 300, 1))) // closed by the delete from vt=30 on
  }

  test("explicit valid range put carves a hole in the older version") {
    val r = EventAlgebra.resolve(Seq(
      Event(100, 0, 100, "put", 0),
      Event(200, 20, 50, "put", 1))).sortBy(x => (x.systemFrom, x.validFrom))
    assert(r == Seq(
      Rect(0, 20, 100, INF, 0),
      Rect(20, 50, 100, 200, 0),
      Rect(50, 100, 100, INF, 0),
      Rect(20, 50, 200, INF, 1)))
  }

  test("erase removes the whole history") {
    val r = EventAlgebra.resolve(Seq(
      Event(100, 10, INF, "put", 0),
      Event(200, 20, INF, "put", 1),
      Event(300, Long.MinValue, INF, "erase", 2)))
    assert(r.isEmpty)
  }

  test("events after an erase resolve again") {
    val r = EventAlgebra.resolve(Seq(
      Event(100, 10, INF, "put", 0),
      Event(200, Long.MinValue, INF, "erase", 1),
      Event(300, 30, INF, "put", 2)))
    assert(r == Seq(Rect(30, INF, 300, INF, 2)))
  }

  test("same system time: higher seq wins") {
    val r = EventAlgebra.resolve(Seq(
      Event(100, 10, INF, "put", 0, seq = 1),
      Event(100, 10, INF, "put", 1, seq = 2)))
    // the seq=2 event is treated as newer; seq=1 fully superseded (zero-area)
    assert(r == Seq(Rect(10, INF, 100, INF, 1)))
  }

  test("visibleAt point queries") {
    val evs = Seq(
      Event(100, 10, INF, "put", 0),
      Event(200, 20, INF, "put", 1),
      Event(300, 30, INF, "delete", 2))
    // system time 150: only v0 exists
    assert(EventAlgebra.visibleAt(evs, 25, 150).map(_.payloadIdx) == Some(0))
    // system 250: v1 covers vt>=20
    assert(EventAlgebra.visibleAt(evs, 25, 250).map(_.payloadIdx) == Some(1))
    // system 350, valid 35: deleted
    assert(EventAlgebra.visibleAt(evs, 35, 350).isEmpty)
    // system 350, valid 25: still v1 (delete starts at 30)
    assert(EventAlgebra.visibleAt(evs, 25, 350).map(_.payloadIdx) == Some(1))
    // valid 5: before any version
    assert(EventAlgebra.visibleAt(evs, 5, 350).isEmpty)
  }
}
