package graft.state

import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite

/** Interval-algebra matrix mirroring the reference's OffsetIntervalsTest
  * (accounting/OffsetIntervalsTest.kt) plus seeded randomized properties.
  */
class OffsetIntervalsSpec extends AnyFunSuite {
  private val t0 = Instant.parse("2024-01-01T00:00:00Z")
  private def t(s: Long) = t0.plusSeconds(s)

  test("point adds coalesce adjacent offsets into one range") {
    val iv = new OffsetIntervals
    iv.add(1, 1, t0); iv.add(2, 2, t0); iv.add(3, 3, t0)
    assert(iv.ranges == Seq(OffsetRange(1, 3, t0)))
  }

  test("gap keeps two ranges; filling the gap merges them") {
    val iv = new OffsetIntervals
    iv.add(1, 1, t0); iv.add(3, 3, t0)
    assert(iv.size == 2)
    iv.add(2, 2, t0)
    assert(iv.ranges == Seq(OffsetRange(1, 3, t0)))
  }

  test("range add merges multiple overlapped ranges, keeps max mtime") {
    val iv = new OffsetIntervals
    iv.add(0, 1, t(1)); iv.add(4, 5, t(5)); iv.add(8, 9, t(2))
    iv.add(1, 8, t(3))
    assert(iv.ranges == Seq(OffsetRange(0, 9, t(5))))
  }

  test("contains honors offset and mtime (newer file must reprocess)") {
    val iv = new OffsetIntervals
    iv.add(5, 10, t(100))
    assert(iv.contains(7, t(50)))
    assert(!iv.contains(7, t(200))) // source modified after processing
    assert(!iv.contains(11, t(50)))
  }

  test("remove splits an interval") {
    val iv = new OffsetIntervals
    iv.add(0, 10, t0)
    iv.remove(3, 5)
    assert(iv.ranges.map(r => (r.from, r.to)) == Seq((0L, 2L), (6L, 10L)))
  }

  test("remove at edges trims without split") {
    val iv = new OffsetIntervals
    iv.add(0, 10, t0)
    iv.remove(0, 2); iv.remove(9, 10)
    assert(iv.ranges.map(r => (r.from, r.to)) == Seq((3L, 8L)))
  }

  test("property: add order does not matter") {
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val offsets = List.fill(rnd.nextInt(40))(rnd.nextLong(60))
      val a = new OffsetIntervals
      val b = new OffsetIntervals
      offsets.foreach(o => a.add(o, o, t0))
      rnd.shuffle(offsets).foreach(o => b.add(o, o, t0))
      assert(a.ranges == b.ranges)
    }
  }

  test("property: contains after add; disjoint sorted ranges invariant") {
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val pairs = List.fill(rnd.nextInt(30))((rnd.nextLong(100), rnd.nextLong(8)))
      val iv = new OffsetIntervals
      pairs.foreach { case (f, len) => iv.add(f, f + len, t0) }
      pairs.foreach { case (f, len) =>
        assert(iv.contains(f, t0) && iv.contains(f + len, t0))
      }
      iv.ranges.sliding(2).foreach {
        case Seq(x, y) => assert(x.to + 1 < y.from) // disjoint AND non-adjacent
        case _         =>
      }
    }
  }

  test("OffsetRangeSet legacy CSV round-trip; optional lastModified") {
    val set = new OffsetRangeSet
    set.add(TopicPartition("a", 0), 0, 10, t(5))
    set.add(TopicPartition("b", 2), 7, 9, t(1))
    val csv = OffsetRangeSet.toCsv(set)
    assert(csv.startsWith("offsetFrom,offsetTo,partition,topic,lastModified\n"))
    assert(OffsetRangeSet.fromCsv(csv).entries == set.entries)
    // legacy 4-column form (no lastModified)
    val legacy = OffsetRangeSet.fromCsv(
      "offsetFrom,offsetTo,partition,topic\n3,4,1,x\n")
    assert(legacy.entries.map { case (tp, r) => (tp.topic, tp.partition, r.from, r.to) } ==
      Seq(("x", 1, 3L, 4L)))
  }

  test("OffsetRangeSet JSON round-trip in reference persistence shape") {
    val set = new OffsetRangeSet
    set.add(TopicPartition("topicA", 0), 0, 10, t(5))
    set.add(TopicPartition("topicA", 1), 3, 4, t(9))
    set.add(TopicPartition("topicB", 0), 7, 7, t(1))
    val back = OffsetRangeSet.fromJson(set.toJson)
    assert(back.entries == set.entries)
    assert(set.toJson.contains("\"partitions\""))
  }

  test("hostile topic names: JSON escapes and round-trips; legacy CSV refuses") {
    // topics are raw directory names, so the persistence layer cannot
    // trust them — an unescaped quote would commit an unparseable state
    // file and wedge every later loadState
    val set = new OffsetRangeSet
    set.add(TopicPartition("""web"logs\2024""", 0), 0, 10, t(5))
    val back = OffsetRangeSet.fromJson(set.toJson)
    assert(back.entries == set.entries)
    // the legacy CSV shape splits on bare commas: refuse what it cannot
    // represent instead of silently corrupting the export
    val bad = new OffsetRangeSet
    bad.add(TopicPartition("a,b", 0), 0, 1, t(1))
    intercept[IllegalArgumentException](OffsetRangeSet.toCsv(bad))
  }
}
