package graft.sink

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors reference SimpleTopicSelectorTest / DefaultTopicSelectorTest. */
class TopicSelectorSpec extends AnyFunSuite {

  test("SimpleTopicSelector picks field values when present") {
    val selector = new SimpleTopicSelector("tpc", "dtpc", "tg", "dtg")
    val tuple = Map[String, Any]("id" -> "x001", "name" -> "vesense", "tpc" -> "tpc1", "tg" -> "tg1")
    assert(selector.getTopic(tuple) === "tpc1")
    assert(selector.getTag(tuple) === "tg1")
  }

  test("SimpleTopicSelector falls back to defaults when fields absent or null") {
    val selector = new SimpleTopicSelector("tpc", "dtpc", "tg", "dtg")
    val tuple = Map[String, Any]("id" -> "x001", "name" -> "vesense")
    assert(selector.getTopic(tuple) === "dtpc")
    assert(selector.getTag(tuple) === "dtg")
    assert(selector.getTopic(Map("tpc" -> null)) === "dtpc")
  }

  test("DefaultTopicSelector is constant; tag defaults to empty") {
    val s = new DefaultTopicSelector[Map[String, Any]]("fixed", "tagx")
    assert(s.getTopic(Map("a" -> 1)) === "fixed")
    assert(s.getTag(Map("a" -> 1)) === "tagx")
    val noTag = new DefaultTopicSelector[Any]("only")
    assert(noTag.getTag(42) === "")
  }
}
