package graft.core

import org.scalatest.funsuite.AnyFunSuite

class RubyOrderingSpec extends AnyFunSuite {
  private val ord = RubyOrdering

  test("semantic numeric order inside array keys: 1 < 2 < 3 < 11 (reducer_spec.rb:64-97)") {
    val keys: Seq[Any] = Seq(
      Seq("key3", 11L), Seq("key3", 1L), Seq("key1", 1L), Seq("key3", 3L), Seq("key3", 2L))
    val sorted = keys.sorted(ord)
    assert(sorted === Seq(
      Seq("key1", 1L), Seq("key3", 1L), Seq("key3", 2L), Seq("key3", 3L), Seq("key3", 11L)))
  }

  test("mixed Integer/Float compare numerically (CHANGELOG.md:32-36)") {
    assert(ord.compare(1L, 1.5) < 0)
    assert(ord.compare(2.0, 2L) === 0)
    assert(ord.compare(11L, 2.5) > 0)
  }

  test("strings compare bytewise (UTF-8)") {
    assert(ord.compare("a", "b") < 0)
    assert(ord.compare("abc", "ab") > 0)
    // é (c3 a9) sorts after any ASCII byte
    assert(ord.compare("é", "z") > 0)
  }

  test("shorter array prefix sorts first") {
    assert(ord.compare(Seq("a"), Seq("a", 1L)) < 0)
  }

  test("incomparable types raise (priority_queue.rb:15-21)") {
    intercept[IllegalArgumentException](ord.compare("a", 1L))
    intercept[IllegalArgumentException](
      ord.compare(Map("key" -> "key1"), Map("key" -> "key2")))
  }
}
