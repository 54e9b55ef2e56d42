package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench headline line must stay under `Bench.MaxLineChars`: the
  * driver captures only the final ~2000 chars of stdout and a longer line
  * self-truncates into unparseable JSON (round 1 shipped a `parsed: null`
  * exactly that way). The guard drops trailing dynamic slow-tail entries,
  * never the protected headline prefix and never the total.
  */
class BenchLineSpec extends AnyFunSuite {

  private val headline =
    (1 to 22).map(i => s"headline_op_$i" -> (0.1 * i))

  test("short maps render untruncated, valid-shaped JSON") {
    val qs = headline ++ Seq("tail_a" -> 1.0, "tail_b" -> 2.0)
    val line = Bench.headlineLine(417.8, 513, 3, qs, headline.size, "sf0.1")
    assert(line.length <= Bench.MaxLineChars)
    assert(line.contains("\"tail_b\":2.000"))
    assert(line.contains("\"value\":417.800"))
    assert(line.startsWith("{\"metric\":\"total\""))
    assert(line.endsWith("\"sf\":\"sf0.1\"}"))
  }

  test("oversized slow tails truncate to fit, keeping every headline op") {
    val tail = (1 to 300).map(i =>
      s"some_very_long_dynamic_slow_tail_operator_name_$i" -> (i * 0.01))
    val qs = headline ++ tail
    val line = Bench.headlineLine(500.0, 800, 3, qs, headline.size, "sf0.1")
    assert(line.length <= Bench.MaxLineChars)
    headline.foreach { case (k, _) => assert(line.contains(s""""$k":""")) }
    assert(line.contains("\"value\":500.000")) // total never dropped
    assert(line.endsWith("\"sf\":\"sf0.1\"}")) // still well-formed
  }

  test("the protected prefix survives even when it alone exceeds the cap") {
    val huge = (1 to 200).map(i => s"protected_op_$i" -> 1.0)
    val line = Bench.headlineLine(1.0, 200, 3, huge, huge.size, "sf0.1")
    // guard cannot shrink below the protected prefix: line stays complete
    huge.foreach { case (k, _) => assert(line.contains(s""""$k":""")) }
  }

  test("lineOrder keeps the headline prefix and sorts the rest by cost") {
    val qs = headline ++ Seq("cheap" -> 0.05, "dear" -> 9.0, "mid" -> 2.0)
    val (ordered, nProt) = Bench.lineOrder(qs, headline.map(_._1))
    assert(nProt == headline.size)
    assert(ordered.take(headline.size) == headline) // original order kept
    assert(ordered.drop(headline.size).map(_._1) ==
      Seq("dear", "mid", "cheap")) // truncation evicts the cheapest last→first
  }

  test("truncation under lineOrder evicts the cheapest dynamic entries") {
    val tail = (1 to 300).map(i =>
      s"some_very_long_dynamic_slow_tail_operator_name_$i" -> (i * 0.01))
    val (ordered, nProt) = Bench.lineOrder(headline ++ tail, headline.map(_._1))
    val line = Bench.headlineLine(500.0, 800, 3, ordered, nProt, "sf0.1")
    assert(line.length <= Bench.MaxLineChars)
    // the costliest dynamic entry always survives; the cheapest is the
    // first to go when the cap binds
    assert(line.contains(
      "\"some_very_long_dynamic_slow_tail_operator_name_300\":"))
    assert(!line.contains(
      "\"some_very_long_dynamic_slow_tail_operator_name_1\":"))
  }

  test("f3 is locale-stable (dot decimal separator)") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(Bench.f3(1.5) == "1.500")
    } finally java.util.Locale.setDefault(prev)
  }
}
