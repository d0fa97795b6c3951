package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** The driver parses Bench's JSON line out of a bounded 2000-char log
  * tail; r2 and r5 overflowed it and the round's bench parsed as null.
  * Pin the emitter's contract: any query count must fit the window and
  * stay valid JSON with the heaviest entries individually visible.
  */
class BenchSpec extends AnyFunSuite {

  test("200-query bench line fits the driver tail window and parses") {
    val results = (1 to 200).map(i =>
      (f"q_some_rather_long_query_name_$i%03d", i * 0.037))
    val line = Bench.renderLine(results, "/root/testdata/sf0.1")
    assert(line.length < 1999, s"line is ${line.length} chars")
    val v = JsonMethods.parse(line) // throws on malformed JSON
    assert((v \ "n_queries").extract[Int](DefaultFormats, manifest[Int]) == 200)
    assert((v \ "sf").extract[Double](DefaultFormats, manifest[Double]) == 0.1)
    val JObject(qs) = (v \ "queries"): @unchecked
    // heaviest query always survives individually; the tail folds into
    // one counted "other" entry and the parts sum back to the total
    assert(qs.head._1 == "q_some_rather_long_query_name_200")
    val other = qs.filter(_._1.startsWith("other_"))
    assert(other.size == 1, "long tail must fold into one counted entry")
    val counted = other.head._1.stripPrefix("other_").stripSuffix("_queries").toInt
    assert(counted == 200 - (qs.size - 1))
    val total = (v \ "value").extract[Double](DefaultFormats, manifest[Double])
    val sumParts = qs.map(_._2.extract[Double](DefaultFormats, manifest[Double])).sum
    assert(math.abs(total - sumParts) < 0.01 * qs.size,
      s"total $total vs summed entries $sumParts")
  }

  test("small inventory emits every query with no folding") {
    val line = Bench.renderLine(
      Seq(("q_a", 1.234), ("q_b", 0.001), ("q_c", 12.0)), "/root/testdata/sf0.01")
    val v = JsonMethods.parse(line)
    val JObject(qs) = (v \ "queries"): @unchecked
    assert(qs.map(_._1) == List("q_c", "q_a", "q_b")) // heaviest first
    assert(!qs.exists(_._1.startsWith("other_")))
  }
}
