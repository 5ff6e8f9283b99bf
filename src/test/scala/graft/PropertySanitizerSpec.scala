package graft

import graft.materialize.PropertySanitizer._
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's _sanitize_property_value/_ensure_jsonable rules
  * (ref:src/fancyrag/kg/pipeline.py:759-819, 849-855).
  */
class PropertySanitizerSpec extends AnyFunSuite {

  test("null values are dropped from the map") {
    assert(sanitize(Map("a" -> null, "b" -> "x")) == Map("b" -> "x"))
  }

  test("primitives pass through") {
    assert(sanitize(Map("s" -> "v", "i" -> 3, "f" -> 2.5, "b" -> true)) ==
      Map("s" -> "v", "i" -> "3", "f" -> "2.5", "b" -> "true"))
  }

  test("homogeneous primitive list -> JSON list, nulls skipped") {
    assert(render(Seq("a", null, "b")) == Some("""["a","b"]"""))
    assert(render(Seq(1, 2, 3)) == Some("[1,2,3]"))
  }

  test("heterogeneous list -> canonical JSON") {
    assert(render(Seq("a", 1)) == Some("""["a",1]"""))
  }

  test("nested map -> canonical JSON with sorted keys") {
    assert(render(Map("b" -> 1, "a" -> Map("z" -> true, "y" -> "s"))) ==
      Some("""{"a":{"y":"s","z":true},"b":1}"""))
  }

  test("law: homogeneous list of primitives round-trips element order") {
    val xs = Seq("q", "w", "e")
    assert(render(xs) == Some("""["q","w","e"]"""))
  }

  test("control characters are escaped in JSON strings") {
    assert(canonicalJson("a\nb") == "\"a\\nb\"")
    assert(canonicalJson("x\u0001y") == "\"x\\u0001y\"")
  }
}
