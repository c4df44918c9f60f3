package graft.text

import graft.functions.UrlCodec
import org.scalatest.funsuite.AnyFunSuite

/** F5 general percent-encoder vs the reference's URLHelper semantics
  * (/root/reference/src/util/URLHelper.cpp:75-91): unreserved
  * [A-Za-z0-9._~-] pass through, everything else — including each byte
  * of a multi-byte UTF-8 character — becomes uppercase %XX. */
class UrlCodecSpec extends AnyFunSuite {

  test("unreserved characters pass through untouched") {
    val s = "AZaz09.-_~"
    assert(UrlCodec.encode(s) === s)
  }

  test("reserved ASCII encodes as uppercase %XX") {
    assert(UrlCodec.encode("a b") === "a%20b")
    assert(UrlCodec.encode("/:?#[]@!$&'()*+,;=") ===
      "%2F%3A%3F%23%5B%5D%40%21%24%26%27%28%29%2A%2B%2C%3B%3D")
    assert(UrlCodec.encode("%") === "%25")
    assert(UrlCodec.encode("\"<>\\^`{|}") === "%22%3C%3E%5C%5E%60%7B%7C%7D")
  }

  test("multi-byte UTF-8 encodes per byte") {
    assert(UrlCodec.encode("é") === "%C3%A9")
    assert(UrlCodec.encode("ß") === "%C3%9F")
    assert(UrlCodec.encode("€") === "%E2%82%AC")
    assert(UrlCodec.encode("naïve/路") === "na%C3%AFve%2F%E8%B7%AF")
  }

  test("already-encoded input escapes its percent signs (no double-decode trap)") {
    assert(UrlCodec.encode("%20") === "%2520")
  }
}
