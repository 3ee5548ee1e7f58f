package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.SyntheticStore

/** Fixture-locked goldens for caption normalization (SURVEY §7.4 risk 4:
  * byte-level caption equality pinned by goldens, not general ftfy parity).
  */
class NormalizeSpec extends AnyFunSuite {

  test("strip_html: tags removed, data kept (ref normalizer/__init__.py:18-37)") {
    assert(TextNormalize.stripHtml("<b>Project 3</b> — <i>laser cut</i>") ==
      "Project 3 — laser cut")
    assert(TextNormalize.stripHtml("plain text") == "plain text")
    assert(TextNormalize.stripHtml("<p>a<br/>b</p>") == "ab")
    // bare '<' (not followed by a tag-name char) is data, like HTMLParser
    assert(TextNormalize.stripHtml("a < b and c > d") == "a < b and c > d")
  }

  test("strip_html: character references converted (convert_charrefs=True)") {
    assert(TextNormalize.stripHtml("Tom &amp; Jerry &lt;3") == "Tom & Jerry <3")
    assert(TextNormalize.stripHtml("&#65;&#x42;") == "AB")
    assert(TextNormalize.stripHtml("5 &unknown; 6") == "5 &unknown; 6")
  }

  test("strip_html: malformed/extreme character references are data, not crashes") {
    // malformed numeric refs are emitted literally (HTMLParser charref regex
    // does not match them) — these used to throw NumberFormatException
    assert(TextNormalize.stripHtml("a &#foo; b") == "a &#foo; b")
    assert(TextNormalize.stripHtml("a &#x; b") == "a &#x; b")
    assert(TextNormalize.stripHtml("a &#; b") == "a &#; b")
    // out-of-range / surrogate code points → U+FFFD (html._replace_charref)
    assert(TextNormalize.stripHtml("&#99999999999;") == "�")
    assert(TextNormalize.stripHtml("&#1114112;") == "�") // 0x110000
    assert(TextNormalize.stripHtml("&#xD800;") == "�")
    assert(TextNormalize.stripHtml("&#0;") == "�")
    // supplementary plane survives as a surrogate PAIR, not a truncated char
    assert(TextNormalize.stripHtml("&#128512;") == "😀")
    assert(TextNormalize.stripHtml("&#x1F600;") == "😀")
    // C1 range maps through windows-1252 (html._invalid_charrefs)
    assert(TextNormalize.stripHtml("it&#146;s") == "it’s") // ’ not U+0092
    assert(TextNormalize.stripHtml("&#128;") == "€") // €
    assert(TextNormalize.stripHtml("&#x93;quoted&#x94;") == "“quoted”")
  }

  test("fix_encoding: cp1252-mojibake em dash repaired (ref util.py:71-72)") {
    assert(TextNormalize.fixEncoding("Project 7 â€” sensor") == "Project 7 — sensor")
    assert(TextNormalize.fixEncoding("ok plain") == "ok plain")
    // real UTF-8 text must NOT be damaged
    assert(TextNormalize.fixEncoding("naïve café — fine") == "naïve café — fine")
  }

  test("caption normalization goldens over fixture shapes (FIXTURES.md F1)") {
    // id % 10 == 3 → HTML; == 7 → mojibake; else plain
    val html = SyntheticStore.caption(3L)
    assert(html.startsWith("<b>"))
    val norm3 = TextNormalize.normalizeCaption(html)
    assert(!norm3.contains("<") && norm3.startsWith("Project 3 — "))
    val moji = SyntheticStore.caption(7L)
    assert(moji.contains("â€”"))
    assert(TextNormalize.normalizeCaption(moji).contains(" — "))
    val plain = SyntheticStore.caption(1L)
    assert(TextNormalize.normalizeCaption(plain) == plain)
  }
}
