package graft.text

import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {

  test("tokens and token counts") {
    assert(Text.tokens("  a  b\tc ").toSeq == Seq("a", "b", "c"))
    assert(Text.tokens("").isEmpty)
    assert(Text.tokenCountBpeish("hello world") == 4) // ceil(5/4) per word
    assert(Text.tokenCountBpeish("hi") == 1)
    assert(Text.tokenCountBpeish("internationalization") == 5) // 20 chars → 5 pieces
    assert(Text.tokenCountBpeish("a,b") == 3) // a + ',' + b
  }

  test("token-window chunking: sizes, stride, overlap, edge cases") {
    val doc = (1 to 100).map(i => s"w$i").mkString(" ")
    val ch = Text.chunks(doc, 32, 24)
    assert(ch.length == 5) // starts 0,24,48,72,96
    assert(ch(0) == (1 to 32).map(i => s"w$i").mkString(" "))
    assert(ch(1).startsWith("w25 ") && ch(1).endsWith(" w56")) // 8-token overlap
    assert(ch(4) == (97 to 100).map(i => s"w$i").mkString(" ")) // short tail
    assert(Text.chunks("", 32, 24).isEmpty)
    assert(Text.chunks("one two", 32, 24).toSeq == Seq("one two"))
    assert(Text.chunks(doc, 10, 10).length == 10) // no overlap: exact partition
    intercept[IllegalArgumentException](Text.chunks(doc, 0, 5))
    intercept[IllegalArgumentException](Text.chunks(doc, 5, 0))
  }

  test("quality score ordering: clean text beats degenerate text") {
    val good = "the quick brown fox jumps over the lazy dog and runs through the field " * 3
    val bad = "zzz zzz zzz zzz zzz zzz zzz zzz"
    assert(Text.qualityScore(good) > Text.qualityScore(bad))
    assert(Text.qualityScore("") == 0.0)
  }

  test("lang id: charset detection and stopword scoring") {
    assert(Text.langId("这是 一个 中文 句子 也许") == "zh")
    assert(Text.langId("the cat sat on the mat with a hat") == "en")
    assert(Text.langId("el perro es un animal y la casa es grande") == "es")
    assert(Text.langId("der Hund ist ein Tier und die Katze ist nicht hier") == "de")
    assert(Text.langId("") == "unknown")
  }

  test("fingerprint: equal content → equal fp; shared window → shared minimum") {
    val a = "some shared content here that is long enough"
    assert(Text.fingerprint(a) == Text.fingerprint(a))
    assert(Text.fingerprint("ab") == Text.fingerprint("ab")) // shorter than gram
  }

  test("minhash approximates jaccard") {
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    val b = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 xx yy zz qq"
    val c = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12 q13 q14 q15 q16"
    val sa = Text.minhash(a, 64); val sb = Text.minhash(b, 64); val sc = Text.minhash(c, 64)
    def sim(x: Array[Long], y: Array[Long]) =
      x.zip(y).count { case (p, q) => p == q }.toDouble / x.length
    val jab = Text.ngramJaccard(a, b, 4)
    assert(math.abs(sim(sa, sb) - jab) < 0.25, s"minhash ${sim(sa, sb)} vs jaccard $jab")
    assert(sim(sa, sc) < 0.15) // disjoint docs
    assert(sim(sa, sa) == 1.0)
  }

  test("lsh bands: identical docs collide on all bands, disjoint docs on none") {
    val a = Text.lshBands(Text.minhash("w1 w2 w3 w4 w5 w6 w7 w8", 16), 4)
    val a2 = Text.lshBands(Text.minhash("w1 w2 w3 w4 w5 w6 w7 w8", 16), 4)
    val c = Text.lshBands(Text.minhash("z1 z2 z3 z4 z5 z6 z7 z8", 16), 4)
    assert(a.toSeq == a2.toSeq && a.length == 4)
    assert(a.intersect(c).isEmpty)
  }

  test("simhash: near-identical docs are close in hamming, different docs far") {
    val a = Text.simhash("the quick brown fox jumps over the lazy dog repeatedly every day")
    val b = Text.simhash("the quick brown fox jumps over the lazy dog repeatedly every night")
    val c = Text.simhash("completely unrelated words about database query optimization plans")
    assert(java.lang.Long.bitCount(a ^ b) < java.lang.Long.bitCount(a ^ c))
  }

  test("jaccard exact") {
    assert(Text.jaccard("a b c", "a b c") == 1.0)
    assert(Text.jaccard("a b", "c d") == 0.0)
    assert(Text.jaccard("a b c d", "c d e f") == 1.0 / 3.0) // 2 / 6
  }

  test("redactPii: placeholders, order, idempotence (r5)") {
    assert(Text.redactPii("mail a.b+c_d%e@sub.example.org now") == "mail <EMAIL> now")
    assert(Text.redactPii("srv at 192.168.0.1 and 10.0.0.255.") == "srv at <IP> and <IP>.")
    assert(Text.redactPii("call +44 20 7946 0958 or +1 (415) 555-0100 now")
      == "call <PHONE> or <PHONE> now")
    // plain national-format numbers (no +) are NOT matched — documented scope
    assert(Text.redactPii("call 555-0100") == "call 555-0100")
    val mixed = "x y@z.co +1 234 567 890, 1.2.3.4 end"
    val once = Text.redactPii(mixed)
    assert(once == "x <EMAIL> <PHONE>, <IP> end")
    // idempotent: placeholders contain nothing the patterns can re-match
    assert(Text.redactPii(once) == once)
    // an email's dotted host is consumed by the email pass, not the ip pass
    assert(Text.redactPii("a@1.2.3.4.co b") == "<EMAIL> b")
    // a bare dotted quad with a non-TLD tail is neither (no \b after the 4)
    assert(Text.redactPii("a@1.2.3.4x b") == "a@1.2.3.4x b")
  }

  test("windowSignatures: count, 60-bit range, cross-doc equality (r5)") {
    // n - w + 1 windows; short/empty docs yield none
    assert(Text.windowSignatures("a b c d e", 3).length == 3)
    assert(Text.windowSignatures("a b", 3).isEmpty)
    assert(Text.windowSignatures("", 3).isEmpty)
    assert(Text.windowSignatures("a b c", 3).length == 1)
    // signature is whitespace-normalized: same token span → same key
    val s1 = Text.windowSignatures("the quick  brown\tfox jumps", 4)
    val s2 = Text.windowSignatures("  the quick brown fox leaps", 4)
    assert(s1(0) == s2(0)) // shared leading 4-token span
    assert(s1(1) != s2(1)) // diverging second window
    // 60-bit: top nibble always clear (matches the 15-hex-char oracle)
    val many = Text.windowSignatures(((1 to 200).map(i => s"t$i")).mkString(" "), 8)
    assert(many.length == 193 && many.forall(h => (h >>> 60) == 0L))
    // distinct windows ⇒ distinct signatures at this scale
    assert(many.distinct.length == many.length)
  }

  test("normalize: NFC + casefold + whitespace collapse + trim (r5)") {
    assert(Text.normalize("  A\tB\r\nC  ") == "a b c")
    // combining acute composes to precomposed é, then lowercases
    assert(Text.normalize("CAFÉ") == "café")
    assert(Text.normalize("") == "")
    assert(Text.normalize(" \t\r\n ") == "")
    // idempotent
    val s = Text.normalize("  MiXed É CASE  ")
    assert(Text.normalize(s) == s)
  }
}
