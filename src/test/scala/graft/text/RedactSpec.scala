package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RedactSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii masks emails and phone groups, counts match") {
    val df = Seq(
      "mail a.b_c9@ex.org and x@y.io tel 555-0012 end",
      "no pii here",
      "digits 12-3456 1234-567 not phones, 123-4567 is").toDF("t")
    val out = df.select(
      Redact.redactPii(col("t")).as("r"),
      Redact.emailCount(col("t")).as("e"),
      Redact.phoneCount(col("t")).as("p"))
      .as[(String, Int, Int)].collect()
    assert(out(0) === (("mail <EMAIL> and <EMAIL> tel <PHONE> end", 2, 1)))
    assert(out(1) === (("no pii here", 0, 0)))
    assert(out(2)._2 === 0)
    assert(out(2)._3 === 1)
    assert(out(2)._1.contains("<PHONE> is"))
  }

  test("redactAll: NANP before short-phone, IPs, chain order pinned") {
    val df = Seq(
      "call 555-010-1234 or 555-0012 from 10.0.3.77 end",
      "a@b.io at 192.168.1.1",
      // a NANP number must become ONE <PHONE>, not a half-eaten
      // "555-<PHONE>" from the short ddd-dddd pattern
      "just 800-555-0199").toDF("t")
    val out = df.select(
      Redact.redactAll(col("t")).as("r"),
      Redact.nanpCount(col("t")).as("np"),
      Redact.ipCount(col("t")).as("ip"))
      .as[(String, Int, Int)].collect()
    assert(out(0) === (("call <PHONE> or <PHONE> from <IP> end", 1, 1)))
    assert(out(1) === (("<EMAIL> at <IP>", 0, 1)))
    assert(out(2) === (("just <PHONE>", 1, 0)))
  }

  test("redactAll single-pass kernel equals the reference chain on PII-laden corpora") {
    // pseudo-random corpus mixing every class, near-miss shapes, and
    // varied separators; deterministic seed. Any divergence between
    // the one-scan kernel and the 4-pass chain fails here.
    val rnd = new scala.util.Random(11)
    val pieces: Vector[() => String] = Vector(
      () => "word" + rnd.nextInt(100),
      () => s"user${rnd.nextInt(50)}._x@mail${rnd.nextInt(9)}.example.com",
      () => f"${rnd.nextInt(1000)}%03d-${rnd.nextInt(1000)}%03d-${rnd.nextInt(10000)}%04d",
      () => f"${rnd.nextInt(1000)}%03d-${rnd.nextInt(10000)}%04d",
      () => s"${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}",
      () => "12-3456",   // not a phone (2-digit head)
      () => "1234-567")  // not a phone (tail too short)
    val seps = Vector(" ", ", ", " (", ") ", ": ", "; ", ".\n")
    val docs = (1 to 300).map { _ =>
      (1 to (3 + rnd.nextInt(10)))
        .map(_ => pieces(rnd.nextInt(pieces.size))())
        .mkString(seps(rnd.nextInt(seps.size)))
    }.toDF("t")
    val diff = docs.select(
        Redact.redactAll(col("t")).as("a"),
        Redact.redactAllChained(col("t")).as("b"))
      .filter(not(col("a") <=> col("b"))).count()
    assert(diff == 0)
    // and the corpus actually exercised redaction
    val changed = docs.select(Redact.redactAll(col("t")).as("a"), col("t"))
      .filter(col("a") =!= col("t")).count()
    assert(changed > 200)
  }

  test("tournament kernel equals the literal alternation on adversarial adjacency strings") {
    // the alternation IS the semantic spec; the tournament is its
    // fast implementation. These strings exercise every overlap/
    // re-derivation path: class ties at one start, digit runs
    // absorbed into emails, matches starting inside consumed text,
    // multiple '@'s, invalid expansions, boundary context.
    val cases = Seq(
      "1.2.3.4222-3333",                // chain-divergent; kernel-consistent
      "1.2.3.4@x.io",                   // email and ip share a start: email wins
      "555-0012abc@x.io",               // email re-derived after phone consumption
      "123-456-7890@example.com",       // nanp starts before the email
      "a@@b.c", "a@b@c", "@x.io", "x@", // degenerate '@' shapes
      "a@b.c d@e.f",                    // consecutive emails
      "9111-222-3333", "1234-567", "12-3456", // near-miss digit shapes
      "x@y.com111-222-3333",            // domain absorbs leading digits
      "111-222-3333x@y.com",            // local absorbs trailing digits
      "call 555-010-1234 or 555-0012 from 10.0.3.77 end",
      "", "no pii at all", "@", "@@", "1.2.3.4", "999.999.999.999")
    cases.foreach { s =>
      assert(graft.expressions.PiiScrub.scrubString(s) ==
        graft.expressions.PiiScrub.scrubAlternation(s), s"input: '$s'")
    }
  }

  test("tournament kernel equals the literal alternation on a dense pseudo-random corpus") {
    // adjacency-heavy generator: pieces concatenated with NO
    // separator half the time, so overlaps and absorptions are
    // common — the regime where the tournament's re-derivation
    // discipline must exactly track the engine's continue-after-match
    val rnd = new scala.util.Random(23)
    val pieces: Vector[() => String] = Vector(
      () => "w" + rnd.nextInt(50),
      () => s"u${rnd.nextInt(50)}@m${rnd.nextInt(9)}.io",
      () => f"${rnd.nextInt(1000)}%03d-${rnd.nextInt(1000)}%03d-${rnd.nextInt(10000)}%04d",
      () => f"${rnd.nextInt(1000)}%03d-${rnd.nextInt(10000)}%04d",
      () => s"${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}",
      () => rnd.nextInt(10000).toString, () => ".", () => "@", () => "-")
    (1 to 2000).foreach { _ =>
      val s = (1 to (2 + rnd.nextInt(8)))
        .map(_ => pieces(rnd.nextInt(pieces.size))())
        .mkString(if (rnd.nextBoolean()) "" else " ")
      assert(graft.expressions.PiiScrub.scrubString(s) ==
        graft.expressions.PiiScrub.scrubAlternation(s), s"input: '$s'")
    }
  }

  test("redactAll null and clean-text pass-throughs") {
    val out = Seq("totally clean text", null)
      .toDF("t").select(Redact.redactAll(col("t")))
      .as[Option[String]].collect().toSeq
    assert(out == Seq(Some("totally clean text"), None))
  }

  test("redactAll divergence class is exactly the documented one (raw adjacency collisions)") {
    // PiiScrub's scaladoc: the chain's phone replacement manufactures
    // a word boundary that lets the IP match on the later pass; the
    // single scan reads the raw text where that boundary doesn't
    // exist. Pinned so any future kernel change that silently alters
    // the contract (either way) surfaces here.
    val s = "1.2.3.4222-3333"
    val (one, chain) = Seq(s).toDF("t")
      .select(Redact.redactAll(col("t")), Redact.redactAllChained(col("t")))
      .as[(String, String)].head()
    assert(one == "1.2.3.4<PHONE>")
    assert(chain == "<IP><PHONE>")
  }

  test("tokenChunks windows with overlap, short tail kept") {
    val df = Seq("a b c d e").toDF("t")
    val out = df.select(explode(
        TextFunctions.tokenChunks(split(col("t"), " "), 3, 2)).as("c"))
      .select(col("c.chunk_idx"), array_join(col("c.chunk"), " "))
      .as[(Int, String)].collect().toSeq
    assert(out === Seq((0, "a b c"), (1, "c d e"), (2, "e")))
  }
}
