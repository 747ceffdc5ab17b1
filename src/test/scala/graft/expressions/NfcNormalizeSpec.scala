package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.text.TextFunctions

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfcOf(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextFunctions.nfc($"t").as("n")).as[String].head()

  test("canonical composition: combining marks and singletons") {
    // e + U+0301 -> é; A + U+030A -> Å; U+212B (angstrom) -> U+00C5
    assert(nfcOf("Café") == "Café")
    assert(nfcOf("Å") == "Å")
    assert(nfcOf("Å") == "Å")
    // NFC is canonical-only: compatibility forms (full-width, ligature)
    // are left alone — that folding belongs to foldAccents (NFKD)
    assert(nfcOf("Ａ") == "Ａ")
    assert(nfcOf("ﬁ") == "ﬁ")
  }

  test("already-NFC text takes the zero-copy fast path") {
    val u = UTF8String.fromString("plain ascii text, already NFC")
    assert(NfcNormalize.normalize(u) eq u)
    val composed = UTF8String.fromString("Café Å")
    assert(NfcNormalize.normalize(composed) eq composed)
  }

  test("null propagates; interpreted eval matches codegen") {
    val df = Seq(Some("Nöel"), None).toDF("t")
      .select(TextFunctions.nfc($"t").as("n"))
    assert(df.as[Option[String]].collect().toSet ==
      Set(Some("Nöel"), None))
    // interpreted path (eval) agrees with the codegen'd column result
    val viaEval = NfcNormalize.normalize(
      UTF8String.fromString("Nöel")).toString
    assert(viaEval == "Nöel")
  }

  test("non-string input is rejected at analysis") {
    val e = intercept[Exception] {
      Seq(1).toDF("t").select(TextFunctions.nfc($"t")).collect()
    }
    assert(e.getMessage.contains("graft_nfc") ||
      e.getMessage.toLowerCase.contains("string"), e.getMessage)
  }
}
