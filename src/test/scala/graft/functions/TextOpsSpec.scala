package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens + counts") {
    val d = Seq("  the quick brown fox  ", "one").toDF("text")
    val got = d.select(TextOps.tokenCount($"text").as("n")).collect().map(_.getInt(0))
    assert(got.toSeq === Seq(4, 1))
  }

  test("bpeTokenCount adds one per punctuation char") {
    val d = Seq("hello, world!").toDF("text")
    assert(d.select(TextOps.bpeTokenCount($"text")).head.getInt(0) === 4) // 2 words + ',' + '!'
  }

  test("hash32 matches the documented MD5-prefix definition") {
    // md5("abc") = 900150983cd24fb0..., first 8 hex = 0x90015098 = 2416005272
    val got = Seq("abc").toDF("w").select(TextOps.hash32($"w")).head.getLong(0)
    assert(got === 2416005272L)
  }

  test("wordShingles: n-grams in order; short docs → empty") {
    val d = Seq("a b c d", "a b").toDF("text")
    val got = d.select(TextOps.wordShingles(TextOps.tokens($"text"), 3).as("g")).collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
  }

  test("native WordNGrams matches the higher-order formulation on real docs") {
    val docs = graft.sources.Tables.parquet(spark, sfDir, "documents")
    val diff = docs
      .select(
        TextOps.wordShingles(TextOps.tokens($"text"), 3).as("native"),
        TextOps.wordShinglesHof(TextOps.tokens($"text"), 3).as("hof")
      )
      .filter($"native" =!= $"hof")
    assert(diff.count() === 0)
  }

  test("nfc: decomposed folds to composed; ASCII and nulls pass through; codegen matches interpreted") {
    val composed = "café"
    val decomposed = "café"
    val d = Seq(Some(composed), Some(decomposed), Some("ascii only"), None).toDF("t")
    val got = d.select(TextOps.nfc($"t").as("n")).collect().map(r => Option(r.getString(0)))
    assert(got(0) === Some(composed))
    assert(got(1) === Some(composed), "decomposed é must normalize to the composed code point")
    assert(got(2) === Some("ascii only"))
    assert(got(3) === None)
    // interpreted path (eval) must agree with the codegen'd result
    val e = graft.plans.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(org.apache.spark.unsafe.types.UTF8String.fromString(decomposed))
    )
    assert(e.eval(null).toString === composed)
    // NFC is canonical only — NOT NFKC: fullwidth stays fullwidth (so token counts never change)
    val full = "ＡＢ"
    assert(Seq(full).toDF("t").select(TextOps.nfc($"t")).head().getString(0) === full)
  }

  test("langId picks the language with most stopword hits; en wins ties") {
    val d = Seq("el la de que y come", "the a and is of", "nothing matching here").toDF("text")
    val got = d.select(TextOps.langId(TextOps.tokens($"text"))).collect().map(_.getString(0))
    assert(got.toSeq === Seq("es", "en", "en"))
  }

  test("charFingerprint: identical text → identical fp; stable length") {
    val d = Seq(("x", "the quick brown fox jumps"), ("y", "the quick brown fox jumps"), ("z", "other")).toDF("id", "text")
    val fps = d.select($"id", TextOps.charFingerprint("text")).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fps("x") === fps("y"))
    assert(fps("x").length === 32)
    assert(fps("x") !== fps("z"))
  }
}
