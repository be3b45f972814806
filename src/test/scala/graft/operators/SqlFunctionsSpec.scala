package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.HashExpressions

/** The native kernels must be reachable from `spark.sql` as the same
  * codegen'd expressions (no UDF wrapper) and agree with the Column
  * API forms. */
class SqlFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("hash kernels callable from SQL and agree with the Column API") {
    HashExpressions.registerAll(spark)
    val viaSql = spark.sql(
      """SELECT simhash64(array('a','b')) AS sig,
        |  shingle_hashes(array('a','b','c','d'), 3) AS sh,
        |  minhash_sig(shingle_hashes(array('a','b','c','d'), 3), 4) AS mh,
        |  lsh_buckets(array_repeat(1.0d, 64), 2, 4) AS lb,
        |  array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d
        |""".stripMargin).head
    val viaCols = spark.range(1).select(
      HashExpressions.simhash64(array(lit("a"), lit("b"))).as("sig"),
      HashExpressions.shingleHashes(
        array(lit("a"), lit("b"), lit("c"), lit("d")), 3).as("sh"),
      HashExpressions.minhashSig(HashExpressions.shingleHashes(
        array(lit("a"), lit("b"), lit("c"), lit("d")), 3), 4).as("mh"),
      HashExpressions.lshBuckets(array_repeat(lit(1.0), 64), 2, 4).as("lb"),
      graft.functions.GraftFunctions.dotProduct(
        array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0))).as("d")).head
    assert(viaSql.getSeq[Long](0) === viaCols.getSeq[Long](0))
    assert(viaSql.getSeq[Long](1) === viaCols.getSeq[Long](1))
    assert(viaSql.getSeq[Long](2) === viaCols.getSeq[Long](2))
    assert(viaSql.getSeq[Long](3) === viaCols.getSeq[Long](3))
    assert(viaSql.getDouble(4) === 11.0)
    assert(viaCols.getDouble(4) === 11.0)
  }

  test("wrong-typed input fails at analysis time, not inside the kernel") {
    HashExpressions.registerAll(spark)
    // a bare string (not ARRAY<STRING>) must produce a clear
    // datatype-mismatch analysis error, not a runtime ClassCastException
    val e1 = intercept[Exception] {
      spark.sql("SELECT simhash64('abc')").head
    }
    assert(e1.getMessage.contains("ARRAY<string>"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('a','b'), 4)").head
    }
    assert(e2.getMessage.contains("ARRAY<bigint>"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("SELECT lsh_buckets(array('a'), 2, 4)").head
    }
    assert(e3.getMessage.contains("ARRAY<double>"), e3.getMessage)
    val e4 = intercept[Exception] {
      spark.sql("SELECT sorted_intersect_count(array('a'), array(1L))").head
    }
    assert(e4.getMessage.contains("ARRAY<BIGINT>"), e4.getMessage)
  }

  /** The merge-walk count must agree with the built-in pipeline it
    * replaces — size(array_intersect) — on the sorted-distinct arrays
    * the shingle kernels emit, including the disjoint and empty
    * edges. */
  test("sorted_intersect_count equals size(array_intersect) on sorted arrays") {
    HashExpressions.registerAll(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { _ =>
      val a = Array.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong)
        .distinct.sorted
      val b = Array.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong)
        .distinct.sorted
      (a, b)
    } :+ ((Array.emptyLongArray, Array(1L, 2L)))
    val df = rows.toDF("a", "b")
    val bad = df.select(
        HashExpressions.sortedIntersectCount(col("a"), col("b")).as("kernel"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
      .filter(col("kernel") =!= col("builtin"))
      .count()
    assert(bad === 0)
    // and the SQL registration routes to the same expression
    val viaSql = spark.sql(
      "SELECT sorted_intersect_count(array(1L,3L,5L), array(3L,4L,5L))").head
    assert(viaSql.getLong(0) === 2L)
  }

  /** The one-pass shingle kernel must emit byte-identical arrays to
    * the built-in sequence→transform→slice→concat_ws→filter pipeline
    * it replaced, across sizes below/at/above n, empty-string tokens,
    * and the empty array. */
  test("word_shingles equals the built-in shingle pipeline") {
    HashExpressions.registerAll(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "bb", "ccc", "", "déjà", "e f")
    val rows = (0 until 300).map { _ =>
      Array.fill(rnd.nextInt(9))(words(rnd.nextInt(words.length)))
    } :+ Array.empty[String]
    val df = rows.toDF("toks")
    def legacy(toks: org.apache.spark.sql.Column, n: Int) =
      filter(
        transform(
          sequence(lit(0), greatest(size(toks) - n, lit(0))),
          i => when(i + n <= size(toks),
            concat_ws(" ", slice(toks, i + 1, lit(n))))),
        s => s.isNotNull)
    for (n <- Seq(2, 3, 5)) {
      val bad = df.select(
          HashExpressions.wordShingles(col("toks"), n).as("kernel"),
          legacy(col("toks"), n).as("builtin"))
        .filter(not(col("kernel") <=> col("builtin")))
        .count()
      assert(bad === 0, s"n=$n")
    }
    val viaSql = spark.sql(
      "SELECT word_shingles(array('x','y','z'), 2)").head
    assert(viaSql.getSeq[String](0) === Seq("x y", "y z"))
  }

  /** The byte-scan tokenizer must reproduce Java regex
    * split(trim(s), "\s+") exactly — including the regex's
    * leading/trailing-empty-field semantics (trim strips only ASCII
    * 32, so tab/newline at the ends still produce empty fields), the
    * ""→[""] edge, and multibyte text. */
  test("ws_tokens equals split(trim(text), regex)") {
    HashExpressions.registerAll(spark)
    import spark.implicits._
    val edges = Seq(
      "", " ", "  ", "a", " a ", "a b", "a  b", "\ta", "a\t", "\t",
      "a\tb\ncd\fe\rf", " \t a \n b \t ", "déjà vu", "a b",
      "一 二\t三", "a\r\n\r\nb", "x" * 50)
    val rnd = new scala.util.Random(11)
    val chars = "ab \t\n\r\fxé".toCharArray
    val fuzz = (0 until 300).map(_ =>
      String.valueOf(Array.fill(rnd.nextInt(24))(chars(rnd.nextInt(chars.length)))))
    val df = (edges ++ fuzz).toDF("text")
    val bad = df.select(
        HashExpressions.whitespaceTokens(col("text")).as("kernel"),
        split(trim(col("text")), "\\s+").as("regex"))
      .filter(not(col("kernel") <=> col("regex")))
    assert(bad.count() === 0, bad.collect().mkString("; "))
    // NBSP ( ) is NOT Java \s — both forms must keep it inside a token
    val nbsp = spark.sql("SELECT ws_tokens('a b')").head.getSeq[String](0)
    assert(nbsp === Seq("a b"))
  }

  /** The SQ8 dequant kernel must match the zip_with/element_at Column
    * pipeline it replaced bit-for-bit, on float input (the stored
    * embedding type), including clamped out-of-range values and a
    * degenerate (mx == mn) dimension. */
  test("sq8_dequant equals the zip_with dequant pipeline") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val dim = 8
    val rows = (0 until 200).map(_ => Array.fill(dim)(rnd.nextFloat() * 4 - 2))
    val mins = Array.tabulate(dim)(i => if (i == 3) 1.0 else -1.5)
    val maxs = Array.tabulate(dim)(i => if (i == 3) 1.0 else 1.5)
    val mnA = typedlit(mins.toSeq)
    val mxA = typedlit(maxs.toSeq)
    def legacy(v: org.apache.spark.sql.Column) =
      zip_with(v, sequence(lit(1), lit(dim)), (x, i) => {
        val mn = element_at(mnA, i)
        val mx = element_at(mxA, i)
        val code = when(mx > mn,
          least(lit(255L), greatest(lit(0L),
            floor((x - mn) * 256.0 / (mx - mn))))).otherwise(lit(0L))
        mn + (code.cast("double") + 0.5) * ((mx - mn) / 256.0)
      })
    val df = rows.toDF("v")
    val bad = df.select(
        graft.functions.VectorExpressions
          .sq8Dequant(col("v"), mins.toSeq, maxs.toSeq).as("kernel"),
        legacy(transform(col("v"), x => x.cast("double"))).as("builtin"))
      .filter(not(col("kernel") <=> col("builtin")))
      .count()
    assert(bad === 0)
  }

  test("non-literal size argument is rejected with a clear error") {
    HashExpressions.registerAll(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(array('a'), 1 + 2)").head
    }
    assert(e.getMessage.contains("literal INT"))
  }
}
