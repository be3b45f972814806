package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.{shinglesOfTokens, tokens}

/** Dev-only stage profiler for the n-gram Jaccard pipeline: times each
  * intermediate materialization so optimization targets the real cost,
  * not the guessed one. Not part of the query surface.
  */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    import org.apache.spark.sql.expressions.Window
    val sh = Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(shinglesOfTokens(col("toks"), 3))).as("sh"))
      .withColumn("kh",
        conv(substring(md5(col("sh").cast("binary")), 1, 15), 16, 10)
          .cast("long"))
      .cache()
    time("sh materialize")(sh.count())
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh")).cache()
    time("counts")(counts.count())
    val w = Window.partitionBy(col("doc_id")).orderBy(col("kh"), col("sh"))
    val prefix = sh.withColumn("rank", row_number().over(w))
      .join(counts, "doc_id")
      .filter(col("rank") <= col("n_sh") - ceil(col("n_sh") * 0.7) + 1)
      .select(col("doc_id"), col("kh"))
      .cache()
    time("prefix")(prefix.count())
    val cand = prefix.as("a")
      .join(prefix.as("b"), col("a.kh") === col("b.kh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
      .cache()
    val nCand = time("cand")(cand.count())
    System.err.println(s"[prof] candidates: $nCand")
    val inter = cand
      .join(sh.as("sa"), col("sa.doc_id") === col("id1"))
      .join(sh.as("sb"), col("sb.doc_id") === col("id2") &&
        col("sa.kh") === col("sb.kh"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("inter"))
      .cache()
    time("inter")(inter.count())
    val out = inter
      .join(counts.withColumnRenamed("doc_id", "id1")
        .withColumnRenamed("n_sh", "n1"), "id1")
      .join(counts.withColumnRenamed("doc_id", "id2")
        .withColumnRenamed("n_sh", "n2"), "id2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= 0.7)
      .select(col("id1"), col("id2"), col("jaccard"))
      .orderBy(col("id1"), col("id2"))
    time("final")(out.count())
    s.stop()
  }
}
