package graft.sources

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Z-order clustering must make row-group min/max footers selective
  * on BOTH clustering keys, where a linear sort is selective on its
  * sort key only. The spec measures the thing the layout exists for:
  * the fraction of row groups a range predicate fails to skip. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Per row group: (min, max) of `column` across the parquet files. */
  private def ranges(path: String, column: String): Seq[(Long, Long)] = {
    val conf = new Configuration()
    val fs = FileSystem.getLocal(conf)
    fs.listStatus(new Path(path)).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .flatMap { st =>
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(st.getPath, conf))
        try {
          reader.getFooter.getBlocks.asScala.toSeq.map { block =>
            val cc = block.getColumns.asScala
              .find(_.getPath.toDotString == column).get
            val s = cc.getStatistics
            (s.genericGetMin.asInstanceOf[Number].longValue(),
              s.genericGetMax.asInstanceOf[Number].longValue())
          }
        } finally reader.close()
      }
  }

  private def overlapFraction(rs: Seq[(Long, Long)],
      lo: Long, hi: Long): Double =
    rs.count { case (mn, mx) => mx >= lo && mn <= hi }.toDouble / rs.size

  test("z-order prunes row groups on both dimensions; linear sort " +
    "only on its own key") {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val zDir = Files.createTempDirectory("graft-zorder").toString
    val linDir = Files.createTempDirectory("graft-linear").toString
    // sf0.001 domains: l_partkey 0..199 (8 bits), l_suppkey 0..9
    // (4 bits). 16 files ⇒ 4 z-cut bits (p7, s3, p6, s2): file ranges
    // resolve partkey quarters AND suppkey quarters.
    ZOrderLayout.writeZOrdered(li, "l_partkey", "l_suppkey", zDir, 16,
      aBits = 8, bBits = 4)
    ZOrderLayout.writeLinear(li, "l_partkey", linDir, 16)

    // ~10-20% slices in the middle of each key domain
    val (pLo, pHi) = (90L, 110L)
    val (sLo, sHi) = (4L, 5L)

    val zPart = overlapFraction(ranges(zDir, "l_partkey"), pLo, pHi)
    val zSupp = overlapFraction(ranges(zDir, "l_suppkey"), sLo, sHi)
    val lPart = overlapFraction(ranges(linDir, "l_partkey"), pLo, pHi)
    val lSupp = overlapFraction(ranges(linDir, "l_suppkey"), sLo, sHi)

    // linear: perfect on the sort key, useless on the other
    assert(lPart <= 0.5, s"linear partkey overlap $lPart")
    assert(lSupp == 1.0, s"linear suppkey overlap $lSupp")
    // z-order: selective on BOTH keys
    assert(zPart <= 0.75, s"zorder partkey overlap $zPart")
    assert(zSupp <= 0.75, s"zorder suppkey overlap $zSupp")

    // correctness: the layout is a pure re-ordering
    val a = spark.read.parquet(zDir).count()
    assert(a == li.count())
  }
}
