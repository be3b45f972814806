package graft.tools

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

import graft.functions.PqImpl

/** Driver-side microbenchmark that settles VERDICT r17 ask #3: would
  * decomposing the PQ/IVF-PQ encode argmin from the direct ‖q−c‖² form
  * into ‖c‖² − 2q·c (codebook norms precomputed, exact integer
  * identity since |q|² is constant per (row, subspace)) speed up
  * `sim_pq_adc_topk` / the `sim_ivfpq_*` build path?
  *
  * Both forms run INTERLEAVED in one JVM over identical inputs, so
  * host weather and JIT state cancel — the bench-row A/B at sf10 could
  * not separate a ~1.3× kernel change from same-day window noise.
  * `direct` calls the PRODUCTION kernel ([[PqImpl.encode]]);
  * `decomp` is the rejected variant, inlined verbatim from the
  * reverted r18 draft.
  *
  * MEASURED RESULT (r18, two independent runs, 100–200k vectors ×
  * 5 rounds): parity on the PQ 16×4×256 geometry (ratios 0.95–1.05
  * round-by-round) and consistently SLOWER on the IVF coarse-assign
  * 1024×64 geometry (+4–12%, e.g. 1.090/1.079/0.982/1.035/1.038) —
  * the direct sub+mul+add loop auto-vectorizes at least as well as
  * mul+add, and the decomposed form streams an extra norms array.
  * The decomposition was therefore REJECTED; kernels stay in the
  * direct form. Codes verified identical across 500k encodes per
  * geometry (the `require` below).
  *
  * Usage: ProfileEncode [nVectors] [rounds]
  * Geometry mirrors the benched trained rows: PQ m=16 subspaces ×
  * k=256 entries × subDim=4 — the sim_pq_adc_topk trained codebook
  * shape — and the IVF coarse assign as one "subspace" of
  * k=1024,subDim=64 (sim_ivfpq_* cell assignment).
  */
object ProfileEncode {

  // the REJECTED decomposed kernel, verbatim from the reverted draft:
  // score = Σ c² − 2Σ q·c per codebook entry (norms precomputed),
  // argmin over scores ≡ argmin over distances since |q|² is constant
  private def encodeDecomp(v: ArrayData, cbNeg2: Array[Long],
      cbNorm: Array[Long], m: Int, k: Int, subDim: Int): ArrayData = {
    val n = m * subDim
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = math.floor(v.getFloat(i).toDouble * 10000.0).toLong
      i += 1
    }
    val out = new Array[Long](m)
    var mi = 0
    while (mi < m) {
      var best = 0L
      var bestS = Long.MaxValue
      var ki = 0
      while (ki < k) {
        val e = mi * k + ki
        val base = e * subDim
        var dot = 0L
        var d = 0
        while (d < subDim) {
          dot += q(mi * subDim + d) * cbNeg2(base + d)
          d += 1
        }
        val s = cbNorm(e) + dot
        if (s < bestS) { bestS = s; best = ki.toLong }
        ki += 1
      }
      out(mi) = mi.toLong * k + best
      mi += 1
    }
    new GenericArrayData(out)
  }

  def main(args: Array[String]): Unit = {
    val nVec = if (args.length > 0) args(0).toInt else 200000
    val rounds = if (args.length > 1) args(1).toInt else 5
    val rnd = new scala.util.Random(7)

    def run(label: String, m: Int, k: Int, subDim: Int): Unit = {
      val dim = m * subDim
      val cb = Array.fill(m * k * subDim)((rnd.nextInt(20001) - 10000).toLong)
      val cbNeg2 = cb.map(c => -2L * c)
      val cbNorm = new Array[Long](m * k)
      var e = 0
      while (e < m * k) {
        var s = 0L
        var d = 0
        while (d < subDim) {
          val c = cb(e * subDim + d); s += c * c; d += 1
        }
        cbNorm(e) = s
        e += 1
      }
      val vecs: Array[ArrayData] = Array.fill(nVec) {
        new GenericArrayData(
          Array.fill(dim)(rnd.nextInt(20001) / 10000.0f - 1.0f)
            .map(_.asInstanceOf[Any]))
      }
      var sinkA = 0L
      var sinkB = 0L
      (1 to rounds).foreach { r =>
        val t0 = System.nanoTime()
        var i = 0
        while (i < nVec) {
          sinkA += PqImpl.encode(vecs(i), cb, m, k, subDim,
            isFloat = true).getLong(0)
          i += 1
        }
        val t1 = System.nanoTime()
        i = 0
        while (i < nVec) {
          sinkB += encodeDecomp(vecs(i), cbNeg2, cbNorm, m, k, subDim)
            .getLong(0)
          i += 1
        }
        val t2 = System.nanoTime()
        println(f"$label round $r: direct=${(t1 - t0) / 1e9}%.3fs " +
          f"decomp=${(t2 - t1) / 1e9}%.3fs " +
          f"ratio=${(t2 - t1).toDouble / (t1 - t0)}%.3f")
      }
      require(sinkA == sinkB,
        s"$label: kernels disagree (sinkA=$sinkA sinkB=$sinkB)")
      println(s"$label: codes identical across ${nVec * rounds} encodes")
    }

    // sim_pq_adc_topk trained-codebook geometry
    run("pq_16x4x256", m = 16, k = 256, subDim = 4)
    // IVF coarse assignment as a single subspace
    run("ivf_coarse_1024x64", m = 1, k = 1024, subDim = 64)
  }
}
