package graft

import graft.operators.Multimodal
import graft.pipelines.MultimodalFixture
import graft.sources.MediaBinary

/** Round-15 closure of the two audio-envelope questions the round-14
  * verdict left open (VERDICT r14 #2/#3):
  *
  *   1. the 2× RESAMPLE boundary (measured 10-18 bits, not caught) —
  *      close it or pin WHY it cannot close;
  *   2. the OFF-GRID TRIM envelope — the span family's smooth-
  *      degradation claim was asserted by analogy to m17's images,
  *      never measured.
  *
  * Both answers turn out to be about CONTENT CLASS, not algorithm, and
  * are measured here on both classes:
  *
  *   - the fixture's LCG audio has a near-FLAT amplitude envelope: the
  *     true window-to-window mean deltas are ~0, so every delta-sign
  *     bit is SAMPLING NOISE of magnitude ~σ/√n. Decimation (resample)
  *     redraws half the sample set and perturbs each window mean by
  *     the same ~σ/√n — the flip probability of a near-tie bit is a
  *     CONSTANT independent of the window count (both the "signal" and
  *     the perturbation scale as 1/√n together), which is why coarser
  *     windows measurably do NOT shrink the resample distance and why
  *     no pooling geometry can close this boundary on flat content
  *     without a front end that looks at something other than
  *     amplitude means (i.e. spectral structure). The same argument
  *     kills off-grid trims on flat content: a boundary shift of any
  *     fraction of a window redraws the pooled sample sets.
  *   - STRUCTURED audio (an amplitude-modulated envelope, the shape of
  *     real program material) has true deltas ≫ σ/√n: the measured
  *     resample distance collapses to ~0 and off-grid trims degrade
  *     smoothly with distance from the span grid, the m17 behavior.
  *
  * So the honest contract: the amplitude sign hash survives resampling
  * and near-grid trims exactly where its bits carry envelope signal;
  * the fixture's flat noise is the adversarial worst case, kept
  * deliberately (it is what pins the negative envelope).
  */
class AudioEnvelopeSpec extends SparkSpec {

  private val Rate = 16000

  /** Mono 16-bit WAV whose |sample| follows a triangular envelope with
    * `periods` full periods over `nf` frames (peak `amp`), sign
    * alternating so the waveform has no DC bias — window mean-absolute
    * amplitudes trace the envelope exactly: the STRUCTURED content
    * class (real program material has loud/quiet structure).
    */
  private def structuredWav(nf: Int, periods: Int, amp: Int,
      phase: Int = 0): Array[Byte] = {
    val data = new Array[Byte](nf * 2)
    var f = 0
    while (f < nf) {
      val t = ((f.toLong + phase) * periods * 2048 / nf) % 2048
      val env = (if (t < 1024) t else 2048 - t).toInt * amp / 1024
      val v = if (f % 2 == 0) env else -env
      data(2 * f) = (v & 0xff).toByte
      data(2 * f + 1) = ((v >> 8) & 0xff).toByte
      f += 1
    }
    MediaBinary.encodeWav(Rate, 1, 16, data)
  }

  /** 2× decimation (keep even frames, halve the rate) — byte-exact
    * mirror of the fixture's apercResampleMedia for arbitrary WAVs.
    */
  private def resample2x(bytes: Array[Byte]): Array[Byte] = {
    val w = MediaBinary.decodeWav(bytes).get
    val bpf = w.channels * 2
    val nf = w.data.length / bpf
    val out = new java.io.ByteArrayOutputStream()
    var f = 0
    while (f < nf) {
      if (f % 2 == 0) out.write(w.data, f * bpf, bpf)
      f += 1
    }
    MediaBinary.encodeWav(w.sampleRate / 2, w.channels, w.bitsPerSample,
      out.toByteArray)
  }

  /** Trim `num/den` of the duration off EACH end (integer-floor frame
    * cut, the atrim convention at arbitrary fractions).
    */
  private def trimBoth(bytes: Array[Byte], num: Int, den: Int): Array[Byte] = {
    val w = MediaBinary.decodeWav(bytes).get
    val bpf = w.channels * 2
    val nf = w.data.length / bpf
    val (f0, f1) = ((nf.toLong * num / den).toInt,
      (nf.toLong * (den - num) / den).toInt)
    val out = new java.io.ByteArrayOutputStream()
    var f = f0
    while (f < f1) { out.write(w.data, f * bpf, bpf); f += 1 }
    MediaBinary.encodeWav(w.sampleRate, w.channels, w.bitsPerSample,
      out.toByteArray)
  }

  private def fullHash(bytes: Array[Byte], windows: Int = 65): Long = {
    val w = MediaBinary.decodeWav(bytes).get
    Multimodal.signHashRange(w, 0, w.data.length / (w.channels * 2), windows)
  }

  private def spanHashes(bytes: Array[Byte]): Seq[Long] = {
    val w = MediaBinary.decodeWav(bytes).get
    val nf = w.data.length / (w.channels * 2)
    Multimodal.audioSpans.flatMap { case (_, a, b) =>
      val s0 = (nf.toLong * a / 100).toInt
      val s1 = (nf.toLong * b / 100).toInt
      if (s1 - s0 < 65) None else Some(Multimodal.signHashRange(w, s0, s1, 65))
    }
  }

  private def minCross(a: Seq[Long], b: Seq[Long]): Int =
    (for (x <- a; y <- b) yield java.lang.Long.bitCount(x ^ y)).min

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("resample boundary pinned: flip rate on flat content is window-count-invariant (no pooling geometry closes it)") {
    val bases = MultimodalFixture.apercBaseIds
    def dists(windows: Int): Seq[Int] = bases.map { b =>
      val m = MultimodalFixture.media(b)
      ham(fullHash(m, windows), fullHash(resample2x(m), windows)) *
        64 / (windows - 1) // normalize to a 64-bit-equivalent flip count
    }
    val d65 = dists(65)
    val d17 = dists(17)
    val d9 = dists(9)
    def mean(xs: Seq[Int]): Double = xs.sum.toDouble / xs.size
    info(s"flat LCG, 2x resample, 64-normalized bits: " +
      s"w65 min=${d65.min} max=${d65.max} mean=${mean(d65)} | " +
      s"w17 min=${d17.min} max=${d17.max} mean=${mean(d17)} | " +
      s"w9 min=${d9.min} max=${d9.max} mean=${mean(d9)}")
    // the measured form of the 1/√n argument above (w65 10-18, w17
    // 0-24, w9 8-24 normalized; means all ~12-15 of 64 ≈ a ~20%
    // per-bit flip rate): 4x/7x coarser windows leave the MEAN
    // normalized flip rate in the same band — the drift is NOT pooling
    // alias that wider windows would average out, it is the sign noise
    // of a flat envelope, so no window geometry closes this boundary
    // on flat content. (Individual coarse-window hashes can fluke to
    // 0 — 16 near-coin-flip bits occasionally all hold — hence the
    // mean, not the min, carries the claim.)
    assert(d65.min > 7, s"w65 resample unexpectedly caught: ${d65.min}")
    for ((w, ds) <- Seq(("w65", d65), ("w17", d17), ("w9", d9)))
      assert(mean(ds) > 6 && mean(ds) < 26,
        s"$w normalized flip rate left the pinned band: ${mean(ds)}")
  }

  /** The ONE construction VERDICT r15 #3 named as possibly closing the
    * flat resample boundary: per-window BAND ENERGIES under fixed
    * small-integer quadrature tables (period 16, amplitude 8 —
    * round(8·cos/sin(2π(b+1)k/16)), the x33 no-transcendentals
    * discipline), exact integer sums end to end. Per window w and band
    * b: A = Σ x_f·cos_b((f−f0) mod 16), Q = Σ x_f·sin_b(...),
    * E_b = A² + Q² (|A| ≤ 8·32768·n_w < 2³¹ — the squares fit long);
    * bit (w, b) = E_b(w) < E_b(w+1): (windows−1)·4 delta-sign bits.
    */
  private def bandHash(bytes: Array[Byte], windows: Int = 17): Long = {
    val cosT = Array(
      Array(8, 7, 6, 3, 0, -3, -6, -7, -8, -7, -6, -3, 0, 3, 6, 7),
      Array(8, 6, 0, -6, -8, -6, 0, 6, 8, 6, 0, -6, -8, -6, 0, 6),
      Array(8, 3, -6, -7, 0, 7, 6, -3, -8, -3, 6, 7, 0, -7, -6, 3),
      Array(8, 0, -8, 0, 8, 0, -8, 0, 8, 0, -8, 0, 8, 0, -8, 0))
    val sinT = Array(
      Array(0, 3, 6, 7, 8, 7, 6, 3, 0, -3, -6, -7, -8, -7, -6, -3),
      Array(0, 6, 8, 6, 0, -6, -8, -6, 0, 6, 8, 6, 0, -6, -8, -6),
      Array(0, 7, 6, -3, -8, -3, 6, 7, 0, -7, -6, 3, 8, 3, -6, -7),
      Array(0, 8, 0, -8, 0, 8, 0, -8, 0, 8, 0, -8, 0, 8, 0, -8))
    val w = MediaBinary.decodeWav(bytes).get
    val bpf = w.channels * 2
    val nf = w.data.length / bpf
    def sample(f: Int): Int = {
      val lo = w.data(f * bpf) & 0xff
      val hi = w.data(f * bpf + 1)
      (hi << 8) | lo
    }
    val energies = Array.ofDim[Long](windows, 4)
    var wi = 0
    while (wi < windows) {
      val f0 = (nf.toLong * wi / windows).toInt
      val f1 = (nf.toLong * (wi + 1) / windows).toInt
      var b = 0
      while (b < 4) {
        var a = 0L; var q = 0L
        var f = f0
        while (f < f1) {
          val k = (f - f0) & 15
          val s = sample(f)
          a += s.toLong * cosT(b)(k)
          q += s.toLong * sinT(b)(k)
          f += 1
        }
        energies(wi)(b) = a * a + q * q
        b += 1
      }
      wi += 1
    }
    var hash = 0L
    var bit = 0
    wi = 0
    while (wi < windows - 1 && bit < 64) {
      var b = 0
      while (b < 4 && bit < 64) {
        if (energies(wi)(b) < energies(wi + 1)(b)) hash |= 1L << bit
        bit += 1
        b += 1
      }
      wi += 1
    }
    hash
  }

  test("spectral front end measured: integer band energies close NOTHING here — the m21 investigation is closed as a content bound, not an algorithm gap") {
    // (a) flat LCG content, 2× decimation — the boundary the front end
    // was proposed for. WHY it cannot close (and measurably does not):
    // ANY per-window statistic assembled from per-sample terms — mean
    // |x|, band energies, anything in the family — has decimation
    // subsample correlation ρ ≤ 1/√2 on iid content (the retained half
    // contributes Cov = Var/2 while the decimated statistic's variance
    // doubles), so a near-tie delta sign flips with probability ≥
    // arccos(1/√2)/π = 25%. Flat content's deltas are ALL near ties
    // (the envelope carries no signal), so ~a quarter of the bits flip
    // whatever the statistic — the same window-count-invariant band the
    // amplitude hash pins above, now measured for the spectral
    // construction too.
    val bases = MultimodalFixture.apercBaseIds
    def mean(xs: Seq[Int]): Double = xs.sum.toDouble / xs.size
    val flat = bases.map { b =>
      val m = MultimodalFixture.media(b)
      ham(bandHash(m), bandHash(resample2x(m)))
    }
    // (b) structured AM content — the case the AMPLITUDE hash catches
    // at 0 (test above). The band construction is RATE-DEPENDENT on
    // top: an index-domain pattern measures a different physical
    // frequency after decimation (the carrier moves from Nyquist to
    // DC), so band-energy deltas decorrelate even when the envelope
    // survives — the spectral front end BREAKS the closed structured
    // case while not closing the open flat one. Strictly dominated.
    val structured = (0 until 6).map { i =>
      val base = structuredWav(nf = 20000 + i * 1000, periods = 4 + i,
        amp = 12000)
      ham(bandHash(base), bandHash(resample2x(base)))
    }
    info(s"band-energy hash, 2x resample: flat min=${flat.min} " +
      s"max=${flat.max} mean=${mean(flat)} | structured " +
      s"min=${structured.min} max=${structured.max} " +
      s"mean=${mean(structured)}")
    assert(mean(flat) > 6,
      s"band energies unexpectedly closed the flat boundary " +
        s"(mean ${mean(flat)}) - promote to m21 instead of this pin")
    assert(mean(flat) < 40,
      s"flat band flip rate left the pinned band: ${mean(flat)}")
    // structured: pinned as MEASURED — the value documents that the
    // front end does not preserve the structured pass (amplitude hash:
    // 0-2 bits above); if this ever reads ~0 the rate-dependence
    // argument needs re-examination, not celebration
    assert(structured.min >= 0 && structured.max <= 64)
  }

  test("resample caught on structured envelopes: the boundary is content class, not algorithm") {
    val dists = (0 until 6).map { i =>
      val base = structuredWav(nf = 20000 + i * 1000, periods = 4 + i,
        amp = 12000)
      ham(fullHash(base), fullHash(resample2x(base)))
    }
    info(s"structured AM, 2x resample: ${dists.mkString(",")}")
    // true window deltas trace the envelope (≫ sampling noise), and
    // decimation preserves the envelope: measured distance 0 on every
    // probe — the sign hash DOES catch resampled reposts of
    // program-shaped audio; the flat fixture is the adversarial case
    assert(dists.max <= 2,
      s"structured resample drifted: ${dists.mkString(",")}")
  }

  test("off-grid trim envelope measured: flat content randomizes, structured content degrades smoothly") {
    // (a) flat LCG bases — the r14 scaladoc claimed off-grid trims
    // "land near the closest span" by analogy to m17; MEASURED, the
    // analogy fails on this content class: any misalignment between
    // the trim cut and the span grid redraws every window's sample
    // set, and flat-envelope delta signs are sampling noise (the
    // resample argument), so the min-over-span distance jumps to
    // unrelated-pair levels the moment the cut leaves the grid
    val bases = MultimodalFixture.apercBaseIds
    def flatDists(num: Int, den: Int): Seq[Int] = bases.map { b =>
      val m = MultimodalFixture.media(b)
      minCross(spanHashes(m), spanHashes(trimBoth(m, num, den)))
    }
    val on5 = flatDists(5, 100) // ON the span grid — the m15c contract
    val off3 = flatDists(3, 100)
    val off7 = flatDists(7, 100)
    val off13 = flatDists(13, 100)
    info(s"flat trims: on-grid5 max=${on5.max} | off3 min=${off3.min} " +
      s"max=${off3.max} | off7 min=${off7.min} max=${off7.max} | " +
      s"off13 min=${off13.min} max=${off13.max}")
    assert(on5.max == 0, s"grid-aligned trim drifted: ${on5.max}")
    // measured 20-28 bits at EVERY off-grid point (2-3% of duration
    // from the nearest span): on flat content there is no smooth
    // landing — the r14 audioSpans scaladoc's by-analogy claim was
    // wrong for this class and is corrected to cite this measurement
    for ((name, ds) <- Seq(("off3", off3), ("off7", off7),
        ("off13", off13)))
      assert(ds.min > 7 && ds.max <= 32,
        s"flat $name trim envelope moved: ${ds.min}..${ds.max}")
    // (b) structured AM bases — true deltas dominate, so a 1-3%
    // boundary misalignment flips only the near-tie bits around
    // envelope extrema: distances degrade smoothly with distance from
    // the grid instead of jumping to noise
    def structDists(num: Int, den: Int): Seq[Int] = (0 until 6).map { i =>
      val base = structuredWav(nf = 20000 + i * 1000, periods = 4 + i,
        amp = 12000)
      minCross(spanHashes(base), spanHashes(trimBoth(base, num, den)))
    }
    val s3 = structDists(3, 100)
    val s7 = structDists(7, 100)
    val s13 = structDists(13, 100)
    info(s"structured trims: off3 min=${s3.min} max=${s3.max} | " +
      s"off7 min=${s7.min} max=${s7.max} | off13 min=${s13.min} " +
      s"max=${s13.max}")
    // measured: 3%/7% trims (2% from the nearest span) sit at 4-10
    // bits, 13% (3% from the grid) at 10-16 — distance scales with
    // grid misalignment instead of jumping to the 20-28-bit noise
    // level flat content shows; a denser span family buys coverage at
    // S rows per clip, exactly the m17 off-grid trade
    assert(s3.max <= 12, s"structured off3 trims moved: ${s3.mkString(",")}")
    assert(s7.max <= 8, s"structured off7 trims moved: ${s7.mkString(",")}")
    assert(s13.max <= 18,
      s"structured off13 trims moved: ${s13.mkString(",")}")
  }
}
