package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyLink

/** Generative properties for the pure algorithmic kernels, checked
  * against independent naive reference implementations — the guarantees
  * the operators' docs claim, exercised over random inputs rather than
  * hand-picked fixtures:
  *
  *   - winnowing (SWA 2003): the O(n) monotonic-deque selection equals
  *     a naive O(n·w) rightmost-min-per-window scan, and every window
  *     is covered by a selection;
  *   - Luhn: the codegen column validates every correctly-checked PAN
  *     and rejects every single-digit substitution (the error class the
  *     checksum guarantees to catch);
  *   - deletion-neighborhood blocking (FastSS): every random
  *     single-edit pair is linked — recall by construction, not by
  *     fixture luck.
  *
  * Spark-evaluated properties batch all generated cases into ONE job
  * (per-case jobs would be minutes of scheduler overhead for no extra
  * coverage).
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._

  private val PosShift = 4294967296L

  // ---- winnowing ----------------------------------------------------------

  /** Naive reference: rightmost minimum of every length-w window (one
    * clamped window when n <= w), first-appearance distinct encoding.
    */
  private def naiveSelections(hs: Array[Long], w: Int): Seq[Long] = {
    val n = hs.length
    val sel = scala.collection.mutable.LinkedHashSet[Long]()
    if (n == 0) return Nil
    if (n <= w) {
      var best = Long.MaxValue
      var pos = 0
      var j = 0
      while (j < n) {
        if (hs(j) <= best) { best = hs(j); pos = j }
        j += 1
      }
      sel += (pos + 1).toLong * PosShift + best
    } else {
      var s = 0
      while (s <= n - w) {
        var best = Long.MaxValue
        var pos = s
        var j = s
        while (j < s + w) {
          if (hs(j) <= best) { best = hs(j); pos = j }
          j += 1
        }
        sel += (pos + 1).toLong * PosShift + hs(pos)
        s += 1
      }
    }
    sel.toSeq
  }

  test("property: winnow deque equals the naive window scan and covers every window") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // tiny vocabulary on purpose: repeated words give repeated gram
    // hashes, exercising the rightmost-min tie handling
    val genText = for {
      n <- Gen.chooseNum(0, 30)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "e"))
    } yield ws.mkString(" ")
    val params = Gen.Parameters.default
    (0 until 200).foreach { i =>
      val text = genText.pureApply(params, Seed(i.toLong))
      val k = 1 + i % 3
      val w = Seq(1, 2, 4, 7)(i % 4)
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(text)
      val got = graft.functions.WinnowUtil.selections(u, k, w)
        .toLongArray().toSeq
      val grams = graft.functions.ShingleUtil.shingles(u, k)
      val hs = Array.tabulate(grams.numElements())(j =>
        graft.functions.SimHashUtil.h32(grams.getUTF8String(j).toString))
      assert(got == naiveSelections(hs, w),
        s"seed $i k=$k w=$w text='$text'")
      // SWA coverage: every window of w gram hashes holds a selection
      val positions = got.map(v => (v / PosShift).toInt - 1).toSet
      if (hs.length > w)
        (0 to hs.length - w).foreach { s =>
          assert(positions.exists(p => p >= s && p < s + w),
            s"window at $s uncovered, seed $i")
        }
    }
  }

  // ---- Luhn ---------------------------------------------------------------

  private def luhnRef(s: String): Boolean = {
    val sum = s.reverse.zipWithIndex.map { case (c, i) =>
      val d = c - '0'
      val dd = if (i % 2 == 1) d * 2 else d
      if (dd > 9) dd - 9 else dd
    }.sum
    sum % 10 == 0
  }

  test("property: Luhn column accepts checked PANs, rejects any single-digit substitution") {
    import org.apache.spark.sql.functions._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val gen = for {
      base <- Gen.listOfN(15, Gen.chooseNum(0, 9))
      pos <- Gen.chooseNum(0, 15)
      delta <- Gen.chooseNum(1, 9)
    } yield (base, pos, delta)
    val params = Gen.Parameters.default
    val rows = (0 until 300).flatMap { i =>
      val (base, pos, delta) = gen.pureApply(params, Seed(i.toLong))
      val b = base.mkString
      // compute the check digit making the PAN valid
      val check = (0 to 9).find(d => luhnRef(b + d)).get
      val valid = b + check
      assert(luhnRef(valid)) // the reference agrees with itself
      // single-digit substitution: Luhn guarantees detection
      val corrupted = valid.updated(pos,
        (((valid(pos) - '0') + delta) % 10 + '0').toChar)
      Seq((valid, true), (corrupted, false))
    }
    val got = rows.toDF("num", "expected")
      .withColumn("got", graft.ext.Curation.luhnValid(col("num")))
      .filter(col("got") =!= col("expected"))
      .count()
    assert(got == 0L)
  }

  // ---- deletion-neighborhood blocking ------------------------------------

  test("property: every random single-edit pair is linked (FastSS recall)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val genCase = for {
      len <- Gen.chooseNum(3, 12)
      s <- Gen.listOfN(len, Gen.alphaLowerChar).map(_.mkString)
      op <- Gen.oneOf("sub", "ins", "del")
      pos <- Gen.chooseNum(0, len - 1)
      c <- Gen.alphaLowerChar
    } yield {
      val d = op match {
        case "sub" => s.updated(pos, if (s(pos) == c) 'z' else c)
        case "ins" => s.substring(0, pos) + c + s.substring(pos)
        case "del" => s.substring(0, pos) + s.substring(pos + 1)
      }
      (s, d)
    }
    val params = Gen.Parameters.default
    val cases = (0 until 300).map(i =>
      genCase.pureApply(params, Seed(i.toLong)))
      .filter { case (s, d) => s != d }
      .distinct
    val clean = cases.map(_._1).distinct.toDF("key")
    val dirty = cases.map(_._2).distinct.toDF("key")
    val got = FuzzyLink.linkage(clean, dirty).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val missing = cases.toSet.diff(got)
    assert(missing.isEmpty,
      s"blocking missed ${missing.size} distance-1 pairs: " +
        missing.take(5).mkString(", "))
  }

  // ---- round-10 report invariants over random corpora ---------------------

  test("padding report: conservation and waste bounds on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // lengths deliberately past 2 * PadBuckets.last (= 4096): overlong
    // docs claim their own length as the bucket, so waste stays >= 0
    val docs = (0 until 400).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(6000))("w").mkString(" "))
    }.toDF("doc_id", "text")
    assert(docs.selectExpr("max(size(split(text, ' ')))")
      .head().getInt(0) > 4096, "fixture must exercise the overflow arm")
    val rows = graft.ext.Curation.paddingReport(docs).collect()
    // every doc lands in exactly one bucket; token mass is conserved
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 400L)
    assert(rows.map(_.getAs[Long]("sum_tokens")).sum
      == docs.selectExpr("sum(size(split(text, ' ')))")
        .head().getLong(0))
    rows.foreach { r =>
      val w = r.getAs[Long]("waste_ppm")
      assert(w >= 0L && w < 1000000L)
      assert(r.getAs[Long]("sum_tokens") <= r.getAs[Long]("padded_tokens"))
      // rounding up to the NEXT power of two never pads beyond 2x
      // (minus the sub-16 bucket where short docs can waste more)
      if (r.getAs[Long]("bucket") > 16L)
        assert(w < 500000L, s"bucket ${r.getAs[Long]("bucket")}: $w")
    }
  }

  test("keep-priority survivors equal a naive per-cluster min on random labels") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(23)
    // random cluster labels + random sources, fed via labelsOpt so the
    // test isolates the POLICY from the pair generation
    val docs = (0 until 400).map(i =>
      (i.toLong, s"text $i", s"src${rnd.nextInt(7)}"))
    val labels = docs.collect {
      case (id, _, _) if rnd.nextInt(3) == 0 =>
        (id, (rnd.nextInt(40) * 10).toLong) // ~1/3 of docs clustered
    }
    val docsDf = docs.toDF("doc_id", "text", "source")
    val labelsDf = labels.toDF("doc_id", "label")
    val got = graft.ext.Dedup.keepPrioritySurvivors(
      docsDf, labelsOpt = Some(labelsDf)).collect()
      .map(r => r.getAs[Long]("doc_id")
        -> (Option(r.get(1)).map(_.asInstanceOf[Long]),
          r.getAs[Boolean]("keep"))).toMap
    // naive reference: per cluster, lexicographic (source, doc_id) min
    val srcOf = docs.map(d => d._1 -> d._3).toMap
    val byCluster = labels.groupBy(_._2)
    val expectKeep = byCluster.values.flatMap { members =>
      val ids = members.map(_._1)
      val best = ids.map(id => (srcOf(id), id)).min._2
      ids.map(id => id -> (id == best))
    }.toMap
    docs.foreach { case (id, _, _) =>
      val (cluster, keep) = got(id)
      labels.find(_._1 == id) match {
        case Some((_, l)) =>
          assert(cluster.contains(l) && keep == expectKeep(id),
            s"doc $id cluster $l")
        case None =>
          assert(cluster.isEmpty && keep, s"unclustered doc $id must keep")
      }
    }
  }

  test("epoch plan: water-fill invariants hold on random corpora") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    // random source sizes (docs AND doc lengths vary independently) and
    // several budget ratios, incl. one past the epoch cap
    Seq((3L, 1L), (7L, 2L), (11L, 2L), (13L, 1L)).foreach {
      case (num, den) =>
        val docs = (0 until 300).map { i =>
          (i.toLong,
            Seq.fill(5 + rnd.nextInt(120))(s"w${rnd.nextInt(40)}")
              .mkString(" "),
            s"s${rnd.nextInt(9)}")
        }.toDF("doc_id", "text", "source")
        val plan = graft.ext.Curation
          .epochPlan(docs, budgetNum = num, budgetDen = den).collect()
        val tTotal = plan.map(_.getAs[Long]("n_tokens")).sum
        val budget = tTotal * num / den
        val cap = graft.ext.Curation.EpochCap
        val fullRounds = math.min(budget / tTotal, cap)
        assert(plan.map(_.getAs[Long]("planned_tokens")).sum <= budget)
        plan.foreach { r =>
          val e = r.getAs[Long]("epochs")
          assert(e >= fullRounds && e <= math.min(fullRounds + 1, cap),
            s"$num/$den: $r")
        }
        // extras form the maximal fitting prefix in quality order
        val ordered = plan.sortBy(r =>
          (-r.getAs[Long]("quality_ppm"), r.getAs[String]("source")))
        val flags = ordered.map(_.getAs[Long]("epochs") > fullRounds)
        assert(!flags.dropWhile(identity).contains(true), s"$num/$den")
        if (fullRounds < cap) {
          val rem = budget - fullRounds * tTotal
          val nExtra = flags.takeWhile(identity).length
          val prefix =
            ordered.take(nExtra).map(_.getAs[Long]("n_tokens")).sum
          assert(prefix <= rem)
          if (nExtra < ordered.length)
            assert(prefix
              + ordered(nExtra).getAs[Long]("n_tokens") > rem)
        } else assert(!flags.contains(true), "extras above the cap")
    }
  }

  test("label balance: shares sum to ~1e6, deltas sum to ~0") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val emb = (0 until 500).map(i => (i.toLong, rnd.nextInt(13).toLong))
      .toDF("vec_id", "label")
    val rows = graft.ext.EmbedStats.labelBalance(emb).collect()
    val shares = rows.map(_.getAs[Long]("share_ppm"))
    val nLabels = rows.length
    // floor-division shares under-shoot by < 1 ppm each
    assert(shares.sum <= 1000000L && shares.sum > 1000000L - nLabels)
    val deltas = rows.map(_.getAs[Long]("uniform_delta_ppm"))
    assert(math.abs(deltas.sum) <= 2L * nLabels)
  }

  test("MG counters: bounds hold under adversarial partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // Zipf-ish stream over 30 symbols
    val syms = (0 until 5000).map { _ =>
      ('a' + math.min(rnd.nextInt(1 + rnd.nextInt(30)),
        25)).toChar.toString
    }
    val k = graft.ext.HeavyHitters.Counters
    for (parts <- Seq(1, 3, 13)) {
      val ds = spark.createDataset(syms)(
        org.apache.spark.sql.Encoders.STRING).repartition(parts)
        .as[String]
      val est = graft.ext.HeavyHitters.mergedCounters(ds, k).collect()
        .map(r => r.getAs[String]("symbol") -> r.getAs[Long]("est")).toMap
      val exact = syms.groupBy(identity).view.mapValues(_.size.toLong)
      val n = syms.size.toLong
      est.foreach { case (sym, e) =>
        assert(e <= exact(sym), s"parts=$parts $sym over-estimate")
        assert((exact(sym) - e) * (k + 1) <= n, s"parts=$parts $sym bound")
      }
      exact.foreach { case (sym, c) =>
        if (c * (k + 1) > n)
          assert(est.contains(sym), s"parts=$parts lost heavy hitter $sym")
      }
    }
  }

  test("bandedHamming64 equals brute force on random fingerprints (lossless at radius 3)") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    def rand32() = rnd.nextInt().toLong & 0xFFFFFFFFL
    val base = (0 until 250).map(i => (i.toLong, rand32(), rand32()))
    // plant neighbors at every distance 0..6 off the first base rows:
    // distances 0-3 MUST pair, 4-6 MUST NOT (the radius is exact)
    def flipBits(lo: Long, hi: Long, k: Int): (Long, Long) = {
      val pos = rnd.shuffle((0 until 64).toList).take(k)
      pos.foldLeft((lo, hi)) { case ((l, h), p) =>
        if (p < 32) (l ^ (1L << p), h) else (l, h ^ (1L << (p - 32)))
      }
    }
    val planted = (0 to 6).map { d =>
      val (_, lo, hi) = base(d)
      val (fl, fh) = flipBits(lo, hi, d)
      (1000L + d, fl, fh)
    }
    val all = base ++ planted
    val out = graft.ext.Multimodal.bandedHamming64(
        all.toDF("doc_id", "fp_lo", "fp_hi"), 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    def ham(a: (Long, Long, Long), b: (Long, Long, Long)): Long =
      (java.lang.Long.bitCount(a._2 ^ b._2)
        + java.lang.Long.bitCount(a._3 ^ b._3)).toLong
    val brute = (for {
      a <- all; b <- all if a._1 < b._1
      d = ham(a, b) if d <= 3
    } yield (a._1, b._1, d)).toSet
    assert(out == brute,
      s"banding must be lossless: missed ${brute -- out}, " +
        s"extra ${out -- brute}")
    // the planted ladder really exercised both sides of the radius
    (0 to 3).foreach(d => assert(
      out.contains((d.toLong, 1000L + d, d.toLong)), s"distance $d"))
    (4 to 6).foreach(d => assert(
      !out.exists(p => p._1 == d.toLong && p._2 == 1000L + d),
      s"distance $d must not pair"))
  }

  test("property: sum-neutral image twin nudge bounds Hamming at 2 for ANY id") {
    // the round-11 ADVICE flake class: a one-pixel nudge shifted the
    // gray MEAN, so a threshold-straddling third cell could flip and
    // push a twin past the band radius at unlucky fixture sizes. The
    // sum-neutral two-pixel nudge makes Hamming <= 2 a THEOREM — prove
    // it generatively over arbitrary doc ids (closed form, no Spark)
    def aHash(docId: Long): (Long, Long) = {
      val twin = docId % 10 == 7
      val seed = if (twin) docId - 7 else docId
      val s =
        if (graft.ext.Hashing.jvmH32(s"img|$seed|0|0") % 256 >= 253) -3L
        else 3L
      val gray = for (y <- 0 until 8; x <- 0 until 8) yield {
        val hv = graft.ext.Hashing.jvmH32(s"img|$seed|$x|$y")
        var r = if (x == 1 && y == 0) 3 + hv % 250 else hv % 256
        if (twin && y == 0) { if (x == 0) r += s else if (x == 1) r -= s }
        assert(r >= 0 && r <= 255, s"nudge wrapped: id=$docId x=$x r=$r")
        (r + (hv / 256) % 256 + (hv / 65536) % 256) / 3
      }
      val sum = gray.sum
      gray.zipWithIndex.foldLeft((0L, 0L)) { case ((lo, hi), (g, i)) =>
        if (g * 64 > sum)
          if (i < 32) (lo | (1L << i), hi) else (lo, hi | (1L << (i - 32)))
        else (lo, hi)
      }
    }
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genBase = Gen.chooseNum(0L, Long.MaxValue / 2)
    val params = Gen.Parameters.default
    (0 until 500).foreach { i =>
      val base = genBase.pureApply(params, Seed(i.toLong))
      val anchor = base - base % 10       // id ≡ 0 (mod 10)
      val twin = anchor + 7               // its planted twin
      val (alo, ahi) = aHash(anchor)
      val (tlo, thi) = aHash(twin)
      val d = java.lang.Long.bitCount(alo ^ tlo) +
        java.lang.Long.bitCount(ahi ^ thi)
      assert(d <= 2, s"twin Hamming $d > 2 for anchor $anchor")
    }
  }
}
