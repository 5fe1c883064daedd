package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.config.ReformatSpec
import graft.functions.expressions.{HammingDistance, RollingHash}
import graft.operators.RefinedOps
import graft.precheck.Precheck
import graft.sources.Params

/** ScalaCheck property suites for the pure (non-Spark) kernels of the
  * config compilers and native expressions — the SURVEY §5 test plan's
  * property-based leg. Spark-side behavior of the same operators is
  * covered by the example specs and the DuckDB oracle gate. */
object GraftProperties extends Properties("graft") {

  private val word: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  // ---- normName / resolution ----------------------------------------------

  property("normName is idempotent") = forAll { (s: String) =>
    RefinedOps.normName(RefinedOps.normName(s)) == RefinedOps.normName(s)
  }

  property("normName ignores case and separators") = forAll(word) { w =>
    RefinedOps.normName(w.toUpperCase) == RefinedOps.normName(w.toLowerCase) &&
    RefinedOps.normName(s" ${w}_/ ") == RefinedOps.normName(w)
  }

  // generate non-empty words directly: suchThat-discards inside
  // nonEmptyListOf accumulate and can exhaust ScalaCheck's give-up
  // budget on unlucky seeds
  private val nonEmptyWord: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  property("resolve finds any case/separator variant of a column") =
    forAll(Gen.nonEmptyListOf(nonEmptyWord)) { cols =>
      val distinct = cols.distinctBy(RefinedOps.normName)
      Prop.all(distinct.map { c =>
        val variant = c.toUpperCase.flatMap(ch => s"$ch ")
        val resolved = RefinedOps.resolve(distinct, variant)
        Prop(resolved.contains(c)) :| s"variant of $c resolved to $resolved"
      }: _*)
    }

  // ---- CSV line parser -----------------------------------------------------

  private val csvField: Gen[String] =
    Gen.chooseNum(0, 10).flatMap(n => Gen.stringOfN(n,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '.', '-'))))

  property("parseCsvLine inverts join for plain fields") =
    forAll(Gen.nonEmptyListOf(csvField)) { fields =>
      Precheck.parseCsvLine(fields.mkString(","), ',') == fields.map(_.trim)
    }

  property("parseCsvLine preserves delimiters inside quotes") =
    forAll(Gen.nonEmptyListOf(csvField)) { fields =>
      val quoted = fields.map(f => "\"" + f + ",x\"")
      Precheck.parseCsvLine(quoted.mkString(","), ',') ==
        fields.map(f => (f + ",x").trim)
    }

  // ---- Params --------------------------------------------------------------

  property("Params k=v round-trips for clean keys/values") =
    forAll(Gen.nonEmptyListOf(Gen.zip(
      Gen.identifier.suchThat(s => s.nonEmpty && !s.contains('=')),
      word.suchThat(v => !v.contains('=') && !v.contains('|'))))) { pairs =>
      val raw = pairs.map { case (k, v) => s"$k=$v" }.mkString("|")
      val parsed = Params.parse(raw)
      // Params.parse lowercases keys (case-insensitive by design, matching
      // the reference's stage params) — the expected map must collapse keys
      // that are equal modulo case too, last occurrence winning.
      val want = pairs.map { case (k, v) => k.toLowerCase -> v }.toMap
      Prop.all(want.toSeq.map { case (k, v) =>
        Prop(parsed.get(k).contains(v.trim)) :| s"key $k"
      }: _*)
    }

  // Regression for the round-10 seed-flaky falsification (seed
  // FojvQjfJ69ZQdq9IDMUhLCOoQo2hTxXzgyJI9D939qK= drew keys `nC` and `nc`):
  // keys equal modulo case collapse to one entry, last occurrence wins.
  property("Params keys case-insensitive, last occurrence wins") = {
    val parsed = Params.parse("nC=first|nc=second|NC=third")
    Prop(parsed.get("nc").contains("third")) :| "lowercase lookup" &&
      Prop(parsed.get("Nc").contains("third")) :| "mixed-case lookup" &&
      Prop(parsed.named.size == 1) :| "single collapsed entry"
  }

  // ---- split_reorder kernel (mirrors the Column compiler's semantics) -----

  private def splitReorderReference(value: String, spec: ReformatSpec): String = {
    val parts = value.split(java.util.regex.Pattern.quote(spec.splitBy), -1)
    spec.partOrder.map { i =>
      val p = if (i >= 0 && i < parts.length) parts(i) else ""
      if (spec.trimParts) p.trim else p
    }.mkString(spec.joinWith)
  }

  property("split_reorder reference never throws, any part_order") =
    forAll(word, Gen.listOf(Gen.chooseNum(-2, 8))) { (v, order) =>
      val spec = ReformatSpec("c", ",", order, " ", trimParts = true)
      splitReorderReference(v, spec) != null
    }

  property("split_reorder identity when order is [0] and no delimiter") =
    forAll(word.suchThat(w => !w.contains(','))) { w =>
      splitReorderReference(w, ReformatSpec("c", ",", Seq(0), " ", true)) == w.trim
    }

  // ---- native expression kernels ------------------------------------------

  property("rolling hash matches BigInt reference") = forAll { (s: String) =>
    val m = BigInt(2).pow(61) - 1
    val want = s.getBytes("UTF-8").foldLeft(BigInt(0))((h, b) =>
      (h * 257 + (b & 0xff)) mod m).toLong
    RollingHash.compute(s.getBytes("UTF-8")) == want
  }

  property("fast quantizer == BigDecimal HALF_UP (Spark Round semantics)") =
    forAll(Gen.oneOf(
      Gen.chooseNum(-10.0, 10.0),                      // embedding-ish range
      Gen.chooseNum(-10000000L, 10000000L).map(_ / 2e7) // dense .5 boundaries
    )) { x =>
      val want = java.math.BigDecimal.valueOf(x * 1e7)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      graft.functions.expressions.ArrayQuantDot.q(x) == want
    }

  // ---- bounded top-k aggregator algebra -----------------------------------

  // The partial/final split is only correct if reduce/merge form a
  // commutative monoid up to the top-k result: ANY partitioning of the
  // input and ANY merge tree must produce the same buffer. This is the
  // property Spark's partial aggregation silently relies on.
  private val entries: Gen[List[graft.operators.TopK.Entry]] =
    Gen.listOf(for {
      ord <- Gen.chooseNum(-100L, 100L) // dense range → many ord ties
      id <- Gen.chooseNum(0L, 50L)
    } yield graft.operators.TopK.Entry(ord, id))

  property("BoundedTopK: any partitioning/merge order gives the sorted top-k") =
    forAll(entries, Gen.chooseNum(1, 6), Gen.chooseNum(0L, 1000L)) {
      (es, k, seed) =>
        val agg = new graft.operators.TopK.BoundedTopK(k)
        val want = es.sorted(Ordering.by((e: graft.operators.TopK.Entry) =>
          (-e.ord, e.id))).take(k)
        // sequential fold
        val seq = es.foldLeft(agg.zero)(agg.reduce)
        // random partitioning, each chunk folded then merged in order
        val rnd = new scala.util.Random(seed)
        val chunks = es.grouped(math.max(1, 1 + rnd.nextInt(4))).toList
        val merged = rnd.shuffle(chunks.map(_.foldLeft(agg.zero)(agg.reduce)))
          .foldLeft(agg.zero)(agg.merge)
        Prop(seq == want) :| s"sequential $seq != $want" &&
          Prop(merged == want) :| s"merged $merged != $want"
    }

  property("CountMin: any partitioning/merge order gives the same matrix; " +
    "weighted == repeated inserts") =
    forAll(
      Gen.listOf(Gen.zip(Gen.chooseNum(0L, 1L << 60), Gen.chooseNum(1L, 5L))),
      Gen.chooseNum(0L, 1000L)) { (hws, seed) =>
        val agg = new graft.operators.Sketches.CountMin(3, 16)
        val seq = hws.foldLeft(agg.zero)(agg.reduce)
        val rnd = new scala.util.Random(seed)
        val chunks = hws.grouped(math.max(1, 1 + rnd.nextInt(4))).toList
        val merged = rnd.shuffle(chunks.map(_.foldLeft(agg.zero)(agg.reduce)))
          .foldLeft(agg.zero)(agg.merge)
        // a weight-w insert == w weight-1 inserts of the same hash
        val unrolled = hws.flatMap { case (h, w) => Seq.fill(w.toInt)((h, 1L)) }
          .foldLeft(agg.zero)(agg.reduce)
        Prop(seq.sameElements(merged)) :| "partition/merge-order independent" &&
          Prop(seq.sameElements(unrolled)) :| "weighted == repeated"
    }

  private val equalLengthTriple: Gen[(String, String, String)] = for {
    n <- Gen.chooseNum(0, 12)
    a <- Gen.stringOfN(n, Gen.alphaNumChar)
    b <- Gen.stringOfN(n, Gen.alphaNumChar)
    c <- Gen.stringOfN(n, Gen.alphaNumChar)
  } yield (a, b, c)

  property("hamming is a metric on equal-length strings") =
    forAll(equalLengthTriple) { case (a, b, c) =>
      val dab = HammingDistance.compute(a, b)
      val dbc = HammingDistance.compute(b, c)
      val dac = HammingDistance.compute(a, c)
      dab >= 0 &&
        (dab == 0) == (a == b) &&
        dab == HammingDistance.compute(b, a) &&
        dac <= dab + dbc
    }

  // ---- string-distance kernels --------------------------------------------

  private val shortWord: Gen[String] =
    Gen.chooseNum(0, 10).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))

  property("damerau-levenshtein is a metric-ish distance") =
    forAll(shortWord, shortWord, shortWord) { (a, b, c) =>
      import graft.functions.expressions.DamerauLevenshtein.compute
      val dab = compute(a, b)
      dab >= 0 &&
        (dab == 0) == (a == b) &&
        dab == compute(b, a) && // symmetric
        dab <= math.max(a.length, b.length) && // bounded by lengths
        compute(a, c) <= dab + compute(b, c) // triangle inequality
    }

  property("damerau-levenshtein: single edit costs exactly 1") =
    forAll(shortWord.suchThat(_.nonEmpty), Gen.chooseNum(0, 9)) { (a, i0) =>
      import graft.functions.expressions.DamerauLevenshtein.compute
      val i = i0 % a.length
      val deleted = a.substring(0, i) + a.substring(i + 1)
      val substituted = a.updated(i, 'z')
      compute(a, deleted) == 1 && compute(a, substituted) == 1
    }

  property("jaro-winkler is symmetric, bounded, and 1 iff equal") =
    forAll(shortWord, shortWord) { (a, b) =>
      import graft.functions.expressions.JaroWinkler.compute
      val j = compute(a, b)
      j >= 0.0 && j <= 1.0 &&
        j == compute(b, a) &&
        ((a == b && a.nonEmpty) == (j == 1.0) ||
          (a.isEmpty && b.isEmpty && j == 1.0))
    }

  // ---- unicode normalization ----------------------------------------------

  property("nfc/strip_accents are idempotent; strip removes marks") =
    forAll(word) { w =>
      import graft.functions.expressions.{NfcNormalize, StripAccents}
      val decorated = w.flatMap(c => c.toString + "\u0301") // mark per char
      NfcNormalize.compute(NfcNormalize.compute(decorated)) ==
        NfcNormalize.compute(decorated) &&
        StripAccents.compute(decorated) == w &&
        StripAccents.compute(StripAccents.compute(decorated)) == w
    }

  // ---- precheck row-count bounds ------------------------------------------

  property("row-count gate honors min/max bounds") =
    forAll(Gen.chooseNum(0L, 1000L), Gen.chooseNum(0L, 100L),
      Gen.chooseNum(0L, 1000L)) { (total, min, max0) =>
      val max = min + max0
      val spec = graft.config.PrecheckSpec(Nil, min, Some(max), true, false, false)
      val data = math.max(0, total - 1)
      val r = Precheck.checkRowCount(total, spec)
      r.failed == (data < min || data > max)
    }
}
