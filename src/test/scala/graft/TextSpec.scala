package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Language-ID and fingerprint specs (the synthetic corpus text
  * carries no real language signal, so known-language sentences are
  * the oracle here). */
class TextSpec extends SparkSuite {

  test("language ID classifies known-language sentences") {
    import spark.implicits._
    val samples = Seq(
      ("en", "the cat is in the house and it is happy with the dog"),
      ("de", "der hund ist nicht mit der katze und das ist ein problem für die"),
      ("fr", "le chat est dans la maison et il est pour les amis dans une ville"),
      ("es", "el gato es feliz y no es por la casa con los amigos y una idea"),
      ("zh", "这是一个中文句子用来测试语言识别"),
      ("und", "xyzzy plugh qwerty asdfgh"))
    val got = samples.toDF("expected", "text")
      .select(col("expected"), TextAnalysis.langIdCol(col("text")).as("pred"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)}, predicted ${r.getString(1)}"))
  }

  test("fingerprint: whitespace-insensitive, order-sensitive, content-sensitive") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "  alpha   beta\tgamma "), // same tokens, messy whitespace
      (3L, "gamma beta alpha"),       // same tokens, different order
      (4L, "alpha beta delta")        // different token
    ).toDF("id", "text")
      .select(col("id"), TextAnalysis.fingerprintCol(col("text")).as("fp"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L), "whitespace normalization")
    assert(m(1L) != m(3L), "order sensitivity")
    assert(m(1L) != m(4L), "content sensitivity")
  }

  test("langid over the documents table runs distributed and total") {
    val out = graft.SparkEntry.queries("text_langid")(spark, sfDir)
    val n = out.count()
    assert(n == 500)
    assert(out.filter(col("pred_lang").isNull).count() == 0)
  }

  test("sequence packing: gapless token stream per source, stable chunk ranges") {
    val rows = TextAnalysis.textPackSequences.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(4), "chunk_first > chunk_last")
    }
    // per source: token stream is gapless — first chunk is 0 and the
    // last doc's chunk_last is exactly floor((sum(tokens)-1)/512)
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val total = rs.map(_.getLong(2)).sum
      assert(rs.map(_.getLong(3)).min == 0L)
      assert(rs.map(_.getLong(4)).max == (total - 1) / 512)
    }
  }

  test("contamination: hits bounded by n-grams, ratio is the exact quotient") {
    val rows = graft.operators.Dedup.dedupContamination.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hit, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(hit >= 0 && hit <= n)
      assert(ratio == hit.toDouble / n)
    }
  }

  test("BPE training matches an independent in-process recomputation, merges are usable") {
    // reference BPE in plain Scala: same word-type dict, same greedy
    // left-to-right merge, same (count desc, l asc, r asc) tie-break
    def refBpe(dict0: Seq[(Vector[String], Long)], rounds: Int)
        : Seq[(Int, String, String, Long)] = {
      var dict = dict0
      (1 to rounds).flatMap { round =>
        val counts = scala.collection.mutable.Map[(String, String), Long]()
          .withDefaultValue(0L)
        for ((syms, c) <- dict; i <- 0 until syms.length - 1)
          counts((syms(i), syms(i + 1))) += c
        if (counts.isEmpty) None
        else {
          val ((l, r), pc) = counts.minBy { case ((l, r), c) => (-c, l, r) }
          dict = dict.map { case (syms, c) =>
            val out = syms.foldLeft(Vector.empty[String]) { (acc, x) =>
              if (acc.nonEmpty && acc.last == l && x == r)
                acc.init :+ (l + r)
              else acc :+ x
            }
            (out, c)
          }
          Some((round, l, r, pc))
        }
      }
    }
    val words = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0).map(_.toString).toVector, r.getLong(1)))
    val expected = refBpe(words.toSeq, 12)
    val got = TextAnalysis.textBpeTrain.run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected,
      s"merge sequences diverge:\n got=$got\n want=$expected")
    // the artifact is usable: counts are non-increasing is NOT
    // guaranteed by BPE, but every merge must have been a real pair
    assert(got.forall(_._4 > 0) && got.map(m => (m._2, m._3)).distinct.size == got.size)
  }

  test("BPE encode matches an independent in-process encoder, and compresses") {
    val merges = TextAnalysis.bpeMergesFor(spark, sfDir).map(m => (m._2, m._3))
    def encodeWord(w: String): Int =
      merges.foldLeft(w.map(_.toString).toVector) { case (syms, (l, r)) =>
        syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
          else acc :+ x
        }
      }.length
    val texts = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalysis.textBpeEncode.run(spark, sfDir).collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val text = texts(r.getLong(0))
      val want = text.toLowerCase.split("\\s+").map(encodeWord).sum.toLong
      assert(r.getLong(2) == want,
        s"doc ${r.getLong(0)}: got ${r.getLong(2)} bpe tokens, want $want")
    }
    // with the learned merges the corpus must actually compress:
    // strictly fewer BPE tokens than raw characters, corpus-wide
    val (chars, toks) = got.foldLeft((0L, 0L)) { case ((c, t), r) =>
      (c + r.getLong(1), t + r.getLong(2))
    }
    assert(toks < chars, s"no compression: $toks tokens vs $chars chars")
  }

  test("unigram LM score matches an independent in-process recomputation") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+").toSeq)
    val counts = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = docs.map(_._2.size.toLong).sum
    val expected = docs.map { case (id, toks) =>
      val sumCnt = toks.map(counts).sum
      id -> ((toks.size.toLong, sumCnt, sumCnt * 1.0 / (toks.size * total)))
    }.toMap
    val got = TextAnalysis.textLmScore.run(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, sc, p) = expected(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == sc && r.getDouble(3) == p,
        s"doc ${r.getLong(0)}: got (${r.getLong(1)},${r.getLong(2)},${r.getDouble(3)}) want ($n,$sc,$p)")
    }
    // sanity of the signal itself: common-token docs outscore rare-token docs
    val ps = got.map(_.getDouble(3))
    assert(ps.max > ps.min, "score is non-constant over the corpus")
  }

  test("gopher rules match an independent in-process recomputation and split the corpus") {
    val texts = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextAnalysis.textGopher.run(spark, sfDir).collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val text = texts(r.getLong(0))
      val toks = text.split("\\s+").toSeq
      val nWords = toks.size.toLong
      val sumLen = toks.map(_.length.toLong).sum
      val nHash = text.count(_ == '#').toLong
      val diff3 = (text.length - text.replace("...", "").length).toLong
      // ASCII letters only, matching the op's [a-zA-Z] exactly — the
      // JVM's Char.isLetter would disagree on non-ASCII-letter tokens
      val nAlpha = toks.count(_.exists(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))).toLong
      val nStop = TextAnalysis.GopherStop.count(toks.contains).toLong
      val okWords = nWords >= 30 && nWords <= 100000
      val okWordlen = 3 * nWords <= sumLen && sumLen <= 10 * nWords
      val okSymbol = 10 * (3 * nHash + diff3) <= 3 * nWords
      val okAlpha = 10 * nAlpha >= 8 * nWords
      val okStop = nStop >= 2
      val expect = Seq(okWords, okWordlen, okSymbol, okAlpha, okStop,
        okWords && okWordlen && okSymbol && okAlpha && okStop)
      val actual = (2 to 7).map(r.getBoolean)
      assert(r.getLong(1) == nWords && actual == expect,
        s"doc ${r.getLong(0)}: got $actual want $expect")
    }
    // thresholds are calibrated to actually split this corpus
    val keeps = got.count(_.getBoolean(7))
    assert(keeps > 0 && keeps < got.length,
      s"gopher filter is degenerate: $keeps/${got.length} kept")
  }

  test("chunk overlap: an independent in-process chunker reproduces every chunk") {
    val got = SparkEntry.queries("text_chunk_overlap")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val texts = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = texts.toSeq.flatMap { case (docId, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val nChunks = if (toks.length <= 64) 1 else (toks.length - 64 + 47) / 48 + 1
      (0 until nChunks).map { ci =>
        val chunk = toks.slice(ci * 48, ci * 48 + 64)
        (docId, ci.toLong, chunk.length.toLong, md5hex(chunk.mkString(" ")))
      }
    }.sorted
    assert(got.sorted.toSeq == expected, "chunker disagrees with reference impl")
    // overlap really exists: for multi-chunk docs, consecutive chunk
    // starts are 48 apart over 64-token windows → 16 shared tokens
    assert(got.groupBy(_._1).exists(_._2.length > 1),
      "corpus has no multi-chunk docs — overlap untested")
  }

  test("mixture sampling: in-process recompute agrees, budgets are maximal and bite") {
    val got = SparkEntry.queries("sample_mixture")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val all = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), md5hex(r.getString(3))))
    val total = all.map(_._3).sum
    val expected = all.groupBy(_._2).flatMap { case (src, ds) =>
      val cap = (1 + src.drop(3).toInt % 4) * total / 100
      var cum = 0L
      ds.toSeq.sortBy(d => (d._4, d._1)).takeWhile { d => cum += d._3; cum <= cap }
        .map(_._1)
    }.toSet
    assert(got.map(_._1).toSet == expected, "selection differs from recompute")
    // budgets are maximal (cum ≤ cap for all kept) and genuinely bite
    got.foreach { case (_, _, _, cum, cap) => assert(cum <= cap) }
    assert(got.length < all.length, "mixture kept everything — budget never bit")
    // the weight classes produce genuinely different keep-rates
    val keepBySrc = got.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val perSrc = all.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val byClass = keepBySrc.toSeq.groupBy(t => t._1.drop(3).toInt % 4)
      .view.mapValues(ss => ss.map(t => t._2 / perSrc(t._1)).sum / ss.length).toMap
    assert(byClass(3) > byClass(0), "higher-weight sources must keep more")
  }

  test("fuzzy join finds every planted edit-distance-1 probe and respects the band") {
    val rows = SparkEntry.queries("text_fuzzy_join")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, probe, tok, dist) =>
      assert(dist <= 2 && math.abs(probe.length - tok.length) <= 2)
    }
    // each probe was built by dropping the first char of a real vocab
    // token — that origin token must come back at distance exactly 1
    val toks = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("source"), explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(col("tok").rlike("^[a-z]{4,20}$"))
      .collect().map(r => (r.getString(0), r.getString(1))).distinct
    val origins = toks.groupBy(_._1).map { case (src, ts) =>
      src -> ts.map(_._2).filter(_.length >= 6).min
    }
    origins.foreach { case (src, origin) =>
      assert(rows.exists(r => r._1 == src && r._3 == origin && r._4 == 1L),
        s"source $src: planted origin '$origin' not recovered at dist 1")
    }
  }

  test("url canon: canonical forms are normalized and groups merge distinct raw variants") {
    val rows = graft.operators.TextAnalysis.textUrlCanon.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.sources.Tables.load(spark, sfDir, "documents").count()
    // a dedup partitions the corpus: group sizes sum to the doc count
    assert(rows.map(_._2).sum == nDocs, "canonical groups lost or duplicated docs")
    // every canonical form is fully normalized — no scheme/host case,
    // default port, fragment, trailing slash, or utm param survives
    rows.map(_._1).foreach { c =>
      assert(!c.contains("#") && !c.contains(":443") && !c.contains("utm_")
        && !c.contains("www.") && c == c.toLowerCase && !c.stripSuffix("?").endsWith("/"),
        s"non-canonical survivor: $c")
    }
    // the no-query groups merge raw variants that differ in case, www
    // and default port — they must span multiple raw forms, which
    // shows the canonicalizer (not string equality) formed the group
    val mergers = rows.filter(r => !r._1.contains("?") && r._2 >= 2)
    assert(mergers.nonEmpty, "no multi-variant canonical group found")
    // keep is the smallest doc_id of its group — deterministic keeps
    rows.foreach { case (_, _, keep) => assert(keep >= 0 && keep < nDocs) }
  }

  test("vocab growth: running curve is monotone and lands exactly on the distinct-type count") {
    val rows = graft.operators.TextAnalysis.textVocabGrowth.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // per source: curve strictly increases, steps sum to the level
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._3).sum == sorted.last._4,
        s"$src: steps do not sum to the final vocabulary")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._4 == a._4 + b._3, s"$src: running sum broke at doc ${b._2}")
        case _ =>
      }
    }
    // the curve's final level equals an independent distinct count
    val distinct = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("source"), explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "").distinct()
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.maxBy(_._2)._4 == distinct(src),
        s"$src: final vocab_size != distinct type count")
    }
  }

  test("co-occurrence: df and pair counts match direct recount, lift exact") {
    import graft.sources.Tables
    val rows = TextAnalysis.textCooccur.run(spark, sfDir).collect()
    assert(rows.length == 50, "fixture too small to fill the top-50 pairs")
    val docSets = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getString(1).split(" ").toSet)
    val nDocs = docSets.length.toLong
    // ordering contract: n_ab desc, then lexicographic pair
    val keys = rows.map(r => (-r.getLong(2), r.getString(0), r.getString(1)))
    assert(keys.sameElements(keys.sorted), "not in (n_ab desc, term_a, term_b) order")
    rows.take(10).foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (nAb, dfA, dfB) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a < b, "pair not canonically ordered")
      assert(docSets.count(_.contains(a)).toLong == dfA, s"df($a)")
      assert(docSets.count(_.contains(b)).toLong == dfB, s"df($b)")
      assert(docSets.count(d => d.contains(a) && d.contains(b)).toLong == nAb,
        s"co-count($a,$b)")
      assert(math.abs(r.getDouble(5) - nAb.toDouble * nDocs / (dfA * dfB)) < 1e-6,
        s"lift($a,$b)")
    }
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("distilled filter: learned token votes reproduce the teacher labels on most docs") {
    val rows = graft.operators.TextAnalysis.textDistillFilter.run(spark, sfDir).collect()
    assert(rows.length > 0)
    // trained on its own labels, the vote classifier must beat chance
    // decisively (distillation sanity, not a generalization claim)
    val agree = rows.count(r => r.getBoolean(1) == r.getBoolean(3))
    assert(agree.toDouble / rows.length >= 0.8,
      s"distilled filter agrees on only $agree/${rows.length} docs")
    // both classes must actually occur or the vote table is degenerate
    assert(rows.exists(_.getBoolean(3)) && rows.exists(!_.getBoolean(3)),
      "predictions are all one class")
    // the stump is trained to maximize agreement, so it can never do
    // worse than the majority-class baseline on its own training set
    val nPos = rows.count(_.getBoolean(1))
    val baseline = math.max(nPos, rows.length - nPos)
    assert(agree >= baseline,
      s"stump agreement $agree below majority baseline $baseline")
  }

  test("grouped distributed rank is bit-identical to the window formulation") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // adversarial fixture: skewed group sizes, duplicate sort values
    // (rank must fall back to the id tiebreak), a singleton group
    val rows = (1 to 300).map(i => ("g" + (i % 3), (i % 7).toDouble, i.toLong)) :+
      (("solo", 1.0, 9999L))
    val df = rows.toDF("grp", "value", "id")
    val got = graft.operators.RankSelect
      .groupRanks(df, "grp", Seq(col("value").desc, col("id")))
      .select("grp", "id", "rank", "n")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val w = Window.partitionBy("grp").orderBy(col("value").desc, col("id"))
    val want = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
      .select("grp", "id", "rank", "n")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == want, "distributed group rank diverges from the window rank")
    // NULL groups rank as their own partition, exactly like PARTITION BY
    // (a plain null join key would silently drop these rows)
    val withNull = rows.map { case (g, v, i) => (if (i % 5 == 0) null else g, v, i) }
      .toDF("grp", "value", "id")
    val gotN = graft.operators.RankSelect
      .groupRanks(withNull, "grp", Seq(col("value").desc, col("id")))
      .select("grp", "id", "rank", "n")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val wantN = withNull
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
      .select("grp", "id", "rank", "n")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(gotN == wantN, "null-group ranks diverge from the window rank")
    assert(gotN.keys.exists(_._1.isEmpty), "fixture lost its null group")
  }

  test("balanced sample: every class lands exactly at the smallest class's size, hash-order not id-order") {
    import graft.sources.Tables
    val rows = TextAnalysis.sampleBalanced.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val byLabel = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val full = Tables.load(spark, sfDir, "embeddings")
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nMin = full.values.min
    assert(byLabel.keySet == full.keySet, "a class vanished from the sample")
    assert(byLabel.values.forall(_ == nMin),
      s"per-class counts $byLabel not all at floor $nMin")
    // the hash order must actually differ from first-N-by-id for at
    // least one class (otherwise the determinism claim is vacuous)
    val firstN = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .groupBy(_._2).toSeq.flatMap { case (_, vs) =>
        vs.map(_._1).sorted.take(nMin.toInt).toSeq }.toSet
    assert(rows.map(_._1).toSet != firstN, "sample degenerated to first-N-by-id")
  }

  test("epoch order: each epoch is a complete permutation, epochs genuinely differ") {
    import graft.sources.Tables
    val rows = TextAnalysis.sampleEpochOrder.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val allDocs = Tables.load(spark, sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.foreach { case (e, rs) =>
      assert(rs.map(_._2).toSet == allDocs, s"epoch $e is not a full pass")
      assert(rs.map(_._3).sorted.toSeq == (1L to allDocs.size).toSeq,
        s"epoch $e positions are not a 1..n bijection")
    }
    val orders = byEpoch.values.map(_.sortBy(_._3).map(_._2).toSeq).toSeq
    assert(orders.distinct.size == 3, "two epochs produced the identical order")
  }

  test("AUC equals an explicit pairwise Mann-Whitney recompute, bit for bit") {
    val row = TextAnalysis.statsAuc.run(spark, sfDir).head()
    val (np, nn, auc) = (row.getLong(0), row.getLong(1), row.getDouble(2))
    val scored = TextAnalysis.distillScored(spark, sfDir)._1.collect()
      .map(r => (r.getBoolean(1), r.getLong(2)))
    val pos = scored.filter(_._1).map(_._2)
    val neg = scored.filterNot(_._1).map(_._2)
    assert(np == pos.length && nn == neg.length)
    // doubled numerator: 2 per win, 1 per tie — the exact integer the
    // op's rank identity produces, so the division compares bit-exact
    var wins2 = 0L
    for (p <- pos; n <- neg)
      wins2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val expect = wins2.toDouble / (2.0 * np * nn)
    assert(auc == expect, s"op $auc vs pairwise $expect")
    assert(auc > 0.5, s"distilled classifier no better than chance: $auc")
    assert(auc <= 1.0)
  }

  test("feature hashing matches a driver-side md5-bucket recompute exactly") {
    val got = TextAnalysis.textFeatureHash.run(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val want = scala.collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect().foreach { r =>
        val id = r.getLong(0)
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { tok =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
          val bucket = java.lang.Long.parseLong(md.take(6), 16) % 64
          want((id, bucket)) += 1L
        }
      }
    assert(got == want.toMap, "feature matrix diverges from the driver recompute")
    assert(got.keys.forall { case (_, b) => b >= 0 && b < 64 })
    // the buckets must genuinely spread (no catastrophic collision) —
    // bounded by the corpus vocabulary, which is tiny at sf0.001
    val vocab = want.keys.map(_._2).toSet.size
    assert(got.keys.map(_._2).toSet.size >= math.min(16, vocab),
      s"only ${got.keys.map(_._2).toSet.size} of 64 buckets occupied (vocab spread $vocab)")
  }

  test("inverted index: doc-sharded postings match a driver recompute, min-df floor applied") {
    val got = TextAnalysis.textInvertedIndex.run(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val post = scala.collection.mutable.Map
      .empty[(String, Long), scala.collection.mutable.SortedSet[Long]]
    graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect().foreach { r =>
        val id = r.getLong(0)
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.foreach { tok =>
          post.getOrElseUpdate((tok, id / 100),
            scala.collection.mutable.SortedSet.empty[Long]) += id
        }
      }
    val globalDf = post.toSeq.groupBy(_._1._1)
      .view.mapValues(_.map(_._2.size.toLong).sum).toMap
    val want = post.collect {
      case ((term, shard), ids) if globalDf(term) >= 5 =>
        (term, shard) -> (ids.size.toLong, globalDf(term), ids.mkString(","))
    }.toMap
    assert(got == want, "posting shards diverge from the driver recompute")
    assert(got.nonEmpty)
    // postings stay shard-bounded: no shard may exceed the doc range
    assert(got.values.forall(_._1 <= 100))
  }

  test("RAKE keywords match an in-process sequential recompute, bit for bit") {
    val got = TextAnalysis.textRake.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    val stop = TextAnalysis.GopherStop.toSet
    val docsArr = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // phrases: maximal stopword-free runs, in token order
    val phrases = docsArr.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split("\\s+")
      val runs = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
      var cur = Vector.empty[String]
      toks.foreach { t =>
        if (stop(t)) { if (cur.nonEmpty) runs += cur; cur = Vector.empty }
        else cur :+= t
      }
      if (cur.nonEmpty) runs += cur
      runs.map(id -> _)
    }
    val freq = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val deg = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    phrases.foreach { case (_, ws) =>
      ws.foreach { w => freq(w) += 1; deg(w) += ws.length }
    }
    val want = phrases.map { case (id, ws) =>
      // same fold shape as the op: 0.0 + s1 + s2 + ...
      val score = ws.foldLeft(0.0)((acc, w) => acc + deg(w).toDouble / freq(w))
      (id, ws.mkString(" "), ws.length.toLong, score)
    }.groupBy(_._1).toSeq.flatMap { case (_, ps) =>
      ps.sortBy(p => (-p._4, p._2)).take(3).zipWithIndex
        .map { case ((id, ph, n, s), i) => (id, ph, n, s, i + 1) }.toSeq
    }
    assert(got.sorted.toSeq == want.sorted, "RAKE output diverges from the recompute")
    assert(got.nonEmpty && got.forall(_._5 <= 3))
  }

  test("perplexity buckets: tercile shares per language, head scores above tail") {
    val rows = TextAnalysis.textPerplexityBucket.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val n = rs.length
      val byB = rs.groupBy(_._3).view.mapValues(_.length).toMap
      // exact tercile arithmetic: bucket b holds the ranks whose
      // (3*(r-1)) div n == b, i.e. sizes differ by at most 1
      val sizes = Seq("head", "middle", "tail").map(byB.getOrElse(_, 0))
      if (n >= 3) {
        assert(sizes.max - sizes.min <= 1, s"$lang tercile sizes $sizes for n=$n")
      }
      assert(sizes.sum == n)
    }
  }

  test("readability: counts match a java-regex recompute, grade formula exact, corpus non-degenerate") {
    import graft.sources.Tables
    val got = TextAnalysis.textReadability.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    val docsRaw = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    def cnt(s: String, p: String) = p.r.findAllIn(s).length.toLong
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    docsRaw.foreach { case (id, text) =>
      val (w, sn, sy, fk) = got(id)
      val (ww, ss, yy) = (cnt(text, "\\S+"), math.max(cnt(text, "[.!?]+"), 1L),
        cnt(text.toLowerCase, "[aeiouy]+"))
      assert((w, sn, sy) == ((ww, ss, yy)), s"doc $id counts")
      assert(fk == r4(0.39 * (ww.toDouble / ss) + 11.8 * (yy.toDouble / math.max(ww, 1L)) - 15.59),
        s"doc $id grade")
    }
    // the corpus must spread across grades, or the feature is useless
    assert(got.values.map(_._4).toSet.size > 10)
  }

  test("curriculum: bands bucket the published grades, order is non-decreasing and hash-reproducible") {
    import graft.sources.Tables
    val cur = TextAnalysis.sampleCurriculum.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // positions are a contiguous 1..N permutation, bands non-decreasing
    assert(cur.map(_._3).sorted.toSeq == (1L to cur.length).toSeq)
    val byPos = cur.sortBy(_._3)
    byPos.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._2, s"band order broken at pos ${b._3}")
      case _ =>
    }
    // bands bucket exactly the readability op's grades (single-sourcing)
    val grades = TextAnalysis.textReadability.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    cur.foreach { case (id, band, _) =>
      // band derives from the UNROUNDED grade; the published grade is
      // rounded to 4 decimals, so only check consistency within grain
      val approx = math.min(math.max(math.floor(grades(id)).toLong, 0L), 20L)
      assert(math.abs(band - approx) <= 1, s"doc $id band $band vs grade ${grades(id)}")
    }
    // within-band order is the seeded hash rank — recompute directly
    val hashes = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), xxhash64(col("doc_id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byPos.groupBy(_._2).foreach { case (band, xs) =>
      val inPos = xs.sortBy(_._3).map(_._1).toSeq
      val byHash = xs.map(_._1).sortBy(id => (hashes(id), id)).toSeq
      assert(inPos == byHash, s"band $band: within-band order is not the hash rank")
    }
    // a real curriculum has multiple bands
    assert(cur.map(_._2).distinct.length > 3)
  }

  test("DPO pairs: sequential best-vs-worst pairing matches; margins strict; sides disjoint") {
    val got = TextAnalysis.sampleDpoPairs.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    val raw = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(2).split(" ", -1)
        (r.getString(0), r.getLong(1),
          toks.count(stop.contains) * 1000000L + toks.length)
      }
    val want = raw.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      val sorted = ds.sortBy(d => (d._3, d._2))
      val n = sorted.length
      (1 to n / 2).flatMap { r =>
        val (rej, cho) = (sorted(r - 1), sorted(n - r))
        if (cho._3 - rej._3 > 0)
          Some((src, r.toLong, cho._2, rej._2, cho._3 - rej._3))
        else None
      }
    }.sortBy(p => (p._1, p._2))
    assert(got.toSeq == want)
    assert(got.forall(_._5 > 0), "strict margins")
    val (chosen, rejected) = (got.map(_._3).toSet, got.map(_._4).toSet)
    assert(chosen.intersect(rejected).isEmpty, "a doc never plays both roles")
    assert(got.nonEmpty)
  }

  test("BPE fertility: language sums equal the per-doc encode totals; fertility > 1 everywhere") {
    val fert = TextAnalysis.textBpeFertility.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val enc = TextAnalysis.textBpeEncode.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val langOf = graft.sources.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), lower(col("text"))).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    langOf.groupBy(_._2).foreach { case (lang, ds) =>
      val (nw, nb, f) = fert(lang)
      assert(nb == ds.map(d => enc(d._1)).sum, s"$lang BPE total != encode op")
      assert(nw == ds.map(_._3.split("\\s+", -1).length.toLong).sum, s"$lang words")
      assert(f == nb.toDouble / nw)
      assert(f >= 1.0, s"$lang fertility below 1 impossible: a word is >= 1 token")
    }
    assert(fert.size > 1, "single-language corpus makes the comparison vacuous")
  }
}
