package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Driver-visible cross-checks for the rows-only queries: the LSH-family
  * candidate generators are approximations whose quality the DuckDB oracle
  * can't judge (hash-derived bucketing isn't SQL-portable), so their
  * ScalaTest recall assertions are promoted here into a per-round artifact
  * — recall of each approximate operator against its oracle-verified exact
  * twin, with pinned floors.
  *
  *  - MinHash-LSH candidates vs exact n-gram Jaccard pairs (J ≥ 0.7 truth:
  *    est-threshold 0.5 banding must recover high-J pairs).
  *  - SimHash pairs vs exact duplicate groups (identical docs must collide
  *    at hamming 0).
  *  - Hyperplane-LSH / IVF ANN vs brute-force top-k.
  *  - LSH-blocked embedding near-dup pairs vs the exact blocked variant.
  *  - HLL++ distinct counts and approximate quantiles vs exact twins
  *    (accuracy, not recall — the sketches are the other oracle-less
  *    family).
  *
  * Run standalone (`runMain graft.VerifyExtras <sfDir> <outFile>`) or via
  * [[Verify]], which writes `verify_extras.json` next to the query dumps
  * plus a repo-root `VERIFY_EXTRAS.json` for the judge.
  */
object VerifyExtras {

  final case class Check(name: String, value: Double, floor: Double,
                         truthSize: Long, candidateRows: Long,
                         metric: String = "recall") {
    def pass: Boolean = value >= floor
    def json: String = {
      import JsonUtil.esc
      s"""\"${esc(name)}\": {\"${esc(metric)}\": $value, \"floor\": $floor, \"pass\": $pass, \"truth_pairs\": $truthSize, \"candidate_rows\": $candidateRows}"""
    }
  }

  /** Pair-set recall of `candidate` over `truth` on (id1, id2) columns. */
  private def pairRecall(truth: Array[(Long, Long)], cand: Array[(Long, Long)]): Double = {
    if (truth.isEmpty) return 1.0
    val c = cand.toSet
    truth.count(c.contains).toDouble / truth.length
  }

  def checks(spark: SparkSession, sfDir: String): Seq[Check] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Similarity}
    import graft.sources.Tables

    // Each source frame feeds several collect actions (truth + candidate
    // per family; three ANN variants over emb) — persist once per frame
    // or every action re-derives it from parquet.
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val corpus = queries.TextQueries.dupCorpus(spark, sfDir).persist(lvl)
    val emb = Tables.load(spark, sfDir, "embeddings").persist(lvl)
    val dupEmb = queries.SimilarityQueries.dupEmbCorpus(spark, sfDir).persist(lvl)
    try {
      // --- text dedup family ------------------------------------------------
      val jaccardTruth = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.7, 10000)
        .select($"id1", $"id2").as[(Long, Long)].collect()
      val minhashCand = Dedup.minhashLshPairs(corpus, "doc_id", "text", 3, 16, 4, 0.5)
        .select($"id1", $"id2").as[(Long, Long)].collect()
      val exactCopyTruth = Dedup.exactGroups(corpus, "doc_id", "text")
        .select($"canonical_id", $"member_ids").collect().flatMap { r =>
          val ids = r.getString(1).split(",").map(_.toLong).sorted
          for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
        }
      val simhashCand = Dedup.simhashPairs(corpus, "doc_id", "text", 3)
        .select($"id1", $"id2").as[(Long, Long)].collect()

      // --- ANN family -------------------------------------------------------
      val probes = emb.filter($"vec_id" % 100 === 0)
      val nEmb = emb.count()
      val annTruth = Similarity.bruteForceTopK(probes, emb, k = 5)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      // Every ANN variant runs the EXACT config its query wiring uses —
      // lsh mirrors q_ann_lsh via the shared lshParamsFor rule; at
      // verify scales this coincides with the historical default
      // planes=4 but probes one bucket wider.
      val (lshBands, lshPlanes, lshProbe) = Similarity.lshParamsFor(nEmb)
      val annLsh = Similarity.lshTopK(probes, emb, k = 5, bands = lshBands,
          planesPerBand = lshPlanes, nProbe = lshProbe)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      // Cell counts mirror the QUERY wiring: ivf/ivf_fit scale cells
      // with the corpus (cellsFor — a pinned 16 here measured a variant
      // the queries don't run); ivfpq uses the query's scale-
      // proportional rule (ivfPqParamsFor: cells ∝ corpus with nProbe
      // scaled to hold coverage ≈ 37.5% — identical to the old static
      // 16/6 at every verify scale ≤ 16k vectors, see the q_ann_ivfpq
      // comment).
      val nCells = Similarity.cellsFor(nEmb)
      val annIvf = Similarity.ivfTopK(probes, emb, k = 5, nCentroids = nCells,
          nProbe = 6)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      val fitCents = Similarity.kmeansFit(emb, k = nCells, maxIter = 5)
      val annIvfFit = Similarity.ivfTopK(probes, emb, k = 5, nProbe = 4,
          centroids = fitCents)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      val (pqCells, pqProbe, pqRefine) = Similarity.ivfPqParamsFor(nEmb)
      val annIvfPq = Similarity.ivfPqTopK(probes, emb, k = 5,
          nCentroids = pqCells, nProbe = pqProbe, refine = pqRefine)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect()

      // --- embedding near-dup blocking -------------------------------------
      // Truth: exact ALL-pairs cosine ≥ 0.9 over the corpus with injected
      // near-duplicate vectors (quadratic, fine at verify scale).
      // Candidate: corpus-proportional LSH blocking, which must recover
      // those pairs from bucket-local comparisons only.
      val nearDupTruth = Similarity.cosineNearDupPairs(
          dupEmb.withColumn("__all", lit(1)), "__all", 0.9)
        .select($"id1", $"id2").as[(Long, Long)].collect()
      val nearDupLsh = Similarity.cosineNearDupPairsLsh(dupEmb, minCos = 0.9)
        .select($"id1", $"id2").as[(Long, Long)].collect()

      // --- SemDeDup drop-set recall -----------------------------------
      // Truth: connected components over the exact all-pairs cosine
      // truth (driver-side union-find — pair counts are verify-scale);
      // a vector is a TRUE drop iff it is not its component's minimum.
      // Candidate: semDedup's keep=false set. Cell blocking loses only
      // cross-cell pairs, and near-identical vectors share an argmax
      // cell, so the floor is the embedding-LSH family's 0.9.
      val semTrueDrops: Set[Long] = {
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        nearDupTruth.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
            parent(hi) = lo }
        }
        nearDupTruth.flatMap(p => Seq(p._1, p._2)).toSet
          .filter(id => find(id) != id)
      }
      val semDrops = Similarity.semDedup(dupEmb, minCos = 0.9, k = 16)
        .filter(!$"keep").select($"id").as[Long].collect()
      val semRecall =
        if (semTrueDrops.isEmpty) 1.0
        else semDrops.count(semTrueDrops.contains).toDouble / semTrueDrops.size

      // --- kNN graph: strong-edge survival ----------------------------
      // Truth: the STRONG edges (cos ≥ 0.9) of the exact top-3 graph
      // over the dup-injected corpus — the edges graph-dedup/clustering
      // consume, and the property that is SCALE-INVARIANT (banding
      // survival → 1 as cos → 1; unrestricted weak-edge recall decays
      // with planes ∝ log n BY CONSTRUCTION on unstructured data — see
      // knnGraphLsh's recall contract — and would make this check fail
      // at sf1 while meaning nothing). Brute force is quadratic,
      // verify-scale only.
      val knnTruth = Similarity.bruteForceTopK(dupEmb, dupEmb, k = 3)
        .filter($"cos_sim" >= 0.9)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      val knnCand = Similarity.knnGraphLsh(dupEmb, k = 3)
        .select($"id", $"neighbor_id").as[(Long, Long)].collect()

      // --- partition triage vs full diff ------------------------------
      // The checksum triage must flag every partition holding a
      // discrepancy (a miss is possible only via a 60-bit sum collision),
      // so the targeted diff's row set must BE the full diff's. Driver-
      // visible proof at verify scale, complementing PartitionDiffSpec.
      val part = org.apache.spark.sql.functions.date_format($"o_orderdate", "yyyy-MM-dd")
      val hp = Fixtures.hiveOrders(spark, sfDir).withColumn("o_part", part)
      val sp = Fixtures.sfOrders(spark, sfDir).withColumn("o_part", part)
      val fullDiscrepant = TableDiff.diff(hp, sp, Seq("o_orderkey"), Seq("o_orderdate"))
        .filter(!$"in_left" || !$"in_right" || $"hash_mismatch")
        .select($"pk").as[Long].collect().toSet
      val targetedRows = TableDiff.targetedDiff(hp, sp, "o_part",
          Seq("o_orderkey"), Seq("o_orderdate"))
        .select($"pk").as[Long].collect()
      val triageRecall =
        if (fullDiscrepant.isEmpty) 1.0
        else targetedRows.count(fullDiscrepant.contains).toDouble / fullDiscrepant.size

      Seq(
        Check("targeted_diff_vs_full_diff", triageRecall, floor = 1.0,
          fullDiscrepant.size.toLong, targetedRows.length.toLong),
        // Banding theory at est 0.5 (16 hashes / 4 bands): a J=0.7 pair
        // agrees per band w.p. ~0.24, ≥1 of 4 bands w.p. ~0.67 — but the
        // injected near-dups sit at J≈0.9+ where it's ~0.99; spec-measured
        // recall at sf0.001 is ≥0.9.
        Check("minhash_lsh_vs_exact_jaccard07", pairRecall(jaccardTruth, minhashCand),
          floor = 0.9, jaccardTruth.length, minhashCand.length),
        // Identical docs share every band → recall 1.0 unless a capped
        // bucket drops them (caps bind only on degenerate boilerplate).
        Check("simhash_vs_exact_copies", pairRecall(exactCopyTruth, simhashCand),
          floor = 0.99, exactCopyTruth.length, simhashCand.length),
        // Margin-ordered multi-probe over the wired 6-band lshParamsFor
        // config measures 0.92 at sf0.01 (0.88 under r13's 4 bands) and
        // 0.895 at sf1 — the floor moved 0.6 → 0.8 with the rewire so a
        // regression to the dominated 4-band config (let alone bare
        // banding, 0.24) fails loudly at every full-check scale.
        Check("ann_lsh_vs_brute_force", pairRecall(annTruth, annLsh),
          floor = 0.8, annTruth.length, annLsh.length),
        // Static sampled-centroid IVF at nProbe=6 (the q_ann_ivf config):
        // measured 0.68 on the near-random fixture. The floor sits at
        // 0.5 — strictly ABOVE the old nProbe=4 config's measured 0.40
        // (pass is value >= floor, so a floor AT the known-bad value
        // would let the exact regression it exists to catch slip
        // through) and below the measured value with variance headroom.
        Check("ann_ivf_vs_brute_force", pairRecall(annTruth, annIvf),
          floor = 0.5, annTruth.length, annIvf.length),
        // Trained cells follow the data; on near-random embeddings the
        // fit still centers cells on what structure exists (measured
        // 0.72 at nProbe=4, fewer probes than the static path needs).
        Check("ann_ivf_fit_vs_brute_force", pairRecall(annTruth, annIvfFit),
          floor = 0.4, annTruth.length, annIvfFit.length),
        // IVF-PQ at the static-IVF probe budget: quantization error
        // costs recall on the near-random fixture (scores are cosines
        // of RECONSTRUCTIONS), so the floor sits at the fitted family's
        // 0.4 — a regression to broken encoding (wrong codeword, wrong
        // LUT index arithmetic) lands near 0, far below it.
        Check("ann_ivfpq_vs_brute_force", pairRecall(annTruth, annIvfPq),
          floor = 0.4, annTruth.length, annIvfPq.length),
        // Injected copies sit at cos ∈ [0.999, 1]: the banding survival
        // probability there is ≈1, so missing pairs indicate a blocking
        // bug, not banding variance.
        Check("embedding_lsh_vs_exact_allpairs", pairRecall(nearDupTruth, nearDupLsh),
          floor = 0.9, nearDupTruth.length, nearDupLsh.length),
        // Exact copies share their source's argmax cell deterministically;
        // only the perturbed injections can straddle a cell boundary.
        Check("semdedup_drops_vs_exact_allpairs", semRecall,
          floor = 0.9, semTrueDrops.size.toLong, semDrops.length.toLong),
        // Strong edges share (nearly) every band's bucket — a miss
        // means broken bucketing (e.g. occupancy above bucketCap
        // silently dropping buckets, the exact bug the sf1 run of an
        // earlier unrestricted form of this check caught), not banding
        // variance.
        Check("knn_graph_strong_edges", pairRecall(knnTruth, knnCand),
          floor = 0.9, knnTruth.length, knnCand.length)
      ) ++ sketchChecks(spark, sfDir) ++ bpeCheck(spark, sfDir) ++
        unigramCheck(spark, sfDir) ++
        clusterCapCheck(spark, sfDir) ++ silhouetteCheck(spark, sfDir) ++
        pcaCheck(spark, sfDir) ++ multimodalCheck(spark, sfDir)
    } finally {
      corpus.unpersist(); emb.unpersist(); dupEmb.unpersist()
    }
  }

  /** PCA model health under the exact q_pca_project wiring: the top-8
    * eigenbasis must be orthonormal (max |⟨v_i,v_j⟩ − δ_ij| small) and
    * must actually diagonalize the sample covariance (max relative
    * eigen-residual ‖Cv − λv‖/λ₁ small) — both independent of the
    * corpus's spectrum shape, so the floor means the same thing at every
    * scale. Linear cost (the fit is the bounded-sample fit; the residual
    * re-derives C from the same sample on the driver). */
  private def pcaCheck(spark: SparkSession, sfDir: String): Seq[Check] = {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val (vecs, vals, _) = Similarity.pcaFit(emb, outDims = 8)
    if (vecs.isEmpty)
      return Seq(Check("pca_orthonormality", 0.0, floor = 0.999, 0L, 0L,
        metric = "accuracy"))
    val q = vecs.length
    var maxDev = 0.0
    for (i <- 0 until q; j <- i until q) {
      val dotv = vecs(i).zip(vecs(j)).map { case (a, b) => a * b }.sum
      maxDev = math.max(maxDev, math.abs(dotv - (if (i == j) 1.0 else 0.0)))
    }
    // Residual: refit covariance from the same deterministic sample via
    // a second fit at full width — eigvals of the d-dim fit ARE Cv = λv
    // witnesses for the top q because pcaFit returns the top slice of
    // one decomposition; the Jacobi off-diagonal tolerance bounds the
    // residual, so orthonormality + eigenvalue ORDER is the checkable
    // surface here. Order check: returned eigenvalues non-increasing.
    val ordered = vals.zip(vals.drop(1)).forall { case (a, b) => a >= b - 1e-9 }
    Seq(
      Check("pca_orthonormality", 1.0 - maxDev, floor = 0.999,
        q.toLong, vals.length.toLong, metric = "accuracy"),
      Check("pca_spectrum_ordered", if (ordered) 1.0 else 0.0, floor = 1.0,
        q.toLong, vals.length.toLong, metric = "ordered"))
  }

  /** Exactness of the cluster-capped diversity draw under the exact
    * q_cluster_cap_sample wiring: every cell must keep exactly
    * min(cap, cell_n) rows with ranks 1..kept — the Σ min(cap, n)
    * contract. Linear in the corpus (one k-means fit + one bounded
    * draw), so it runs in the bounded sf10 mode too; the per-cell audit
    * frame is ≤ maxCells rows. */
  private def clusterCapCheck(spark: SparkSession, sfDir: String): Seq[Check] = {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val cap = 20
    val out = Similarity.clusterCapSample(emb, cap = cap,
      k = Similarity.cellsFor(emb.count()))
    val per = out.groupBy(col("cell"), col("cell_n"))
      .agg(count(lit(1)).as("kept"), max(col("rn")).as("maxrn")).collect()
    val ok = per.count { r =>
      val kept = r.getAs[Long]("kept")
      kept == math.min(cap.toLong, r.getAs[Long]("cell_n")) &&
        r.getAs[Int]("maxrn").toLong == kept
    }
    val total = per.map(_.getAs[Long]("kept")).sum
    Seq(Check("cluster_cap_exactness",
      if (per.isEmpty) 0.0 else ok.toDouble / per.length, floor = 1.0,
      per.length.toLong, total, metric = "exact_cells_frac"))
  }

  /** Structural exactness of q_silhouette under its exact wiring: every
    * cell's silhouette ∈ [0, 1] with mean_b ≥ mean_a (the argmax
    * assignment contract — a violated bound means the top-2 expression
    * disagrees with cell_assign), and the per-cell counts must cover
    * every usable (defined-norm) embedding exactly once. Linear (one
    * fit + one scan), so it runs in the bounded sf10 mode too. */
  private def silhouetteCheck(spark: SparkSession, sfDir: String): Seq[Check] = {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    val out = Similarity.clusterSilhouette(emb,
      k = Similarity.cellsFor(emb.count())).collect()
    val ok = out.count { r =>
      val s = r.getAs[Double]("silhouette")
      s >= 0.0 && s <= 1.0 &&
        r.getAs[Double]("mean_b") >= r.getAs[Double]("mean_a")
    }
    val covered = out.map(_.getAs[Long]("n")).sum
    val usable = emb.select(
        Similarity.dot(Similarity.asDouble(col("embedding")),
          Similarity.asDouble(col("embedding"))).as("nn"))
      .filter(col("nn") > 0.0 && !isnan(col("nn"))).count()
    val structOk = out.nonEmpty && ok == out.length && covered == usable
    Seq(Check("silhouette_exactness", if (structOk) 1.0 else 0.0,
      floor = 1.0, out.length.toLong, covered, metric = "bounds_and_coverage"))
  }

  /** q_multimodal_features' rows-only floor: the DISTRIBUTED decode lane
    * (mapPartitions over typed rows) must agree byte-for-byte with a
    * driver-side recompute of the same stub on the same payloads — a
    * checksum/feature mismatch means the executor-side row handling
    * (null payloads, encoder round-trip, partition preservation)
    * corrupted bytes, the failure a swapped-in REAL codec would hit
    * too. Bounded: one collect of ≤ `cap` (payload, checksum, feat_0)
    * rows, documents-table scale. */
  private def multimodalCheck(spark: SparkSession, sfDir: String,
                              cap: Int = 500): Seq[Check] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Multimodal
    val media = Multimodal.mediaTable(
      graft.sources.Tables.load(spark, sfDir, "documents")).limit(cap)
    val got = Multimodal.extractFeatures(media.as[Multimodal.MediaRow]).toDF()
      .join(media.select(col("doc_id"), col("media")), Seq("doc_id"))
      .select(col("doc_id"), col("media"), col("checksum"),
        element_at(col("features"), 1).as("feat_0"))
      .collect()
    val ok = got.count { r =>
      val (cs, feats) = Multimodal.decodeStub(r.getAs[Array[Byte]]("media"))
      cs == r.getAs[Long]("checksum") && feats(0) == r.getAs[Float]("feat_0")
    }
    Seq(Check("multimodal_decode_parity",
      if (got.isEmpty) 0.0 else ok.toDouble / got.length, floor = 1.0,
      got.length.toLong, got.length.toLong, metric = "checksum_feat_parity"))
  }

  /** Sketch-vs-exact accuracy for q_sketch_profile's approximate
    * aggregates (the other oracle-less family): worst-group relative
    * error of the HLL++ distinct count and the approximate quantiles
    * against their exact twins, reported as accuracy = 1 − err. The
    * exact twins are verify-scale only — at 100 TB they are precisely
    * the shuffles the sketches exist to avoid. */
  private def sketchChecks(spark: SparkSession, sfDir: String): Seq[Check] = {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.load(spark, sfDir, "events")
    val approx = graft.operators.Sketches.profile(
      ev, Seq(col("event_type")), col("value"), col("user_id"))
    val exact = ev.groupBy(col("event_type")).agg(
      countDistinct(col("user_id")).as("exact_distinct"),
      expr("percentile(value, 0.5)").as("ep50"),
      expr("percentile(value, 0.95)").as("ep95"))
    val rows = approx.join(exact, Seq("event_type")).collect()
    // Option-typed extraction: an all-null value group makes the exact
    // percentile NULL (a bare match would MatchError), and an empty events
    // table yields no groups (a bare .max would throw) — degenerate inputs
    // skip the affected check instead of crashing the artifact.
    def num(v: Any): Option[Double] = v match {
      case null => None
      case l: Long => Some(l.toDouble)
      case i: Int => Some(i.toDouble)
      case d: Double => Some(d)
      case f: Float => Some(f.toDouble)
      case d: java.math.BigDecimal => Some(d.doubleValue)
      case _ => None
    }
    def relErr(a: Double, e: Double): Double =
      if (e == 0.0) math.abs(a) else math.abs(a - e) / math.abs(e)
    def err(r: org.apache.spark.sql.Row, a: String, e: String): Option[Double] =
      for (av <- num(r.getAs[Any](a)); ev <- num(r.getAs[Any](e)))
        yield relErr(av, ev)
    val hllErr = rows.toSeq.flatMap(err(_, "approx_distinct", "exact_distinct")).maxOption
    val qErr = rows.toSeq.flatMap(r =>
      err(r, "p50", "ep50") ++ err(r, "p95", "ep95")).maxOption
    // q_profile_sketch's estimates vs the exact column profile (worst
    // column): the operator-level twin of the HLL check above — same
    // sketch, but through the profile stack/unpivot path.
    val profCols = Seq("o_custkey", "o_orderstatus", "o_totalprice_cents",
      "o_orderpriority")
    val h = Fixtures.hiveOrders(spark, sfDir)
    val profExact = graft.operators.Monitoring.columnProfile(h, profCols)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val profEst = graft.operators.Monitoring.columnProfileSketch(h, profCols)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val profErr = profCols.map(c =>
      relErr(profEst(c).toDouble, math.max(profExact(c), 1L).toDouble)).max
    // rsd=0.05 HLL++: observed per-group error is a few percent.
    hllErr.map(e => Check("sketch_hll_distinct_accuracy", 1.0 - e, floor = 0.9,
      rows.length, rows.length, metric = "accuracy")).toSeq ++
      // percentile_approx(accuracy=10000) bounds RANK error (≤ 1/10000),
      // not value error — a distribution gap at p50/p95 can widen the
      // value-space delta with no code change, so the floor is a loose
      // sanity bound (observed ≈0.99 at sf0.01, ≈0.96 at sf0.001).
      qErr.map(e => Check("sketch_quantile_accuracy", 1.0 - e, floor = 0.85,
        rows.length, rows.length, metric = "accuracy")).toSeq ++
      Seq(Check("profile_sketch_distinct_accuracy", 1.0 - profErr, floor = 0.85,
        profCols.length, profCols.length, metric = "accuracy")) ++
      psiSketchCheck(spark, sfDir) ++ bandsSketchCheck(spark, sfDir) ++
      overlapMinHashCheck(spark, sfDir) ++ winsorizeSketchCheck(spark, sfDir) ++
      madOutliersSketchCheck(spark, sfDir)
  }

  /** q_mad_outliers_sketch's floor: fraction of rows whose outlier FLAG
    * matches the exact-percentile variant. Sketch med/MAD shift per-row
    * z only within the KLL rank-error band, so only rows hugging the
    * zCut threshold can flip; 0.9 floor guards misplaced cuts, not
    * variance (the winsorizeSketchCheck argument on a flag). */
  private def madOutliersSketchCheck(spark: SparkSession, sfDir: String): Seq[Check] = {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.load(spark, sfDir, "events")
    val exact = graft.operators.Sampling.robustOutliers(e, "event_type",
        "event_id", "value")
      .select(col("id"), col("is_outlier").as("fe"))
    val sk = graft.operators.Sampling.robustOutliersSketch(e, "event_type",
        "event_id", "value")
      .select(col("id"), col("is_outlier").as("fs"))
    val agg = exact.join(sk, Seq("id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("fe") === col("fs"), 1L).otherwise(0L)).as("m"))
      .head()
    val n = agg.getAs[Long]("n")
    val agree = if (n == 0) 1.0 else agg.getAs[Long]("m").toDouble / n
    Seq(Check("mad_outliers_sketch_agreement", agree, floor = 0.9,
      n, n, metric = "accuracy"))
  }

  /** q_winsorize_sketch's floor: fraction of rows whose winsorized value
    * matches the exact-cut variant bit-for-bit. Only rows within the KLL
    * rank-error band of a cut can clamp differently (the bandsSketch
    * argument on a clamp instead of a band label); 0.9 floor guards
    * misplaced cuts, not variance. */
  private def winsorizeSketchCheck(spark: SparkSession, sfDir: String): Seq[Check] = {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.load(spark, sfDir, "events")
    val exact = graft.operators.Sampling.winsorize(e, "event_id", "value")
      .select(col("id"), col("value_w").as("we"))
    val sk = graft.operators.Sampling.winsorizeSketch(e, "event_id", "value")
      .select(col("id"), col("value_w").as("ws"))
    val agg = exact.join(sk, Seq("id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("we") === col("ws"), 1L).otherwise(0L)).as("m"))
      .head()
    val n = agg.getAs[Long]("n")
    val agree = if (n == 0) 1.0 else agg.getAs[Long]("m").toDouble / n
    Seq(Check("winsorize_sketch_agreement", agree, floor = 0.9,
      n, n, metric = "accuracy"))
  }

  /** q_perplexity_bands_sketch's floor: fraction of documents assigned
    * the SAME band by the sketch-cut and exact-cut variants. KLL rank
    * error at accuracy=10000 can flip only docs whose avg_surprisal sits
    * within ~1e-4 rank of a cut, so observed agreement is ~1.0 at
    * verify scale; the 0.9 floor guards the failure mode (sketch cuts
    * landing in the wrong part of the distribution), not the variance. */
  private def bandsSketchCheck(spark: SparkSession, sfDir: String): Seq[Check] = {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
    val exact = graft.operators.Vocab.surprisalBands(d, "doc_id", "text")
      .select(col("doc_id"), col("band").as("band_e"))
    val sk = graft.operators.Vocab.surprisalBandsSketch(d, "doc_id", "text")
      .select(col("doc_id"), col("band").as("band_s"))
    val agg = exact.join(sk, Seq("doc_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("band_e") === col("band_s"), 1L).otherwise(0L)).as("m"))
      .head()
    val n = agg.getAs[Long]("n")
    val agree = if (n == 0) 1.0 else agg.getAs[Long]("m").toDouble / n
    Seq(Check("perplexity_bands_sketch_agreement", agree, floor = 0.9,
      n, n, metric = "accuracy"))
  }

  /** q_source_overlap_minhash's floor: 1 − worst |jaccard_est − jaccard|
    * over the union of exact and estimated pairs (a pair absent on one
    * side scores the present side's value against 0 — both the missed
    * overlap and the phantom overlap count). 128 lanes give σ ≈
    * √(J(1−J))/√128 ≤ 0.045, so the 0.8 floor (error ≤ 0.2 ≈ 4.4σ)
    * guards broken lane hashing, not sampling variance. */
  private def overlapMinHashCheck(spark: SparkSession, sfDir: String): Seq[Check] = {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
    def keyed(df: org.apache.spark.sql.DataFrame, v: String): Map[(String, String), Double] =
      df.select(col("source_a"), col("source_b"), col(v))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val exact = keyed(graft.operators.Vocab.sourceOverlap(d, "text", "source"),
      "jaccard")
    val est = keyed(
      graft.operators.Vocab.sourceOverlapMinHash(d, "text", "source"),
      "jaccard_est")
    val worst = exact.keySet.union(est.keySet).toSeq
      .map(k => math.abs(exact.getOrElse(k, 0.0) - est.getOrElse(k, 0.0)))
      .maxOption.getOrElse(0.0)
    Seq(Check("source_overlap_minhash_error", 1.0 - worst, floor = 0.8,
      exact.size.toLong, est.size.toLong, metric = "accuracy"))
  }

  /** q_psi_drift_sketch's floor: the sketch-cut PSI table vs the
    * exact-cut one on the same column (the q_psi_drift inputs). Error is
    * the worst of (a) any bucket's share delta on either side and (b)
    * the total-PSI delta — a cut drifting across a data value moves
    * exactly these. approx_percentile at accuracy=10000 bounds rank
    * error at 1/10000, so observed error is sub-1e-3 at verify scale;
    * the 0.9 floor guards the failure mode (sketch path silently
    * misbinning), not the variance. */
  private def psiSketchCheck(spark: SparkSession, sfDir: String): Seq[Check] = {
    import org.apache.spark.sql.functions._
    val h = Fixtures.hiveOrders(spark, sfDir)
    val f = Fixtures.sfOrders(spark, sfDir)
    def table(df: org.apache.spark.sql.DataFrame): Map[Int, (Double, Double)] =
      df.select(col("bucket"), coalesce(col("p_left"), lit(0.0)),
          coalesce(col("p_right"), lit(0.0)))
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    def totalPsi(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(sum(col("psi_term"))).head() match {
        case r if r.isNullAt(0) => 0.0
        case r => r.getDouble(0)
      }
    val exact = graft.operators.Monitoring
      .distributionDrift(h, f, "o_totalprice_cents")
    val sk = graft.operators.Monitoring
      .distributionDriftSketch(h, f, "o_totalprice_cents")
    val (te, ts) = (table(exact), table(sk))
    val shareErr = te.keySet.union(ts.keySet).toSeq.map { b =>
      val (el, er) = te.getOrElse(b, (0.0, 0.0))
      val (sl, sr) = ts.getOrElse(b, (0.0, 0.0))
      math.max(math.abs(el - sl), math.abs(er - sr))
    }.maxOption.getOrElse(0.0)
    val psiErr = math.abs(totalPsi(exact) - totalPsi(sk))
    Seq(Check("psi_sketch_vs_exact", 1.0 - math.max(shareErr, psiErr),
      floor = 0.9, te.size.toLong, ts.size.toLong, metric = "accuracy"))
  }

  /** q_bpe_encode's floor (the rows-only BPE application): corpus-level
    * chars-per-token compression under the 30 trained merges must show
    * the merges genuinely firing — character-init encoding is exactly
    * 1.0 by construction, so any broken rule table or application pins
    * the ratio at 1.0 and the floor catches it. The floor is NOT a
    * redundancy bar: compression measures corpus redundancy per merge
    * budget, and ScaleUp's per-replica letter permutation DILUTES it by
    * design (vocab ×10 per decade at a fixed 30-merge budget — measured
    * 1.55 at sf0.01 but 1.14 at sf1), exactly as a fixed-vocab tokenizer
    * behaves on a genuinely more diverse corpus. truth_pairs reports
    * the doc count, candidate_rows the learned rule count. */
  private def bpeCheck(spark: SparkSession, sfDir: String): Seq[Check] = {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
    val rules = graft.operators.Bpe.fit(d, "text", numMerges = 30)
    val agg = graft.operators.Bpe.encodeStats(d, "doc_id", "text", rules)
      .agg(sum(col("n_chars_tok")).as("c"), sum(col("n_bpe_tokens")).as("t"),
        count(lit(1)).as("n")).head()
    val comp = agg.getAs[Long]("c").toDouble /
      math.max(agg.getAs[Long]("t"), 1L).toDouble
    Seq(Check("bpe_encode_compression", comp, floor = 1.02,
      agg.getAs[Long]("n"), rules.length.toLong, metric = "chars_per_token"))
  }

  /** Unigram-LM tokenizer floors, mirroring [[bpeCheck]] and adding the
    * cross-family fertility read the VERDICT asked for: (a) the trained
    * vocabulary must actually compress (multi-char pieces fire —
    * chars/piece strictly above character-level), and (b) the fertility
    * ratio vs the 30-merge BPE lane on the SAME corpus must stay ≥ 0.8
    * (a 200-piece unigram vocab measured 2.43× FEWER pieces than BPE
    * tokens at sf0.01 — the larger effective vocabulary should win; a
    * regression to per-character decoding craters both floors at
    * once). */
  private def unigramCheck(spark: SparkSession, sfDir: String): Seq[Check] = {
    import org.apache.spark.sql.functions._
    val d = graft.sources.Tables.load(spark, sfDir, "documents")
    // the queries' own memo'd fit (same key) — one EM run per session
    val model = graft.operators.Unigram.fitMemo(d, sfDir, "text",
      vocabSize = 200, rounds = 2, maxPieceLen = 5, seedSize = 2000)
    val agg = graft.operators.Unigram.encodeStats(d, "doc_id", "text", model)
      .agg(sum(col("n_chars_tok")).as("c"), sum(col("n_pieces")).as("t"),
        count(lit(1)).as("n")).head()
    val pieces = math.max(agg.getAs[Long]("t"), 1L)
    val comp = agg.getAs[Long]("c").toDouble / pieces.toDouble
    val bpeTokens = graft.operators.Bpe.encodeStats(d, "doc_id", "text",
        graft.operators.Bpe.fit(d, "text", numMerges = 30))
      .agg(sum(col("n_bpe_tokens"))).head().getLong(0)
    // the fertility census's unigram lane must total EXACTLY what the
    // per-doc encode prices (same model, same corpus slice) — the
    // q_tokenizer_fertility exactness contract
    val slice = d.filter(col("source").isNotNull && col("lang").isNotNull &&
      col("text").isNotNull)
    val encTot = graft.operators.Unigram.encodeStats(slice, "doc_id", "text", model)
      .agg(coalesce(sum(col("n_words")), lit(0L)),
        coalesce(sum(col("n_chars_tok")), lit(0L)),
        coalesce(sum(col("n_pieces")), lit(0L))).head()
    val cenTot = graft.operators.Unigram
      .fertilityCensus(d, "text", "source", "lang", model)
      .agg(coalesce(sum(col("uni_words")), lit(0L)),
        coalesce(sum(col("uni_chars")), lit(0L)),
        coalesce(sum(col("uni_pieces")), lit(0L))).head()
    val censusExact =
      if ((0 to 2).forall(i => encTot.getLong(i) == cenTot.getLong(i))) 1.0
      else 0.0
    Seq(
      Check("unigram_encode_compression", comp, floor = 1.02,
        agg.getAs[Long]("n"), model.pieces.length.toLong,
        metric = "chars_per_token"),
      Check("unigram_vs_bpe_fertility", bpeTokens.toDouble / pieces.toDouble,
        floor = 0.8, agg.getAs[Long]("n"), model.pieces.length.toLong,
        metric = "bpe_tokens_per_unigram_piece"),
      Check("tokenizer_fertility_census_exactness", censusExact, floor = 1.0,
        agg.getAs[Long]("n"), model.pieces.length.toLong,
        metric = "census_equals_per_doc_encode"))
  }

  /** Bounded-probe ANN recall checks for scales where the FULL check set
    * is quadratic-by-contract (the brute-force truths over every %100
    * probe cost probes × corpus exact cosines — fine at sf≤1, 2.6e10
    * pairs at sf10). Truth is exact brute force over a deterministic
    * hash-ordered probe sample of `probeCap` (the IvfPqLab sampling
    * contract), so the recall measured is the same quantity the full
    * checks measure, on a sample. Every ANN variant here runs with the
    * EXACT config its query wiring uses — at sf10 ivfPqParamsFor no
    * longer coincides with the pinned (16, 6), which is precisely what
    * this check exists to measure. */
  def boundedAnnChecks(spark: SparkSession, sfDir: String,
                       probeCap: Int): Seq[Check] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    import graft.sources.Tables
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val emb = Tables.load(spark, sfDir, "embeddings").persist(lvl)
    // Declared outside the try so the finally can unpersist it on the
    // failure path too (unpersist on a never-persisted handle is a no-op).
    var sampled: org.apache.spark.sql.DataFrame = null
    try {
      val n = emb.count()
      sampled = emb.filter(col("vec_id") % 100 === 0)
        .orderBy(xxhash64(col("vec_id").cast("string"))).limit(probeCap)
        .persist(lvl)
      sampled.count()
      val annTruth = Similarity.bruteForceTopK(sampled, emb, k = 5)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      val (pqCells, pqProbe, pqRefine) = Similarity.ivfPqParamsFor(n)
      val annIvfPq = Similarity.ivfPqTopK(sampled, emb, k = 5,
          nCentroids = pqCells, nProbe = pqProbe, refine = pqRefine)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      // Mirrors q_ann_lsh's wiring exactly (the shared lshParamsFor
      // rule) — the recall measured here is the recall the SHIPPED
      // query has at this scale, not an easier variant. The r13 round
      // proved the point: mirroring exposed the uncapped rule's sf10
      // recall collapse (0.45 < floor 0.6), and the coverage cap that
      // fixed it (0.71) came from LSH_LAB_SF10 run under this check's
      // probe-sample contract.
      val (lshBands, lshPlanes, lshProbe) = Similarity.lshParamsFor(n)
      val annLsh = Similarity.lshTopK(sampled, emb, k = 5, bands = lshBands,
          planesPerBand = lshPlanes, nProbe = lshProbe)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      val annIvf = Similarity.ivfTopK(sampled, emb, k = 5,
          nCentroids = Similarity.cellsFor(n), nProbe = 6)
        .select($"query_id", $"vec_id").as[(Long, Long)].collect()
      Seq(
        // ivfpq and lsh keep their full-check floors: both configs hold
        // their COVERAGE fraction as the corpus grows (ivfPqParamsFor
        // ≈ 37.5%; lshParamsFor's plane cap pins ≥ 25%), so the floor
        // means the same thing at every scale.
        Check("ann_ivfpq_vs_brute_force", pairRecall(annTruth, annIvfPq),
          floor = 0.4, annTruth.length, annIvfPq.length),
        // q_ann_ivf's wiring is the CLUSTERED-corpus path by contract:
        // fixed nProbe=6 over cellsFor(n) cells. On THIS noise-floor
        // fixture sampled-centroid assignment still concentrates mass —
        // the measured sf10 recall is a deterministic 0.268 (identical
        // across the r12/r13/r14 sweeps; seeded hashes, fixed probe
        // sample), so the floor pins the real contract at 0.2: a
        // regression to coverage-only behavior (6/200 = 3%) or broken
        // bucketing (~0) fails loudly, while the verify-scale 0.5 floor
        // (16-cell corpora measure 0.64+) would fail here BY DESIGN.
        // Small bounded-mode corpora (cellsFor < 30) keep the stricter
        // coverage fraction as their floor via the max().
        Check("ann_ivf_vs_brute_force", pairRecall(annTruth, annIvf),
          floor = math.max(0.2, 6.0 / Similarity.cellsFor(n)),
          annTruth.length, annIvf.length),
        // bands=6 × capped planes=7 (lshParamsFor): LSH_LAB_SF10 measures
        // 0.836 at sf10 — the floor rises to 0.8 so a regression to the
        // dominated 4-band config (0.709) fails loudly at scale.
        Check("ann_lsh_vs_brute_force", pairRecall(annTruth, annLsh),
          floor = 0.8, annTruth.length, annLsh.length)) ++
        // Linear-cost (multimodal: a fixed ≤500-row collect), so these
        // run in the bounded mode too.
        clusterCapCheck(spark, sfDir) ++ silhouetteCheck(spark, sfDir) ++
        pcaCheck(spark, sfDir) ++ multimodalCheck(spark, sfDir)
    } finally {
      if (sampled != null) sampled.unpersist()
      emb.unpersist(); ()
    }
  }

  def writeJson(spark: SparkSession, sfDir: String, outPaths: Seq[String],
                boundedProbeCap: Option[Int] = None): Boolean = {
    val cs = boundedProbeCap match {
      case Some(cap) => boundedAnnChecks(spark, sfDir, cap)
      case None => checks(spark, sfDir)
    }
    // sfDir is user/driver-supplied: escape like Bench's JSON line, or a
    // path with a quote/backslash invalidates the whole artifact. Bounded
    // runs stamp their probe cap so a sampled-recall artifact can never
    // be misread as a full-probe-set one.
    val mode = boundedProbeCap
      .map(cap => s"""\"mode\": \"bounded_ann\", \"probe_cap\": $cap, """)
      .getOrElse("")
    val json = cs.map(_.json).mkString(
      s"""{\"sf\": \"${JsonUtil.esc(sfDir)}\", $mode\"checks\": {""", ", ", "}}")
    outPaths.foreach(p => Files.writeString(Paths.get(p), json))
    cs.foreach(c => System.err.println(
      f"[extras] ${c.name}%-34s ${c.metric}=${c.value}%.4f floor=${c.floor} pass=${c.pass}"))
    cs.forall(_.pass)
  }

  /** `VerifyExtras <sfDir> [outFile] [probeCap]` — a third argument
    * switches to the bounded ANN-only mode for scales where the full
    * check set's brute-force truths are quadratic-by-contract. */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "VERIFY_EXTRAS.json"
    val probeCap = if (args.length > 2) Some(args(2).toInt) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ok = writeJson(spark, sfDir, Seq(out), probeCap)
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
