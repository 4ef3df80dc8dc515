package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Hybrid retrieval: reciprocal-rank fusion of ranked candidate lists
 * from heterogeneous retrievers (lexical BM25, dense cosine, ...).
 *
 * The reference engine's decontamination surface stops at exact id
 * matching (`FabricQC/run.js` joins staged fact rows on natural keys);
 * modern training-data pipelines pair a lexical retriever with a dense
 * one and fuse the ranked lists, because each leg finds contamination
 * the other is blind to (paraphrase vs verbatim). RRF (Cormack,
 * Clarke & Büttcher, SIGIR 2009 — public) is the standard fusion rule:
 * it needs only RANKS, so heterogeneous score scales (integer-exact
 * BM25 micro-nats vs float cosine) never have to be calibrated.
 *
 * Scale shape: both legs are already bounded-output broadcast-probe
 * top-k operators ([[CorpusStats.bm25TopK]], [[Similarity.cosineTopK]]);
 * fusion touches only their outputs — ≤ Σ_leg k rows per probe — so its
 * two shuffles move candidate lists, never corpus rows. At 100 TB the
 * cost is entirely in the legs, which is where it belongs.
 */
object Retrieval {

  /**
   * Reciprocal-rank fusion of ranked runs. Each run must expose columns
   * `q_id` (castable to bigint), `doc_id` (castable to bigint) and
   * `rank` (1-based int). A candidate's fused score is
   * Σ_runs floor(1e9 / (k0 + rank)) — the textbook 1/(k0+rank) RRF
   * weight scaled to an exact BIGINT (micro-weight discipline of
   * q119/q125/q127), so fused scores sum order-free and replay exactly
   * in any engine; ties break to the smaller doc_id.
   *
   * Output: q_id, rank (1..k over the fused order), doc_id, rrf_u.
   *
   * Plan: union of the runs' candidate rows → hash-agg SUM on
   * (q_id, doc_id) → mergeable bounded top-k ([[graft.plans.TopKByScore]])
   * per q_id. Both shuffles carry at most Σ_runs k_run rows per probe.
   */
  def rrfFuse(runs: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(runs.nonEmpty, "rrfFuse: need at least one run")
    require(k >= 1, s"k must be positive, got $k")
    require(k0 >= 0, s"k0 must be non-negative, got $k0")
    val contribs = runs.map { r =>
      r.select(col("q_id").cast("long").as("q_id"),
        col("doc_id").cast("long").as("doc_id"),
        // floor(1e9/(k0+rank)) is exact: numerator and divisor are
        // integers well under 2^53, the double quotient can only sit
        // ON an integer when the division is exact, so floor of the
        // nearest-double quotient equals the true integral quotient
        floor(lit(1000000000.0) / (col("rank").cast("double") + lit(k0)))
          .as("c_u"))
    }
    val fused = contribs.reduce(_ union _)
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("c_u")).as("rrf_u"))
    // max rrf_u = runs·ceil(1e9/(k0+1)) ≪ 2^53, so the double round-trip
    // through the top-k aggregate is exact
    fused.groupBy(col("q_id"))
      .agg(graft.plans.Kernels.topK(col("rrf_u").cast("double"),
        col("doc_id"), lit(k)).as("__topk"))
      .select(col("q_id"), posexplode(col("__topk")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("doc_id"), col("col.score").cast("long").as("rrf_u"))
  }

  /**
   * Maximal-marginal-relevance re-rank (Carbonell & Goldstein, SIGIR
   * 1998 — public) of a per-query candidate list: greedily select `k`
   * candidates maximizing `rel_u·relW − penW·max_{s∈selected} sim_u(d,s)`
   * — relevance traded against redundancy with what is already picked,
   * the diversification step a retrieval-augmented pipeline runs after
   * fusion so near-duplicate passages don't crowd out coverage.
   *
   * Exact-replay discipline: `rel_u` is an integer relevance (e.g.
   * [[rrfFuse]]'s `rrf_u`), the similarity penalty is the cosine
   * quantized to integer micro-units — `floor(1e6·cosine)`, where the
   * cosine double is bit-identical across engines (sequential-fold dot
   * product, q40's proven parity) — so every MMR score is an exact
   * BIGINT and the greedy argmax (ties to the smaller doc_id) replays
   * deterministically anywhere.
   *
   * `candidates` must be unique per (q_id, doc_id) with integral
   * `rel_u`; rows whose doc_id has no row in `vecs` are dropped (inner
   * join — a candidate without an embedding cannot be diversified
   * against). Output: q_id, rank (1..k, selection order), doc_id,
   * mmr_u (the score AT selection; rank 1's is `rel_u·relW`). Queries
   * with fewer than `k` candidates yield that many rows.
   *
   * Plan: the greedy loop unrolls at plan-build time (k is small by
   * contract). Per step, the remaining candidates anti-join the
   * selected set and join it on q_id for the pairwise penalty — every
   * side is candidate-list-proportional (≤ |probes|·|candidates|
   * rows), never corpus-proportional. The candidate table and each
   * step's selection are EAGER local checkpoints, not cache pins: a
   * pin short-circuits execution but leaves the logical tree intact,
   * and with each step referencing the previous selection three times
   * the ANALYZED plan grows ~3^k copies of the upstream retrieval tree
   * — measured 36 s of driver-side analysis at sf0.1 before any task
   * ran. `localCheckpoint(eager=true)` rewrites the step to a
   * LogicalRDD, so analysis stays O(step) and the executors only ever
   * see candidate-list-sized work. (Local checkpoints do not survive
   * executor loss; for a multi-hour cluster backfill, write the
   * candidate list to a table first and re-rank from that scan.)
   */
  def mmrRerank(candidates: DataFrame, vecs: DataFrame, idCol: String,
                vecCol: String, k: Int, relW: Long = 1L,
                penW: Long = 33L): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(relW >= 0 && penW >= 0,
      s"weights must be non-negative, got relW=$relW penW=$penW")
    val cand = candidates
      .select(col("q_id").cast("long").as("q_id"),
        col("doc_id").cast("long").as("doc_id"),
        col("rel_u").cast("long").as("rel_u"))
      .join(vecs.select(col(idCol).cast("long").as("doc_id"),
        col(vecCol).cast("array<double>").as("__v")), "doc_id")
      .localCheckpoint(true)
    def pick(scored: DataFrame, rank: Int): DataFrame =
      scored.groupBy(col("q_id"))
        .agg(graft.plans.Kernels.topK(col("mmr_u").cast("double"),
          col("doc_id"), lit(1)).as("__t"))
        .select(col("q_id"), posexplode(col("__t")))
        .select(col("q_id"), lit(rank).cast("int").as("rank"),
          col("col.id").as("doc_id"), col("col.score").cast("long").as("mmr_u"))
    var sel = pick(cand.select(col("q_id"), col("doc_id"),
      (col("rel_u") * lit(relW)).as("mmr_u")), 1).localCheckpoint(true)
    for (t <- 2 to k) {
      val selV = cand.join(sel.select(col("q_id"), col("doc_id")),
        Seq("q_id", "doc_id")).select(col("q_id"), col("__v").as("__sv"))
      val rem = cand.join(sel.select(col("q_id"), col("doc_id")),
        Seq("q_id", "doc_id"), "left_anti")
      val scored = rem.join(selV, "q_id")
        .groupBy(col("q_id"), col("doc_id"))
        .agg(max(col("rel_u")).as("rel_u"),
          max(floor(Similarity.cosine(col("__v"), col("__sv"))
            * lit(1000000.0))).as("sim_u"))
        .select(col("q_id"), col("doc_id"),
          (col("rel_u") * lit(relW) - col("sim_u") * lit(penW)).as("mmr_u"))
      sel = sel.union(pick(scored, t)).localCheckpoint(true)
    }
    sel
  }

  /**
   * The standard two-leg hybrid: integer-exact Okapi BM25 over the text
   * corpus fused with exact cosine top-k over the embedding corpus,
   * both legs cut at `kPerLeg`, fused list cut at `k`. Probes must
   * carry the same id in both spaces (doc text and doc embedding).
   */
  def hybridBm25CosineTopK(
      docs: DataFrame, docIdCol: String, textCol: String,
      embs: DataFrame, embIdCol: String, vecCol: String,
      probeDocs: DataFrame, probeEmbs: DataFrame,
      kPerLeg: Int, k: Int, k0: Int = 60): DataFrame = {
    val lex = CorpusStats.bm25TopK(docs, docIdCol, textCol,
        probeDocs, docIdCol, textCol, kPerLeg)
      .select(col("q_id"), col("doc_id"), col("rank"))
    val den = Similarity.cosineTopK(embs, probeEmbs, embIdCol, vecCol, kPerLeg)
      .select(col("query_id").as("q_id"),
        col("neighbor_id").as("doc_id"), col("rank"))
    rrfFuse(Seq(lex, den), k, k0)
  }
}
