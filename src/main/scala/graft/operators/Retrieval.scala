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
   * contract), carrying one STATE table of not-yet-selected candidates
   * with the running `sim_u = max similarity-to-selected` (the penalty
   * is `penW·sim_u`; null = empty set) —
   * `max_{s∈S∪{p}} sim(d,s) = greatest(max_{s∈S} sim(d,s), sim(d,p))`,
   * so each step joins the state to the ONE newly picked vector
   * (per-q_id, a broadcast-sized side), computes |remaining| cosines
   * instead of |remaining|·|selected|, and drops the picked row by
   * column comparison — no anti-join. Every side is candidate-list-
   * proportional (≤ |probes|·|candidates| rows), never corpus-
   * proportional. The state is an EAGER local checkpoint per step, not
   * a cache pin: a pin short-circuits execution but leaves the logical
   * tree intact, and a growing self-referencing tree blows up ANALYSIS
   * (the first formulation referenced the selection 3× per step —
   * ~3^k copies of the upstream retrieval tree, measured 36 s of
   * driver-side analysis at sf0.1 before any task ran).
   * `localCheckpoint(eager=true)` rewrites the step to a LogicalRDD,
   * so analysis stays O(step). (Local checkpoints do not survive
   * executor loss; for a multi-hour cluster backfill, write the
   * candidate list to a table first and re-rank from that scan.)
   */
  def mmrRerank(candidates: DataFrame, vecs: DataFrame, idCol: String,
                vecCol: String, k: Int, relW: Long = 1L,
                penW: Long = 33L): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(relW >= 0 && penW >= 0,
      s"weights must be non-negative, got relW=$relW penW=$penW")
    // state: not-yet-selected candidates, each with its vector and the
    // running max-similarity-to-selected (`sim_u`, null = empty set —
    // `greatest` skips nulls, so the first fold takes the raw value
    // even when it is negative; a zero init would wrongly clamp
    // negative-cosine "bonuses")
    var state = candidates
      .select(col("q_id").cast("long").as("q_id"),
        col("doc_id").cast("long").as("doc_id"),
        col("rel_u").cast("long").as("rel_u"))
      .join(vecs.select(col(idCol).cast("long").as("doc_id"),
        col(vecCol).cast("array<double>").as("__v")), "doc_id")
      .withColumn("sim_u", lit(null).cast("long"))
      .localCheckpoint(true)
    def mmr = col("rel_u") * lit(relW) -
      coalesce(col("sim_u") * lit(penW), lit(0L))
    // per-q_id argmax as an integer-lexicographic struct max — (score
    // desc, doc_id asc) exactly like the topK kernel, but the struct
    // carries the winner's VECTOR out of the aggregate, so the state
    // update below needs no self-join to recover it
    def pick(rank: Int): DataFrame =
      state.groupBy(col("q_id"))
        .agg(max(struct(mmr.as("m"),
          (col("doc_id") * lit(-1L)).as("nd"),
          col("doc_id").as("doc_id"), col("__v").as("__pv"))).as("__p"))
        .select(col("q_id"), lit(rank).cast("int").as("rank"),
          col("__p.doc_id").as("doc_id"), col("__p.m").as("mmr_u"),
          col("__p.__pv").as("__pv"))
    var pickT = pick(1)
    var sel = pickT.drop("__pv")
    for (t <- 2 to k) {
      val pv = pickT.select(col("q_id"), col("doc_id").as("__pid"),
        col("__pv"))
      // queries whose candidates ran out vanish from the pick, the
      // inner join retires their state — selection just stops
      state = state.join(pv, Seq("q_id"))
        .filter(col("doc_id") =!= col("__pid"))
        .select(col("q_id"), col("doc_id"), col("rel_u"), col("__v"),
          greatest(col("sim_u"),
            floor(Similarity.cosine(col("__v"), col("__pv"))
              * lit(1000000.0))).as("sim_u"))
        .localCheckpoint(true)
      pickT = pick(t)
      sel = sel.union(pickT.drop("__pv"))
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
