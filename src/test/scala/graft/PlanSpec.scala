package graft

import org.apache.spark.sql.execution.FormattedMode

/**
 * Plan-shape regression tests: the physical plans that make these queries
 * scale (pushdown, pruning, broadcast, partial aggregation) are asserted
 * so a refactor can't silently degrade them into full scans or shuffles.
 */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(FormattedMode)

  test("q03: watermark predicate reaches the parquet scan (pushdown)") {
    val p = formatted("q03_incremental_scan")
    assert(p.contains("GreaterThan(l_shipdate"), p)
  }

  test("q03: scan is column-pruned to the projected columns") {
    val p = formatted("q03_incremental_scan")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    // exactly the 4 referenced columns of lineitem's 11
    assert(readSchema.contains("struct<l_orderkey:bigint,l_linenumber:int," +
      "l_quantity:double,l_shipdate:timestamp_ntz>"), readSchema)
  }

  test("q05/q06: dimension joins broadcast (no shuffle join for small dims)") {
    assert(formatted("q06_broadcast_dim").contains("BroadcastHashJoin"))
    assert(formatted("q05_join_chain").contains("BroadcastHashJoin"))
  }

  test("q01: aggregation is partial (map-side combine before the exchange)") {
    val p = formatted("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("no query plans a CartesianProduct (cross joins must be broadcast)") {
    for (name <- SparkEntry.queries.keys) {
      val p = formatted(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
    }
  }

  test("scans stay whole-stage-codegen'd (filter/project fused)") {
    val p = formatted("q03_incremental_scan")
    assert(p.contains("codegen id"), p)
  }

  test("q40 kNN: top-k is a partial-merge aggregate, not a window") {
    // the window formulation shuffles every scored (query, neighbor) row;
    // graft_topk forwards at most k pairs per query per map task
    val p = formatted("q40_knn_bruteforce")
    assert(p.contains("graft_topk"), p)
    assert(!p.toLowerCase.contains("windowspecdefinition"), p)
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("q43b IVF: corpus cell assignment is a per-row argmax, not a shuffle") {
    // the old shape crossJoined corpus × centroids then ran a window
    // partitioned by neighbor_id (a corpus-wide shuffle × nCentroids);
    // the fix computes greatest() over literal centroid structs — the
    // only windows left partition by query_id (probe + final rank)
    val p = formatted("q43b_knn_ivf")
    assert(!p.toLowerCase.contains("windowspecdefinition(neighbor_id"),
      "corpus-side window (assignment shuffle) reappeared:\n" + p)
    assert(!p.contains("partitionBy [neighbor_id"), p)
  }

  test("q69/q74 sampling: a single pruned, codegen'd filter — no shuffle") {
    for (name <- Seq("q69_hash_split", "q74_weighted_sample")) {
      val p = formatted(name)
      assert(!p.contains("Exchange"), s"$name shuffles for a row predicate:\n$p")
      assert(p.contains("codegen id"), p)
      val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
      assert(!readSchema.contains("text"),
        s"$name reads the text column it never uses: $readSchema")
    }
  }

  test("q75 curation: dedup window partitions by fingerprint, never global") {
    val p = formatted("q75_curation_pipeline")
    assert(p.contains("windowspecdefinition(fp#"), p)
    assert(!p.contains("windowspecdefinition(specifiedwindowframe"),
      "an unpartitioned (single-reducer) window appeared:\n" + p)
  }

  test("q73 packing: shard-partitioned window, not a global sort") {
    val p = formatted("q73_sequence_packing")
    assert(p.contains("windowspecdefinition(shard#"), p)
    assert(!p.contains("windowspecdefinition(specifiedwindowframe"), p)
  }

  test("q66 vocabulary: both aggregations combine map-side") {
    val p = formatted("q66_vocabulary")
    // distinct-count rewrites to two exchanges, each fed by partials
    assert("partial_count".r.findAllIn(p).size >= 2, p)
  }

  test("q81 stratified sample: window keys on the stratum, never global") {
    val p = formatted("q81_stratified_sample")
    assert(p.contains("windowspecdefinition(o_orderpriority#"), p)
  }

  test("q82 z-order: top-k by z-key is TakeOrdered, not a global sort") {
    // orderBy+limit must fuse — each map task forwards its local top
    // 100, never a full-sort exchange of the fact
    val p = formatted("q82_zorder_cluster")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("q83 unigram NLL: every aggregation combines map-side") {
    val p = formatted("q83_unigram_nll")
    assert("partial_count".r.findAllIn(p).size >= 2, p)
  }

  test("q85 rollup maintenance: merge shuffles state rows, fact scans " +
    "aggregate partially") {
    val p = formatted("q85_incremental_rollup")
    // each summarize side: partial aggregate before its exchange; the
    // final merge aggregates the union of state rows the same way
    assert("partial_count".r.findAllIn(p).size +
      "partial_sum".r.findAllIn(p).size >= 4, p)
  }

  test("q88 chunking: pure per-row explode — zero exchanges") {
    val p = formatted("q88_sliding_chunks")
    assert(p.contains("posexplode("), p)
    assert(!p.contains("Exchange"), "chunking must not shuffle:\n" + p)
  }

  test("q134 BPE accounting: pure per-row codegen pass — zero exchanges") {
    val p = formatted("q134_bpe_tokens")
    assert(!p.contains("Exchange"),
      "per-doc token accounting must not shuffle:\n" + p)
    assert(p.contains("graft_bpe_encode"), p)
  }

  test("q135 BPE packing: shard-partitioned window over per-row encode, " +
      "no global sort") {
    val p = formatted("q135_bpe_packing")
    assert(p.contains("graft_bpe_encode"), p)
    // the only exchange is the pack window's shard hash partitioning —
    // never a global (empty-key) window or a range sort
    assert(p.contains("hashpartitioning(shard#"), p)
    assert(!p.contains("rangepartitioning"), p)
    assert(!p.contains("SinglePartition"), "global window:\n" + p)
  }

  test("q89 epoch shuffle: sampled-bucket counter, ONE execution, " +
      "no single-reducer window") {
    val p = formatted("q89_epoch_shuffle")
    // r19: the auto counter's in-memory branch is the sampled-range
    // form — ONE hash exchange on the pre-sampled bucket id (the
    // RangePartitioner's plan-re-executing sampling pass is gone)
    assert(p.contains("hashpartitioning(__bk#"), p)
    assert(!p.contains("rangepartitioning"), p)
    // the in-partition numbering windows on the bucket id, never on
    // an empty (global) partition spec
    assert(p.contains("windowspecdefinition(__bk#"), p)
    assert(!p.contains("SinglePartition"), "global window:\n" + p)
  }

  test("q90 quality bins: window keys on the stratum, never global") {
    val p = formatted("q90_quality_bins")
    assert(p.contains("windowspecdefinition(source#"), p)
  }

  test("q92/q93 pipeline transforms: dimension joins broadcast") {
    val p = formatted("q93_pipeline_kanban")
    // instructions/steps/machines are dims against the kanban spine —
    // AQE or static planning must broadcast, not shuffle, all three
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!formatted("q92_pipeline_sales_contract").contains("Exchange"),
      "branch union + scalar transform must not shuffle")
  }

  test("q115 repeated spans: shuffle keys on the span hash, combines " +
      "map-side, and never carries the span text") {
    val p = formatted("q115_repeated_spans")
    // the dup-count aggregation exchanges on the 64-bit hash...
    assert(p.contains("hashpartitioning(span_hash"), p)
    // ...with a partial aggregate below it (map-side combine)
    assert(p.contains("partial_count(distinct"), p)
    // the gram STRING never reaches an exchange: every Exchange's
    // argument list is hash/id/pos columns only
    val exchanges = p.linesIterator.filter(_.contains("Arguments: hashpartitioning"))
    exchanges.foreach(l => assert(!l.contains("span#") || l.contains("span_hash"), l))
  }

  test("q117 temperature mixture: rates broadcast onto an unshuffled " +
      "corpus scan; only the domain-keyed count agg exchanges") {
    val p = formatted("q117_temperature_mixture")
    // the (domain, threshold) table joins as a broadcast, never a sort-
    // merge — the corpus side stays a filtered scan
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // corpus rows are never hash-partitioned: every shuffle keys on the
    // domain column (the counts side, bounded by domain cardinality)
    // (no codegen-id assert: the plan is AQE-wrapped now that it has
    // exchanges, and un-executed adaptive plans print no codegen ids)
    p.linesIterator.filter(_.contains("Arguments: hashpartitioning"))
      .foreach(l => assert(l.contains("lang"), l))
  }

  test("q119 KN bigram: every count aggregation combines map-side") {
    val p = formatted("q119_bigram_kn")
    // bigram counts, context totals, continuation counts, the type
    // total and the per-doc score each show a partial aggregate
    assert("partial_count".r.findAllIn(p).size >= 3, p)
    assert(p.contains("partial_sum"), p)
  }

  test("q125 DSIR: the B-row model joins broadcast, nothing sort-merges " +
      "on the bucket, and no global sort appears") {
    val p = formatted("q125_dsir_resample")
    // the λ model (≤ buckets rows) must reach the per-doc counts as a
    // broadcast — a bucket-keyed shuffle join here would shuffle the
    // corpus-proportional count table a second time
    assert(p.contains("BroadcastHashJoin"), p)
    p.linesIterator.filter(_.contains("SortMergeJoin"))
      .foreach(l => assert(!l.contains("bucket"), l))
    // selection is a per-row predicate against broadcast scalars: no
    // range partitioning and no global Sort ("true" = global in the
    // Sort node's argument list) anywhere in the plan
    assert(!p.contains("rangepartitioning"), p)
    p.linesIterator.filter(_.contains("Sort ["))
      .foreach(l => assert(!l.contains("], true,"), l))
    // both corpus-side aggregations combine map-side
    assert("partial_count".r.findAllIn(p).size +
      "partial_sum".r.findAllIn(p).size >= 2, p)
  }

  test("q126 near-dup coverage: LSH runs at the distinct-vector level " +
      "and no exchange ever carries the pair list") {
    val p = formatted("q126_neardup_coverage_lsh")
    // exact-duplicate collapse: the bucket self-join's input is gated
    // on id = gid (representatives only), so the join is distinct-
    // vector-sized — |group|² candidates per duplicate cluster never
    // exist. The gate shows up as the id = gid filter below the
    // (tbl, bucket) exchange.
    assert(p.contains("(id"), p)
    assert("= gid#\\d+L?\\)".r.findFirstIn(p).isDefined, p)
    // member-level facts fold through windows (group-id min over the
    // vector, running min/max over the group) — no pair aggregate
    assert("windowspecdefinition".r.findAllIn(p.toLowerCase).nonEmpty, p)
    // every exchange keys on the vector, the bucket join key, or the
    // group id — never on the (id_a, id_b) pair, which would make the
    // shuffle pair-proportional (O(n²) on a duplicate-heavy corpus)
    p.linesIterator.filter(_.contains("Arguments: hashpartitioning"))
      .foreach { l =>
        val pairKeyed = l.contains("partner#") || l.contains("cosine#")
        assert(!pairKeyed, l)
      }
    // and no distinct over raw pairs anywhere (min/max tolerate the
    // cross-table duplicates, so the plan needs no pair-keyed dedup)
    assert(!p.contains("partial_first(partner"), p)
  }

  test("q127 BM25: probe vocabulary, idf and probe terms all reach the " +
      "postings as broadcasts — nothing sort-merges on the term") {
    val p = formatted("q127_bm25_topk")
    // vocab gate + idf join + (q_id, term) join: three broadcast hash
    // joins keyed on the term; a term-keyed shuffle join would re-
    // exchange the corpus-proportional postings per join
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    p.linesIterator.filter(_.contains("SortMergeJoin"))
      .foreach(l => assert(!l.contains("term"), l))
    // postings tf and the (q,d) score sum both combine map-side
    assert(p.contains("partial_count"), p)
    assert(p.contains("partial_sum"), p)
    // no global sort: no rangepartitioning anywhere in the plan
    assert(!p.contains("rangepartitioning"), p)
    // top-k is the mergeable graft_topk aggregate, NOT a q_id window:
    // a window would shuffle every scored (q_id, doc_id) row to one
    // task per probe — one high-df probe term makes that task
    // corpus-sized. Map-side partials bound every task at k rows per
    // probe, so the only q_id-keyed exchange carries ≤ k·nPartitions
    // rows per probe.
    assert(p.contains("graft_topk"), p)
    assert(!p.toLowerCase.contains("windowspecdefinition"), p)
    assert(p.contains("ObjectHashAggregate"), p)
  }
}
