#!/bin/bash
# Round-17 closing recapture: all five r16 bench scales PLUS the new
# 1000x structural point (r16 verdict task 6), sequentially so each
# capture gets the whole machine. Captures land in ROUND-STAMPED files
# (bench_*_r17.json) that nothing overwrites — the r11 provenance
# lesson: the driver's post-round bench clobbered the unstamped
# bench_metrics.json after COVERAGE.md quoted it. Writes a sentinel
# when finished; run detached (nohup) — the captures take ~90-150 min
# end to end.
set -e
cd /root/repo
rm -f target/RECAPTURE_DONE target/RECAPTURE_FAILED

# r17 trend subset (38 lines): r16's 37 plus this round's registration
# docs_source_overlap_capped (document-frequency-capped overlap matrix)
# — per the task-8 discipline, every query registered this round lands
# in the trend subset the same round.
TREND="docs_ngram_jaccard,docs_containment,docs_dedup_then_simhash,\
emb_ivf_streamed,emb_ivf_streamed_sql,docs_dup_clusters,\
docs_ingest_dedup_gate,docs_simhash_hamming,docs_span_dedup,\
docs_contamination_bloom,docs_contamination,docs_minhash_pairs_mv,\
emb_semantic_dedup_capped,events_seq_match,docs_lm_surprise,\
trades_price_quantiles,trades_hist_quantiles,trades_ttl_readback,\
trades_candles_streamed,docs_bpe_encode,emb_lsh_pairs,\
emb_knn_accuracy,emb_near_dup,docs_normalized_dedup,\
joins_revenue_region_month,trades_gapfill_asof,trades_ingest_decode,\
media_frame_sample,joins_revenue_region_month_bucketed,docs_cluster_split,\
joins_top_suppliers_bucketed,docs_source_novelty,\
docs_corpus_build_neardup,docs_source_greedy,trades_projection_ingest,\
docs_corpus_build_keepbest,docs_source_overlap,docs_source_overlap_capped"

# 1000x structural subset (r16 verdict task 6): the spill-sensitive
# lines — both contamination twins, span dedup, the two task-1 fix
# targets, projection ingest, both bucketed joins, the decode wall,
# and the new capped overlap.
STRUCT="docs_contamination,docs_contamination_bloom,docs_span_dedup,\
docs_source_novelty,docs_lm_surprise,trades_projection_ingest,\
joins_revenue_region_month_bucketed,joins_top_suppliers_bucketed,\
trades_ingest_decode,docs_source_overlap_capped"

run() {
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT="$2" \
    SPARK_GRAFT_BENCH_ONLY="$3" sbt -batch "runMain graft.Bench" \
    > "$4" 2>&1
}

fail() { touch target/RECAPTURE_FAILED; exit 1; }

# WRITE-TIME provenance refusal (r12 verdict task 7): refuse when an
# unstamped capture is NEWER than the stamped one it shadows — the r11
# clobber scenario in flight. Called TWICE (r17, closing the r16 ADVICE
# comment/behavior gap): once before the captures — catching a stale
# stamped set about to be extended — and once at end-of-run, catching a
# clobber that happened during this run.
provenance_guard() {
  for base in bench_metrics bench_scale10 bench_scale30 bench_scale100 \
              bench_scale300 bench_scale1000; do
    if [ -f "target/$base.json" ] && [ -f "target/${base}_r17.json" ] &&
       [ "target/$base.json" -nt "target/${base}_r17.json" ]; then
      echo "PROVENANCE DRIFT: target/$base.json is newer than its r17 stamp" \
           "— the driver (or a stray run) clobbered the unstamped file" \
           "after this round's capture; re-run this script before quoting" >&2
      fail
    fi
  done
}
provenance_guard

# The scale corpora live under target/ and die with `sbt clean`;
# ScaleCorpus is deterministic, so regeneration reproduces the exact
# same rows — self-heal instead of capturing PATH_NOT_FOUND errors.
ensure() {
  if [ ! -f "$1/documents.parquet/_SUCCESS" ]; then
    SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ScaleCorpus /root/testdata/sf0.1 $1 $2" \
      > "target/scalegen_$2.log" 2>&1 || fail
  fi
}
ensure target/scale10 10
ensure target/scale30 30
if [ -z "${SKIP_100X:-}" ]; then ensure target/scale100 100; fi
if [ -z "${SKIP_300X:-}" ]; then ensure target/scale300 300; fi
if [ -z "${SKIP_1000X:-}" ]; then ensure target/scale1000 1000; fi

run /root/testdata/sf0.1 target/bench_metrics_r17.json "" target/bench_sf01_r17.log || fail
run target/scale10 target/bench_scale10_r17.json "" target/bench10_r17.log || fail
run target/scale30 target/bench_scale30_r17.json "" target/bench30_r17.log || fail
if [ -z "${SKIP_100X:-}" ]; then
  run target/scale100 target/bench_scale100_r17.json "$TREND" target/bench100_r17.log || fail
  run target/scale100 target/bench_scale100b_r17.json "$TREND" target/bench100b_r17.log || fail
fi
if [ -z "${SKIP_300X:-}" ]; then
  run target/scale300 target/bench_scale300_r17.json "$TREND" target/bench300_r17.log || fail
fi
# the 1000x point runs the structural subset at a single rep — each
# line is tens of seconds there; the medians-of-3 discipline would
# cost an extra hour for lines whose 1000x story is shape, not ulps
if [ -z "${SKIP_1000X:-}" ]; then
  SPARK_GRAFT_BENCH_REPS=1 SPARK_GRAFT_SF_DIR=target/scale1000 \
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT=target/bench_scale1000_r17.json \
    SPARK_GRAFT_BENCH_ONLY="$STRUCT" sbt -batch "runMain graft.Bench" \
    > target/bench1000_r17.log 2>&1 || fail
fi

CAPTURED="target/bench_metrics_r17.json target/bench_scale10_r17.json target/bench_scale30_r17.json"
if [ -z "${SKIP_100X:-}" ]; then
  CAPTURED="$CAPTURED target/bench_scale100_r17.json target/bench_scale100b_r17.json"
fi
if [ -z "${SKIP_300X:-}" ]; then
  CAPTURED="$CAPTURED target/bench_scale300_r17.json"
fi
if [ -z "${SKIP_1000X:-}" ]; then
  CAPTURED="$CAPTURED target/bench_scale1000_r17.json"
fi
for f in $CAPTURED; do
  python3 -c "
import json, sys
d = json.load(open('$f'))
sys.exit(0 if d['n_queries'] > 0 and d['n_failed'] == 0 else 1)" || fail
done
provenance_guard
touch target/RECAPTURE_DONE
