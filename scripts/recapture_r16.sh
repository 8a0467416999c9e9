#!/bin/bash
# Round-16 closing recapture: all FIVE bench scales at final HEAD,
# sequentially so each capture gets the whole machine. Captures land in
# ROUND-STAMPED files (bench_*_r16.json) that nothing overwrites — the
# r11 provenance lesson: the driver's post-round bench clobbered the
# unstamped bench_metrics.json after COVERAGE.md quoted it. Writes a
# sentinel when finished; run detached (nohup) — the captures take
# ~60-100 min end to end.
set -e
cd /root/repo
rm -f target/RECAPTURE_DONE target/RECAPTURE_FAILED

# r16 trend subset (37 lines): r15's 32 plus the five r16
# registrations — docs_corpus_build_neardup (the near-dup-cluster
# corpus capstone, r15 verdict task 4), docs_source_greedy (bounded-k
# greedy max-coverage source selection, task 5),
# trades_projection_ingest (per-block aggregate projection maintained
# at ingest, task 6), docs_corpus_build_keepbest (quality-aware
# rep selection), and docs_source_overlap (pairwise source-overlap
# matrix). Per the r15 task-8 discipline, every query registered this
# round lands in the trend subset the same round.
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
docs_corpus_build_keepbest,docs_source_overlap"

run() {
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT="$2" \
    SPARK_GRAFT_BENCH_ONLY="$3" sbt -batch "runMain graft.Bench" \
    > "$4" 2>&1
}

# Explicit per-step failure handling: `set -e` is IGNORED inside any
# compound command on the left of `||`, so a
# `{ ...; touch DONE; } || touch FAILED` form never fires the FAILED
# sentinel — a failed capture falls through, later steps run against
# the broken build, and DONE is touched anyway.
fail() { touch target/RECAPTURE_FAILED; exit 1; }

# WRITE-TIME provenance refusal (r12 verdict task 7): the stamps make a
# later clobber of the unstamped files detectable at READ time, but the
# cheap fix is refusing to (re)generate the closing record when an
# unstamped capture is NEWER than the stamped one it shadows — that is
# exactly the r11 clobber scenario in flight. The check runs ONCE, at
# end-of-run (just before the DONE sentinel), so it catches a clobber
# that happened DURING this run; it is also the reason
# closing_record.py must only ever be run right after this script
# finishes. (r17 ADVICE fix: this comment previously claimed a
# before-capture invocation that never existed; the r17 script calls
# the guard at both points.)
provenance_guard() {
  for base in bench_metrics bench_scale10 bench_scale30 bench_scale100 \
              bench_scale300; do
    if [ -f "target/$base.json" ] && [ -f "target/${base}_r16.json" ] &&
       [ "target/$base.json" -nt "target/${base}_r16.json" ]; then
      echo "PROVENANCE DRIFT: target/$base.json is newer than its r16 stamp" \
           "— the driver (or a stray run) clobbered the unstamped file" \
           "after this round's capture; re-run this script before quoting" >&2
      fail
    fi
  done
}

# The scale corpora live under target/ and die with `sbt clean`;
# ScaleCorpus is deterministic (zero randomness), so regenerating a
# missing corpus reproduces the exact same rows — self-heal instead of
# capturing 120 PATH_NOT_FOUND errors per scale.
ensure() {
  # documents.parquet is a DIRECTORY (Spark output); test its _SUCCESS
  # marker — a bare `-f` on the dir is always false
  if [ ! -f "$1/documents.parquet/_SUCCESS" ]; then
    SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ScaleCorpus /root/testdata/sf0.1 $1 $2" \
      > "target/scalegen_$2.log" 2>&1 || fail
  fi
}
ensure target/scale10 10
ensure target/scale30 30
if [ -z "${SKIP_100X:-}" ]; then
  ensure target/scale100 100
fi
# 300× (r15 verdict task 3: the FULL trend subset at the fifth scale
# point — r15 measured only 13 structural lines there)
if [ -z "${SKIP_300X:-}" ]; then
  ensure target/scale300 300
fi

run /root/testdata/sf0.1 target/bench_metrics_r16.json "" target/bench_sf01_r16.log || fail
run target/scale10 target/bench_scale10_r16.json "" target/bench10_r16.log || fail
run target/scale30 target/bench_scale30_r16.json "" target/bench30_r16.log || fail
# 100×/300× run only the trend subset — the full registry there would
# burn an hour per rep. Skippable (SKIP_100X=1 / SKIP_300X=1) when a
# good capture already exists and must not be overwritten by a
# contended re-run.
if [ -z "${SKIP_100X:-}" ]; then
  run target/scale100 target/bench_scale100_r16.json "$TREND" target/bench100_r16.log || fail
  run target/scale100 target/bench_scale100b_r16.json "$TREND" target/bench100b_r16.log || fail
fi
if [ -z "${SKIP_300X:-}" ]; then
  run target/scale300 target/bench_scale300_r16.json "$TREND" target/bench300_r16.log || fail
fi
# a capture that "succeeded" but timed zero queries — or timed them
# all as throws — is a failure too: the blank-filter bug wrote a
# zero-query file while exiting 0, and Bench deliberately catches
# per-query NonFatal errors (recording them in n_failed) so a broken
# build exits 0 with garbage near-zero timings. Only the files this
# invocation actually (re)captured are gated: under SKIP_* the
# skipped files may legitimately predate this run or not exist.
CAPTURED="target/bench_metrics_r16.json target/bench_scale10_r16.json target/bench_scale30_r16.json"
if [ -z "${SKIP_100X:-}" ]; then
  CAPTURED="$CAPTURED target/bench_scale100_r16.json target/bench_scale100b_r16.json"
fi
if [ -z "${SKIP_300X:-}" ]; then
  CAPTURED="$CAPTURED target/bench_scale300_r16.json"
fi
for f in $CAPTURED; do
  python3 -c "
import json, sys
d = json.load(open('$f'))
sys.exit(0 if d['n_queries'] > 0 and d['n_failed'] == 0 else 1)" || fail
done
provenance_guard
touch target/RECAPTURE_DONE
