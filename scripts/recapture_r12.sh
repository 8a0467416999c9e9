#!/bin/bash
# Round-12 closing recapture: all four bench scales at final HEAD,
# sequentially so each capture gets the whole machine. Captures land in
# ROUND-STAMPED files (bench_*_r12.json) that nothing overwrites — the
# r11 provenance lesson: the driver's post-round bench clobbered the
# unstamped bench_metrics.json after COVERAGE.md quoted it. Writes a
# sentinel when finished; run detached (nohup) — the captures take
# ~30-50 min end to end.
set -e
cd /root/repo
rm -f target/RECAPTURE_DONE target/RECAPTURE_FAILED

# r12 trend subset: docs_minhash_pairs is demoted (bench contrast via
# graft.Time, no longer Bench-runnable); trades_candles_streamed and
# docs_bpe_encode are the round's new registered lines. The perf pass
# added the lines it touched so the machine table covers them:
# docs_contamination (exact twin of the bloom line), the adaptive-LSH
# trio, and docs_normalized_dedup (the registry's former worst ratio).
TREND="docs_ngram_jaccard,docs_containment,docs_dedup_then_simhash,\
emb_ivf_streamed,emb_ivf_streamed_sql,docs_dup_clusters,\
docs_ingest_dedup_gate,docs_simhash_hamming,docs_span_dedup,\
docs_contamination_bloom,docs_contamination,docs_minhash_pairs_mv,\
emb_semantic_dedup_capped,events_seq_match,docs_lm_surprise,\
trades_price_quantiles,trades_hist_quantiles,trades_ttl_readback,\
trades_candles_streamed,docs_bpe_encode,emb_lsh_pairs,\
emb_knn_accuracy,emb_near_dup,docs_normalized_dedup"

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

# The scale corpora live under target/ and die with `sbt clean`;
# ScaleCorpus is deterministic (zero randomness), so regenerating a
# missing corpus reproduces the exact same rows — self-heal instead of
# capturing 120 PATH_NOT_FOUND errors per scale.
ensure() {
  # documents.parquet is a DIRECTORY (Spark output); test its _SUCCESS
  # marker — the old `-f` on the dir was always false, silently
  # regenerating every corpus on every invocation (~5 min/run wasted;
  # harmless only because ScaleCorpus is deterministic)
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

run /root/testdata/sf0.1 target/bench_metrics_r12.json "" target/bench_sf01_r12.log || fail
run target/scale10 target/bench_scale10_r12.json "" target/bench10_r12.log || fail
run target/scale30 target/bench_scale30_r12.json "" target/bench30_r12.log || fail
# 100× runs only the trend subset — the full registry at 100× would
# burn an hour per rep. Skippable (SKIP_100X=1) when a good capture
# already exists and must not be overwritten by a contended re-run.
if [ -z "${SKIP_100X:-}" ]; then
  run target/scale100 target/bench_scale100_r12.json "$TREND" target/bench100_r12.log || fail
fi
# a capture that "succeeded" but timed zero queries — or timed them
# all as throws — is a failure too: the blank-filter bug wrote a
# zero-query file while exiting 0, and Bench deliberately catches
# per-query NonFatal errors (recording them in n_failed) so a broken
# build exits 0 with garbage near-zero timings. Only the files this
# invocation actually (re)captured are gated: under SKIP_100X the
# scale100 file may legitimately predate this run or not exist.
CAPTURED="target/bench_metrics_r12.json target/bench_scale10_r12.json target/bench_scale30_r12.json"
if [ -z "${SKIP_100X:-}" ]; then
  CAPTURED="$CAPTURED target/bench_scale100_r12.json"
fi
for f in $CAPTURED; do
  python3 -c "
import json, sys
d = json.load(open('$f'))
sys.exit(0 if d['n_queries'] > 0 and d['n_failed'] == 0 else 1)" || fail
done
touch target/RECAPTURE_DONE
