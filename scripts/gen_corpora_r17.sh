#!/bin/bash
# Round-17 corpus regeneration: the driver's clean wiped target/, so the
# deterministic ScaleCorpus recipe rebuilds every scale factor used by
# this round's captures — the four r16 factors plus the NEW 1000x point
# (r16 verdict task 6) and the many-sources corpora (tasks 2/7).
set -e
cd /root/repo
rm -f target/GEN_DONE target/GEN_FAILED
gen() {
  if [ ! -f "$1/documents.parquet/_SUCCESS" ]; then
    SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.ScaleCorpus /root/testdata/sf0.1 $1 $2 $3" \
      > "target/scalegen_r17_$(basename $1).log" 2>&1 || { touch target/GEN_FAILED; exit 1; }
  fi
}
gen target/scale10 10
gen target/scale30 30
gen target/scale100 100
gen target/scale300 300
gen target/scale100clean 100 clean
gen target/scale30manysrc 30 manysrc
gen target/scale100manysrc 100 manysrc
gen target/scale1000 1000
touch target/GEN_DONE
