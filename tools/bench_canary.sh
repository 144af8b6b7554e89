#!/bin/sh
# Bench-stability canary: heaviest queries x10 in one session, assert no
# context death / monotone heap growth. See graft.BenchCanary.
cd "$(dirname "$0")/.." || exit 1
SPARK_GRAFT_CANARY_REPS="${SPARK_GRAFT_CANARY_REPS:-10}" \
  exec sbt -batch "runMain graft.BenchCanary $*"
