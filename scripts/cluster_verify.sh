#!/usr/bin/env bash
# The r12 standing gate: the FULL oracle harness across REAL executor JVMs.
#
# Runs graft.Verify under local-cluster[2,8,3072] (two executor processes —
# closure serialization, broadcasts, and codegen classloaders all cross JVM
# boundaries, unlike local[*]), then replays every oracle_sql row in DuckDB
# and compares (scripts/local_verify.py — the driver's compare, locally).
#
# Usage: scripts/cluster_verify.sh [sfDir] [outDir]
set -euo pipefail
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-/tmp/graft_cluster_verify}"
cd "$(dirname "$0")/.."
rm -rf "$OUT_DIR"
export SPARK_HOME=/opt/spark
export SPARK_SCALA_VERSION=2.13
export SPARK_GRAFT_MASTER='local-cluster[2,8,3072]'
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"
python3 scripts/local_verify.py "$SF_DIR" "$OUT_DIR"
