#!/usr/bin/env bash
# Pinned-binary bench control (VERDICT r13 item 4 / r14 item 8): re-time a
# PREVIOUS round's exact code on TODAY'S box, so a gate re-measurement
# ships with a same-moment control number instead of blaming code for box
# weather. The same-code replay has been the decisive adjudicator twice
# (r13 q_stream_neardup, r14 q_image_resize).
#
# Usage: tools/bench_control.sh <commit> [SF_DIR [query ...]]
#   <commit>   the pinned driver commit to rebuild (e.g. last round's)
#   SF_DIR     fixture dir (default /root/testdata/sf0.1)
#   query ...  TimeQ query names; with none, runs the full graft.Bench
#
# The worktree build is cached per commit under tmp/ctl_<commit> — a
# repeated control run skips the rebuild.
set -euo pipefail
cd "$(dirname "$0")/.."

COMMIT="${1:?usage: bench_control.sh <commit> [SF_DIR [query ...]]}"
SF_DIR="${2:-/root/testdata/sf0.1}"
shift || true; shift || true
QUERIES=("$@")

SHORT=$(git rev-parse --short "$COMMIT")
WT="tmp/ctl_$SHORT"

if [ ! -d "$WT" ]; then
  git worktree add --detach "$WT" "$COMMIT"
fi
cd "$WT"

echo "[bench_control] commit $SHORT on $(date -u +%FT%TZ), sf=$SF_DIR" >&2
if [ ${#QUERIES[@]} -eq 0 ]; then
  SPARK_GRAFT_SF_DIR="$SF_DIR" sbt -batch "runMain graft.Bench"
else
  sbt -batch "runMain graft.TimeQ $SF_DIR ${QUERIES[*]}"
fi
