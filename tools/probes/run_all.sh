#!/bin/bash
# Per-round scale-regression ritual (VERDICT r12 ask 4, extended r13):
# run every probe sequentially on a QUIET host (concurrent load blurs
# the wall-time bands; the count/recall/exactness signals are immune)
# and record the figures in the round's SURVEY notes.
#
#   bash tools/probes/run_all.sh [logfile]
#
# Bands (r13, this host): see each probe's module docstring — the
# docstring is the band of record, updated whenever a code change
# legitimately moves a figure.
set -u
LOG="${1:-/tmp/probes_$(date +%Y%m%d_%H%M%S).log}"
cd "$(dirname "$0")/../.."
for p in timeline_probe probe_pointread partition_read_probe \
         partitioned_overwrite_probe incremental_read_probe \
         demux_scale_probe ann_scale_probe dedup100k_probe; do
  echo "=== $p ===" | tee -a "$LOG"
  python "tools/probes/$p.py" 2>/dev/null | grep -v "^\[Stage" | tee -a "$LOG"
done
echo "figures in $LOG"
