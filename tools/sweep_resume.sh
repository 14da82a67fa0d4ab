#!/bin/bash
# Resume the chunked sf0.1 sweep over the queries listed in $2 (one
# name per line), appending to $1. Same chunking/spill hygiene as
# tools/sweep_sf01.sh.
set -u
SF=/root/testdata/sf0.1
OUT=${1:-/root/repo/sweep_sf01.log}
LIST=${2:-/root/repo/.sweep_remaining.txt}
CHUNK=${3:-30}
mapfile -t ALL < "$LIST"
TOTAL=${#ALL[@]}
echo "resume: $TOTAL queries, chunks of $CHUNK" >> "$OUT"
for ((i = 0; i < TOTAL; i += CHUNK)); do
  chunk=("${ALL[@]:i:CHUNK}")
  echo "--- resume chunk $((i / CHUNK)) (${chunk[0]}..${chunk[$((${#chunk[@]} - 1))]})" >> "$OUT"
  SPARK_GRAFT_CPUS=16 timeout 3000 python /root/repo/tools/check_parity.py \
    --jobs 2 "$SF" "${chunk[@]}" 2>/dev/null \
    | grep -E "^(OK|FAIL|ROWS|[0-9]+ pass)" >> "$OUT"
  # DuckDB spill only, plus arcon scratch STALE >90min - deleting
  # live /tmp/arcon_* kills concurrent pytest/parity processes
  # (DuckDB aborts when its temp vanishes; tempfile.mkdir races)
  rm -rf /root/repo/.tmp /tmp/duckdb_* 2>/dev/null
  find /tmp -maxdepth 1 -name 'arcon_*' -mmin +90 -exec rm -rf {} + 2>/dev/null
done
echo "SWEEP DONE" >> "$OUT"
