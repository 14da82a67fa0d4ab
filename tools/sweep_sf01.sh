#!/bin/bash
# Chunked full-registry parity sweep at sf0.1 (10x driver scale).
#
# Why chunked: a single-process sweep at sf0.1 OOMs (concurrent
# million-row pandas collects in the compare step) and DuckDB's
# out-of-core oracle runs can spill tens of GB of temp files. Each
# chunk runs in a fresh process (memory resets) and spill dirs are
# swept between chunks.
set -u
SF=/root/testdata/sf0.1
OUT=${1:-/root/repo/sweep_sf01.log}
CHUNK=${2:-30}
: > "$OUT"
NAMES=$(python - <<'PY'
import sys; sys.path.insert(0, "/root/repo")
import __spark_entry__ as e
print("\n".join(e.queries().keys()))
PY
)
mapfile -t ALL <<< "$NAMES"
TOTAL=${#ALL[@]}
echo "sweep: $TOTAL queries, chunks of $CHUNK" >> "$OUT"
for ((i = 0; i < TOTAL; i += CHUNK)); do
  chunk=("${ALL[@]:i:CHUNK}")
  echo "--- chunk $((i / CHUNK)) (${chunk[0]}..${chunk[$((${#chunk[@]} - 1))]})" >> "$OUT"
  SPARK_GRAFT_CPUS=16 timeout 3000 python /root/repo/tools/check_parity.py \
    --jobs 2 "$SF" "${chunk[@]}" 2>/dev/null \
    | grep -E "^(OK|FAIL|ROWS|[0-9]+ pass)" >> "$OUT"
  # sweep DuckDB spill + stray scratch between chunks
  # DuckDB spill only, plus arcon scratch STALE >90min - deleting
  # live /tmp/arcon_* kills concurrent pytest/parity processes
  # (DuckDB aborts when its temp vanishes; tempfile.mkdir races)
  rm -rf /root/repo/.tmp /tmp/duckdb_* 2>/dev/null
  find /tmp -maxdepth 1 -name 'arcon_*' -mmin +90 -exec rm -rf {} + 2>/dev/null
done
echo "SWEEP DONE" >> "$OUT"
