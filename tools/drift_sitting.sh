#!/bin/bash
# Baseline-drift adjudication sitting (VERDICT r8 #2 / MEASURE.md's
# own anchor rule): the r8 same-host min-of-3 baseline read 1.15x the
# r7 pin (95.2 -> 108.7 s) while the anchor microbenchmarks stayed
# flat — flat anchors + moved floor means SUSPECT CODE, and the
# discriminating experiment is to bench r7 HEAD and current HEAD in
# ONE idle sitting: if both read the same, the r8 drift was host/session
# state after all (re-pin); if r7 HEAD reads ~95 s, bisect the diff
# (bench.py's stdout change and session confs are the first suspects).
#
# Usage: bash tools/drift_sitting.sh [r7_commit]
# Produces: bench_r7head_sitting.json, bench_r9head_sitting.json,
#           anchors printed before/after each bench.
set -u
R7=${1:-5f6a179}
REPO=/root/repo
WT=$REPO/.scratch/r7head

anchors() {
  echo "--- anchors ($1) ---"
  python3 - <<'EOF'
import time
import numpy as np
# int loop
t0=time.monotonic()
s=0
for i in range(20_000_000): s+=i
print(f"int-loop {time.monotonic()-t0:.2f} s")
# warm BLAS min-of-3
a=np.random.default_rng(0).standard_normal((2048,2048))
a@a  # warm
best=min((lambda t0=time.monotonic(): ((a@a), time.monotonic()-t0)[1])() for _ in range(3))
print(f"blas-2048 {best:.3f} s")
# 10 MB buffered read
import os, tempfile
p=tempfile.mktemp()
with open(p,'wb') as f: f.write(os.urandom(10*1024*1024))
t0=time.monotonic()
with open(p,'rb') as f: f.read()
print(f"read-10mb {time.monotonic()-t0:.3f} s")
os.unlink(p)
EOF
}

cd "$REPO"
if [ ! -d "$WT" ]; then
  git worktree add "$WT" "$R7" || exit 1
fi

anchors before

echo "=== bench @ r7 HEAD ($R7) ==="
( cd "$WT" && SPARK_GRAFT_BENCH_REPEATS=3 \
    SPARK_GRAFT_BENCH_OUT=$REPO/bench_r7head_sitting.json \
    timeout 3000 python bench.py ) 2>&1 | tail -2

anchors mid

echo "=== bench @ current HEAD ==="
SPARK_GRAFT_BENCH_REPEATS=3 \
  SPARK_GRAFT_BENCH_OUT=$REPO/bench_r9head_sitting.json \
  timeout 3000 python bench.py 2>&1 | tail -2

anchors after
echo "=== sitting complete ==="
