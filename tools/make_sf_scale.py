"""Synthesize a larger scale factor from an existing testdata dir.

Usage:
    python tools/make_sf_scale.py SRC_DIR DEST_DIR FACTOR

Replicates the volume-bearing tables (events, documents, embeddings,
orders, customer) FACTOR times with deterministic per-replica
perturbation, and copies the rest (region nation supplier part
lineitem) unchanged. Used for the sf1 scaling-curve measurement
(MEASURE.md r8): /root/testdata tops out at sf0.1 and is read-only, so
scale evidence above that needs synthetic 10x data.

Perturbation design — the point is REALISTIC scaling, not copies:

- ids (doc_id, vec_id, event_id, user_id, o_orderkey, o_custkey,
  c_custkey) are offset by replica*STRIDE: key cardinality grows with
  volume, the way a real 10x corpus has ~10x users/documents, so
  per-key state and group counts scale instead of deepening.
- documents.text: replica 0 is verbatim; in replica r >= 1 every token
  gets the replica id appended ("fox" -> "fox7"). Within one replica
  the corpus's whole n-gram/shingle structure is IDENTICAL to the
  original (same duplicate rate, same cross-doc similarity), across
  replicas the shingle overlap is exactly zero — so the global
  duplicate-pair count grows linearly with the factor, the way a real
  10x corpus behaves. (A plain copy — or even a token SHUFFLE, which
  preserves enough trigram overlap on this vocabulary to collide in
  4-band MinHash, measured 1.08M pairs vs the expected ~10x — makes
  every document ~10 near-duplicates of itself and turns the pair
  space O(factor^2): that measures a data pathology, not the engine.)
  Token count per doc is unchanged; vocabulary grows with the factor
  (aggressive but directionally right per Heaps' law).
- embeddings.embedding: replica 0 verbatim; replicas >= 1 get
  norm-preserving Gaussian rotation noise (cos ~ 0.7 to the original),
  so cluster structure stays realistic but replicas are not mutual
  top-1 neighbors.
- events/orders keep their timestamp columns untouched: the hourly /
  daily window structure (what the window operators key on) is the
  same, there is just 10x more of it per bucket from 10x more users.

Everything is seeded by (replica, id) — byte-identical output on every
run, no wall-clock or global RNG state.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

STRIDE = 10_000_000
COPY_TABLES = ("region", "nation", "supplier", "part", "lineitem")


def _offset(tbl: pa.Table, cols: tuple[str, ...], r: int) -> pa.Table:
    for c in cols:
        if c in tbl.column_names:
            arr = pa.array(
                tbl.column(c).to_numpy(zero_copy_only=False) + r * STRIDE,
                type=tbl.schema.field(c).type,
            )
            tbl = tbl.set_column(tbl.column_names.index(c), tbl.schema.field(c), arr)
    return tbl


def _suffix_text(texts, r: int):
    # join token and replica id with U+00A7 — a character outside the
    # corpus tokenizer alphabet (queries split on whitespace; base
    # vocabulary is ascii words) — so a digit-suffixed base token
    # ('fox1') can never collide with a replica token ('fox'+'1'),
    # which would silently re-introduce the O(factor^2) cross-replica
    # pair pathology this tool exists to avoid (ADVICE r8).
    tag = "§" + str(r)
    return [" ".join(tok + tag for tok in t.split()) for t in texts]


def _perturb_embeddings(tbl: pa.Table, r: int) -> pa.Table:
    col = tbl.column("embedding").combine_chunks()
    mat = np.array(col.to_pylist(), dtype=np.float64)
    rng = np.random.default_rng((r << 20) ^ 0x5EED)
    noise = rng.standard_normal(mat.shape)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mixed = mat + 1.0 * norms * noise
    mixed *= norms / np.linalg.norm(mixed, axis=1, keepdims=True)
    arr = pa.array(
        [row.astype(np.float32) for row in mixed], type=tbl.schema.field("embedding").type
    )
    return tbl.set_column(
        tbl.column_names.index("embedding"), tbl.schema.field("embedding"), arr
    )


def _replicate(src: str, name: str, factor: int) -> pa.Table:
    base = pq.read_table(os.path.join(src, f"{name}.parquet"))
    reps = []
    for r in range(factor):
        t = base
        if name in ("documents",):
            t = _offset(t, ("doc_id",), r)
            if r > 0:
                texts = _suffix_text(base.column("text").to_pylist(), r)
                t = t.set_column(
                    t.column_names.index("text"),
                    t.schema.field("text"),
                    pa.array(texts, type=t.schema.field("text").type),
                )
                if "n_chars" in t.column_names:
                    t = t.set_column(
                        t.column_names.index("n_chars"),
                        t.schema.field("n_chars"),
                        pa.array(
                            [len(x) for x in texts],
                            type=t.schema.field("n_chars").type,
                        ),
                    )
        elif name == "embeddings":
            t = _offset(t, ("vec_id",), r)
            if r > 0:
                t = _perturb_embeddings(t, r)
        elif name == "events":
            t = _offset(t, ("event_id", "user_id"), r)
        elif name == "orders":
            t = _offset(t, ("o_orderkey", "o_custkey"), r)
        elif name == "customer":
            t = _offset(t, ("c_custkey",), r)
        reps.append(t)
    return pa.concat_tables(reps)


def main() -> int:
    src, dest, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dest, exist_ok=True)
    for name in COPY_TABLES:
        shutil.copyfile(
            os.path.join(src, f"{name}.parquet"), os.path.join(dest, f"{name}.parquet")
        )
        print(f"copied  {name}", flush=True)
    for name in ("customer", "orders", "events", "documents", "embeddings"):
        tbl = _replicate(src, name, factor)
        pq.write_table(tbl, os.path.join(dest, f"{name}.parquet"))
        print(f"scaled  {name}: {tbl.num_rows} rows", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
