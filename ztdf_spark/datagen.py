"""Deterministic synthetic data generators (seeded, no wall-clock, no
external data) for the binlog CDC input and the tokens base table.

Shapes per BASELINE.json ``input_hint`` and FIXTURES.md:

- tokens table: (doc_id string, tokens array<int32>, n_tok int32, source string)
- binlog:       (lsn int64, op I/U/D, doc_id, tokens, n_tok, source,
                 kas_url?, tdf_attribute?, assertions?)

Hot-key skew: ~1% of doc ids receive ~100× the update traffic
(FIXTURES.md §1), exercising the salted/partial-agg MERGE path.

Generation is pure numpy/pyarrow on the driver — writing N part files lets
the Structured Streaming file source tail them as micro-batches, and gives
the bench ≥4×cores input splits so both parallelism levels are
parallelism-bound (BASELINE.md measurement protocol).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CANON_ATTR = "https://opentdf.io/attr/intellectualproperty/value/tradesecret"
SECOND_ATTR = "https://opentdf.io/attr/intellectualproperty/value/confidential"
OVERRIDE_KAS = "https://kas2.example.com"
CANON_ASSERTION = json.dumps(
    [
        {
            "id": "1111",
            "type": "handling",
            "scope": "payload",
            "appliesToState": "unencrypted",
            "statement": {"value": "a test assertion", "format": "sample"},
        }
    ]
)

SOURCES = np.array(["web", "books", "code", "wiki"])

BINLOG_ARROW_SCHEMA = pa.schema(
    [
        ("lsn", pa.int64()),
        ("op", pa.string()),
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
        ("kas_url", pa.string()),
        ("tdf_attribute", pa.string()),
        ("assertions", pa.string()),
    ]
)

BINLOG_DDL = (
    "lsn long, op string, doc_id string, tokens array<int>, n_tok int, "
    "source string, kas_url string, tdf_attribute string, assertions string"
)


@dataclass(frozen=True)
class BinlogSpec:
    n_events: int = 10_000
    n_docs: int = 1_000
    n_files: int = 8
    seed: int = 42
    hot_frac: float = 0.01
    hot_weight: float = 100.0
    token_len_lo: int = 8
    token_len_hi: int = 64
    p_insert: float = 0.30
    p_update: float = 0.60
    p_delete: float = 0.10
    frac_attr_null: float = 0.02
    frac_kas_override: float = 0.10
    frac_two_attrs: float = 0.10
    frac_assertions: float = 0.05


def _doc_sampler(spec: BinlogSpec, rng: np.random.Generator):
    """Skewed doc-id distribution: hot ids get hot_weight× probability."""
    w = np.ones(spec.n_docs)
    n_hot = max(1, int(spec.n_docs * spec.hot_frac))
    w[:n_hot] = spec.hot_weight
    p = w / w.sum()
    return lambda n: rng.choice(spec.n_docs, size=n, p=p)


def _chunk_table(spec: BinlogSpec, rng: np.random.Generator, lsn_start: int, n: int) -> pa.Table:
    lsn = np.arange(lsn_start, lsn_start + n, dtype=np.int64)
    doc_idx = _doc_sampler(spec, rng)(n)
    doc_id = np.char.add("doc-", np.char.zfill(doc_idx.astype("U8"), 8))
    op = rng.choice(np.array(["I", "U", "D"]), size=n, p=[spec.p_insert, spec.p_update, spec.p_delete])
    is_del = op == "D"

    lens = rng.integers(spec.token_len_lo, spec.token_len_hi + 1, size=n).astype(np.int32)
    lens[is_del] = 0
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    values = rng.integers(0, 50257, size=int(offsets[-1]), dtype=np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(values))

    n_tok = lens.copy()
    source = SOURCES[rng.integers(0, len(SOURCES), size=n)]

    r_attr = rng.random(n)
    attrs = np.where(
        r_attr < spec.frac_attr_null,
        None,
        np.where(r_attr < spec.frac_attr_null + spec.frac_two_attrs, CANON_ATTR + "," + SECOND_ATTR, CANON_ATTR),
    )
    kas = np.where(rng.random(n) < spec.frac_kas_override, OVERRIDE_KAS, None)
    asserts = np.where(rng.random(n) < spec.frac_assertions, CANON_ASSERTION, None)

    # deletes / null-markers as pyarrow arrays with proper nulls
    def _opt_str(arr):
        return pa.array([x if x is not None else None for x in arr], type=pa.string())

    return pa.Table.from_arrays(
        [
            pa.array(lsn),
            pa.array(op),
            pa.array(doc_id),
            tokens,
            pa.array(np.where(is_del, None, n_tok), type=pa.int32()),
            pa.array(np.where(is_del, None, source), type=pa.string()),
            _opt_str(kas),
            _opt_str(np.where(is_del, None, attrs)),
            _opt_str(np.where(is_del, None, asserts)),
        ],
        schema=BINLOG_ARROW_SCHEMA,
    )


def write_binlog(out_dir: str, spec: BinlogSpec = BinlogSpec()) -> list[str]:
    """Write the seeded binlog as ``n_files`` ordered parquet part files.

    File i holds the contiguous LSN range [i*chunk, ...) — the on-disk analog
    of a WAL segment directory that the streaming source tails. Idempotent
    for a given (out_dir, spec): files are rewritten byte-identically.
    """
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per = spec.n_events // spec.n_files
    for i in range(spec.n_files):
        n = per if i < spec.n_files - 1 else spec.n_events - per * (spec.n_files - 1)
        rng = np.random.default_rng(spec.seed + 1000 * i)  # per-file stream: parallel-friendly
        tbl = _chunk_table(spec, rng, lsn_start=i * per, n=n)
        path = os.path.join(out_dir, f"binlog-{i:05d}.parquet")
        pq.write_table(tbl, path)
        paths.append(path)
    return paths


def expected_final_state(out_dir: str) -> "pd.DataFrame":
    """Brute-force replay oracle in pandas (FIXTURES.md §5): for each doc_id
    the row with max(lsn) among all ops; absent if that op is 'D' or if the
    row would have been routed to failure (no data attributes) — failure rows
    never reach the MERGE (reference failure relationship,
    AbstractTDFProcessor.java:100-103)."""
    import pandas as pd

    frames = []
    for f in sorted(os.listdir(out_dir)):
        if f.endswith(".parquet"):
            frames.append(pq.read_table(os.path.join(out_dir, f)).to_pandas())
    log = pd.concat(frames, ignore_index=True)
    # failure-routed rows (no attrs on a change event) are dropped pre-merge
    ok = log[(log.op == "D") | log.tdf_attribute.notna()]
    last = ok.sort_values("lsn").groupby("doc_id").tail(1)
    return last[last.op != "D"].reset_index(drop=True)


def tokens_table_for_documents(doc_ids: "np.ndarray", seed: int = 42) -> pa.Table:
    """Deterministic token arrays keyed on doc_id (for the flagship demo
    joining /root/testdata documents with generated token payloads)."""
    n = len(doc_ids)
    rng = np.random.default_rng(seed)
    lens = rng.integers(8, 64, size=n).astype(np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    values = rng.integers(0, 50257, size=int(offsets[-1]), dtype=np.int32)
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(values))
    return pa.Table.from_arrays(
        [pa.array([f"doc-{int(d):08d}" for d in doc_ids]), tokens, pa.array(lens)],
        names=["doc_id", "tokens", "n_tok"],
    )
