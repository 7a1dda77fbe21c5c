"""Per-data-file key Bloom filters for point-lookup file skipping.

MOR delta files are written UNCLUSTERED (the O(batch) append path never
shuffles, lake.py `_write_files(cluster=False)`), so each delta file spans
a wide key range and min/max range pruning can rarely skip it. Between
compactions a point lookup therefore opens every delta file even when the
looked-up keys live in none of them. A per-delta-file Bloom filter closes
that gap: no false negatives (a file holding key k always passes k's
probe, so winner reconstruction still sees ALL rows of k), and the filter
rides in the manifest entry next to the min/max stats it complements (the
Iceberg puffin / Parquet bloom-offset analog, rebuilt here at the
table-format layer where the manifest already travels).

Sizing: 20 bits/key with k=13 → per-key FPR ≈ 7e-5. The per-key rate must
be this low because a PROBE is a union over the whole lookup key list — a
file is read if ANY key might be in it, so a 100-key lookup passes a file
with probability ≈ 100×FPR (0.7% here; at the classic 10 bits/key it
would be ~50% and the filter would be decorative).

Build is a single narrow Spark job over just-written files — a scan of
the key column only, `mapInPandas` emitting one PARTIAL bitset per file
per partition (no shuffle; bitsets for the same file OR together on the
driver, O(#files) small rows). Bit indices are computed with vectorized
numpy double hashing; the per-key hash is one blake2b digest (C speed).

Probe is driver-side over the point-lookup key list (bounded by contract).

Compacted base files do NOT carry blooms: `compact()` range-clusters its
output, so min/max ranges are tight and disjoint and the bloom would be
redundant weight. The property is opt-in (`create(bloom_delta_keys=True)`)
— the default ingest path stays byte-identical with zero extra jobs.
"""

from __future__ import annotations

import base64
import hashlib
from typing import Iterable

import numpy as np

BITS_PER_KEY = 20
N_HASHES = 13
_MASK64 = 0xFFFFFFFFFFFFFFFF
# manifest-entry weight cap: 1 MiB of bits ≈ 420k keys at 20 bits/key.
# Files larger than that get a degraded (higher-FPR) bloom rather than an
# unbounded manifest entry — at cluster scale the bitset would move to a
# side file (puffin-style); the cap documents that boundary.
MAX_BITS = 8 * 1024 * 1024


def bloom_m_bits(n_rows: int) -> int:
    """Bitset size for ``n_rows`` keys, 64-bit aligned, capped."""
    return int(min(MAX_BITS, max(1024, ((n_rows * BITS_PER_KEY + 63) // 64) * 64)))


def _key_hash_pair(key) -> tuple[int, int]:
    """(h1, h2) double-hashing pair from one blake2b digest. Keys hash via
    their canonical string form so build and probe agree for the str/int
    key types the manifest stats support. h2 is forced odd so the k probe
    indices never collapse onto one slot."""
    d = hashlib.blake2b(str(key).encode(), digest_size=16).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little") | 1


def _hash_arrays(keys: Iterable) -> tuple[np.ndarray, np.ndarray]:
    pairs = [_key_hash_pair(k) for k in keys]
    if not pairs:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    arr = np.array(pairs, dtype=np.uint64)
    return arr[:, 0], arr[:, 1]


def _set_bits(bits: np.ndarray, h1: np.ndarray, h2: np.ndarray, m: int) -> None:
    """Vectorized double hashing: idx_i = (h1 + i·h2) mod 2^64 mod m —
    uint64 arithmetic wraps mod 2^64 naturally; the scalar probe applies
    the same wrap explicitly so build and probe always agree."""
    i = np.arange(N_HASHES, dtype=np.uint64)
    idx = ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).ravel()
    np.bitwise_or.at(bits, (idx >> 3).astype(np.int64), (1 << (idx & 7)).astype(np.uint8))


def build_bloom(keys: Iterable, n_rows: int) -> dict:
    """Bitset over ``keys`` → manifest-entry field ``{m, k, bits(b64)}``."""
    m = bloom_m_bits(n_rows)
    bits = np.zeros(m // 8, dtype=np.uint8)
    h1, h2 = _hash_arrays(keys)
    _set_bits(bits, h1, h2, m)
    return {"m": m, "k": N_HASHES, "bits": base64.b64encode(bits.tobytes()).decode()}


def might_contain(bloom: dict, hash_pair: tuple[int, int], _bits: bytes | None = None) -> bool:
    """Probe with a pair from :func:`_key_hash_pair`. No false negatives."""
    m, k = bloom["m"], bloom["k"]
    bits = base64.b64decode(bloom["bits"]) if _bits is None else _bits
    h1, h2 = hash_pair
    for i in range(k):
        idx = ((h1 + i * h2) & _MASK64) % m
        if not (bits[idx >> 3] >> (idx & 7)) & 1:
            return False
    return True


def probe_entries(entries: list[dict], keys: list) -> list[dict]:
    """Keep only files whose bloom admits at least one wanted key; files
    without a bloom always survive (range stats are their only pruning).
    Hash each key once, decode each bitset once."""
    pairs = [_key_hash_pair(k) for k in keys]
    out = []
    for e in entries:
        bloom = e.get("bloom")
        if bloom is None:
            out.append(e)
            continue
        bits = base64.b64decode(bloom["bits"])
        if any(might_contain(bloom, p, bits) for p in pairs):
            out.append(e)
    return out


def attach_blooms(spark, data_dir: str, entries: list[dict], key_col: str) -> list[dict]:
    """Return ``entries`` with a ``bloom`` field per file, built by ONE
    narrow no-shuffle Spark job over the listed files (key column only;
    ``mapInPandas`` emits a partial bitset per file per partition — a file
    split across partitions contributes several partials that OR together
    on the driver, O(#files × #splits-per-file) small rows)."""
    if not entries:
        return entries
    import os

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    m_by_name = {e["path"]: bloom_m_bits(e["rows"]) for e in entries}
    paths = [os.path.join(data_dir, e["path"]) for e in entries]

    def _partials(batches):
        acc: dict[str, np.ndarray] = {}
        for pdf in batches:
            for fname, grp in pdf.groupby("_file", sort=False):
                name = os.path.basename(str(fname))
                m = m_by_name.get(name)
                if m is None:
                    continue
                bits = acc.get(name)
                if bits is None:
                    bits = acc[name] = np.zeros(m // 8, dtype=np.uint8)
                h1, h2 = _hash_arrays(grp[key_col])
                _set_bits(bits, h1, h2, m)
        yield pd.DataFrame(
            {
                "name": list(acc),
                "bits": [base64.b64encode(b.tobytes()).decode() for b in acc.values()],
            }
        )

    result = (
        spark.read.parquet(*paths)
        .select(F.input_file_name().alias("_file"), F.col(key_col))
        .mapInPandas(
            _partials,
            T.StructType(
                [T.StructField("name", T.StringType()), T.StructField("bits", T.StringType())]
            ),
        )
        .collect()
    )
    merged: dict[str, np.ndarray] = {}
    for r in result:
        part = np.frombuffer(base64.b64decode(r["bits"]), dtype=np.uint8)
        if r["name"] in merged:
            merged[r["name"]] = merged[r["name"]] | part
        else:
            merged[r["name"]] = part
    out = []
    for e in entries:
        bits = merged.get(e["path"])
        if bits is None:
            out.append(e)  # file produced no rows in the scan: leave unpruned
            continue
        out.append(
            {
                **e,
                "bloom": {
                    "m": m_by_name[e["path"]],
                    "k": N_HASHES,
                    "bits": base64.b64encode(bits.tobytes()).decode(),
                },
            }
        )
    return out
