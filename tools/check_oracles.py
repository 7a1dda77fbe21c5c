"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries()[name] on Spark and its oracle_sql()[name] on
DuckDB over the same sf dir; compare row count, column names, and an
order-insensitive value multiset. Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df_pandas):
    import numpy as np

    cols = sorted(df_pandas.columns)
    rows = []
    for t in df_pandas[cols].itertuples(index=False, name=None):
        row = []
        for v in t:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                row.append("NULL")
            elif isinstance(v, (list, tuple, np.ndarray)):
                row.append("[" + ",".join(str(x) for x in v) + "]")
            elif isinstance(v, (float, np.floating)):
                row.append(f"{float(v):.9g}")
            elif isinstance(v, (np.integer,)):
                row.append(str(int(v)))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return cols, sorted(rows)


# ---------------------------------------------------------------------------
# Independent pandas/numpy oracles for rows-only (non-SQL-expressible)
# queries: the algorithm is RE-IMPLEMENTED here from its spec (same seeds,
# same hash constructions) without touching the Spark execution path, so a
# Spark-side wiring bug (banding slice off-by-one, wrong column order,
# dropped dedup) fails the value comparison even though DuckDB can't
# express the op.
# ---------------------------------------------------------------------------


def _docs_pdf(sf_dir):
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()


def _py_bpe_train(sf_dir, n_merges=16, sample_docs=10_000, seed=42):
    """Independent BPE trainer: collections.Counter over the same
    layout-invariant md5 doc sample, same (count desc, pair asc) winner
    order — none of bpeops' Spark machinery."""
    import hashlib
    from collections import Counter

    d = _docs_pdf(sf_dir)
    n = len(d)
    frac = min(1.0, (sample_docs * 1.5) / max(1, n))
    thr = "g" if frac >= 1.0 else format(int(frac * (1 << 32)), "08x")
    keyed = sorted(
        (hashlib.md5(f"bpe{seed}-{int(i)}".encode()).hexdigest()[:8], int(i), t)
        for i, t in zip(d["doc_id"], d["text"])
    )
    texts = [t for h, _i, t in keyed if h < thr][:sample_docs]
    wf = Counter()
    for t in texts:
        for w in str(t).lower().split(" "):
            if w:
                wf[w] += 1
    syms = {w: list(w) + ["</w>"] for w in wf}
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for w, f in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((rank, left, right, left + right))
        for w in syms:
            out = []
            for s in syms[w]:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            syms[w] = out
    return merges


def _pandas_bpe_train(sf_dir):
    import pandas as pd

    m = _py_bpe_train(sf_dir)
    return pd.DataFrame(m, columns=["rank", "left", "right", "token"]).astype(
        {"rank": "int64"}
    )


def _pandas_bpe_encode(sf_dir):
    import hashlib

    import pandas as pd

    merges = _py_bpe_train(sf_dir)
    d = _docs_pdf(sf_dir)
    memo: dict = {}

    def tok(word):
        got = memo.get(word)
        if got is None:
            syms = list(word) + ["</w>"]
            for _r, left, right, _t in merges:
                out = []
                for s in syms:
                    if out and out[-1] == left and s == right:
                        out[-1] = left + right
                    else:
                        out.append(s)
                syms = out
            got = memo[word] = syms
        return got

    recs = []
    for i, t in zip(d["doc_id"], d["text"]):
        toks = []
        for w in str(t).lower().split(" "):
            if w:
                toks.extend(tok(w))
        recs.append((int(i), len(toks), hashlib.md5(" ".join(toks).encode()).hexdigest()))
    return pd.DataFrame(recs, columns=["doc_id", "n_tokens", "tokens_md5"]).astype(
        {"doc_id": "int64", "n_tokens": "int64"}
    )


def _emb_matrix(sf_dir):
    """(ids, float64 matrix) sorted by vec_id."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas().sort_values("vec_id")
    M = np.stack(t["embedding"].map(lambda v: np.asarray(v, dtype="float64")).to_numpy())
    return t["vec_id"].to_numpy(), M


def _hyperplane_sigs(M, dim, n_planes, n_tables, seed, multiprobe):
    """Banded random-hyperplane probe ids, same construction as
    simops._lsh_probes_udf (same rng seed/order): (table << 32) | bucket,
    plus every 1-bit-flip bucket when multiprobe=1. Returns (n, P) int64."""
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal((dim, n_tables * n_planes))
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    bits = (M @ planes) > 0
    bits = bits.reshape(len(M), n_tables, n_planes)
    base = bits @ weights
    tcode = (np.arange(n_tables, dtype=np.int64) << 32)[None, :]
    out = base + tcode
    if multiprobe:
        flips = base[:, :, None] ^ weights[None, None, :]
        out = np.concatenate([out[:, :, None], flips + tcode[:, :, None]], axis=2).reshape(len(M), -1)
    return out.astype(np.int64)


def _topk_cos(qids, qm, cand_ids_per_q, M, ids_index, k):
    """Exact-cosine rerank + top-k under the (cos desc, id asc) total order;
    returns rows (query_id, neighbor_id, cos, rank)."""
    import numpy as np

    recs = []
    for qi, qid in enumerate(qids):
        cids = np.array(sorted(cand_ids_per_q.get(int(qid), ())), dtype=np.int64)
        if not len(cids):
            continue
        cm = M[[ids_index[c] for c in cids]]
        cos = (cm @ qm[qi]) / (np.linalg.norm(cm, axis=1) * np.linalg.norm(qm[qi]))
        order = np.lexsort((cids, -cos))[:k]
        for r, j in enumerate(order, 1):
            recs.append((int(qid), int(cids[j]), float(cos[j]), r))
    return recs


def _ann_frame(recs):
    import pandas as pd

    df = pd.DataFrame(recs, columns=["query_id", "neighbor_id", "cos", "rank"])
    return df.astype({"query_id": "int64", "neighbor_id": "int64", "rank": "int64"})


def _pandas_ann_lsh(sf_dir, n_queries=10, k=5, n_planes=8, n_tables=8, seed=42, dim=64):
    """Oracle for q_ann_lsh: multi-table hyperplane buckets, query-side
    1-bit multiprobe widening, exact-cosine rerank, top-k."""
    import numpy as np

    ids, M = _emb_matrix(sf_dir)
    qmask = ids < n_queries
    qids, qm = ids[qmask], M[qmask]
    cids, cm = ids[~qmask], M[~qmask]
    csig = _hyperplane_sigs(cm, dim, n_planes, n_tables, seed, multiprobe=0)
    qsig = _hyperplane_sigs(qm, dim, n_planes, n_tables, seed, multiprobe=1)
    buckets: dict = {}
    for i, cid in enumerate(cids):
        for p in csig[i]:
            buckets.setdefault(int(p), []).append(int(cid))
    cand: dict = {}
    for qi, qid in enumerate(qids):
        s = set()
        for p in set(int(x) for x in qsig[qi]):
            s.update(buckets.get(p, ()))
        cand[int(qid)] = s
    ids_index = {int(v): i for i, v in enumerate(ids)}
    return _ann_frame(_topk_cos(qids, qm, cand, M, ids_index, k))


def _md5_sample(ids, M, prefix, train_sample=10_000):
    """Layout-invariant bounded training sample, same construction as
    simops: md5(prefix + str(id))[:8] threshold + (hash, id) total-order
    cap. Returns the sample matrix in (hash, id) order."""
    import hashlib

    import numpy as np

    n = len(ids)
    frac = min(1.0, (train_sample * 1.5) / max(1, n))
    thr = "g" if frac >= 1.0 else format(int(frac * (1 << 32)), "08x")
    keyed = sorted(
        (hashlib.md5(f"{prefix}{int(v)}".encode()).hexdigest()[:8], int(v), i)
        for i, v in enumerate(ids)
    )
    keep = [i for h, v, i in keyed if h < thr][:train_sample]
    return M[keep]


def _pandas_ann_ivf(sf_dir, n_queries=10, k=5, n_cells=16, n_probe=3, seed=42,
                    train_sample=10_000, iters=5):
    """Oracle for q_ann_ivf: seeded spherical k-means on the md5-sample,
    nearest-cell assignment, n_probe query cells, exact rerank."""
    import numpy as np

    ids, M = _emb_matrix(sf_dir)
    qmask = ids < n_queries
    qids, qm = ids[qmask], M[qmask]
    cids, cm = ids[~qmask], M[~qmask]
    sample = _md5_sample(cids, cm, f"ivf{seed}-", train_sample)
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)]
    for _ in range(iters):
        cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(sample @ cn.T, axis=1)
        for j in range(len(cent)):
            m = sample[assign == j]
            if len(m):
                cent[j] = m.mean(axis=0)
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    c_cell = np.argsort(-(cm @ cent.T), axis=1)[:, 0]
    q_cells = np.argsort(-(qm @ cent.T), axis=1)[:, :n_probe]
    cell_members: dict = {}
    for i, cid in enumerate(cids):
        cell_members.setdefault(int(c_cell[i]), []).append(int(cid))
    cand = {
        int(qid): {m for c in q_cells[qi] for m in cell_members.get(int(c), ())}
        for qi, qid in enumerate(qids)
    }
    ids_index = {int(v): i for i, v in enumerate(ids)}
    return _ann_frame(_topk_cos(qids, qm, cand, M, ids_index, k))


def _pandas_semdedup(sf_dir, n_cells=16, threshold=0.95, seed=42, train_sample=10_000, iters=5):
    """Oracle for q_dedup_semantic: rebuild the duplicated population
    (md5-selected rolled copies at vec_id+10^7), seeded spherical
    k-means on the md5-sample, nearest-cell assignment, per-cell greedy
    prune in ascending centroid-similarity order — all in flat numpy,
    structured nothing like the engine's Arrow-batch UDF + applyInPandas
    split (values must still agree exactly)."""
    import hashlib

    import numpy as np
    import pandas as pd

    ids, M = _emb_matrix(sf_dir)
    sel = [
        i for i, v in enumerate(ids)
        if hashlib.md5(f"dup-{int(v)}".encode()).hexdigest()[0] in "0123"
    ]
    all_ids = np.concatenate([ids, ids[sel] + 10_000_000]).astype(np.int64)
    A = np.vstack([M, M[sel] + 0.05 * np.roll(M[sel], 1, axis=1)])
    sample = _md5_sample(all_ids, A, f"sem{seed}-", train_sample)
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), size=min(n_cells, len(sample)), replace=False)]
    for _ in range(iters):
        cn = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(sample @ cn.T, axis=1)
        for j in range(len(cent)):
            m = sample[assign == j]
            if len(m):
                cent[j] = m.mean(axis=0)
    cent = cent / np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    cells = np.argmax(A @ cent.T, axis=1)
    recs = []
    for cell in np.unique(cells):
        mask = cells == cell
        cids = all_ids[mask]
        Mn = A[mask]
        Mn = Mn / np.maximum(np.linalg.norm(Mn, axis=1, keepdims=True), 1e-12)
        sim_c = Mn @ cent[cell]
        S = Mn @ Mn.T
        order = np.lexsort((cids, sim_c))
        keep = np.zeros(len(cids), dtype=bool)
        dup_of = np.full(len(cids), -1, dtype=np.int64)
        kept: list = []
        for idx in order:
            if kept:
                sims = S[idx, kept]
                j = int(np.argmax(sims))
                if sims[j] >= threshold:
                    dup_of[idx] = cids[kept[j]]
                    continue
            keep[idx] = True
            kept.append(int(idx))
        for i2 in range(len(cids)):
            recs.append((int(cids[i2]), int(cell), int(np.floor(sim_c[i2] * 1_000_000)),
                         bool(keep[i2]), int(dup_of[i2])))
    return pd.DataFrame(recs, columns=["vec_id", "cell", "centroid_sim_q", "keep", "dup_of"])


def _pandas_ann_pq(sf_dir, n_queries=10, k=5, m=8, n_codes=16, seed=42,
                   train_sample=10_000, iters=8, rerank_factor=3):
    """Oracle for q_ann_pq: per-subspace k-means codebooks on the
    md5-sample, candidate encoding, ADC table-gather scores, global top
    rerank_factor*k under (score desc, id asc), exact-cosine top-k."""
    import numpy as np

    ids, M = _emb_matrix(sf_dir)
    qmask = ids < n_queries
    qids, qm = ids[qmask], M[qmask]
    cids, cm = ids[~qmask], M[~qmask]
    sample = _md5_sample(cids, cm, f"pq{seed}-", train_sample)
    dim = sample.shape[1]
    sub = dim // m
    rng = np.random.default_rng(seed)
    books = np.zeros((m, n_codes, sub))
    for j in range(m):
        sj = sample[:, j * sub : (j + 1) * sub]
        cent = sj[rng.choice(len(sj), size=min(n_codes, len(sj)), replace=False)].copy()
        for _ in range(iters):
            d2 = ((sj[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                pts = sj[assign == c]
                if len(pts):
                    cent[c] = pts.mean(axis=0)
        books[j, : len(cent)] = cent
    codes = np.empty((len(cids), m), dtype=np.int64)
    for j in range(m):
        xj = cm[:, j * sub : (j + 1) * sub]
        d2 = ((xj[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    qtab = np.einsum("qjs,jcs->qjc", qm.reshape(len(qids), m, sub), books)
    scores = np.zeros((len(qids), len(cids)))
    for j in range(m):
        scores += qtab[:, j, :][:, codes[:, j]]
    top_r = rerank_factor * k
    cand = {}
    for qi, qid in enumerate(qids):
        sel = np.lexsort((cids, -scores[qi]))[: min(top_r, len(cids))]
        cand[int(qid)] = {int(cids[j]) for j in sel}
    ids_index = {int(v): i for i, v in enumerate(ids)}
    return _ann_frame(_topk_cos(qids, qm, cand, M, ids_index, k))


def _pandas_emb_near_dup_lsh(sf_dir, min_cos=0.45, n_planes=8, n_tables=16, seed=42, dim=64):
    """Oracle for q_emb_near_dup_lsh: banded hyperplane collision pairs
    (any table), exact-cosine rerank, threshold filter."""
    import numpy as np
    import pandas as pd

    ids, M = _emb_matrix(sf_dir)
    sig = _hyperplane_sigs(M, dim, n_planes, n_tables, seed, multiprobe=0)
    buckets: dict = {}
    for i in range(len(ids)):
        for p in sig[i]:
            buckets.setdefault(int(p), []).append(i)
    pairs = set()
    for members in buckets.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                pairs.add((ms[x], ms[y]))
    norms = np.linalg.norm(M, axis=1)
    recs = []
    for i, j in pairs:
        cos = float((M[i] @ M[j]) / (norms[i] * norms[j]))
        if cos >= min_cos:
            a, b = int(ids[i]), int(ids[j])
            if a > b:
                a, b = b, a
            recs.append((a, b, cos))
    df = pd.DataFrame(sorted(recs), columns=["vec_a", "vec_b", "cos"])
    return df.astype({"vec_a": "int64", "vec_b": "int64"})


def _pandas_ann_cosine(sf_dir, n_queries=10, k=5):
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas().sort_values("vec_id")
    M = np.stack(t["embedding"].map(lambda v: np.asarray(v, dtype="float64")).to_numpy())
    ids = t["vec_id"].to_numpy()
    qm, cm = M[ids < n_queries], M[ids >= n_queries]
    cids = ids[ids >= n_queries]
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    cn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    recs = []
    for qi in range(len(qm)):
        cos = cn @ qn[qi]
        order = np.lexsort((cids, -cos))[:k]
        for r, j in enumerate(order, 1):
            recs.append((qi, int(cids[j]), float(cos[j]), r))
    return pd.DataFrame(recs, columns=["query_id", "neighbor_id", "cos", "rank"])


# -- multimodal oracles: the FIXTURE rows are shared (test input), but the
# -- container parsing below is an INDEPENDENT implementation (chunk walk /
# -- regex header / vectorized stride math) from ztdf_spark/mmops.py's
# -- decoders (stdlib wave / scanner loop / per-row slicing), so a parser
# -- bug on either side fails the comparison. Feature ARITHMETIC mirrors
# -- the spec exactly (same numpy reductions), as with the hash oracles.


def _oracle_png_pixels(b: bytes):
    """INDEPENDENT PNG pixel parse (fixture profiles: 8/16-bit RGB,
    sub-byte palette, gray, plain or Adam7): chunk walk via
    int.from_bytes, pure-python per-byte un-filter lists, per-pixel bit
    extraction via integer shifts on a big-int bit cursor, pass grids
    enumerated as coordinate ranges — none of png.py's numpy structure."""
    import zlib

    import numpy as np

    pos, idat = 8, bytearray()
    w = h = None
    depth = color = interlace = 0
    pal = None
    while pos + 12 <= len(b):
        ln = int.from_bytes(b[pos : pos + 4], "big")
        typ = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, color = body[8], body[9]
            interlace = body[12]
        elif typ == b"PLTE":
            pal = [list(body[i : i + 3]) for i in range(0, len(body), 3)]
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(bytes(idat))
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    bpp = max(1, nch * depth // 8)

    def paeth(a, up, c):
        p = a + up - c
        pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
        return a if pa <= pb and pa <= pc else (up if pb <= pc else c)

    grids = (
        [(0, 0, 1, 1)]
        if interlace == 0
        else [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    )
    px = [[None] * w for _ in range(h)]
    off = 0
    for x0, y0, dx, dy in grids:
        xs, ys = list(range(x0, w, dx)), list(range(y0, h, dy))
        if not xs or not ys:
            continue
        stride = (len(xs) * nch * depth + 7) // 8
        prev = [0] * stride
        for y in ys:
            ft, line = raw[off], raw[off + 1 : off + 1 + stride]
            off += 1 + stride
            cur = [0] * stride
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                v = line[i]
                if ft == 1:
                    v += left
                elif ft == 2:
                    v += prev[i]
                elif ft == 3:
                    v += (left + prev[i]) >> 1
                elif ft == 4:
                    v += paeth(left, prev[i], ul)
                cur[i] = v & 0xFF
            prev = cur
            # bit cursor over the unfiltered row: sample s of pixel r sits
            # at bit offset (r*nch + s)*depth, MSB first
            rowint = int.from_bytes(bytes(cur), "big")
            rowbits = stride * 8
            for rx, x in enumerate(xs):
                samples = []
                for s in range(nch):
                    sh = rowbits - (rx * nch + s + 1) * depth
                    v = (rowint >> sh) & ((1 << depth) - 1)
                    if depth == 16:
                        v >>= 8  # high byte == inverse of v8*257 replication
                    elif depth < 8 and color != 3:
                        v *= 255 // ((1 << depth) - 1)
                    samples.append(v)
                if color == 3:
                    px[y][x] = pal[samples[0]]
                elif color == 0 or color == 4:
                    px[y][x] = [samples[0]] * 3
                else:
                    px[y][x] = samples[:3]
    assert off == len(raw)
    return np.array(px, dtype=np.uint8)


def _oracle_gif(b: bytes):
    """INDEPENDENT GIF parse (frames, delays_cs): classic dict-of-bytes
    LZW with a generator bit reader, python-list sub-block walk, and
    list-based canvas composition — none of gif.py's prefix-array /
    numpy-region structure."""
    import numpy as np

    assert b[:6] in (b"GIF87a", b"GIF89a")
    w = int.from_bytes(b[6:8], "little")
    h = int.from_bytes(b[8:10], "little")
    packed, bg = b[10], b[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = [tuple(b[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    bg_rgb = gct[bg] if gct and bg < len(gct) else (0, 0, 0)
    canvas = [[bg_rgb] * w for _ in range(h)]
    frames, delays = [], []
    delay, transp, disp = 0, None, 0

    def subblocks(p):
        chunks = []
        while b[p]:
            n = b[p]
            chunks.append(b[p + 1 : p + 1 + n])
            p += 1 + n
        return b"".join(chunks), p + 1

    def lzw(stream, mcs, npx):
        def bits():
            for byte in stream:
                for k in range(8):
                    yield (byte >> k) & 1

        g = bits()

        def read(width):
            v = 0
            for k in range(width):
                v |= next(g) << k
            return v

        clear, eoi = 1 << mcs, (1 << mcs) + 1
        table = None
        width = mcs + 1
        prev = None
        out = bytearray()
        while len(out) < npx:
            code = read(width)
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = mcs + 1
                prev = None
                continue
            if code == eoi:
                break
            if prev is None:
                seq = table[code]
            elif code < len(table):
                seq = table[code]
                if len(table) < 4096:
                    table.append(prev + seq[:1])
            else:
                seq = prev + prev[:1]
                table.append(seq)
            out += seq
            if len(table) == (1 << width) and width < 12:
                width += 1
            prev = seq
        return bytes(out[:npx])

    while True:
        blk = b[pos]
        pos += 1
        if blk == 0x3B:
            break
        if blk == 0x21:
            label = b[pos]
            payload, pos = subblocks(pos + 1)
            if label == 0xF9:
                delay = int.from_bytes(payload[1:3], "little")
                disp = (payload[0] >> 2) & 7
                transp = payload[3] if payload[0] & 1 else None
            continue
        assert blk == 0x2C
        left = int.from_bytes(b[pos : pos + 2], "little")
        top = int.from_bytes(b[pos + 2 : pos + 4], "little")
        iw = int.from_bytes(b[pos + 4 : pos + 6], "little")
        ih = int.from_bytes(b[pos + 6 : pos + 8], "little")
        ip = b[pos + 8]
        pos += 9
        table = gct
        if ip & 0x80:
            n = 2 << (ip & 7)
            table = [tuple(b[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)]
            pos += 3 * n
        mcs = b[pos]
        stream, pos = subblocks(pos + 1)
        idx = lzw(stream, mcs, iw * ih)
        rows = [list(idx[r * iw : (r + 1) * iw]) for r in range(ih)]
        if ip & 0x40:  # deinterlace by scattering pass rows
            order = [r for s, st in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(s, ih, st)]
            scat = [None] * ih
            for src, dst in enumerate(order):
                scat[dst] = rows[src]
            rows = scat
        saved = [row[:] for row in canvas] if disp == 3 else None
        for r in range(ih):
            for c in range(iw):
                v = rows[r][c]
                if transp is not None and v == transp:
                    continue
                canvas[top + r][left + c] = table[v]
        frames.append(np.array(canvas, dtype=np.uint8))
        delays.append(delay)
        if disp == 2:
            for r in range(ih):
                for c in range(iw):
                    canvas[top + r][left + c] = bg_rgb
        elif disp == 3:
            canvas = saved
        delay, transp, disp = 0, None, 0
    return frames, delays


def _oracle_jpeg_pixels(d: bytes):
    """INDEPENDENT baseline-JPEG decode: spec F.2.2.3 MINCODE/MAXCODE
    huffman walk (jpeg.py builds (length,code)->symbol dicts), a
    bit-at-a-time reader, per-block separable IDCT via two np.dot
    contractions (jpeg.py does one whole-plane einsum), np.kron chroma
    upsampling (jpeg.py uses np.repeat). Verified bit-exact against
    decode_jpeg across 400 random frames (both subsamplings, lossy and
    lossless) — the float64 IDCT paths agree after round+clip."""
    import struct

    import numpy as np

    zz_order = [
        (0,0),(0,1),(1,0),(2,0),(1,1),(0,2),(0,3),(1,2),(2,1),(3,0),(4,0),(3,1),(2,2),(1,3),(0,4),(0,5),
        (1,4),(2,3),(3,2),(4,1),(5,0),(6,0),(5,1),(4,2),(3,3),(2,4),(1,5),(0,6),(0,7),(1,6),(2,5),(3,4),
        (4,3),(5,2),(6,1),(7,0),(7,1),(6,2),(5,3),(4,4),(3,5),(2,6),(1,7),(2,7),(3,6),(4,5),(5,4),(6,3),
        (7,2),(7,3),(6,4),(5,5),(4,6),(3,7),(4,7),(5,6),(6,5),(7,4),(7,5),(6,6),(5,7),(6,7),(7,6),(7,7),
    ]
    basis = np.empty((8, 8), dtype=np.float64)
    for u in range(8):
        cu = np.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            basis[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)

    class Br:
        def __init__(self, d, i):
            self.d, self.i, self.bit = d, i, 0

        def read1(self):
            byte = self.d[self.i]
            if byte == 0xFF and self.d[self.i + 1] != 0x00:
                return 0  # marker reached: pad bits
            v = (byte >> (7 - self.bit)) & 1
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.i += 1
                if byte == 0xFF and self.d[self.i] == 0x00:
                    self.i += 1
            return v

        def readn(self, n):
            v = 0
            for _ in range(n):
                v = (v << 1) | self.read1()
            return v

    def mk_tables(bits, vals):
        code, k = 0, 0
        mincode, maxcode, valptr = [0] * 17, [-1] * 17, [0] * 17
        for length in range(1, 17):
            valptr[length], mincode[length] = k, code
            code += bits[length - 1]
            k += bits[length - 1]
            maxcode[length] = code - 1 if bits[length - 1] else -1
            code <<= 1
        return mincode, maxcode, valptr, vals

    def huffdec(br, tab):
        mincode, maxcode, valptr, vals = tab
        code, length = br.read1(), 1
        while maxcode[length] < 0 or code > maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("oracle jpeg: bad huffman code")
            code = (code << 1) | br.read1()
        return vals[valptr[length] + code - mincode[length]]

    def recv_extend(br, s):
        if s == 0:
            return 0
        v = br.readn(s)
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    d = bytes(d)
    if d[:2] != b"\xff\xd8":
        raise ValueError("oracle jpeg: no SOI")
    i, qts, htabs, comps = 2, {}, {}, []
    h = w = 0
    out_planes = None
    while i + 4 <= len(d):
        if d[i] != 0xFF:
            raise ValueError("oracle jpeg: marker expected")
        m = d[i + 1]
        i += 2
        if m == 0xD9:
            break
        if m == 0x01 or 0xD0 <= m <= 0xD8:
            continue
        (ln,) = struct.unpack_from(">H", d, i)
        seg = d[i + 2 : i + ln]
        if m == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                j += 1
                q = np.empty(64, np.int64)
                if pq == 0:
                    q[:] = np.frombuffer(seg[j : j + 64], np.uint8)
                    j += 64
                else:
                    q[:] = np.frombuffer(seg[j : j + 128], ">u2")
                    j += 128
                qts[tq] = q
        elif m == 0xC4:
            j = 0
            while j < len(seg):
                tcth = seg[j]
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                htabs[tcth] = mk_tables(bits, list(seg[j + 17 : j + 17 + n]))
                j += 17 + n
        elif m == 0xC0:
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            for k in range(nc):
                cid, hv, tq = seg[6 + 3 * k : 9 + 3 * k]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif m == 0xDA:
            ns = seg[0]
            scan = []
            for k in range(ns):
                cid, tt = seg[1 + 2 * k], seg[2 + 2 * k]
                ci = [x for x, c in enumerate(comps) if c[0] == cid][0]
                scan.append((ci, tt >> 4, tt & 0xF))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mx_n, my_n = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            planes = [np.zeros((my_n * c[2] * 8, mx_n * c[1] * 8), np.float64) for c in comps]
            br = Br(d, i + ln)
            preds = [0] * len(comps)
            for my in range(my_n):
                for mx in range(mx_n):
                    for ci, td, ta in scan:
                        _cid, hs, vs, tq = comps[ci]
                        for by in range(vs):
                            for bx in range(hs):
                                zz = np.zeros(64, np.int64)
                                s = huffdec(br, htabs[0x00 | td])
                                preds[ci] += recv_extend(br, s)
                                zz[0] = preds[ci]
                                k = 1
                                while k < 64:
                                    rs = huffdec(br, htabs[0x10 | ta])
                                    r, s = rs >> 4, rs & 0xF
                                    if s == 0:
                                        if r == 15:
                                            k += 16
                                            continue
                                        break
                                    k += r
                                    zz[k] = recv_extend(br, s)
                                    k += 1
                                blk = np.zeros((8, 8), np.float64)
                                dq = zz * qts[tq]
                                for idx, (r_, c_) in enumerate(zz_order):
                                    blk[r_, c_] = dq[idx]
                                sp = basis.T.dot(blk).dot(basis) + 128.0
                                py, px = (my * vs + by) * 8, (mx * hs + bx) * 8
                                planes[ci][py : py + 8, px : px + 8] = sp
            out_planes = []
            for (cid, hs, vs, tq), pl in zip(comps, planes):
                up = np.kron(pl, np.ones((vmax // vs, hmax // hs)))
                out_planes.append(up[:h, :w])
            break
        i += ln
    if out_planes is None:
        raise ValueError("oracle jpeg: no scan")
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _oracle_avi(b: bytes):
    """INDEPENDENT AVI/MJPEG parse: flat index scan collecting the strh
    rate and every '00dc' payload (avi.py uses a recursive generator
    walk), frames via _oracle_jpeg_pixels. Returns (frames, fps)."""
    import struct

    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("oracle avi: not AVI")
    fps = None
    frames = []

    def walk(pos, end):
        nonlocal fps
        while pos + 8 <= end:
            cid = b[pos : pos + 4]
            (sz,) = struct.unpack_from("<I", b, pos + 4)
            body = pos + 8
            if cid == b"LIST":
                walk(body + 4, body + sz)
            elif cid == b"strh" and b[body : body + 4] == b"vids":
                scale, rate = struct.unpack_from("<II", b, body + 20)
                if scale:
                    fps = rate / scale
            elif cid[2:4] == b"dc":
                frames.append(_oracle_jpeg_pixels(b[body : body + sz]))
            pos = body + sz + (sz & 1)

    walk(12, min(len(b), 8 + struct.unpack_from("<I", b, 4)[0]))
    if not frames or fps is None:
        raise ValueError("oracle avi: no frames/rate")
    return frames, fps


def _oracle_flac(b: bytes):
    """INDEPENDENT FLAC decode for the fixture profiles (16-bit,
    independent channels, constant/verbatim/fixed<=2 subframes, one
    4-bit rice partition): a big-int bit cursor over the whole stream
    (flac.py walks a stateful byte/bit reader class) with inline rice
    and fixed-predictor reconstruction. Returns (interleaved int16,
    sample_rate, n_channels)."""
    import numpy as np

    if b[:4] != b"fLaC":
        raise ValueError("oracle flac: bad magic")
    pos = 4
    sr = nch = total = None
    while True:
        hdr = b[pos]
        blen = int.from_bytes(b[pos + 1 : pos + 4], "big")
        if hdr & 0x7F == 0:
            body = int.from_bytes(b[pos + 4 : pos + 4 + blen], "big")
            nbits = blen * 8
            sr = (body >> (nbits - 100)) & 0xFFFFF
            nch = ((body >> (nbits - 103)) & 0x7) + 1
            bps = ((body >> (nbits - 108)) & 0x1F) + 1
            total = (body >> (nbits - 144)) & ((1 << 36) - 1)
        pos += 4 + blen
        if hdr & 0x80:
            break
    if sr is None or bps != 16:
        raise ValueError("oracle flac: unsupported streaminfo")

    bits = int.from_bytes(b, "big")
    nbits_total = len(b) * 8

    def rd(off, n):
        return (bits >> (nbits_total - off - n)) & ((1 << n) - 1), off + n

    def unary(off):
        q = 0
        while True:
            v, off = rd(off, 1)
            if v:
                return q, off
            q += 1

    def signed(v, n):
        return v - (1 << n) if v >> (n - 1) else v

    chans = [[] for _ in range(nch)]
    got = 0
    off = pos * 8
    while got < total:
        frame_start_byte = off // 8
        sync, off = rd(off, 14)
        if sync != 0x3FFE:
            raise ValueError("oracle flac: lost sync")
        off += 2  # reserved + blocking strategy
        bsc, off = rd(off, 4)
        src, off = rd(off, 4)
        chc, off = rd(off, 4)
        _bpsc, off = rd(off, 3)
        off += 1
        b0, off = rd(off, 8)  # utf8 frame number (fixture: multi-byte ok)
        if b0 >= 0x80:
            nb = 0
            m = 0x80
            while b0 & m:
                nb += 1
                m >>= 1
            for _ in range(nb - 1):
                _c, off = rd(off, 8)
        if bsc == 6:
            v, off = rd(off, 8)
            blk = v + 1
        elif bsc == 7:
            v, off = rd(off, 16)
            blk = v + 1
        elif bsc == 12:
            blk = 4096
        else:
            raise ValueError("oracle flac: unexpected blocksize code")
        if src in (12, 13, 14):
            _v, off = rd(off, 8 if src == 12 else 16)
        _crc8, off = rd(off, 8)
        if chc >= 8:
            raise ValueError("oracle flac: stereo decorrelation not in fixture")
        if chc + 1 != nch:
            raise ValueError("oracle flac: channel mismatch")
        for c in range(nch):
            _pad, off = rd(off, 1)
            st, off = rd(off, 6)
            wast, off = rd(off, 1)
            if wast:
                raise ValueError("oracle flac: wasted bits not in fixture")
            if st == 0:  # constant
                v, off = rd(off, 16)
                chans[c].extend([signed(v, 16)] * blk)
            elif st == 1:  # verbatim
                for _ in range(blk):
                    v, off = rd(off, 16)
                    chans[c].append(signed(v, 16))
            elif 8 <= st <= 10:  # fixed 0-2
                order = st - 8
                warm = []
                for _ in range(order):
                    v, off = rd(off, 16)
                    warm.append(signed(v, 16))
                meth, off = rd(off, 2)
                porder, off = rd(off, 4)
                if meth != 0 or porder != 0:
                    raise ValueError("oracle flac: partition shape not in fixture")
                k, off = rd(off, 4)
                res = []
                for _ in range(blk - order):
                    q, off = unary(off)
                    lo, off = rd(off, k) if k else (0, off)
                    zz = (q << k) | lo
                    res.append((zz >> 1) ^ -(zz & 1))
                out = list(warm)
                for i in range(order, blk):
                    if order == 0:
                        out.append(res[i])
                    elif order == 1:
                        out.append(res[i - 1] + out[i - 1])
                    else:
                        out.append(res[i - 2] + 2 * out[i - 1] - out[i - 2])
                chans[c].extend(out)
            else:
                raise ValueError("oracle flac: subframe type not in fixture")
        if off % 8:
            off += 8 - off % 8
        off += 16  # frame crc16
        got += blk
    inter = np.empty(total * nch, dtype=np.int64)
    for c in range(nch):
        inter[c::nch] = chans[c][:total]
    return inter.astype(np.int16), sr, nch


def _oracle_decode(payload: bytes, mtype: str):
    import hashlib
    import re
    import struct

    import numpy as np

    b = bytes(payload)
    if b[:4] == b"fLaC":
        s, sr, nch = _oracle_flac(b)
        x = s.astype(np.float64) / 32768.0
        n = max(1, len(x))
        zc = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))) / n
        seg_rms = [float(np.sqrt(np.mean(p * p))) if len(p) else 0.0 for p in np.array_split(x, 8)]
        feats = [float(nch), sr / 1000.0, (len(x) / nch) / sr,
                 float(np.sqrt(np.mean(x * x))), float(np.max(np.abs(x))) if len(x) else 0.0,
                 float(np.mean(np.abs(x))), zc, float(np.mean(x)), *seg_rms]
        return np.asarray(feats, dtype=np.float32)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        pos, tag, nch, sr, data, fmt_raw, n_samp = 12, 1, None, None, None, None, None
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            sz = int.from_bytes(b[pos + 4 : pos + 8], "little")
            if cid == b"fmt ":
                fmt_raw = b[pos + 8 : pos + 8 + sz]
                tag, nch, sr = struct.unpack_from("<HHI", fmt_raw, 0)
            elif cid == b"fact":
                (n_samp,) = struct.unpack_from("<I", b, pos + 8)
            elif cid == b"data":
                data = b[pos + 8 : pos + 8 + sz]
            pos += 8 + sz + (sz & 1)
        if tag == 1:
            s = np.frombuffer(data, dtype="<i2")
        elif tag in (6, 7):
            # INDEPENDENT G.711 expansion: 256-entry tables built by
            # scalar loops from the segment definitions (audio.py is
            # vectorized formula-style numpy)
            table = []
            for code in range(256):
                if tag == 7:  # µ-law
                    u = ~code & 0xFF
                    t = ((((u & 0xF) << 3) + 0x84) << ((u >> 4) & 7))
                    table.append(0x84 - t if u & 0x80 else t - 0x84)
                else:  # A-law
                    a = code ^ 0x55
                    t = (a & 0xF) << 4
                    seg = (a >> 4) & 7
                    if seg == 0:
                        t += 8
                    elif seg == 1:
                        t += 0x108
                    else:
                        t = (t + 0x108) << (seg - 1)
                    table.append(t if a & 0x80 else -t)
            s = np.array([table[c] for c in data], dtype=np.int16)
        elif tag == 0x11:
            # INDEPENDENT IMA ADPCM decode: bitmask-product diff form
            # (audio.py accumulates via if-chains), explicit block walk
            steps = [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
                     37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
                     157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
                     544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
                     1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
                     4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
                     12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
                     29794, 32767]
            idx_adj = [-1, -1, -1, -1, 2, 4, 6, 8]
            (spb,) = struct.unpack_from("<H", fmt_raw, 18)
            block_bytes = 4 + (spb - 1) // 2
            out = []
            for b0 in range(0, len(data), block_bytes):
                pred, index, _r = struct.unpack_from("<hBB", data, b0)
                index = min(max(index, 0), 88)
                out.append(pred)
                for byte in data[b0 + 4 : b0 + block_bytes]:
                    for nib in (byte & 0xF, byte >> 4):
                        st = steps[index]
                        diff = (st >> 3) + (nib & 1) * (st >> 2) + ((nib >> 1) & 1) * (st >> 1) + ((nib >> 2) & 1) * st
                        pred = pred - diff if nib & 8 else pred + diff
                        pred = min(32767, max(-32768, pred))
                        index = min(88, max(0, index + idx_adj[nib & 7]))
                        out.append(pred)
            s = np.array(out, dtype=np.int16)
        else:
            raise ValueError(f"oracle wav: unsupported tag {tag}")
        if n_samp is not None:
            s = s[: n_samp * nch]
        x = s.astype(np.float64) / 32768.0
        n = max(1, len(x))
        zc = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))) / n
        seg_rms = [float(np.sqrt(np.mean(p * p))) if len(p) else 0.0 for p in np.array_split(x, 8)]
        feats = [float(nch), sr / 1000.0, (len(x) / nch) / sr,
                 float(np.sqrt(np.mean(x * x))), float(np.max(np.abs(x))) if len(x) else 0.0,
                 float(np.mean(np.abs(x))), zc, float(np.mean(x)), *seg_rms]
        return np.asarray(feats, dtype=np.float32)
    px = fmt_tag = None
    if b[:2] == b"P6":
        m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", b)
        w, h = int(m.group(1)), int(m.group(2))
        px = np.frombuffer(b, np.uint8, count=w * h * 3, offset=m.end()).reshape(h, w, 3)
        fmt_tag = 1.0
    elif b[:2] == b"BM":
        data_off = struct.unpack_from("<I", b, 10)[0]
        w, h = struct.unpack_from("<ii", b, 18)
        h = abs(h)
        stride = (w * 3 + 3) & ~3
        arr = np.frombuffer(b, np.uint8, count=stride * h, offset=data_off).reshape(h, stride)
        px = arr[:, : w * 3].reshape(h, w, 3)[..., ::-1][::-1]
        fmt_tag = 2.0
    elif b[:8] == b"\x89PNG\r\n\x1a\n":
        px = _oracle_png_pixels(b)
        fmt_tag = 5.0
    elif b[:6] in (b"GIF87a", b"GIF89a"):
        px = _oracle_gif(b)[0][0]
        fmt_tag = 6.0
    if px is not None:
        f = px.astype(np.float64)
        mean, std = f.mean(axis=(0, 1)), f.std(axis=(0, 1))
        luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        gx = float(np.mean(np.abs(np.diff(luma, axis=1)))) if px.shape[1] > 1 else 0.0
        gy = float(np.mean(np.abs(np.diff(luma, axis=0)))) if px.shape[0] > 1 else 0.0
        feats = [float(px.shape[1]), float(px.shape[0]), mean[0], mean[1], mean[2],
                 std[0], std[1], std[2], float(f.min()), float(f.max()),
                 float(luma.mean()), gx, gy, 0.0, 0.0, fmt_tag]
        return np.asarray(feats, dtype=np.float32)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        frames, fps = _oracle_avi(b)
        f64 = [f.astype(np.float64) for f in frames]
        ys = np.stack([0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2] for f in f64])
        cbs = [(-0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128.0) for f in f64]
        crs = [(0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128.0) for f in f64]
        h, w = frames[0].shape[:2]
        feats = [float(w), float(h), float(len(frames)), fps,
                 float(ys.mean()), float(ys.std()),
                 float(np.mean([cb.mean() for cb in cbs])),
                 float(np.mean([cr.mean() for cr in crs])),
                 float(ys[0].mean()), float(ys[-1].mean()),
                 float(np.mean(np.abs(np.diff(ys, axis=0)))) if len(frames) > 1 else 0.0,
                 0.0, 0.0, 0.0, 0.0, 7.0]
        return np.asarray(feats, dtype=np.float32)
    if b[:9] == b"YUV4MPEG2":
        (w, h, fps), frames = _oracle_y4m(b)
        ys = np.stack([f[0].astype(np.float64) for f in frames])
        feats = [float(w), float(h), float(len(frames)), fps,
                 float(ys.mean()), float(ys.std()),
                 float(np.mean([f[1].astype(np.float64).mean() for f in frames])),
                 float(np.mean([f[2].astype(np.float64).mean() for f in frames])),
                 float(ys[0].mean()), float(ys[-1].mean()),
                 float(np.mean(np.abs(np.diff(ys, axis=0)))) if len(frames) > 1 else 0.0,
                 0.0, 0.0, 0.0, 0.0, 3.0]
        return np.asarray(feats, dtype=np.float32)
    if b[:4] == b"\x00\x00\x00\x01" or b[:3] == b"\x00\x00\x01":
        (w, h, fps), frames = _oracle_h264(b)
        ys = np.stack([f[0].astype(np.float64) for f in frames])
        feats = [float(w), float(h), float(len(frames)), fps,
                 float(ys.mean()), float(ys.std()),
                 float(np.mean([f[1].astype(np.float64).mean() for f in frames])),
                 float(np.mean([f[2].astype(np.float64).mean() for f in frames])),
                 float(ys[0].mean()), float(ys[-1].mean()),
                 float(np.mean(np.abs(np.diff(ys, axis=0)))) if len(frames) > 1 else 0.0,
                 0.0, 0.0, 0.0, 0.0, 8.0]
        return np.asarray(feats, dtype=np.float32)
    digest = hashlib.blake2b(b, digest_size=64, key=mtype.encode()[:16]).digest()
    return (np.frombuffer(digest, dtype=np.uint32).astype(np.float32) / np.float32(2**32))[:16]


def _oracle_y4m(b: bytes):
    """Independent YUV4MPEG2 parse (regex header + FRAME split — a
    different strategy from mmops._y4m_frames' cursor walk)."""
    import re

    import numpy as np

    header, _, rest = b.partition(b"\n")
    w = int(re.search(rb" W(\d+)", header).group(1))
    h = int(re.search(rb" H(\d+)", header).group(1))
    fm = re.search(rb" F(\d+):(\d+)", header)
    fps = int(fm.group(1)) / int(fm.group(2))
    cm = re.search(rb" (C\w+)", header)
    cs = cm.group(1).decode() if cm else "C420jpeg"
    cw, ch = (w, h) if cs.startswith("C444") else (w // 2, h // 2)
    frames = []
    for chunk in rest.split(b"FRAME")[1:]:
        body = chunk[chunk.index(b"\n") + 1 :]
        y = np.frombuffer(body, np.uint8, count=w * h).reshape(h, w)
        u = np.frombuffer(body, np.uint8, count=cw * ch, offset=w * h).reshape(ch, cw)
        v = np.frombuffer(body, np.uint8, count=cw * ch, offset=w * h + cw * ch).reshape(ch, cw)
        frames.append((y, u, v))
    return (w, h, fps), frames


def _oracle_h264(data: bytes):
    """Independent H.264 Annex-B I_PCM parser: stateful generator-based
    bit reading and table-free header walks — none of ztdf_spark/h264.py's
    classes. Returns ((w, h, fps), [(y, u, v) planes])."""
    import numpy as np

    # split NALs on 3-byte start codes, drop start-code-prefix zeros
    chunks = []
    i = bytes(data).find(b"\x00\x00\x01")
    raw = bytes(data)
    while i != -1:
        j = raw.find(b"\x00\x00\x01", i + 3)
        seg = raw[i + 3 : j if j != -1 else len(raw)].rstrip(b"\x00")
        if seg:
            chunks.append(seg)
        i = j

    def unescape(b):
        out, z, k = bytearray(), 0, 0
        while k < len(b):
            c = b[k]
            if z >= 2 and c == 3:
                z, k = 0, k + 1
                continue
            out.append(c)
            z = z + 1 if c == 0 else 0
            k += 1
        return bytes(out)

    def bit_iter(b):
        for byte in b:
            for s in range(7, -1, -1):
                yield (byte >> s) & 1

    class R:
        def __init__(self, b):
            self.b = b
            self.it = bit_iter(b)
            self.n = 0

        def u(self, k):
            v = 0
            for _ in range(k):
                v = (v << 1) | next(self.it)
            self.n += k
            return v

        def ue(self):
            z = 0
            while self.u(1) == 0:
                z += 1
            return (1 << z) - 1 + (self.u(z) if z else 0)

        def se(self):
            k = self.ue()
            return (k + 1) // 2 if k % 2 else -(k // 2)

        def align(self):
            while self.n % 8:
                self.u(1)

        def bytes_(self, k):
            self.align()
            return bytes(self.u(8) for _ in range(k))

    sps = None
    fps = 0.0
    frames = []
    for nal in chunks:
        t = nal[0] & 0x1F
        r = R(unescape(nal[1:]))
        if t == 7:
            r.u(24)
            r.ue()
            lmfn = r.ue() + 4
            poc = r.ue()
            if poc == 0:
                r.ue()
            elif poc == 1:
                r.u(1); r.se(); r.se()
                for _ in range(r.ue()):
                    r.se()
            r.ue(); r.u(1)
            wmb, hmb = r.ue() + 1, r.ue() + 1
            r.u(2)  # frame_mbs_only + direct_8x8
            crop = [r.ue(), r.ue(), r.ue(), r.ue()] if r.u(1) else [0] * 4
            if r.u(1) and not any([r.u(1), r.u(1), r.u(1), r.u(1)]) and r.u(1):
                nuit, ts = r.u(32), r.u(32)
                if nuit:
                    fps = ts / (2.0 * nuit)
            sps = (wmb, hmb, lmfn, crop)
        elif t == 5 and sps is not None:
            wmb, hmb, lmfn, crop = sps
            r.ue(); r.ue(); r.ue()
            r.u(lmfn)
            r.ue()  # idr_pic_id
            r.u(2)  # dec_ref_pic_marking (IDR, ref)
            r.se()
            if r.ue() != 1:
                r.se(); r.se()
            y = np.zeros((hmb * 16, wmb * 16), np.uint8)
            u = np.zeros((hmb * 8, wmb * 8), np.uint8)
            v = np.zeros_like(u)
            for mb in range(wmb * hmb):
                assert r.ue() == 25, "oracle: non-I_PCM mb"
                my, mx = divmod(mb, wmb)
                y[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = np.frombuffer(
                    r.bytes_(256), np.uint8).reshape(16, 16)
                u[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = np.frombuffer(
                    r.bytes_(64), np.uint8).reshape(8, 8)
                v[my * 8:(my + 1) * 8, mx * 8:(mx + 1) * 8] = np.frombuffer(
                    r.bytes_(64), np.uint8).reshape(8, 8)
            cl, _, ct, _ = crop
            w_ = wmb * 16 - 2 * (crop[0] + crop[1])
            h_ = hmb * 16 - 2 * (crop[2] + crop[3])
            frames.append((
                y[2 * ct:2 * ct + h_, 2 * cl:2 * cl + w_],
                u[ct:ct + h_ // 2, cl:cl + w_ // 2],
                v[ct:ct + h_ // 2, cl:cl + w_ // 2],
            ))
    w_ = sps[0] * 16 - 2 * (sps[3][0] + sps[3][1])
    h_ = sps[1] * 16 - 2 * (sps[3][2] + sps[3][3])
    return (w_, h_, fps), frames


def _mm_rows(n=30, seed=42):
    from ztdf_spark.mmops import synthetic_media_rows

    return synthetic_media_rows(n, seed)


def _pandas_mm_features(sf_dir, n=30, seed=42):
    import hashlib

    import numpy as np
    import pandas as pd

    recs = []
    for mid, mtype, payload, _meta in _mm_rows(n, seed):
        feat = _oracle_decode(payload, mtype)
        q = [str(int(np.floor(float(x) * 1_000_000))) for x in feat.astype("float64")]
        recs.append((mid, mtype, len(payload), 16, hashlib.md5(",".join(q).encode()).hexdigest()))
    return pd.DataFrame(recs, columns=["media_id", "media_type", "n_bytes", "feat_dim", "feat_checksum"])


def _pandas_mm_frames(sf_dir, n=30, seed=42, every_ms=1000):
    import hashlib

    import pandas as pd

    recs = []
    for mid, mtype, payload, meta in _mm_rows(n, seed):
        if mtype != "video":
            continue
        b = bytes(payload)
        if b[:9] == b"YUV4MPEG2":  # real decode: hash the sampled planes
            (_w, _h, fps), frames = _oracle_y4m(b)
            step = max(1, round(fps * every_ms / 1000.0))
            for fi in range(0, len(frames), step):
                y, u, v = frames[fi]
                hh = hashlib.blake2b(
                    y.tobytes() + u.tobytes() + v.tobytes(), digest_size=8
                ).hexdigest()
                recs.append((mid, fi, hh))
            continue
        if b[:4] == b"RIFF" and b[8:12] == b"AVI ":  # real MJPEG decode
            aframes, afps = _oracle_avi(b)
            step = max(1, round(afps * every_ms / 1000.0))
            for fi in range(0, len(aframes), step):
                hh = hashlib.blake2b(aframes[fi].tobytes(), digest_size=8).hexdigest()
                recs.append((mid, fi, hh))
            continue
        if b[:6] in (b"GIF87a", b"GIF89a"):  # real animated-GIF decode
            gframes, gdelays = _oracle_gif(b)
            dcs = gdelays[0] if gdelays and gdelays[0] > 0 else 10
            step = max(1, round((100.0 / dcs) * every_ms / 1000.0))
            for fi in range(0, len(gframes), step):
                hh = hashlib.blake2b(gframes[fi].tobytes(), digest_size=8).hexdigest()
                recs.append((mid, fi, hh))
            continue
        if b[:4] == b"\x00\x00\x00\x01" or b[:3] == b"\x00\x00\x01":
            # real H.264 I_PCM decode: stride from the stream's VUI rate
            (_w, _h, hfps), hframes = _oracle_h264(b)
            step = max(1, round(hfps * every_ms / 1000.0)) if hfps else 1
            for fi in range(0, len(hframes), step):
                y, u, v = hframes[fi]
                hh = hashlib.blake2b(
                    y.tobytes() + u.tobytes() + v.tobytes(), digest_size=8
                ).hexdigest()
                recs.append((mid, fi, hh))
            continue
        dur = int(meta[2] or 0)
        for fi in range(max(1, dur // every_ms)):
            h = hashlib.blake2b(b + fi.to_bytes(4, "little"), digest_size=8).hexdigest()
            recs.append((mid, fi, h))
    return pd.DataFrame(recs, columns=["media_id", "frame_idx", "frame_hash"])


def _pandas_mm_resize(sf_dir, n=30, seed=42, out_w=8, out_h=8):
    import hashlib
    import re
    import struct

    import numpy as np
    import pandas as pd

    recs = []
    for mid, _mtype, payload, _meta in _mm_rows(n, seed):
        b = bytes(payload)
        if b[:2] == b"P6":
            m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", b)
            w, h = int(m.group(1)), int(m.group(2))
            px = np.frombuffer(b, np.uint8, count=w * h * 3, offset=m.end()).reshape(h, w, 3)
        elif b[:2] == b"BM":
            data_off = struct.unpack_from("<I", b, 10)[0]
            w, h = struct.unpack_from("<ii", b, 18)
            h = abs(h)
            stride = (w * 3 + 3) & ~3
            arr = np.frombuffer(b, np.uint8, count=stride * h, offset=data_off).reshape(h, stride)
            px = arr[:, : w * 3].reshape(h, w, 3)[..., ::-1][::-1]
        elif b[:8] == b"\x89PNG\r\n\x1a\n":
            px = _oracle_png_pixels(b)
        elif b[:6] in (b"GIF87a", b"GIF89a"):
            px = _oracle_gif(b)[0][0]  # poster frame (video rows too)
        elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            px = _oracle_avi(b)[0][0]  # MJPEG poster frame
        else:
            continue
        small = px[np.ix_((np.arange(out_h) * px.shape[0]) // out_h,
                          (np.arange(out_w) * px.shape[1]) // out_w)]
        recs.append((mid, out_w, out_h, hashlib.md5(np.ascontiguousarray(small).tobytes()).hexdigest()))
    return pd.DataFrame(recs, columns=["media_id", "out_w", "out_h", "resized_md5"])


def _py_unigram_train(sf_dir, vocab_size=48, seed_size=256, max_piece_len=6,
                      sample_docs=10_000, seed=42, shrink_num=3, shrink_den=4,
                      max_rounds=16):
    """Independent unigram-LM trainer: Counter word frequencies over the
    same md5 doc-sample rule, substring seeding, hard-EM rounds with the
    (count desc, piece asc) prune order, and Fraction-exact Viterbi (a
    DIFFERENT exactness mechanism than unigram.py's big-int
    cross-multiplication — same rational semantics, none of its code)."""
    import hashlib
    from collections import Counter
    from fractions import Fraction

    d = _docs_pdf(sf_dir)
    n = len(d)
    frac = min(1.0, (sample_docs * 1.5) / max(1, n))
    thr = "g" if frac >= 1.0 else format(int(frac * (1 << 32)), "08x")
    keyed = sorted(
        (hashlib.md5(f"bpe{seed}-{int(i)}".encode()).hexdigest()[:8], int(i), t)
        for i, t in zip(d["doc_id"], d["text"])
    )
    texts = [t for h, _i, t in keyed if h < thr][:sample_docs]
    wf = Counter()
    for t in texts:
        for w in str(t).lower().split(" "):
            if w:
                wf[w] += 1

    def viterbi(word, counts, total):
        m = len(word)
        best = [None] * (m + 1)
        best[0] = (Fraction(1), 0, -1, "")
        for j in range(1, m + 1):
            inc = None
            for i in range(max(0, j - max_piece_len), j):
                if best[i] is None:
                    continue
                c = counts.get(word[i:j])
                if not c:
                    continue
                sc = best[i][0] * Fraction(c, total)
                k = best[i][1] + 1
                if inc is None or sc > inc[0] or (sc == inc[0] and k < inc[1]):
                    inc = (sc, k, i, word[i:j])
            best[j] = inc
        if best[m] is None:
            return None
        out = []
        j = m
        while j > 0:
            _, _, i, piece = best[j]
            out.append(piece)
            j = i
        return out[::-1]

    def seg_or_unk(word, counts, total):
        got = viterbi(word, counts, total)
        if got is not None:
            return got
        out, run = [], ""
        for ch in word:
            if ch in counts:
                run += ch
            else:
                if run:
                    out.extend(viterbi(run, counts, total))
                    run = ""
                out.append("<unk>")
        if run:
            out.extend(viterbi(run, counts, total))
        return out

    def estep(vocab):
        total = sum(vocab.values())
        used = Counter()
        for w, f in wf.items():
            for p in seg_or_unk(w, vocab, total):
                used[p] += f
        used.pop("<unk>", None)
        return dict(used)

    # seed: occurrence-weighted substring mass, all chars + top multi
    sub = Counter()
    for w, f in wf.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                sub[w[i:i + l]] += f
    vocab = {p: c for p, c in sub.items() if len(p) == 1}
    multi = sorted(((p, c) for p, c in sub.items() if len(p) > 1),
                   key=lambda pc: (-pc[1], pc[0]))[:seed_size]
    vocab.update(dict(multi))

    for _ in range(max_rounds):
        used = estep(vocab)
        chars = {p for p in vocab if len(p) == 1}
        n_multi = max(0, len(vocab) - len(chars))
        target_multi = max(max(0, vocab_size - len(chars)),
                           n_multi * shrink_num // shrink_den)
        keep = {p: used.get(p, 1) for p in chars}
        kept_multi = sorted(((p, c) for p, c in used.items()
                             if len(p) > 1 and p in vocab),
                            key=lambda pc: (-pc[1], pc[0]))[:target_multi]
        keep.update(dict(kept_multi))
        done = len(keep) <= max(vocab_size, len(chars)) and n_multi == len(kept_multi)
        vocab = keep
        if done:
            break
    final = estep(vocab)
    out = {p: (final.get(p, 1) if len(p) == 1 else final.get(p, 0)) for p in vocab}
    out = {p: c for p, c in out.items() if c > 0 or len(p) == 1}
    return sorted(out.items(), key=lambda pc: (-pc[1], pc[0]))


def _pandas_unigram_vocab(sf_dir):
    import pandas as pd

    v = _py_unigram_train(sf_dir)
    return pd.DataFrame(
        [(i, p, c) for i, (p, c) in enumerate(v)], columns=["rank", "piece", "cnt"]
    ).astype({"rank": "int32", "cnt": "int64"})


def _pandas_unigram_encode(sf_dir):
    import hashlib
    from fractions import Fraction

    import pandas as pd

    vocab = dict(_py_unigram_train(sf_dir))
    total = sum(vocab.values())
    max_piece_len = 6

    def viterbi(word):
        m = len(word)
        best = [None] * (m + 1)
        best[0] = (Fraction(1), 0, -1, "")
        for j in range(1, m + 1):
            inc = None
            for i in range(max(0, j - max_piece_len), j):
                if best[i] is None:
                    continue
                c = vocab.get(word[i:j])
                if not c:
                    continue
                sc = best[i][0] * Fraction(c, total)
                k = best[i][1] + 1
                if inc is None or sc > inc[0] or (sc == inc[0] and k < inc[1]):
                    inc = (sc, k, i, word[i:j])
            best[j] = inc
        if best[m] is None:
            return None
        out = []
        j = m
        while j > 0:
            _, _, i, piece = best[j]
            out.append(piece)
            j = i
        return out[::-1]

    memo: dict = {}

    def seg(word):
        got = memo.get(word)
        if got is not None:
            return got
        got = viterbi(word)
        if got is None:
            got, run = [], ""
            for ch in word:
                if ch in vocab:
                    run += ch
                else:
                    if run:
                        got.extend(viterbi(run))
                        run = ""
                    got.append("<unk>")
            if run:
                got.extend(viterbi(run))
        memo[word] = got
        return got

    d = _docs_pdf(sf_dir)
    recs = []
    for i, t in zip(d["doc_id"], d["text"]):
        pieces = []
        for w in str(t).lower().split(" "):
            if w:
                pieces.extend(seg(w))
        recs.append((int(i), len(pieces),
                     hashlib.md5(" ".join(pieces).encode()).hexdigest()))
    return pd.DataFrame(recs, columns=["doc_id", "n_pieces", "pieces_md5"]).astype(
        {"doc_id": "int64", "n_pieces": "int64"}
    )


def _pandas_quality_classifier(sf_dir, dim=256, iters=12, lr=2.0, l2=1e-3, salt="qc"):
    """Oracle for q_corpus_quality_classifier: the full integer-exact
    logistic-regression loop recomputed in plain numpy/hashlib — same md5
    feature hashing, same 2^20 quantization of weights / per-doc errors /
    gradients, same clip — then the exact int64 scores. Any deviation in
    the Spark implementation (a float sum crossing partitions, a wrong
    quantization point) breaks row equality."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq_

    Q = 1 << 20
    tbl = pq_.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    doc_ids = tbl.column("doc_id").to_pylist()
    texts = [t.lower() for t in tbl.column("text").to_pylist()]

    def widx(w):
        return int(hashlib.md5((salt + w).encode()).hexdigest()[:8], 16) % dim

    feats = []
    y = []
    for t in texts:
        ws = t.split(" ")
        v: dict = {}
        for w in ws:
            i = widx(w)
            v[i] = v.get(i, 0) + 1
        feats.append(v)
        y.append(1.0 if ws.count("table") > ws.count("key") else 0.0)
    y = np.array(y)
    n = len(y)
    w = np.zeros(dim)
    b = 0.0
    for _ in range(iters):
        wq = np.rint(w * Q).astype(np.int64)
        zq = np.array([sum(c * int(wq[i]) for i, c in v.items()) for v in feats],
                      dtype=np.int64)
        z = zq / Q + b
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30.0, 30.0)))
        eq = np.rint((p - y) * Q).astype(np.int64)
        gq = np.zeros(dim, dtype=np.int64)
        for v, e in zip(feats, eq):
            for i, c in v.items():
                gq[i] += c * int(e)
        w -= lr * (gq / (Q * n) + l2 * w)
        b -= lr * float(np.sum(eq)) / (Q * n)
    wq = np.rint(w * Q).astype(np.int64)
    bq = int(np.rint(b * Q))
    score = np.array([sum(c * int(wq[i]) for i, c in v.items()) for v in feats],
                     dtype=np.int64) + bq
    return pd.DataFrame({
        "doc_id": np.asarray(doc_ids, dtype=np.int64),
        "score_q": score,
        "pred": (score > 0).astype(np.int32),
    })


def _pandas_pack_bestfit(sf_dir, context_len=128, docs_per_shard=256, salt="bfd"):
    """Oracle for q_tok_pack_bestfit: the md5 shard rule + per-shard
    best-fit-decreasing recomputed in plain Python (no Spark semantics
    shared)."""
    import hashlib

    import pandas as pd

    d = _docs_pdf(sf_dir)
    n = len(d)
    n_shards = max(1, -(-n // docs_per_shard))
    recs = []
    shards: dict = {}
    for i, t in zip(d["doc_id"], d["text"]):
        ntok = len([w for w in str(t).split(" ")])
        h = int(hashlib.md5(f"{salt}-{int(i)}".encode()).hexdigest()[:8], 16)
        shards.setdefault(h % n_shards, []).append((int(ntok), int(i)))
    for shard, docs in shards.items():
        docs.sort(key=lambda p: (-p[0], p[1]))
        fills: list = []
        for ntok, did in docs:
            if ntok > context_len:
                recs.append((did, ntok, shard, -1, 0))
                continue
            best = -1
            for bi, fl in enumerate(fills):
                if fl + ntok <= context_len and (best < 0 or fl > fills[best]):
                    best = bi
            if best < 0:
                best = len(fills)
                fills.append(0)
            recs.append((did, ntok, shard, best, fills[best]))
            fills[best] += ntok
    return pd.DataFrame(
        recs, columns=["doc_id", "n_tok", "shard", "bin", "bin_off"]
    ).astype({"doc_id": "int64", "n_tok": "int64", "shard": "int32",
              "bin": "int64", "bin_off": "int64"})


def _py_wordpiece_train(sf_dir, vocab_size=64, sample_docs=10_000, seed=42):
    """Independent WordPiece trainer: collections.Counter over the same
    md5 doc-sample rule, merge winner = max EXACT Fraction score
    count(l,r)/(count(l)*count(r)) among pairs occurring >= 2, ties
    (left asc, right asc) — a DIFFERENT exactness mechanism than
    wordpiece.py's float-band prefilter + big-int cross-multiplication;
    same rational semantics, none of its code."""
    import hashlib
    from collections import Counter
    from fractions import Fraction

    d = _docs_pdf(sf_dir)
    n = len(d)
    frac = min(1.0, (sample_docs * 1.5) / max(1, n))
    thr = "g" if frac >= 1.0 else format(int(frac * (1 << 32)), "08x")
    keyed = sorted(
        (hashlib.md5(f"bpe{seed}-{int(i)}".encode()).hexdigest()[:8], int(i), t)
        for i, t in zip(d["doc_id"], d["text"])
    )
    texts = [t for h, _i, t in keyed if h < thr][:sample_docs]
    wf = Counter()
    for t in texts:
        for w in str(t).lower().split(" "):
            if w:
                wf[w] += 1
    syms = {w: [w[0]] + ["##" + c for c in w[1:]] for w in wf}
    vocab = sorted({s for w in wf for s in syms[w]})
    have = set(vocab)
    while len(vocab) < vocab_size:
        pc, sc = Counter(), Counter()
        for w, f in wf.items():
            s = syms[w]
            for sym in s:
                sc[sym] += f
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        best = None
        for (left, right), cnt in pc.items():
            if cnt < 2:
                continue
            score = Fraction(cnt, sc[left] * sc[right])
            key = (score, (left, right))
            if best is None or score > best[0] or (
                score == best[0] and (left, right) < best[1]
            ):
                best = key
        if best is None:
            break
        left, right = best[1]
        token = left + (right[2:] if right.startswith("##") else right)
        if token not in have:
            vocab.append(token)
            have.add(token)
        for w in syms:
            out = []
            for s in syms[w]:
                if out and out[-1] == left and s == right:
                    out[-1] = token
                else:
                    out.append(s)
            syms[w] = out
    return vocab


def _pandas_wordpiece_vocab(sf_dir):
    import pandas as pd

    v = _py_wordpiece_train(sf_dir)
    return pd.DataFrame(list(enumerate(v)), columns=["rank", "piece"]).astype(
        {"rank": "int32"}
    )


def _pandas_wordpiece_encode(sf_dir):
    """Oracle for q_tok_wordpiece_encode: greedy longest-match-first
    (MaxMatch) with whole-word [UNK], reimplemented plainly."""
    import hashlib

    import pandas as pd

    vocab = set(_py_wordpiece_train(sf_dir))
    max_len = max((len(p) for p in vocab), default=1)
    memo: dict = {}

    def tok(word):
        got = memo.get(word)
        if got is not None:
            return got
        out, i, n = [], 0, len(word)
        while i < n:
            prefix = "" if i == 0 else "##"
            piece = None
            for j in range(min(n, i + max_len), i, -1):
                cand = prefix + word[i:j]
                if cand in vocab:
                    piece, i = cand, j
                    break
            if piece is None:
                out = ["[UNK]"]
                break
            out.append(piece)
        memo[word] = out
        return out

    d = _docs_pdf(sf_dir)
    recs = []
    for i, t in zip(d["doc_id"], d["text"]):
        toks = []
        for w in str(t).lower().split(" "):
            if w:
                toks.extend(tok(w))
        recs.append(
            (
                int(i),
                len(toks),
                sum(1 for x in toks if x == "[UNK]"),
                hashlib.md5(" ".join(toks).encode()).hexdigest(),
            )
        )
    return pd.DataFrame(
        recs, columns=["doc_id", "n_tokens", "n_unk", "tokens_md5"]
    ).astype({"doc_id": "int64", "n_tokens": "int64", "n_unk": "int64"})


PANDAS_ORACLES = {
    "corpus_quality_classifier": _pandas_quality_classifier,
    "tok_unigram_vocab": _pandas_unigram_vocab,
    "tok_unigram_encode": _pandas_unigram_encode,
    "tok_wordpiece_vocab": _pandas_wordpiece_vocab,
    "tok_wordpiece_encode": _pandas_wordpiece_encode,
    "tok_pack_bestfit": _pandas_pack_bestfit,
    "bpe_train": _pandas_bpe_train,
    "bpe_encode": _pandas_bpe_encode,
    "ann_topk_cosine": _pandas_ann_cosine,
    "ann_lsh": _pandas_ann_lsh,
    "ann_ivf": _pandas_ann_ivf,
    "ann_pq": _pandas_ann_pq,
    "emb_near_dup_lsh": _pandas_emb_near_dup_lsh,
    "dedup_semantic": _pandas_semdedup,
    "mm_features": _pandas_mm_features,
    "mm_frames": _pandas_mm_frames,
    "mm_resize": _pandas_mm_resize,
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            if name in PANDAS_ORACLES:
                pdf = PANDAS_ORACLES[name](sf_dir)
                scols, srows = canon(sdf)
                pcols, prows = canon(pdf)
                if (scols, srows) != (pcols, prows):
                    failures.append(name)
                    diff = [(a, b) for a, b in zip(srows, prows) if a != b][:3]
                    print(f"FAIL  {name}: pandas-oracle mismatch cols {scols} vs {pcols}; "
                          f"rows {len(srows)} vs {len(prows)}; first diffs: {diff}")
                else:
                    print(f"OK(p) {name}: {len(srows)} rows match independent pandas oracle "
                          f"[{time.monotonic()-t0:.1f}s]")
                continue
            print(f"rows  {name}: {len(sdf)} rows (rows-only, no oracle) [{time.monotonic()-t0:.1f}s]")
            if len(sdf) == 0 and name != "dedup_exact":
                print(f"  WARN {name}: empty result")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        scols, srows = canon(sdf)
        ocols, orows = canon(odf)
        if scols != ocols:
            failures.append(name)
            print(f"FAIL  {name}: columns spark={scols} duckdb={ocols}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(srows)} duckdb={len(orows)}")
            continue
        if srows != orows:
            failures.append(name)
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            continue
        print(f"OK    {name}: {len(srows)} rows match [{time.monotonic()-t0:.1f}s]")

    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
