"""IVFADC residual-encoding probe (VERDICT r12 "Next round" #4) —
measure BEFORE building: on the q183 drift corpus at sf1 scale (the
20k x 64-dim embeddings with the %10==3 slice re-embedded to its
negation — the distribution shift that tripped the r12 refresh
loop), does quantizing the RESIDUAL x - centroid(cell(x)) at m=8 buy
the recall that the health loop currently buys by DOUBLING m (8->16,
2x index bytes + a full re-encode)?

Harness = the same metric the r12 refresh work used: for each probe
query, the WORST rank of an exact top-5 neighbor in the ADC ordering
(and containment of exact top-5 in ADC top-100/top-200 — the serving
budget). All conditions retrain their codebook on the CURRENT
(post-drift) corpus, mirroring what the refresh loop does; the
coarse quantizer is tried both STALE (trained on the pre-drift day-1
slice, the maintainer's fixed seed centroids) and RETRAINED.

Pure driver-side numpy over the parquet (the corpus is 10 MB — this
is a measurement, not the production path); reuses similarity.py's
deterministic _lloyd so the codebooks match train_pq's exactly.

Usage: python tools/ivfadc_probe.py [sf1_dir]   (default /tmp/sif_sf1)
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from sif_spark.operators.similarity import _lloyd  # noqa: E402

N_CELLS = 16
N_QUERIES = 32
K = 5
SAMPLE = 32768
SEED = 42


def load_corpus(sf1_dir: str):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf1_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    X = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    # the q183 drift: the %10==3 slice re-embedded to its negation
    X[ids % 10 == 3] *= -1.0
    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return ids, X / n


def train_books(X: np.ndarray, m: int, ksub: int = 256) -> np.ndarray:
    rng = np.random.RandomState(SEED)
    samp = X[rng.permutation(len(X))[:SAMPLE]]
    dsub = X.shape[1] // m
    return np.stack(
        [
            _lloyd(samp[:, j * dsub: (j + 1) * dsub], ksub, 8, rng)
            for j in range(m)
        ]
    )


def encode(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    m, ksub, dsub = books.shape
    codes = np.empty((len(X), m), dtype=np.int32)
    for j in range(m):
        S = X[:, j * dsub: (j + 1) * dsub]
        C = books[j]
        d2 = (S * S).sum(1)[:, None] - 2.0 * (S @ C.T) + (C * C).sum(1)[None, :]
        codes[:, j] = d2.argmin(1)
    return codes


def adc_rank(Q, X, books, codes, cells=None, cents=None, qcells_all=True):
    """For each query row q: ADC distances to every corpus code; in
    residual mode (cells/cents given) the LUT is per (query, cell).
    Returns (n_queries, n_corpus) ADC distance matrix."""
    m, ksub, dsub = books.shape
    n = len(codes)
    D = np.zeros((len(Q), n))
    if cells is None:
        for j in range(m):
            S = Q[:, j * dsub: (j + 1) * dsub]
            C = books[j]
            lut = (S * S).sum(1)[:, None] - 2.0 * (S @ C.T) + (C * C).sum(1)[None, :]
            D += lut[:, codes[:, j]]
        return D
    for c in range(len(cents)):
        idx = np.where(cells == c)[0]
        if not len(idx):
            continue
        Qr = Q - cents[c][None, :]
        for j in range(m):
            S = Qr[:, j * dsub: (j + 1) * dsub]
            C = books[j]
            lut = (S * S).sum(1)[:, None] - 2.0 * (S @ C.T) + (C * C).sum(1)[None, :]
            D[:, idx] += lut[:, codes[idx, j]]
    return D


def worst_rank_and_containment(D_adc, exact_top, self_idx):
    worst = 0
    in100 = in200 = 0
    total = 0
    for qi in range(D_adc.shape[0]):
        order = np.argsort(D_adc[qi], kind="stable")
        order = order[order != self_idx[qi]]
        pos = {int(v): r for r, v in enumerate(order)}
        for t in exact_top[qi]:
            r = pos[int(t)] + 1
            worst = max(worst, r)
            in100 += r <= 100
            in200 += r <= 200
            total += 1
    return worst, in100 / total, in200 / total


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sif_sf1"
    ids, X = load_corpus(sf1)
    dim = X.shape[1]
    rng = np.random.RandomState(7)
    q_idx = rng.permutation(len(X))[:N_QUERIES]
    Q = X[q_idx]
    # exact cosine top-K per query (normalized: max dot), self excluded
    sims = Q @ X.T
    exact_top = []
    for i, qi in enumerate(q_idx):
        order = np.argsort(-sims[i], kind="stable")
        order = order[order != qi]
        exact_top.append(order[:K])
    # coarse quantizers: STALE (day-1 pre-drift slice) and RETRAINED
    day1_mask = ids % 3 == 0
    X_day1_predrift = X.copy()
    X_day1_predrift[ids % 10 == 3] *= -1.0  # undo the drift
    rngc = np.random.RandomState(SEED)
    cents_stale = _lloyd(X_day1_predrift[day1_mask], N_CELLS, 8, rngc)
    cents_fresh = _lloyd(X[: min(SAMPLE, len(X))], N_CELLS, 8,
                         np.random.RandomState(SEED))
    results = {}
    # the cell-count axis: IVFADC's residuals only shrink when the
    # coarse quantizer captures real variance — sqrt(n) cells is the
    # classic operating point (~141 here), 16 is the maintainer's seed
    cents_128 = _lloyd(X[: min(SAMPLE, len(X))], 128, 8,
                       np.random.RandomState(SEED))
    for name, m, cents in (
        ("raw_m8", 8, None),
        ("raw_m16", 16, None),
        ("residual_m8_stale_cells", 8, cents_stale),
        ("residual_m8_fresh_cells", 8, cents_fresh),
        ("residual_m8_fresh128_cells", 8, cents_128),
        ("residual_m16_stale_cells", 16, cents_stale),
    ):
        if cents is None:
            books = train_books(X, m)
            codes = encode(X, books)
            D = adc_rank(Q, X, books, codes)
        else:
            d2 = (
                (X * X).sum(1)[:, None] - 2.0 * (X @ cents.T)
                + (cents * cents).sum(1)[None, :]
            )
            cells = d2.argmin(1)
            R = X - cents[cells]
            books = train_books(R, m)
            codes = encode(R, books)
            D = adc_rank(Q, X, books, codes, cells=cells, cents=cents)
        worst, c100, c200 = worst_rank_and_containment(D, exact_top, q_idx)
        results[name] = {
            "worst_true_neighbor_rank": int(worst),
            "containment@100": round(c100, 4),
            "containment@200": round(c200, 4),
            "index_bytes_per_vec": 2 * m,
        }
        if cents is not None:
            # how much variance does the coarse quantizer actually
            # absorb? IVFADC only beats raw PQ when residuals are
            # SMALL — on unit vectors E||r||^2/E||x||^2 near 1.0 means
            # the cells capture (almost) nothing and residual
            # quantization is raw quantization in a shifted frame
            results[name]["residual_energy_ratio"] = round(
                float((R * R).sum() / (X * X).sum()), 4
            )
        print(f"  {name}: {results[name]}", file=sys.stderr)
    print(json.dumps({"n": len(X), "dim": dim, "queries": N_QUERIES,
                      "k": K, "conditions": results}))


if __name__ == "__main__":
    raise SystemExit(main())
