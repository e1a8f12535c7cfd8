#!/usr/bin/env python
"""Recall economics for the IVF-accelerated kNN GRAPH (r14 verdict
task 6): the ann_recall_10x protocol applied to x3_knn_graph_ivf's
candidate generation — vectors x1 / x10 (replicas carry the same
deterministic +/-1% per-(rep, dim) ripple so exact ground truth has no
ties), n_centroids scaled with the corpus (lists held at ~125 vectors),
nprobe swept. Pure-numpy EXACT replay of the plan's deterministic
logic (the trainer/assignment/probe arithmetic is batch-invariant by
construction, gated bit-identical in tests), so the sweep measures the
CANDIDATE-SET recall the registered knobs buy, independent of host
timing noise.

Usage: python tools/graph_recall_probe.py [sf_dir]
"""
import hashlib
import sys
import time

import numpy as np
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def sha60(s: str) -> int:
    return int(hashlib.sha256(s.encode()).hexdigest()[:15], 16)


def train_coarse(Xm: np.ndarray, ids: np.ndarray, k: int, iters: int = 3,
                 tag: str = "pq:0") -> np.ndarray:
    """Exact numpy replay of train_coarse_centroids_int (same init
    ranking, lowest-index argmin, exact floor(sum/n), empty-cluster
    carry)."""
    order = sorted(range(len(ids)), key=lambda i: (sha60(f"{tag}:{ids[i]}"), ids[i]))
    cents = Xm[order[:k]].copy()
    for _ in range(iters):
        d2 = d2_int(Xm, cents)
        assign = np.argmin(d2, axis=1)
        new = cents.copy()
        for c in range(k):
            m = Xm[assign == c]
            if len(m):
                new[c] = np.floor(m.sum(axis=0) / len(m)).astype(np.int64)
        cents = new
    return cents


def d2_int(X, C):
    # norm-expansion, exact under 2^53 at these magnitudes
    return (
        (X.astype(np.float64) ** 2).sum(1)[:, None]
        - 2.0 * X.astype(np.float64) @ C.astype(np.float64).T
        + (C.astype(np.float64) ** 2).sum(1)[None, :]
    ).astype(np.int64)


def graph_recall(X: np.ndarray, k_coarse: int, nprobe: int, topk: int = 3):
    n = len(X)
    ids = np.arange(n)
    Xm = np.floor(X * 1000.0).astype(np.int64)
    t0 = time.time()
    cents = train_coarse(Xm, ids, k_coarse)
    d2 = d2_int(Xm, cents)
    assign = np.argmin(d2, axis=1)
    probes = np.argsort(d2, axis=1, kind="stable")[:, :nprobe]
    # exact cosine matrix (chunked)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    members = [np.nonzero(assign == c)[0] for c in range(k_coarse)]
    hits = 0
    exact_sim = Xn @ Xn.T
    np.fill_diagonal(exact_sim, -2.0)
    exact_top = np.argsort(-exact_sim, axis=1, kind="stable")[:, :topk]
    cand_sizes = 0
    for i in range(n):
        cand = np.concatenate([members[c] for c in probes[i]])
        cand = cand[cand != i]
        cand_sizes += len(cand)
        s = exact_sim[i, cand]
        order = np.lexsort((cand, -s))[:topk]
        got = set(cand[order])
        hits += len(got & set(exact_top[i]))
    return hits / (n * topk), cand_sizes / n, time.time() - t0


def load(sf):
    t = pq.read_table(f"{sf}/embeddings.parquet").to_pandas()
    t = t.sort_values("vec_id")
    return np.asarray([np.asarray(v, dtype=np.float64) for v in t["embedding"]])


def replicate(X, reps):
    out = [X]
    for r in range(1, reps):
        ripple = np.asarray(
            [1.0 + (((sha60(f"rep:{r}:{j}") % 2001) - 1000) / 100000.0)
             for j in range(X.shape[1])]
        )
        out.append(X * ripple[None, :])
    return np.concatenate(out)


X1 = load(SF)
print(f"corpus {SF}: {len(X1)} vectors")
for label, X, kc in (("x1", X1, 16), ("x10", replicate(X1, 10), 160)):
    for nprobe in (2, 4, 6, 8):
        r, cs, w = graph_recall(X, kc, nprobe)
        print(f"{label} n={len(X)} k_coarse={kc} nprobe={nprobe}: "
              f"edge_recall@3={r:.3f} cand/node={cs:.0f} ({w:.1f}s)")
