"""QVZ-style rate-distortion quality quantization (lossy mode ``-q qvz``).

Reference analog: the embedded QVZ library (src/qvz/) — per-column
conditional PMFs (src/qvz/src/pmf.cpp), Lloyd-Max codebooks per
(column, previous-symbol) context (generate_codebooks,
src/qvz/src/codebook.cpp:421), used by Spring quantize-only, in place
(src/qvz/src/qvz.cpp:22-60); entropy coding happens downstream in the
block codec, exactly as Spring feeds QVZ output to BSC.

TPU-first redesign (not a port): the reference trains one scalar quantizer
per (column, previous symbol) pair with a WELL-RNG hi/lo dither. Here the
whole training pass is dense linear algebra over a (columns, contexts,
levels) histogram tensor:
  * conditional histograms by vectorized bincount over all reads at once;
  * Lloyd-Max iterations as cumulative-sum centroid updates (no loops over
    reads, only over the 64-symbol alphabet);
  * the level budget per column follows the reference's MODE_RATIO
    semantics: target bits ~= column entropy / ratio.
Quantization itself is a gather: q[i, col] = codebook[col, ctx, value].
"""
from __future__ import annotations

import numpy as np

QMIN, QMAX = 33, 104          # printable Phred range
NSYM = QMAX - QMIN + 1
NCTX = 8                      # previous-symbol context buckets
LLOYD_ITERS = 12


def _entropy(p: np.ndarray) -> np.ndarray:
    nz = p > 0
    h = np.zeros(p.shape[:-1])
    h = -np.sum(np.where(nz, p * np.log2(np.maximum(p, 1e-30)), 0), axis=-1)
    return h


def _lloyd_max(hist: np.ndarray, k: int) -> np.ndarray:
    """1-D Lloyd-Max on a histogram over NSYM symbols -> (NSYM,) mapping
    symbol -> reconstruction symbol, with k levels."""
    total = hist.sum()
    if total == 0 or k >= NSYM:
        return np.arange(NSYM)
    # init boundaries at quantiles
    cdf = np.cumsum(hist) / total
    bounds = np.searchsorted(cdf, np.arange(1, k) / k)
    sym = np.arange(NSYM)
    for _ in range(LLOYD_ITERS):
        level = np.searchsorted(bounds, sym, side="right")
        # centroids per level
        cent = np.zeros(k)
        for l in range(k):
            m = level == l
            w = hist[m]
            cent[l] = (np.sum(w * sym[m]) / w.sum()) if w.sum() else 0
        nb = np.round((cent[:-1] + cent[1:]) / 2).astype(np.int64)
        if np.array_equal(nb, bounds):
            break
        bounds = nb
    level = np.searchsorted(bounds, sym, side="right")
    cent = np.zeros(k)
    for l in range(k):
        m = level == l
        w = hist[m]
        if w.sum():
            # reconstruction at the rounded conditional mean (QVZ uses
            # unconstrained centroids too, src/qvz/src/quantizer.c) — the
            # snapped-to-observed variant cost ~2 MSE at low rates; the
            # codec's fine position contexts absorb the larger output
            # alphabet that centroid means produce
            cent[l] = np.round(np.sum(w * sym[m]) / w.sum())
    return cent[level].astype(np.int64)


def quantize_block(quals: list[bytes], ratio: float) -> list[bytes]:
    """Quantize quality strings in place (returns new list).

    Keeps read lengths; empty strings pass through.
    """
    if not quals:
        return quals
    L = max(len(q) for q in quals)
    if L == 0:
        return quals
    n = len(quals)
    mat = np.full((n, L), 255, np.uint8)
    for i, q in enumerate(quals):
        mat[i, : len(q)] = np.frombuffer(q, np.uint8)
    lens = np.fromiter((len(q) for q in quals), np.int64, n)
    res = quantize_matrix(mat, lens, ratio)
    return [res[i, : len(q)].tobytes() for i, q in enumerate(quals)]


def quantize_matrix(mat: np.ndarray, lengths: np.ndarray,
                    ratio: float) -> np.ndarray:
    """Quantize a padded (n, L) quality matrix; padding stays 0."""
    n, L = mat.shape
    if n == 0 or L == 0:
        return mat
    valid = np.arange(L)[None, :] < np.asarray(lengths)[:, None]
    sym = np.where(valid, np.clip(mat.astype(np.int32) - QMIN, 0, NSYM - 1), 0)

    # context: the previous column's quantized value, as its RANK in that
    # column's output alphabet (the reference conditions codebooks on the
    # exact quantized previous symbol, src/qvz/src/codebook.cpp:494-527;
    # value-bucket contexts blurred that and cost ~20% rate at mid
    # ratios). With few reads the conditional histograms are too noisy,
    # so pool contexts.
    pool = n < NCTX * 64
    max_ctx = 16

    # reference MODE_FIXED semantics (src/util.cpp:151-164 -> MODE_FIXED in
    # src/qvz/src/codebook.cpp:470-527): the target is an ABSOLUTE entropy
    # of `ratio` bits per symbol per (column, context); two bracketing
    # quantizers are mixed (the reference's hi/lo dither) to hit it exactly
    target = float(ratio)
    out = np.zeros_like(sym)
    ctx = np.zeros(n, np.int32)
    nctx = 1
    for col in range(L):
        v = valid[:, col]
        idx = ctx * NSYM + sym[:, col]
        hist = np.bincount(idx[v], minlength=nctx * NSYM).reshape(nctx, NSYM)
        p = hist / np.maximum(hist.sum(axis=1, keepdims=True), 1)
        h = _entropy(p)                      # (nctx,)
        maps = np.empty((nctx, NSYM), np.int64)
        for c in range(nctx):
            if h[c] <= target:
                maps[c] = np.arange(NSYM)
                continue
            # largest level count whose quantized entropy stays <= target
            # (the reference's per-value hi/lo dither would inject choice
            # noise the downstream codec cannot model; a hard floor keeps
            # the rate budget honest)
            m_lo = _lloyd_max(hist[c], 1)
            for k in range(2, NSYM + 1):
                m_k = _lloyd_max(hist[c], k)
                pq = np.bincount(m_k, weights=hist[c].astype(np.float64),
                                 minlength=NSYM)
                tot = pq.sum()
                h_k = float(_entropy(pq / tot)) if tot else 0.0
                if h_k > target:
                    break
                m_lo = m_k
            maps[c] = m_lo
        out[:, col] = maps[ctx, sym[:, col]]
        if pool:
            continue
        alpha = np.unique(out[v, col]) if v.any() else np.zeros(1, np.int64)
        nctx = int(max(1, min(len(alpha), max_ctx)))
        rank = np.searchsorted(alpha, out[:, col]).clip(0, nctx - 1)
        ctx = np.where(v, rank, ctx).astype(np.int32)
    return np.where(valid, out + QMIN, 0).astype(np.uint8)
