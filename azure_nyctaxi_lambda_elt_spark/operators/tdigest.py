"""t-digest mergeable quantile sketch (Dunning & Ertl 2019) over a
grouped DataFrame — the tail-accurate companion to the GK sketch
(plans/serving2_catalog.py approx_quantile_sketch): k1 scale-function
clustering spends its centroid budget on the distribution tails, so
p99/p999 keep near-constant RELATIVE rank error where GK's bound is
uniform.

Spark shape: the digest is an Arrow-batched kernel (numpy inside
``applyInPandas``), never a row-at-a-time UDF.  Construction here is
chunked-and-merged over the SORTED group — bit-deterministic, so the
catalog entry is hash-comparable run to run; a 100 TB deployment
builds per-partition partial digests with the SAME ``_merge_pass``
and tree-merges them (the merge property is pinned in
tests/test_temporal_sketch.py) — accuracy bounds are unchanged, only
determinism of the exact centroid layout is given up, which is why
the COMPARABLE output carries exact rank brackets + an ok flag
rather than raw centroids (same driver-oracle technique as
approx_quantile_sketch).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TDIGEST_DELTA = 100.0
TDIGEST_CHUNK = 4096
TDIGEST_QS = (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))


def _k1(q: np.ndarray | float) -> np.ndarray | float:
    """k1 scale function: δ/2π · asin(2q−1) — unit k-distance clusters
    shrink toward q→0/1, concentrating centroids in the tails."""
    return TDIGEST_DELTA / (2.0 * math.pi) * np.arcsin(
        np.clip(2.0 * np.asarray(q, dtype=np.float64) - 1.0, -1.0, 1.0))


def _merge_pass(means: np.ndarray, weights: np.ndarray
                ) -> tuple[np.ndarray, np.ndarray]:
    """One merging-digest pass over (mean-sorted) weighted centroids:
    greedily absorb neighbors while the cluster spans ≤ 1 unit of k1.
    This is BOTH the builder (over singletons) and the merger (over
    concatenated digests) — mergeability is the same code path."""
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    w_before = 0.0
    k_lo = float(_k1(0.0))
    for x, w in zip(means[1:], weights[1:]):
        q_hi = (w_before + cur_w + w) / total
        if float(_k1(q_hi)) - k_lo <= 1.0:
            cur_m += (x - cur_m) * w / (cur_w + w)
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            k_lo = float(_k1(w_before / total))
            cur_m, cur_w = float(x), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def build_digest(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Digest of a value array: sort, build per-chunk partials, then
    fold-merge — the same two-level shape a distributed build uses
    (per-partition partials → merge), made deterministic by sorting
    first."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    means = np.empty(0)
    weights = np.empty(0)
    for lo in range(0, len(v), TDIGEST_CHUNK):
        chunk = v[lo:lo + TDIGEST_CHUNK]
        cm, cw = _merge_pass(chunk, np.ones(len(chunk)))
        means, weights = merge_digests((means, weights), (cm, cw))
    return means, weights


def merge_digests(a: tuple[np.ndarray, np.ndarray],
                  b: tuple[np.ndarray, np.ndarray]
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Merge two digests: concatenate, stable-sort by (mean, weight),
    one merge pass.  Associative up to the accuracy bound — the
    distributed tree-merge path."""
    m = np.concatenate([a[0], b[0]])
    w = np.concatenate([a[1], b[1]])
    if len(m) == 0:
        return m, w
    order = np.lexsort((w, m))
    return _merge_pass(m[order], w[order])


def digest_quantile(means: np.ndarray, weights: np.ndarray,
                    q: float) -> float:
    """Standard t-digest quantile estimate: linear interpolation
    between centroid midpoints in cumulative-weight space."""
    total = float(weights.sum())
    target = q * total
    mid = np.cumsum(weights) - weights / 2.0
    if target <= mid[0]:
        return float(means[0])
    if target >= mid[-1]:
        return float(means[-1])
    i = int(np.searchsorted(mid, target))
    frac = (target - mid[i - 1]) / (mid[i] - mid[i - 1])
    return float(means[i - 1] + frac * (means[i] - means[i - 1]))


def rank_error_bound(n: int, q: float) -> int:
    """Conservative rank-error budget for δ=100: the local cluster
    weight near q is ≈ 4·n·q(1−q)/δ, and midpoint interpolation can
    stray across BOTH adjacent half-clusters — so budget 2× the
    cluster weight, +2 for the discrete-rank edges (empirically ≥1.4×
    headroom over the worst observed error at sf0.001–0.1)."""
    return int(math.ceil(8.0 * n * q * (1.0 - q) / TDIGEST_DELTA)) + 2


def tdigest_quantile_brackets(df: DataFrame, group_col: str,
                              value_col: str) -> DataFrame:
    """Per-group t-digest p50/p90/p99, emitted as exact rank brackets
    (``<q>_lo``/``<q>_hi`` = order statistics at ⌈q·n⌉ ∓ bound) plus
    ``<q>_ok`` = estimate landed inside — the deterministic,
    oracle-comparable encoding of the sketch guarantee."""
    fields = [f"{group_col} string", "n_events bigint"]
    for c, _ in TDIGEST_QS:
        fields += [f"{c}_lo double", f"{c}_hi double", f"{c}_ok boolean"]
    schema = ", ".join(fields)

    def per_group(pdf):
        import pandas as pd

        vals = np.sort(pdf[value_col].to_numpy(dtype=np.float64))
        n = len(vals)
        means, weights = build_digest(vals)
        row: dict = {group_col: pdf[group_col].iloc[0], "n_events": n}
        for c, q in TDIGEST_QS:
            est = digest_quantile(means, weights, q)
            err = rank_error_bound(n, q)
            target = int(math.ceil(q * n))
            lo = vals[max(1, target - err) - 1]
            hi = vals[min(n, target + err) - 1]
            row[f"{c}_lo"] = float(lo)
            row[f"{c}_hi"] = float(hi)
            row[f"{c}_ok"] = bool(lo <= est <= hi)
        return pd.DataFrame([row])

    return (df.select(F.col(group_col), F.col(value_col))
            .groupBy(group_col).applyInPandas(per_group, schema))
