"""The closed-form NTILE bucket assignment used by
column_stats_histogram (plans/ext3_catalog.py) — property-tested in
pure Python against the NTILE definition (first n%b buckets take
ceil(n/b) rows, the rest floor(n/b)), including the float-error regime
that bit us at sf0.01 (F.ceil over a double quotient)."""

from __future__ import annotations

from hypothesis import given, strategies as st


def ntile_direct(n: int, b: int) -> list[int]:
    """Reference NTILE: explicit bucket sizes."""
    q, rem = divmod(n, b)
    out = []
    for i in range(1, b + 1):
        size = q + 1 if i <= rem else q
        out.extend([i] * size)
    return out


def bucket_closed_form(r: int, n: int, b: int) -> int:
    """The exact integer arithmetic the Spark plan folds in."""
    q, rem = divmod(n, b)
    big = rem * (q + 1)
    if q == 0:
        return r
    if r <= big:
        return (r + q) // (q + 1)
    return rem + (r - big + q - 1) // q


@given(st.integers(min_value=1, max_value=5000),
       st.integers(min_value=1, max_value=64))
def test_closed_form_matches_ntile(n, b):
    want = ntile_direct(n, b)
    got = [bucket_closed_form(r, n, b) for r in range(1, n + 1)]
    assert got == want


@given(st.integers(min_value=1, max_value=10**7),
       st.integers(min_value=2, max_value=1000))
def test_closed_form_boundary_ranks_exact(n, b):
    """Spot the boundary ranks only (full enumeration is too slow at
    1e7): the last rank of every bucket must land in that bucket, and
    the next rank in the next bucket — this is exactly where double
    division failed."""
    q, rem = divmod(n, b)
    if q == 0:
        return
    edge = 0
    for i in range(1, b + 1):
        edge += q + 1 if i <= rem else q
        assert bucket_closed_form(edge, n, b) == i
        if edge < n:
            assert bucket_closed_form(edge + 1, n, b) == i + 1


# ---------------------------------------------------------------------------
# deletion-neighborhood completeness (fuzzy_name_linkage's blocking)


def _del_keys(s: str) -> set[str]:
    return {s} | {s[:i] + s[i + 1:] for i in range(len(s))}


def _lev1(a: str, b: str) -> bool:
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # insertion: b is a with one char added
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


@given(st.lists(st.text(alphabet="ab0", min_size=0, max_size=6),
                min_size=2, max_size=12, unique=True))
def test_deletion_neighborhood_blocking_is_complete(names):
    """Every lev<=1 pair shares at least one deletion-neighborhood key
    — the completeness guarantee the Spark candidate join relies on
    (a small alphabet maximizes accidental lev-1 pairs)."""
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            if _lev1(a, b):
                assert _del_keys(a) & _del_keys(b), (a, b)
