"""Suffix arrays — the exact-overlap kernel named by the substring-pass
literature (Lee et al. 2021, "Deduplicating Training Data Makes Language
Models Better", builds corpus suffix arrays; cc_net itself has no
counterpart). The distributed pass (``operators/substring.py``) finds
candidate pairs with rolling-hash window grams; THIS module is the
per-pair exact kernel: a generalized suffix array + Kasai LCP over the
two strings gives the longest common substring with no hash-collision
caveat. numpy prefix-doubling construction (O(n log^2 n)), Kasai in a
tight per-char loop — candidate pairs are tiny (KB texts), so this runs
driver-of-the-UDF-batch side, never over the corpus.
"""

from __future__ import annotations

import numpy as np


def suffix_array(codes: np.ndarray) -> np.ndarray:
    """Suffix array of an int64 code sequence (prefix doubling, numpy).

    Returns ``sa`` with ``sa[r]`` = start index of the rank-r suffix.
    """
    n = len(codes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.unique(codes, return_inverse=True)[1].astype(np.int64)
    k = 1
    while rank.max() < n - 1:
        rank2 = np.full(n, -1, dtype=np.int64)
        rank2[: n - k] = rank[k:]
        order = np.lexsort((rank2, rank))
        key_r, key_r2 = rank[order], rank2[order]
        changed = (key_r[1:] != key_r[:-1]) | (key_r2[1:] != key_r2[:-1])
        new_rank = np.zeros(n, dtype=np.int64)
        new_rank[order[1:]] = np.cumsum(changed)
        rank = new_rank
        k *= 2
    sa = np.empty(n, dtype=np.int64)
    sa[rank] = np.arange(n)
    return sa


def lcp_array(codes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: ``lcp[r]`` = common-prefix length of the rank-(r-1) and
    rank-r suffixes (``lcp[0] = 0``)."""
    n = len(sa)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and codes[i + h] == codes[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def _codes(s: str) -> np.ndarray:
    # codepoints as int64; utf-32-le is a straight codepoint dump
    return np.frombuffer(s.encode("utf-32-le"), dtype="<u4").astype(np.int64)


def lcs_length(x: str, y: str) -> int:
    """Exact longest-common-substring length via a generalized suffix
    array: concatenate ``x <sep> y`` with a sentinel below any codepoint,
    build SA+LCP, and take the max LCP between rank-adjacent suffixes
    that start in DIFFERENT strings (the classical reduction; the
    sentinel is unique so no common prefix spans it)."""
    a, b = _codes(x), _codes(y)
    if len(a) == 0 or len(b) == 0:
        return 0
    codes = np.concatenate([a, np.array([-1], dtype=np.int64), b])
    sa = suffix_array(codes)
    lcp = lcp_array(codes, sa)
    in_a = sa < len(a)
    cross = in_a[1:] != in_a[:-1]
    return int(lcp[1:][cross].max(initial=0))
