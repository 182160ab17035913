"""Hashing primitives.

``str_hash``/``sha1_u64`` reproduce the reference's paragraph hash exactly:
first 8 bytes of ``sha1(utf8(s))`` reinterpreted as a little-endian uint64
(``cc_net/dedup.py:29-30,51-57,281-292``). Spark's builtin ``sha1()``
returns a hex string and ``xxhash64`` is a different function, so parity
requires this UDF-side implementation. Values are carried in Spark
``LongType`` as the *signed* reinterpretation of the uint64 bit pattern —
callers must compare bit patterns, never magnitudes.

The MinHash/SimHash/rolling-hash helpers are numpy-vectorized over whole
Arrow batches; no per-row Python beyond the unavoidable per-string sha1
calls (the reference itself loops ``hashlib.sha1`` per line,
``cc_net/dedup.py:282-291``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

HASH_BYTES = 8
U64 = np.uint64
# Reserved sentinel: the reference zeroes hashes of removed paragraphs and
# treats 0 as "already dropped" (``cc_net/dedup.py:160,312,426``). A real
# paragraph hashing to exactly 0 would be dropped; we reproduce this edge.
ZERO_SENTINEL = 0


def str_hash(s: str) -> int:
    """Reference-parity paragraph hash, returned as *signed* int64."""
    d = hashlib.sha1(s.encode("utf-8")).digest()[:HASH_BYTES]
    return int(np.frombuffer(d, dtype=np.int64, count=1)[0])


def sha1_u64_series(s: pd.Series) -> pd.Series:
    """Vectorized ``str_hash`` over a Series of (already normalized) strings.

    Returns an int64 Series (bit pattern of the LE uint64). Nulls -> pd.NA.
    """
    out = np.zeros(len(s), dtype=np.int64)
    mask = s.notna().to_numpy()
    vals = s.fillna("").to_numpy(dtype=object)
    # One sha1 per string, as the reference does; the buffer reinterpret is
    # batched.
    digests = b"".join(
        hashlib.sha1(str(v).encode("utf-8")).digest()[:HASH_BYTES] for v in vals
    )
    if len(s):
        out = np.frombuffer(digests, dtype=np.int64).copy()
        out[~mask] = 0
    res = pd.Series(out, index=s.index, dtype="Int64")
    res[~mask] = pd.NA
    return res


# ---------------------------------------------------------------------------
# Deterministic 64-bit string hashing for shingles (fast path; does NOT need
# reference parity — only self-consistency). Uses pandas' SipHash-1-3 with
# its fixed default key, which is stable across processes and executors.
# ---------------------------------------------------------------------------


def hash_str_array_u64(values: np.ndarray | pd.Series | list) -> np.ndarray:
    """Hash an array of strings to uint64, vectorized."""
    s = pd.Series(values, dtype=object)
    return pd.util.hash_pandas_object(s, index=False).to_numpy(dtype=U64)


# ---------------------------------------------------------------------------
# MinHash
# ---------------------------------------------------------------------------

def _splitmix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — a full-avalanche 64-bit mixer (public domain
    constant set, Steele et al. 2014). All ops wrap mod 2^64."""
    z = z + U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> U64(30))) * U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> U64(27))) * U64(0x94D049BB133111EB)
    return z ^ (z >> U64(31))


def minhash_params(num_perm: int, seed: int = 1337) -> tuple[np.ndarray, np.ndarray]:
    """Seeded per-permutation keys (second array kept for API symmetry)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, np.iinfo(np.uint64).max, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    flat_hashes: np.ndarray,
    offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
) -> np.ndarray:
    """MinHash signatures for a batch of documents at once.

    flat_hashes: uint64 shingle hashes of all docs concatenated.
    offsets: int64 array of len n_docs+1; doc i owns flat[offsets[i]:offsets[i+1]].
    Returns (n_docs, num_perm) uint64. Docs with zero shingles get all-max
    signatures (never match anything).

    "Permutation" k ranks shingles by ``splitmix64(h ^ key_k) + b_k`` — a
    full-avalanche mix, so minima are unbiased Jaccard estimators (the
    earlier multiply-mask family measurably biased estimates low). The
    family only needs corpus-wide consistency, not reference parity.

    Layout note: computed per document as a (num_perm, S) block — S is
    tens of shingles, so each block stays L2-resident. A whole-batch
    (num_perm, n_flat) formulation with ``np.minimum.reduceat`` measured
    ~50x slower single-threaded and anti-scaled across executor threads
    (hundreds of MB of temporaries streaming through the shared L3).
    """
    n_docs = len(offsets) - 1
    num_perm = len(a)
    sig = np.full((n_docs, num_perm), np.iinfo(np.uint64).max, dtype=U64)
    if len(flat_hashes) == 0:
        return sig
    ak = a[:, None]
    bk = b[:, None]
    for i in range(n_docs):
        seg = flat_hashes[offsets[i] : offsets[i + 1]]
        if len(seg) == 0:
            continue
        vals = _splitmix64(seg[None, :] ^ ak) + bk
        sig[i] = vals.min(axis=1)
    return sig


# ---------------------------------------------------------------------------
# SimHash (64-bit)
# ---------------------------------------------------------------------------


def simhash64(
    flat_hashes: np.ndarray, offsets: np.ndarray, weights: np.ndarray | None = None
) -> np.ndarray:
    """64-bit SimHash per document from flat token hashes + offsets.

    Bit j of the output is 1 iff the (weighted) count of tokens with bit j
    set exceeds half the (weighted) token count. Returns int64 (bit pattern).
    Empty docs get signature 0. Computed per document ((S, 64) bit blocks
    stay cache-resident; see the layout note on ``minhash_signatures``).
    """
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.int64)
    if len(flat_hashes) == 0:
        return out
    for i in range(n_docs):
        lo, hi = offsets[i], offsets[i + 1]
        if lo == hi:
            continue
        seg = flat_hashes[lo:hi]
        bytes_view = seg.astype("<u8").view(np.uint8).reshape(-1, 8)
        bits = np.unpackbits(bytes_view, axis=1, bitorder="little")
        if weights is None:
            sums = bits.sum(axis=0, dtype=np.float64)
            total = float(hi - lo)
        else:
            w = weights[lo:hi]
            sums = (bits * w[:, None]).sum(axis=0, dtype=np.float64)
            total = float(w.sum())
        sig_bits = (sums > total / 2.0).astype(np.uint8)
        out[i] = np.packbits(sig_bits, bitorder="little").view("<u8")[0].astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# Rolling polynomial hash over all length-L character windows (stride 1).
# Used by the substring-overlap pass (SURVEY.md §7.1 step 7).
# ---------------------------------------------------------------------------

_ROLL_P = U64(1000003)  # odd -> invertible mod 2^64
_ROLL_P_INV = U64(pow(1000003, -1, 1 << 64))

# Power tables are input-independent (just powers of P / P^-1): computed
# once per process and grown geometrically — the per-doc cumprods were
# half of window_hashes' accumulate work. Both arrays are published in
# one tuple assignment so a concurrent reader can never pair a grown
# pows with a stale shorter invpows (broadcast shape error otherwise if
# a worker ever runs UDFs on multiple threads).
_pow_tables_cache: tuple[np.ndarray, np.ndarray] = (
    np.array([1, 1000003], dtype=U64),
    np.array([_ROLL_P_INV], dtype=U64),
)


def _pow_tables(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(pows[0..n], invpows[0..n-1]) with pows[k] = P^k, invpows[j] = P^-(j+1)."""
    global _pow_tables_cache
    pows, invpows = _pow_tables_cache
    if len(pows) < n + 1:
        grow = max(n + 1, 2 * len(pows))
        pows = np.empty(grow, dtype=U64)
        pows[0] = 1
        np.multiply.accumulate(np.full(grow - 1, _ROLL_P, dtype=U64), out=pows[1:])
        invpows = np.multiply.accumulate(
            np.full(grow - 1, _ROLL_P_INV, dtype=U64)
        )
        _pow_tables_cache = (pows, invpows)
    return pows, invpows


def window_hashes(text: str, L: int) -> np.ndarray:
    """uint64 hashes of every length-L character window of `text`.

    Position-independent polynomial hash mod 2^64, computed fully
    vectorized via the prefix trick: with prefix P[k] = sum c[j] p^(k-1-j),
    window hash at i is P[i+L] - P[i] * p^L. P[k] itself is computed as
    p^k * cumsum(c[j] * p^(-1-j)) using the modular inverse of p, so the
    whole thing is O(n) numpy with uint64 wraparound.
    """
    n = len(text)
    if n < L:
        return np.empty(0, dtype=U64)
    c = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(U64)
    pows, invpows = _pow_tables(n)
    s = np.zeros(n + 1, dtype=U64)
    np.add.accumulate(c * invpows[:n], out=s[1:])
    prefix = pows[: n + 1] * s
    return prefix[L:] - prefix[:-L] * pows[L]


def token_shingle_hashes(
    tok_hashes: np.ndarray, tok_offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hash of every k-token window, from PER-TOKEN hashes.

    Replaces the materialize-the-gram-string path: profiling showed
    building ``" ".join(toks[j:j+k])`` strings dominated the fused
    signature kernel (~4.2 s/1000 docs vs 0.76 s for hashing them), so
    shingle hashes are now an order-sensitive polynomial combine of the
    (already computed, SipHash-strength) token hashes, finished with a
    full-avalanche splitmix64 — a handful of vectorized passes over the
    window array, no string materialization. Like the previous scheme
    this needs only corpus-wide self-consistency, not reference parity;
    two distinct windows collide with prob ~2^-64 (difference polynomial
    in an odd constant over Z/2^64 must vanish on random inputs).

    tok_hashes: uint64 hashes of all docs' tokens, concatenated.
    tok_offsets: int64, len n_docs+1; doc i owns tok_hashes[o[i]:o[i+1]].
    Returns (flat gram hashes, gram_offsets) in the same layout; docs
    with fewer than k tokens own zero grams (== the string path).
    """
    counts = np.maximum(tok_offsets[1:] - tok_offsets[:-1] - (k - 1), 0)
    gram_offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    total = int(gram_offsets[-1])
    if total == 0:
        return np.empty(0, dtype=U64), gram_offsets
    # index into tok_hashes of each window start: doc i contributes
    # tok_offsets[i] .. tok_offsets[i] + counts[i] - 1
    starts = np.repeat(tok_offsets[:-1], counts) + (
        np.arange(total, dtype=np.int64) - np.repeat(gram_offsets[:-1], counts)
    )
    mult = U64(0x9E3779B97F4A7C15)  # odd => position-distinct contributions
    acc = tok_hashes[starts].copy()
    for j in range(1, k):
        acc = acc * mult + tok_hashes[starts + j]
    return _splitmix64(acc), gram_offsets


def winnow(hashes: np.ndarray, w: int) -> np.ndarray:
    """Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
    SIGMOD'03 — the MOSS algorithm): the minimum hash of every w-window of
    consecutive window-hashes. Guarantee: two documents sharing a
    substring of length >= L + w - 1 share at least one selected
    fingerprint (selection depends only on hash values, which are
    position-independent). Returns the distinct selected values —
    ~2/(w+1) of the input, cutting the shuffled gram table ~10x."""
    if len(hashes) == 0:
        return hashes
    if len(hashes) <= w:
        return np.unique(hashes.min(keepdims=True))
    # O(n) sliding min via per-block prefix/suffix minima (the classic
    # "sparse table in blocks of w" trick): out[i] = min(suffix_min within
    # i's block from i, prefix_min within (i+w-1)'s block up to i+w-1).
    # ~3 linear passes independent of w — the naive windowed min walks
    # w*n elements (w=21 default), and measured 4x slower per doc.
    n = len(hashes)
    m = n - w + 1
    pad = (-n) % w
    hp = (
        np.concatenate([hashes, np.full(pad, np.iinfo(hashes.dtype).max, hashes.dtype)])
        if pad
        else hashes
    )
    blocks = hp.reshape(-1, w)
    pref = np.minimum.accumulate(blocks, axis=1).ravel()
    suff = np.minimum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].ravel()
    mins = np.minimum(suff[:m], pref[w - 1 : w - 1 + m])
    # each selected minimum repeats over ~w consecutive windows — collapse
    # the runs BEFORE the sort inside np.unique (~w-fold less sort work)
    keep = np.empty(m, dtype=bool)
    keep[0] = True
    np.not_equal(mins[1:], mins[:-1], out=keep[1:])
    return np.unique(mins[keep])
