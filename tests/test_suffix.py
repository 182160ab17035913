"""Suffix-array kernel: property-tested against brute force, and
equivalent to the rolling-hash verify kernel on real candidates."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cc_net_spark.functions.suffix import lcp_array, lcs_length, suffix_array


def _lcs_dp(x: str, y: str) -> int:
    best = 0
    prev = [0] * (len(y) + 1)
    for i in range(1, len(x) + 1):
        cur = [0] * (len(y) + 1)
        for j in range(1, len(y) + 1):
            if x[i - 1] == y[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


ALPHA = st.text(alphabet="abcd", max_size=60)


@given(ALPHA)
@settings(max_examples=200, deadline=None)
def test_suffix_array_is_sorted_suffixes(s):
    codes = np.frombuffer(s.encode("utf-32-le"), dtype="<u4").astype(np.int64)
    sa = suffix_array(codes)
    suffixes = sorted(range(len(s)), key=lambda i: s[i:])
    assert list(sa) == suffixes


@given(ALPHA)
@settings(max_examples=100, deadline=None)
def test_lcp_matches_bruteforce(s):
    codes = np.frombuffer(s.encode("utf-32-le"), dtype="<u4").astype(np.int64)
    sa = suffix_array(codes)
    lcp = lcp_array(codes, sa)
    for r in range(1, len(sa)):
        a, b = s[sa[r - 1]:], s[sa[r]:]
        k = 0
        while k < min(len(a), len(b)) and a[k] == b[k]:
            k += 1
        assert lcp[r] == k


@given(ALPHA, ALPHA)
@settings(max_examples=200, deadline=None)
def test_lcs_length_matches_dp(x, y):
    assert lcs_length(x, y) == _lcs_dp(x, y)


def test_verify_kernels_agree_on_synth_candidates(spark):
    """Both exact-LCS kernels return identical overlap lengths for the
    synth corpus's substring candidates (incl. the planted 50+-char
    donor-paragraph overlaps)."""
    from pyspark.sql import functions as F

    from cc_net_spark.operators.substring import (
        substring_candidate_pairs,
        verify_overlap_length,
    )
    from cc_net_spark.sources import synth

    clips = synth.generate_clips(spark, 80, seed=42, with_audio=False)
    cand = substring_candidate_pairs(
        clips, "transcript", "clip_id", length=30, winnow_window=21
    ).localCheckpoint()

    def run(kernel):
        return {
            (r["id_a"], r["id_b"]): r["overlap_len"]
            for r in verify_overlap_length(
                cand, clips, "transcript", "clip_id",
                min_length=50, kernel=kernel,
            ).collect()
        }

    rolling, sa = run("rolling"), run("suffix_array")
    assert rolling == sa
    assert len(sa) > 0  # the planted overlaps actually verified
    assert all(v >= 50 for v in sa.values())
