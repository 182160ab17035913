"""Deterministic synthetic clips corpus (FIXTURES.md §1/§5).

Generates the input-contract table
``(clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,
transcript string)`` with planted duplicate structure, fully derivable
from the row index — generation is distributed (``spark.range`` ->
``mapInPandas``) and identical regardless of partitioning, so the corpus,
the expected-pair and expected-cluster oracles, re-runs and resume are all
byte-stable (SURVEY.md §7.3 "determinism").

Group layout: rows are blocks of 8; group g owns indices [8g, 8g+8):

  role 0  base transcript (in-doc repeated paragraph when g % 5 == 0)
  role 1  exact duplicate of the base transcript
  role 2  normalization variant (case + digits + removable unicode punct —
          identical under ``normalize_for_dedup``)
  role 3  near-duplicate (~5% token edits)  -> MinHash/SimHash recall
  role 4  substring overlap (one >=60-char base paragraph embedded in
          otherwise-unrelated text)          -> substring-pass recall
  role 5  unrelated singleton
  role 6  unrelated singleton
  role 7  unrelated singleton carrying the HOT paragraph (skew probe: a
          shared >=60-char paragraph in 1/8 of the corpus; the substring /
          paragraph-hash buckets it creates must be cap-dropped, so role-7
          rows stay singletons in the expected clusters)

Expected clusters: {roles 0..4} of each group, cluster_id = role-0 clip_id
(the minimum, since ids are zero-padded indices). Audio: cluster members
share the same seeded PCM tone mix with per-row noise injected at ~45 dB
SNR (passes the >=30 dB invariant); singletons get unique PCM.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc_net_spark.multimodal.audio import wav_encode_pcm16

ROLES_PER_GROUP = 8
CLUSTER_ROLES = 5  # roles 0..4 form the planted cluster
HOT_PARAGRAPH = (
    "subscribe to our channel for more weekly updates and never miss "
    "an episode of the show"
)
def _letters(n: int) -> str:
    """Digit-free base-26 suffix — ``normalize_for_dedup`` maps digits to
    '0', which would collapse a digit-suffixed vocabulary into one token."""
    s = ""
    n += 1
    while n:
        n, r = divmod(n, 26)
        s += chr(ord("a") + r)
    return s


_VOCAB = ["word" + _letters(i) for i in range(400)] + ["item", "count", "track", "audio"]

SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string"
)


def _clip_id(i: int) -> str:
    return f"clip-{i:09d}"


def _base_paragraphs(g: int, seed: int, size_scale: int = 1) -> list[str]:
    rng = np.random.default_rng([seed, g])
    n_paras = int(rng.integers(4, 7)) * size_scale
    paras = []
    for p in range(n_paras):
        n_tok = int(rng.integers(10, 18))
        toks = list(rng.choice(_VOCAB, size=n_tok))
        # sprinkle digits so the normalization variant has digits to change
        toks[rng.integers(0, n_tok)] = f"take {rng.integers(100, 999)}"
        paras.append(" ".join(toks))
    if g % 5 == 0:
        paras.append(paras[0])  # in-doc repeat (keep-first semantics probe)
    return paras


def _unrelated_paragraphs(i: int, seed: int, size_scale: int = 1) -> list[str]:
    rng = np.random.default_rng([seed, 7_777_777, i])
    return [
        " ".join(rng.choice(_VOCAB, size=int(rng.integers(10, 18))))
        for _ in range(int(rng.integers(3, 6)) * size_scale)
    ]


def _norm_variant(paras: list[str], g: int) -> list[str]:
    out = []
    for j, p in enumerate(paras):
        q = p.upper() if j % 2 == 0 else p.capitalize()
        # swap digits for other digits (both normalize to '0') and append a
        # removable fullwidth punct char
        q = "".join(str((int(c) + 3) % 10) if c.isdigit() else c for c in q)
        out.append(q + "！")
    return out


def _near_dup(paras: list[str], g: int, seed: int) -> list[str]:
    rng = np.random.default_rng([seed, 31337, g])
    out = []
    for p in paras:
        toks = p.split()
        n_mut = max(1, int(len(toks) * 0.05))
        for idx in rng.choice(len(toks), size=n_mut, replace=False):
            toks[idx] = "edit" + _letters(int(rng.integers(1_000_000)))
        out.append(" ".join(toks))
    return out


def _substring_overlap(paras: list[str], i: int, seed: int, size_scale: int = 1) -> list[str]:
    donor = max(paras, key=len)  # >= 60 normalized chars
    other = _unrelated_paragraphs(i, seed, size_scale)
    return [other[0], donor, *other[1:]]


def _transcript(i: int, seed: int, include_hot: bool, size_scale: int = 1) -> str:
    g, r = divmod(i, ROLES_PER_GROUP)
    base = _base_paragraphs(g, seed, size_scale)
    if r == 0:
        paras = base
    elif r == 1:
        paras = base
    elif r == 2:
        paras = _norm_variant(base, g)
    elif r == 3:
        paras = _near_dup(base, g, seed)
    elif r == 4:
        paras = _substring_overlap(base, i, seed, size_scale)
    else:
        paras = _unrelated_paragraphs(i, seed, size_scale)
        if r == 7 and include_hot:
            # skew probe (opt-in): the hot paragraph is shared by every
            # role-7 row — a pathological bucket for the paragraph-hash,
            # LSH and substring passes. Isolated behind a doc-unique
            # >=50-char letter pad. NB the pad/hot junction windows are
            # genuine >=50-char shared substrings whenever two pads share a
            # 1-2 char suffix, so the expected-cluster oracle is only exact
            # with include_hot=False; skew tests assert cap/drop metrics
            # instead of exact clusters.
            rng = np.random.default_rng([seed, 424242, i])
            pad = "".join(chr(ord("a") + d) for d in rng.integers(0, 26, size=56))
            paras.append(pad)
            paras.append(HOT_PARAGRAPH)
    return "\n".join(paras)


def _group_audio_params(g: int, seed: int) -> tuple[int, int, np.ndarray, np.ndarray]:
    rng = np.random.default_rng([seed, 555, g])
    sr = int(rng.choice([8000, 16000]))
    dur_ms = int(rng.integers(300, 900))
    n_tones = int(rng.integers(2, 5))
    freqs = rng.uniform(80.0, min(3500.0, sr / 2.5), size=n_tones)
    amps = rng.uniform(0.1, 0.5, size=n_tones)
    return sr, dur_ms, freqs, amps


def _pcm(i: int, seed: int) -> tuple[int, int, np.ndarray]:
    g, r = divmod(i, ROLES_PER_GROUP)
    # cluster members (roles 0-4) share the group's PCM; singletons get
    # their own, keyed by absolute index
    key = g if r < CLUSTER_ROLES else 1_000_000_000 + i
    sr, dur_ms, freqs, amps = _group_audio_params(key, seed)
    n = int(sr * dur_ms / 1000)
    t = np.arange(n, dtype=np.float64) / sr
    sig = sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, amps))
    sig = 0.8 * sig / max(1e-9, np.max(np.abs(sig)))
    if r in (1, 2, 3, 4):
        # per-row noise at ~45 dB SNR: well above the 30 dB invariant floor
        rng = np.random.default_rng([seed, 999, i])
        p_sig = float(np.mean(sig**2))
        noise = rng.normal(0.0, np.sqrt(p_sig / 10**4.5), size=n)
        sig = np.clip(sig + noise, -1.0, 1.0)
    return sr, dur_ms, sig.astype(np.float32)


def generate_clips(
    spark: SparkSession,
    n_rows: int,
    *,
    seed: int = 42,
    with_audio: bool = True,
    include_hot: bool = False,
    size_scale: int = 1,
    partitions: int | None = None,
) -> DataFrame:
    """The clips table, generated distributed and deterministically.

    ``size_scale`` multiplies paragraph counts (bench realism knob —
    real transcripts are KBs, not hundreds of bytes)."""
    partitions = partitions or max(8, n_rows // 4096)
    base = spark.range(0, n_rows, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                transcript = _transcript(i, seed, include_hot, size_scale)
                if with_audio:
                    sr, dur_ms, pcm = _pcm(i, seed)
                    blob = wav_encode_pcm16(pcm, sr)
                else:
                    g = i // ROLES_PER_GROUP
                    sr, dur_ms, _, _ = _group_audio_params(g, seed)
                    blob = b""
                rows.append((_clip_id(i), blob, sr, dur_ms, "pcm_s16le", transcript))
            yield pd.DataFrame(
                rows, columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]
            )

    return base.mapInPandas(gen, schema=SCHEMA)


def expected_dup_pairs(spark: SparkSession, n_rows: int) -> DataFrame:
    """(clip_id_a, clip_id_b, kind) oracle — pure index math, no UDF.

    kind reflects which pass is expected to find the pair *directly*:
    pairs among roles {0,1,2} are exact; pairs with role 3 are
    minhash_near; pairs with role 4 are substring. All 10 pairs within a
    group's cluster roles are emitted (a < b canonical).
    """
    pair_specs = []
    for ra in range(CLUSTER_ROLES):
        for rb in range(ra + 1, CLUSTER_ROLES):
            if rb <= 2:
                kind = "exact_paragraph"
            elif rb == 3:
                kind = "minhash_near"
            else:
                kind = "substring"
            pair_specs.append((ra, rb, kind))
    n_groups = n_rows // ROLES_PER_GROUP
    groups = spark.range(0, n_groups).select(F.col("id").alias("g"))
    specs = F.array(
        *[
            F.struct(F.lit(ra).alias("ra"), F.lit(rb).alias("rb"), F.lit(k).alias("kind"))
            for ra, rb, k in pair_specs
        ]
    )
    fmt = "clip-%09d"
    exploded = groups.select("g", F.explode(specs).alias("s"))
    return exploded.select(
        F.format_string(fmt, F.col("g") * ROLES_PER_GROUP + F.col("s.ra")).alias("clip_id_a"),
        F.format_string(fmt, F.col("g") * ROLES_PER_GROUP + F.col("s.rb")).alias("clip_id_b"),
        F.col("s.kind").alias("kind"),
    )


def expected_clusters(spark: SparkSession, n_rows: int) -> DataFrame:
    """(clip_id, cluster_id) oracle over ALL rows (singletons = own id)."""
    rows = spark.range(0, n_rows).select(F.col("id"))
    g = (F.col("id") / ROLES_PER_GROUP).cast("long")
    r = F.col("id") % ROLES_PER_GROUP
    in_cluster = (r < CLUSTER_ROLES) & (g * ROLES_PER_GROUP + CLUSTER_ROLES <= F.lit(n_rows))
    root = F.when(in_cluster, g * ROLES_PER_GROUP).otherwise(F.col("id"))
    fmt = "clip-%09d"
    return rows.select(
        F.format_string(fmt, F.col("id")).alias("clip_id"),
        F.format_string(fmt, root).alias("cluster_id"),
    )
