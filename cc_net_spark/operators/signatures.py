"""Fused signature stage: ONE corpus scan + ONE normalization pass
emitting every per-document artifact the near-dup pipeline needs.

Round-2 measurement (BENCH/BASELINE.md): the engine sits on this VM's
memory-bandwidth wall, and the flagship pipeline was paying ~4 separate
scan+normalize passes over the corpus (minhash signatures, simhash
signatures, full-transcript exact hash, substring grams — each its own
mapInPandas reading and re-normalizing the text). This module fuses them:

  clips -> ONE mapInPandas -> (id, n_shingles, [shingles], sig,
                               simhash, [grams], tkey)

* sig       MinHash signature over word shingles (== minhash.shingle_signatures)
* shingles  distinct u64 shingle hashes (exact-Jaccard verification side)
* simhash   64-bit SimHash over the token multiset (== simhash.simhash_signatures)
* grams     winnowed rolling-hash substring fingerprints (== substring.doc_window_grams,
            pre-explode: stored as an array, exploded JVM-side by the consumer)
* tkey      sha1-u64 of the whole normalized text (== exact_dedup.dedup_hash_udf)

The per-row work shares ONE ``normalize_for_dedup_series`` call and ONE
``str.split()`` per text; token/gram hashing stays batched exactly as in
the standalone operators, so every output is bit-identical to its
standalone counterpart (asserted by ``tests/test_pipeline.py``).

At 10^12 rows this is still a narrow map — no shuffle until the (much
smaller) band/gram tables derived from it.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cc_net_spark.functions.hashing import (
    hash_str_array_u64,
    minhash_params,
    minhash_signatures,
    sha1_u64_series,
    token_shingle_hashes,
    window_hashes,
    winnow,
)
from cc_net_spark.functions.normalize import normalize_for_dedup_series


def fused_signatures(
    df: DataFrame,
    field: str,
    id_col: str,
    *,
    shingle_size: int = 5,
    num_perm: int = 128,
    seed: int = 1337,
    keep_shingles: bool = True,
    substring_length: int = 30,
    winnow_window: int = 21,
    with_grams: bool = True,
    simhash_ngram: int = 1,
) -> DataFrame:
    """All per-doc signatures from one scan+normalize (see module doc).

    ``with_grams=False`` skips the substring-fingerprint computation and
    column — for consumers (e.g. the incremental near-dup state) that
    run no substring pass and must not pay the window-hash cost.
    ``simhash_ngram>1`` switches the SimHash features from the unigram
    multiset to word n-grams (see ``simhash.simhash_signatures`` — the
    unigram fingerprint of a long document converges to its word
    DISTRIBUTION, merging unrelated same-vocabulary docs); both paths
    reuse the one shared token-hash pass and stay bit-identical to the
    standalone operator."""
    a, b = minhash_params(num_perm, seed)
    shingle_cols = ", shingles array<long>" if keep_shingles else ""
    gram_cols = " grams array<long>," if with_grams else ""
    # sig entries store the TOP 32 BITS of each 64-bit minimum (see
    # minhash.shingle_signatures): equality semantics preserved, half
    # the bytes in the pipeline's dominant table and verify-join shuffle
    out_schema = (
        f"{id_col} string, n_shingles int{shingle_cols}, sig array<int>,"
        f" simhash long,{gram_cols} tkey long"
    )
    src = df.select(F.col(id_col).cast("string").alias(id_col), F.col(field))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            norm = normalize_for_dedup_series(pdf[field]).fillna("")
            n_rows = len(norm)

            # --- ONE tokenize + ONE vectorized token-hash call, shared by
            # the simhash AND word-shingle paths (shingle hashes are a
            # rolling combine of token hashes — no gram strings built)
            all_toks: list[str] = []
            tok_counts = np.zeros(n_rows, dtype=np.int64)
            for i, t in enumerate(norm):
                toks = t.split()
                all_toks.extend(toks)
                tok_counts[i] = len(toks)
            tok_flat = (
                hash_str_array_u64(all_toks) if all_toks else np.empty(0, np.uint64)
            )
            tok_offsets = np.concatenate([[0], np.cumsum(tok_counts)]).astype(np.int64)

            # --- word-shingle hashes from the token hashes
            flat_all, bounds = token_shingle_hashes(
                tok_flat, tok_offsets, shingle_size
            )
            per_row = [
                np.unique(flat_all[bounds[i] : bounds[i + 1]]) for i in range(n_rows)
            ]
            offsets = np.concatenate(
                [[0], np.cumsum([len(x) for x in per_row])]
            ).astype(np.int64)
            flat = (
                np.concatenate(per_row) if per_row else np.empty(0, np.uint64)
            ).astype(np.uint64)
            sig = (minhash_signatures(flat, offsets, a, b) >> np.uint64(32)).astype(
                np.uint32
            ).view(np.int32)

            # --- simhash over the token (or n-gram) multiset, from the
            # same token hashes — shared path with the standalone op
            from cc_net_spark.operators.simhash import simhash_from_token_hashes

            sims = simhash_from_token_hashes(tok_flat, tok_offsets, simhash_ngram)

            # --- winnowed substring fingerprints (kept as per-row arrays;
            # the consumer explodes them JVM-side)
            gram_arrays = []
            if with_grams:
                for t in norm:
                    wh = window_hashes(t, substring_length)
                    g = winnow(wh, winnow_window) if winnow_window > 1 else np.unique(wh)
                    gram_arrays.append(g.view(np.int64))

            # --- full-text exact-dup key (== dedup_hash_udf(raw_text))
            tkeys = sha1_u64_series(norm).astype("int64")

            out = {
                id_col: pdf[id_col],
                "n_shingles": pd.Series(
                    (offsets[1:] - offsets[:-1]).astype(np.int32), index=pdf.index
                ),
            }
            if keep_shingles:
                out["shingles"] = pd.Series(
                    [arr.view(np.int64) for arr in per_row], index=pdf.index
                )
            out["sig"] = pd.Series(list(sig), index=pdf.index)
            out["simhash"] = pd.Series(sims, index=pdf.index)
            if with_grams:
                out["grams"] = pd.Series(list(gram_arrays), index=pdf.index)
            out["tkey"] = tkeys.set_axis(pdf.index)
            yield pd.DataFrame(out)

    return src.mapInPandas(compute, schema=out_schema)
