"""Minify / unminify — metadata projection + reconstruction join
(SURVEY.md §2.3/§2.5; reference ``cc_net/minify.py``).

``minify`` projects a processed doc down to its identifying metadata plus
``line_ids`` (which paragraphs of the ORIGINAL doc survived dedup) —
the reference packs line_ids as base64 ``<u2`` (``cc_net/minify.py:62-69``,
implying <= 65,535 lines/doc); we keep a native ``array<int>`` since
Parquet stores it compactly.

``unminify`` is the reference's ``MetadataFetcher`` join
(``cc_net/minify.py:101-211``): metadata ⋈ original docs on the id, then
gather paragraphs by ``line_ids`` to rebuild the deduped content. The
reference requires co-ordered per-segment iteration; here it is a plain
join — co-location comes from bucketed/partitioned storage, and
Catalyst/AQE picks broadcast vs shuffle.
"""

from __future__ import annotations

import base64

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, LongType, StringType

MINIFY_COLUMNS = ["language", "language_score", "perplexity", "bucket", "cc_segment"]


# ---------------------------------------------------------------------------
# wire-format codecs — byte-compatible with reference-produced metadata
# ---------------------------------------------------------------------------


def encode_line_ids(line_ids) -> str:
    """base64 of little-endian uint16 array (``cc_net/minify.py:62-64``) —
    the reference's on-disk line_ids format (implies <= 65,535 lines/doc)."""
    return base64.b64encode(np.asarray(line_ids, dtype="<u2").tobytes()).decode("ascii")


def decode_line_ids(compact: str) -> list[int]:
    """Inverse codec. NB the reference decodes as ``<i2``
    (``cc_net/minify.py:67-69``), which corrupts ids > 32767; we decode
    ``<u2`` (matching the encoder) and document the divergence."""
    return np.frombuffer(base64.b64decode(compact), dtype="<u2").astype("int32").tolist()


# The reference's minify wire format uses 4-byte (uint32) sha1 prefixes
# (HASH_SIZE=4, ``cc_net/minify.py:20-21,38-58``); the engine's own dedup
# hash columns are 8-byte sha1-u64 (``cc_net/dedup.py`` parity). Both
# widths are supported: hash_size=4 reads/writes reference-produced dumps
# byte-for-byte, hash_size=8 round-trips internal hash columns.
REFERENCE_HASH_SIZE = 4
INTERNAL_HASH_SIZE = 8


def encode_hashes(hashes: list[bytes], hash_size: int = REFERENCE_HASH_SIZE) -> str:
    """base64 of concatenated ``hash_size``-byte sha1-prefix hashes
    (``cc_net/minify.py:43-44``; the reference writes 4-byte prefixes)."""
    return base64.b64encode(b"".join(h[:hash_size] for h in hashes)).decode("ascii")


def decode_hashes(compact: str, hash_size: int = REFERENCE_HASH_SIZE) -> list[bytes]:
    """Inverse codec (``cc_net/minify.py:51-58``). hash_size must match the
    encoder's: 4 for reference-produced dumps, 8 for internal dumps."""
    raw = base64.b64decode(compact)
    assert len(raw) % hash_size == 0, "hash blob not a multiple of hash_size"
    return [raw[i : i + hash_size] for i in range(0, len(raw), hash_size)]


def doc_key(digest: str, hash_size: int = INTERNAL_HASH_SIZE) -> int:
    """Join key from a CC ``sha1:BASE32`` digest (``cc_net/minify.py:72-75``):
    b32decode, first ``hash_size`` bytes as a little-endian unsigned int.

    hash_size=8 (default) yields the SAME formula as this engine's dedup
    hash (sha1[:8] LE-u64, carried as signed int64), so digests join
    directly against internal hash columns. hash_size=4 reproduces the
    reference's ``get_doc_key`` (uint32) exactly, for joining against
    reference-minified metadata."""
    assert digest.startswith("sha1:"), digest
    raw = base64.b32decode(digest[5:])
    if hash_size == 4:
        return int(np.frombuffer(raw[:4], dtype="<u4")[0])
    return int(np.frombuffer(raw[:8], dtype="<u8").view("<i8")[0])


@pandas_udf(StringType())
def encode_line_ids_udf(line_ids: pd.Series) -> pd.Series:
    return line_ids.map(encode_line_ids)


@pandas_udf(ArrayType(IntegerType()))
def decode_line_ids_udf(compact: pd.Series) -> pd.Series:
    return compact.map(decode_line_ids)


@pandas_udf(LongType())
def doc_key_udf(digest: pd.Series) -> pd.Series:
    return digest.map(doc_key)


def minify(
    deduped: DataFrame,
    id_col: str = "doc_id",
    keep: list[str] | None = None,
    wire_compat: bool = False,
) -> DataFrame:
    """Project to id + line_ids + whichever metadata columns exist, with the
    reference's rounding (pp -> 1dp, score -> 2dp, ``cc_net/minify.py:91-97``).

    ``wire_compat=True`` emits line_ids in the reference's base64 ``<u2``
    string format instead of a native array (cross-compat with
    reference-produced minified metadata)."""
    lid = encode_line_ids_udf(F.col("line_ids")) if wire_compat else F.col("line_ids")
    cols = [F.col(id_col), lid.alias("line_ids")]
    present = set(deduped.columns)
    for c in keep if keep is not None else MINIFY_COLUMNS:
        if c not in present:
            continue
        if c == "perplexity":
            cols.append(F.round(F.col(c), 1).alias(c))
        elif c == "language_score":
            cols.append(F.round(F.col(c), 2).alias(c))
        else:
            cols.append(F.col(c))
    return deduped.select(*cols)


def unminify(
    meta: DataFrame,
    originals: DataFrame,
    field: str = "raw_content",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rebuild deduped content: meta ⋈ originals, then gather the original
    paragraphs at ``line_ids`` (``cc_net/minify.py:173-195``). String-typed
    (wire-compat base64) line_ids are decoded transparently."""
    if dict(meta.dtypes)["line_ids"] == "string":
        meta = meta.withColumn("line_ids", decode_line_ids_udf(F.col("line_ids")))
    orig = originals.select(F.col(id_col), F.split(F.col(field), "\n").alias("_lines"))
    joined = meta.join(orig, id_col, "inner")
    gathered = F.transform(F.col("line_ids"), lambda i: F.element_at("_lines", i + 1))
    return (
        joined.withColumn(field, F.array_join(gathered, "\n"))
        .withColumn("nlines", F.size("line_ids"))
        .withColumn("length", F.length(field))
        .drop("_lines")
    )
