"""Text normalization with byte-level parity to the reference.

The dedup hash is computed over ``normalize_for_dedup(line)`` so the
normalizer must match the reference byte-for-byte
(``cc_net/text_normalizer.py:180-189``): strip -> lowercase -> unicode
digits -> "0" -> remove the 36-entry unicode-punctuation set and C0/C1
control chars. Accents are *kept* in the dedup normalizer (they are only
stripped by the general ``normalize``, ``cc_net/text_normalizer.py:158-173``).

Everything here is vectorized over pandas Series (Arrow batches); the
Python ``re`` module is used (not RE2) so ``\\d`` matches unicode digits
exactly as the reference does.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd

# The typographic/CJK punctuation translation table of the reference
# (``cc_net/text_normalizer.py:10-45``). Replacement values matter only for
# ``replace_unicode_punct``; for dedup the *key set* is what must match.
UNICODE_PUNCT: dict[str, str] = {
    "，": ",",
    "。": ".",
    "、": ",",
    "„": '"',
    "”": '"',
    "“": '"',
    "«": '"',
    "»": '"',
    "１": '"',
    "」": '"',
    "「": '"',
    "《": '"',
    "》": '"',
    "´": "'",
    "∶": ":",
    "：": ":",
    "？": "?",
    "！": "!",
    "（": "(",
    "）": ")",
    "；": ";",
    "–": "-",
    "—": " - ",
    "．": ". ",
    "～": "~",
    "’": "'",
    "…": "...",
    "━": "-",
    "〈": "<",
    "〉": ">",
    "【": "[",
    "】": "]",
    "％": "%",
    "►": "-",
}

UNICODE_PUNCT_RE = re.compile("[" + "".join(UNICODE_PUNCT) + "]")
# C0 (0-31) and C1 (127-159) control characters
# (``cc_net/text_normalizer.py:69-71``).
NON_PRINTING_CHARS_RE = re.compile(
    "[" + "".join(map(chr, [*range(0, 32), *range(127, 160)])) + "]"
)
DIGIT_RE = re.compile(r"\d")
# Single combined class, as the reference builds it
# (``cc_net/text_normalizer.py:73-75``).
PUNCT_OR_NON_PRINTING_CHARS_RE = re.compile(
    (UNICODE_PUNCT_RE.pattern + NON_PRINTING_CHARS_RE.pattern).replace("][", "")
)


def replace_unicode_punct(text: str) -> str:
    """Map typographic/CJK punctuation to ASCII (``text_normalizer.py:50-51``)."""
    return "".join(UNICODE_PUNCT.get(c, c) for c in text)


def remove_unicode_punct(text: str) -> str:
    """Delete the same punctuation set (``text_normalizer.py:54-56``)."""
    return UNICODE_PUNCT_RE.sub("", text)


def strip_accents(text: str) -> str:
    """NFD-decompose and drop combining marks (``text_normalizer.py:59-65``)."""
    nfd = unicodedata.normalize("NFD", text)
    return "".join(c for c in nfd if unicodedata.category(c) != "Mn")


def remove_non_printing_char(text: str) -> str:
    return NON_PRINTING_CHARS_RE.sub("", text)


def normalize(
    text: str, accent: bool = True, case: bool = True, numbers: bool = True, punct: int = 1
) -> str:
    """General normalizer (``cc_net/text_normalizer.py:158-173``)."""
    text = text.strip()
    if not text:
        return text
    if case:
        text = text.lower()
    if accent:
        text = strip_accents(text)
    if numbers:
        text = DIGIT_RE.sub("0", text)
    if punct == 1:
        text = replace_unicode_punct(text)
    elif punct == 2:
        text = remove_unicode_punct(text)
    return remove_non_printing_char(text)


# Ordered rewrite program for the Moses-style pre-tokenization spacing
# normalizer (``cc_net/text_normalizer.py:82-155``). Each step is either a
# literal str.replace or a regex sub, applied IN ORDER — order matters
# (e.g. "''" is rewritten twice at different points). Behavioral parity
# is byte-exact INCLUDING the port's quirks, which we keep deliberately:
# * ("lit", " +", " ") is a literal two-char pattern, not a regex —
#   the Moses original collapsed runs of spaces; the port does not,
# * ("lit", "([a-z])‘([a-z])", ...) are literal patterns that almost
#   never occur — regex-looking strings passed to str.replace,
# * several pseudo-space rules (("lit", "nº ", "nº "), (", ", ", "), ...)
#   are no-ops — the original matched NO-BREAK SPACE, the port lost it.
_SPACING_PROGRAM: list[tuple[str, str, str]] = [
    ("lit", "\r", ""),
    ("lit", "(", " ("),
    ("lit", ")", ") "),
    ("lit", " +", " "),
    # the reference's replacement templates are r"\)\1" / r"\1\%" — Python
    # leaves unknown escapes in templates ALONE, so a literal backslash
    # lands in the output; parity keeps it (explicitly escaped here)
    ("re", r"\) ([\.\!\:\?\;\,])", r"\\)\1"),
    ("lit", "( ", "("),
    ("lit", " )", ")"),
    ("re", r"(\d) \%", r"\1\\%"),
    ("lit", " :", ":"),
    ("lit", " ;", ";"),
    ("lit", "`", "'"),
    ("lit", "''", ' " '),
    ("lit", "„", '"'),
    ("lit", "“", '"'),
    ("lit", "”", '"'),
    ("lit", "–", "-"),
    ("lit", "—", " - "),
    ("lit", " +", " "),
    ("lit", "´", "'"),
    ("lit", "([a-z])‘([a-z])", r"\1'\2/"),
    ("lit", "([a-z])’([a-z])", r"\1'\2/"),
    ("lit", "‘", '"'),
    ("lit", "‚", '"'),
    ("lit", "’", '"'),
    ("lit", "''", '"'),
    ("lit", "´´", '"'),
    ("lit", "…", "..."),
    ("lit", " « ", ' "'),
    ("lit", "« ", '"'),
    ("lit", "«", '"'),
    ("lit", " » ", '" '),
    ("lit", " »", '"'),
    ("lit", "»", '"'),
    ("lit", " %", "%"),
    ("lit", "nº ", "nº "),
    ("lit", " :", ":"),
    ("lit", " ºC", " ºC"),
    ("lit", " cm", " cm"),
    ("lit", " ?", "?"),
    ("lit", " !", "!"),
    ("lit", " ;", ";"),
    ("lit", ", ", ", "),
    ("lit", " +", " "),
    ("lit", "．", ". "),
]


def normalize_spacing_for_tok(text: str, language: str = "en") -> str:
    """Pre-tokenization spacing/punctuation normalization
    (``cc_net/text_normalizer.py:82-155``; Moses `normalize-punctuation`
    lineage). Needed the day a real tokenizer+LM scorer is slotted in."""
    res = text
    for kind, old, new in _SPACING_PROGRAM:
        res = res.replace(old, new) if kind == "lit" else re.sub(old, new, res)
    if language == "en":
        # English: comma/period moves inside the closing quote
        res = re.sub(r"\"([,\.]+)", r"\1\"", res)
    elif language in ("cs", "cz"):
        pass
    else:
        # German/Spanish/French style
        res = res.replace(',"', '",')
        res = re.sub(r"(\.+)\"(\s*[^<])", r"\"\1\2", res)
    if language in ("de", "es", "cz", "cs", "fr"):
        res = re.sub(r"(\d) (\d)", r"\1,\2", res)
    else:
        res = re.sub(r"(\d) (\d)", r"\1.\2", res)
    return res


def normalize_for_dedup(text: str) -> str:
    """The dedup canonicalization (``cc_net/text_normalizer.py:180-189``)."""
    text = text.strip()
    if not text:
        return text
    text = text.lower()
    text = DIGIT_RE.sub("0", text)
    return PUNCT_OR_NON_PRINTING_CHARS_RE.sub("", text)


class _DedupTranslateTable(dict):
    """Lazy per-codepoint ``str.translate`` table for the dedup mapping.

    The two regex substitutions of ``normalize_for_dedup`` are both
    single-CODEPOINT character classes, so they fuse into one C-level
    translate pass: digit -> "0", punct/non-printing -> delete, everything
    else identity. Decisions are made ONCE per distinct codepoint with the
    very regexes the scalar path uses (byte parity by construction; a
    pytest asserts series == map(scalar)). Profiling: the two regex passes
    were ~30% of the fused signature kernel."""

    def __missing__(self, cp: int):
        ch = chr(cp)
        # digit FIRST: the reference substitutes digits before removing
        # punctuation, and its punct table contains full-width digits
        # (e.g. "１"), which must become "0", not be deleted
        if DIGIT_RE.match(ch):
            res: int | str | None = "0"
        elif PUNCT_OR_NON_PRINTING_CHARS_RE.match(ch):
            res = None
        else:
            res = cp
        self[cp] = res
        return res


_DEDUP_TABLE = _DedupTranslateTable()


def normalize_for_dedup_series(s: pd.Series) -> pd.Series:
    """Vectorized ``normalize_for_dedup`` over a pandas Series of strings.

    Equivalent to ``s.map(normalize_for_dedup)``. Nulls pass through as
    nulls.
    """
    vals = s.to_numpy(dtype=object)
    out = np.empty(len(vals), dtype=object)
    for i, t in enumerate(vals):
        out[i] = (
            t.strip().lower().translate(_DEDUP_TABLE)
            if isinstance(t, str)
            else None
        )
    return pd.Series(out, index=s.index, dtype="string")
