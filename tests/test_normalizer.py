"""Normalizer goldens transliterated from the reference
(``tests/test_normalizer.py:10-29``)."""

import pandas as pd

from cc_net_spark.functions import normalize as txt

WEIRD_PUNCT = "，。、„”“«»１」「《》´∶：？！（）；–—．～’…━〈〉【】％"


def test_unicode_punct():
    replaced = ',.,""""""""""\'::?!();- - . ~\'...-<>[]%'
    assert txt.replace_unicode_punct(WEIRD_PUNCT) == replaced
    assert txt.remove_unicode_punct(WEIRD_PUNCT) == ""


def test_numbers():
    weird = "０２３４５６７８９ | 0123456789"
    normalized = "000000000 | 0000000000"
    assert txt.normalize(weird, numbers=True) == normalized
    assert txt.normalize(weird, numbers=False) == weird


def test_normalize_for_dedup():
    weird = "０２３´∶：\x10 | ;012 hèllo"
    normalized = "000 | ;000 hèllo"
    # slow path (general normalize with punct removal, accents kept)
    assert normalized == txt.normalize(weird, accent=False, case=True, numbers=True, punct=2)
    assert normalized == txt.normalize_for_dedup(weird)


def test_vectorized_matches_scalar():
    cases = [
        WEIRD_PUNCT,
        "０２３´∶：\x10 | ;012 hèllo",
        "  _Hello  ",
        "",
        "   ",
        "ONLY ASCII 123",
        "tabs\tand\x7fdel",
    ]
    got = txt.normalize_for_dedup_series(pd.Series(cases)).tolist()
    assert got == [txt.normalize_for_dedup(c) for c in cases]


def test_accents_kept_in_dedup_but_stripped_in_normalize():
    assert txt.normalize_for_dedup("hèllo") == "hèllo"
    assert txt.normalize("hèllo", accent=True) == "hello"
    assert txt.strip_accents("hèllo") == "hello"
