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
        # "１" is BOTH a unicode digit and a member of the reference's
        # punct table — the scalar order (digit sub BEFORE punct removal)
        # must map it to "0", not delete it (caught a translate-table
        # ordering bug)
        "，。、„１European 99",
    ]
    got = txt.normalize_for_dedup_series(pd.Series(cases)).tolist()
    assert got == [txt.normalize_for_dedup(c) for c in cases]


def test_accents_kept_in_dedup_but_stripped_in_normalize():
    assert txt.normalize_for_dedup("hèllo") == "hèllo"
    assert txt.normalize("hèllo", accent=True) == "hello"
    assert txt.strip_accents("hèllo") == "hello"


def test_normalize_spacing_for_tok_golden():
    """Byte parity with the reference's Moses-style spacing normalizer
    (``cc_net/text_normalizer.py:82-155``), goldens generated from a
    64k-case differential run against the reference (0 mismatches).
    Includes the port's quirks kept deliberately: literal " +" patterns,
    no-op pseudo-space rules, and backslashes from unknown template
    escapes (r"\\)", r"\\%", r'\\"')."""
    cases = [
        ("hello ( world ) .", "en", "hello  (world)  ."),
        ("12 34 cm", "en", "12.34 cm"),
        ("12 34", "fr", "12,34"),
        ('he said "yes," ok', "en", 'he said "yes," ok'),
        ('he said "yes," ok', "de", 'he said "yes", ok'),
        ("a « b » c", "en", 'a "b" c'),
        ("5 % of nº 3", "en", "5\\% of nº 3"),
        ("it’s ‘fine’…", "en", 'it"s "fine...\\"'),
        ("x\r`y''z", "en", "x'y \" z"),
        ("3 ?! ) ,", "en", "3?!)  ,"),
        ('end." <tag', "es", 'end\\". <tag'),
        ("", "en", ""),
    ]
    for text, lang, expected in cases:
        assert txt.normalize_spacing_for_tok(text, lang) == expected, (text, lang)
