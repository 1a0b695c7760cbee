"""M1/C1 parity unit tests (SURVEY.md §5.2 item 1)."""

from tabbyray.normalize import (
    encode_partition_name,
    normalize_entry,
    php_levenshtein,
    strip_uri_prefix,
)


def test_normalize_golden_pairs():
    # reference semantics: components/CanonicalTableAnnotator.php:121-137
    assert normalize_entry("  Hello,  World! ") == "Hello_world"
    assert normalize_entry("New York City") == "New_york_city"
    assert normalize_entry("A.C. Milan") == "Ac_milan"
    assert normalize_entry("42 km²") == "42_km"
    assert normalize_entry("") == ""
    assert normalize_entry(None) == ""
    assert normalize_entry("!!!") == ""
    assert normalize_entry("_underscore_kept?") == "Underscorekept"  # _ stripped


def test_normalize_cyrillic():
    # PHP ucfirst is byte-oriented: leading Cyrillic char stays lowercase
    assert normalize_entry("Москва Сити") == "москва_сити"
    # ё/Ё are outside а-яА-Я and stripped, as in the PCRE class
    assert normalize_entry("Ёлка") == "лка"
    assert normalize_entry("приЁмник") == "примник"


def test_normalize_not_idempotent_on_underscores():
    # underscores are outside [a-zA-Zа-яА-Я0-9\s] and get stripped, so the
    # function is NOT idempotent on its own output — PHP behaves identically
    assert normalize_entry("New_york") == "Newyork"


def test_php_levenshtein_basics():
    assert php_levenshtein("kitten", "sitting") == 3
    assert php_levenshtein("", "abc") == 3
    assert php_levenshtein("abc", "") == 3
    assert php_levenshtein("same", "same") == 0


def test_php_levenshtein_is_byte_level():
    # М (D0 9C) vs м (D0 BC): one differing byte
    assert php_levenshtein("Мир", "мир") == 1
    # each Cyrillic char is 2 bytes: full substitution costs 2 per char
    assert php_levenshtein("аб", "вг") == 2  # а/в share first byte D0; б(D0B1)/г(D0B3) share D0


def test_php_levenshtein_255_limit():
    assert php_levenshtein("x" * 256, "x") == -1
    assert php_levenshtein("x", "я" * 130) == -1  # 260 bytes


def test_strip_uri_prefix():
    assert strip_uri_prefix("http://dbpedia.org/resource/Berlin") == "Berlin"
    assert strip_uri_prefix("http://dbpedia.org/ontology/City") == "City"
    assert strip_uri_prefix("http://dbpedia.org/property/name") == "name"
    assert strip_uri_prefix("plain") == "plain"


def test_encode_partition_name():
    assert encode_partition_name('a/b|c"') == "a+SS-RS+b+SS-VL+c+SS-QM+"


def test_decode_partition_name_roundtrip():
    from tabbyray.normalize import decode_partition_name
    s = 'a/b|c"<>*?:\\'
    assert decode_partition_name(encode_partition_name(s)) == s


def test_normalize_batch_parity_property():
    """Vectorized Arrow normalize_batch == scalar normalize_entry over
    the full relevant alphabet (ASCII, Cyrillic incl. the excluded ё,
    digits, punctuation, ASCII whitespace)."""
    import pyarrow as pa
    from hypothesis import given, settings, strategies as st
    from tabbyray.normalize import normalize_batch, normalize_entry

    alphabet = ("abcXYZ09  \t\r\n.,;*-_()[]'\"&%$#@!/\\"
                "абвгдеёжзиклмнопрстуфхцчшщъыьэюяАБВЁЯ")

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.text(alphabet=alphabet, max_size=24), max_size=8))
    def check(vals):
        got = normalize_batch(pa.array(vals, pa.string())).to_pylist()
        assert got == [normalize_entry(v) for v in vals]

    check()
