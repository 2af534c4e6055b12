"""Vectorized RE2 kernels vs the pinned scalar semantics: reference
vectors, golden corpus strings, and a hypothesis sweep over random
unicode-ish inputs."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_rs_ray.functions import text as T
from etl_rs_ray.functions.registry import col_email_expr_vec, col_nom_expr_vec, col_telephone_vec

ALPHABET = (
    "abczABCZ019 \t\n-_/&'’@.éàÀÉçÇñøßÆŒ漢"
    "  "  # NBSP, LS — the Unicode-whitespace divergence zone
    "%+,*\"("
)


def _check(vec_fn, scalar_fn, values):
    got = vec_fn(pa.array(values, pa.string())).to_pylist()
    want = [scalar_fn(v) for v in values]
    mismatches = [(v, g, w) for v, g, w in zip(values, got, want) if g != w]
    assert not mismatches, mismatches[:5]


FIXED = [
    None, "", " ", "Jean-Dupont//Smith", "&Carre & Lagrave&", "/Sébastien / Pascal /",
    "El Niño", "Brøgger", "Carre_/", "A/B/C", "x&y&z", "Straße", "漢字",
    "Lucas31@gmail.com", "Luc’’as31@gmail.com", "Lucas31@.gmail.com",
    "Lucas31@gmail..com", "Lucas31@g.com", "a b@c-d.ef", "ab@c-d.ef",
    "AB@CD.EFGHI", "AB@CD.EF.GH", "x@y.zz ", "no break@mail.com",
]


def test_nom_expr_vec_fixed():
    _check(col_nom_expr_vec, T.transform_nom_expr, FIXED)


def test_email_expr_vec_fixed():
    _check(col_email_expr_vec, T.transform_email_expr, FIXED)


@settings(max_examples=400, deadline=None)
@given(st.lists(st.text(alphabet=ALPHABET, max_size=24), min_size=1, max_size=8))
def test_nom_expr_vec_random(values):
    _check(col_nom_expr_vec, T.transform_nom_expr, values)


@settings(max_examples=400, deadline=None)
@given(st.lists(st.text(alphabet=ALPHABET, max_size=24), min_size=1, max_size=8))
def test_email_expr_vec_random(values):
    _check(col_email_expr_vec, T.transform_email_expr, values)


RS_FIXED = [
    None, "", '"ED""BANGER"', '""vanescènce"', '"', '""', "Straße", "HecøTOR",
    "Société dupont", "漢字", "TIGER_Milk", '"x"', 'a"b', "ﬁnance",
]

CIV_FIXED = [
    None, "", "Mm", "MR", "Ms", "MMe", "M(espace)", "MAD", "MADAME", "MM Mme",
    "Mme M.", "MISS", "Docteur", "DOCTEUR", "  m  ", "M.Mme", "monsieur madame",
    "PROFESSEUR", "Sœur", "M,MS", "MMM", "XMM",
]


def test_raison_sociale_vec_fixed():
    from etl_rs_ray.functions.registry import col_raison_sociale_vec

    _check(col_raison_sociale_vec, T.transform_raison_sociale, RS_FIXED)


def test_civilite_vec_fixed():
    from etl_rs_ray.functions.registry import col_civilite_vec

    _check(col_civilite_vec, T.transform_civilite, CIV_FIXED)


@settings(max_examples=400, deadline=None)
@given(st.lists(st.text(alphabet=ALPHABET + 'ß"œŒ', max_size=20), min_size=1, max_size=8))
def test_raison_sociale_vec_random(values):
    from etl_rs_ray.functions.registry import col_raison_sociale_vec

    _check(col_raison_sociale_vec, T.transform_raison_sociale, values)


_CIV_ALPHABET = "MRSmrs. ,/&\\ADEOILNU ée  (espace)X"


@settings(max_examples=500, deadline=None)
@given(st.lists(st.text(alphabet=_CIV_ALPHABET, max_size=16), min_size=1, max_size=8))
def test_civilite_vec_random(values):
    from etl_rs_ray.functions.registry import col_civilite_vec

    _check(col_civilite_vec, T.transform_civilite, values)


TEL_FIXED = [
    None, "", "07 85 78 45 21b", "06.58.96.32.47", "081 6 75 57 98",
    "085 6 75 57 98", "443-73-421-00395", "330612345678", "00336123456789",
    "003312345678", "0033123456789", "123456789", "812345678", "0612345678",
]


def test_telephone_vec_fixed():
    _check(col_telephone_vec, T.transform_telephone, TEL_FIXED)


@settings(max_examples=400, deadline=None)
@given(st.lists(st.text(alphabet="0123456789 .-ab38+’é", max_size=16), min_size=1, max_size=8))
def test_telephone_vec_random(values):
    _check(col_telephone_vec, T.transform_telephone, values)


PRENOM_FIXED = [
    None, "", " ", "jean-pierre", "  marie claire  ", "JEAN--luc", "élodie",
    "a&b", "j&&k-l m", "x- -y", "ßtest", "o'neill-MC donald", "émile-  zola ",
    "a", "-", "--", "Jean  Pierre-Anne marie", "çaça-ÉTÉ", "漢字 abc", "d’arc",
]


def test_prenom_expr_vec_fixed():
    from etl_rs_ray.functions.registry import col_prenom_expr_vec

    _check(col_prenom_expr_vec, T.transform_prenom_expr, PRENOM_FIXED)


@settings(max_examples=500, deadline=None)
@given(st.lists(st.text(alphabet=ALPHABET + "ßœ'’-", max_size=24), min_size=1, max_size=8))
def test_prenom_expr_vec_random(values):
    from etl_rs_ray.functions.registry import col_prenom_expr_vec

    _check(col_prenom_expr_vec, T.transform_prenom_expr, values)


def test_fold_upper_accents_byte_lut_matches_regex():
    """The byte-LUT fold must equal the 7-pass regex fold on adversarial
    inputs: nulls, empties, sliced/chunked arrays, unmapped accents (ß, ø),
    multi-byte neighbors, and every mapped char."""
    import pyarrow as pa

    from etl_rs_ray.functions.registry import (
        _fold_upper_accents,
        _fold_upper_accents_regex,
    )

    vals = [
        None, "", "ÀÉÎÕÜÇÑ", "ABC", "ß-ÀØÎ", "ﬁÀ", "É" * 50, "xÃy", "€ÀÉ€",
        "ÀÁÂÃÄÅÈÉÊËÌÍÎÏÒÓÔÕÖÙÚÛÜÇÑ", "no accents at all", None, "Ç",
    ]
    arr = pa.array(vals, pa.string())
    assert _fold_upper_accents(arr).to_pylist() == _fold_upper_accents_regex(arr).to_pylist()
    # sliced array (non-zero offset falls back to the regex path)
    sl = arr.slice(2, 8)
    assert _fold_upper_accents(sl).to_pylist() == _fold_upper_accents_regex(sl).to_pylist()
    # chunked
    ch = pa.chunked_array([arr, arr])
    assert _fold_upper_accents(ch).to_pylist() == _fold_upper_accents_regex(arr).to_pylist() * 2
    # large_string storage
    la = arr.cast(pa.large_string())
    assert _fold_upper_accents(la).to_pylist() == _fold_upper_accents_regex(arr).to_pylist()


def test_fold_upper_accents_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pyarrow as pa

    from etl_rs_ray.functions.registry import (
        _fold_upper_accents,
        _fold_upper_accents_regex,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.one_of(st.none(), st.text(max_size=12)), max_size=8))
    def check(vals):
        arr = pa.array(vals, pa.string())
        assert (
            _fold_upper_accents(arr).to_pylist()
            == _fold_upper_accents_regex(arr).to_pylist()
        )

    check()
