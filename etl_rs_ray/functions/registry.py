"""Column-level Transform registry — the Ray-native ``Transform`` chain.

The reference dispatches per-column UDFs through a ``Transform`` enum +
``col_with_udf_expr`` (crates/libs/lib-etl/src/config.rs:99-107,
src/transforms.rs:29-47).  Here a transform is a named
``pa.Array -> pa.Array`` function; a :class:`TransformChain` maps column
names to transforms and compiles into ONE ``map_batches`` UDF over
zero-copy Arrow batches.

Vectorized pyarrow.compute (RE2) kernels back every transform whose
semantics are expressible without per-row Python: the regex family (pce,
siret_successeur, siret, siren, ape, code_naf, libelle_naf), the
expression variants nom_expr/email_expr, telephone, civilite and
raison_sociale — each cross-checked against its pinned scalar function by
reference vectors AND hypothesis sweeps (tests/test_vectorized_kernels.py).
The UDF variants whose reference semantics depend on byte offsets or
per-token casing (nom, prenom, prenom_expr, email UDF) run the scalar
functions over the batch with precompiled module-level regexes.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import text as T

ColumnFn = Callable[[pa.Array], pa.Array]


def _map_strings(arr: pa.Array | pa.ChunkedArray, fn: Callable[[str | None], str | None]) -> pa.Array:
    """Apply a scalar Optional[str]->Optional[str] over a string array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pa.array([fn(v) for v in arr.to_pylist()], type=pa.string())


def _scalar(fn: Callable[[str | None], str | None]) -> ColumnFn:
    def col_fn(arr: pa.Array) -> pa.Array:
        return _map_strings(arr, fn)

    return col_fn


# --- vectorized fast paths (exact RE2 equivalents) ---------------------------


def col_pce(arr: pa.Array) -> pa.Array:
    # pce.rs:4-17 — remove all non-digits, no length check
    return pc.replace_substring_regex(arr, pattern=r"\D", replacement="")


col_siret_successeur = col_pce


def col_siret(arr: pa.Array) -> pa.Array:
    # siret.rs:8-34 — keep Unicode-numeric chars, require exactly 14
    cleaned = pc.replace_substring_regex(arr, pattern=r"\P{N}", replacement="")
    ok = pc.equal(pc.utf8_length(cleaned), 14)
    return pc.if_else(ok, cleaned, pa.scalar(None, pa.string()))


def col_siren(arr: pa.Array) -> pa.Array:
    # siren.rs:8-33 — strip '-' and whitespace, require 9 Unicode-numeric chars
    cleaned = pc.replace_substring_regex(arr, pattern=r"-|\s", replacement="")
    ok = pc.match_substring_regex(cleaned, r"^\p{N}{9}$")
    return pc.if_else(ok, cleaned, pa.scalar(None, pa.string()))


def _naf_like(arr: pa.Array, strip_pattern: str, max_replacements: int | None) -> pa.Array:
    cleaned = pc.replace_substring_regex(
        arr, pattern=strip_pattern, replacement="", max_replacements=max_replacements
    )
    ok = pc.match_substring_regex(cleaned, r"^\p{Nd}{4}[a-zA-Z]$")
    upped = pc.binary_join_element_wise(
        pc.utf8_slice_codeunits(cleaned, 0, 4),
        pc.utf8_upper(pc.utf8_slice_codeunits(cleaned, 4, 5)),
        "",
    )
    return pc.if_else(ok, upped, pa.scalar(None, pa.string()))


def col_ape(arr: pa.Array) -> pa.Array:
    # ape.rs:9-38 — strip [.\-_,] everywhere, require ^\d{4}[a-zA-Z]$
    return _naf_like(arr, r"[.\-_,]", None)


def col_code_naf(arr: pa.Array) -> pa.Array:
    # code_naf.rs:7-37 — polars str.replace = FIRST occurrence only
    return _naf_like(arr, r"[.\-_,;]", 1)


col_libelle_naf = col_code_naf


# --- vectorized expression-variant kernels -----------------------------------
# The expr variants (used by the example pipelines) are pure regex chains —
# no byte-offset quirks — so they vectorize fully in RE2. Semantics are
# pinned to the scalar functions by vector tests AND a hypothesis
# cross-check over random unicode strings (tests/test_vectorized_kernels.py).

# Rust regex \s is Unicode White_Space; RE2 \s is ASCII-only. This class
# reproduces the Unicode set (Z* covers NBSP/LS/PS; \x{85} is NEL).
_WS = r"[\t\n\x0b\f\r \x{85}\p{Z}]"

# accent folds applied AFTER utf8_upper (upper(fold(x)) == fold(upper(x))
# for every mapped char; ß/ø are unmapped in both orders)
_UPPER_FOLDS = [
    ("ÀÁÂÃÄÅ", "A"), ("ÈÉÊË", "E"), ("ÌÍÎÏ", "I"), ("ÒÓÔÕÖ", "O"),
    ("ÙÚÛÜ", "U"), ("Ç", "C"), ("Ñ", "N"),
]


def _fold_upper_accents_regex(arr: pa.Array) -> pa.Array:
    for chars, base in _UPPER_FOLDS:
        arr = pc.replace_substring_regex(arr, pattern=f"[{chars}]", replacement=base)
    return arr


# Byte-level fold: every mapped char is U+00C0..U+00DC, whose UTF-8 form is
# 0xC3 followed by 0x80 + (cp - 0xC0). In valid UTF-8, 0xC3 occurs ONLY as
# that lead byte, so one LUT pass over the value buffer replaces the 7
# regex passes above. (Hypothesis-cross-checked against the scalar fold in
# tests/test_vectorized_kernels.py.)
_ACCENT_LUT = np.zeros(256, dtype=np.uint8)
for _chars, _base in _UPPER_FOLDS:
    for _ch in _chars:
        _ACCENT_LUT[0x80 + (ord(_ch) - 0xC0)] = ord(_base)


def _fold_upper_accents(arr: pa.Array) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_string(t):
        off_dtype = np.int32
    elif pa.types.is_large_string(t):
        off_dtype = np.int64
    else:
        return _fold_upper_accents_regex(arr)
    if arr.offset != 0 or len(arr) == 0:
        return _fold_upper_accents_regex(arr)
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[: len(arr) + 1]
    if bufs[2] is None:
        return arr  # all rows null/empty
    d = np.frombuffer(bufs[2], dtype=np.uint8)[int(offs[0]) : int(offs[-1])]
    offs = offs - offs[0]  # hit indices below are relative to the d slice
    lead = np.flatnonzero(d[:-1] == 0xC3)
    if len(lead) == 0:
        return arr
    rep = _ACCENT_LUT[d[lead + 1]]
    hit = lead[rep != 0]
    if len(hit) == 0:
        return arr
    d = d.copy()
    d[hit + 1] = _ACCENT_LUT[d[hit + 1]]
    keep = np.ones(len(d), dtype=bool)
    keep[hit] = False
    new_data = np.ascontiguousarray(d[keep])
    # each deleted lead byte before an offset shifts it left by one
    new_offs = (offs - np.searchsorted(hit, offs, side="left")).astype(off_dtype)
    return pa.Array.from_buffers(
        t,
        len(arr),
        [bufs[0], pa.py_buffer(new_offs.tobytes()), pa.py_buffer(new_data.tobytes())],
        null_count=arr.null_count,
    )


# utf8_upper uses simple case mapping (ß -> U+1E9E, ligatures unchanged);
# Python/Rust use full mapping (ß -> SS, ﬁ -> FI). Pre-expand the common
# divergent chars so upper() agrees with the scalar ground truth.
_FULL_CASE_EXPANSIONS = [("ß", "SS"), ("ﬀ", "FF"), ("ﬁ", "FI"), ("ﬂ", "FL"), ("ﬃ", "FFI"), ("ﬄ", "FFL"), ("ﬅ", "ST"), ("ﬆ", "ST")]


_FULL_CASE_CLASS = "[" + "".join(ch for ch, _ in _FULL_CASE_EXPANSIONS) + "]"


def _upper_full(arr: pa.Array) -> pa.Array:
    # one match pass gates the 8 literal replace passes — divergent chars
    # (ß + ligatures) are rare, so the common case is 2 kernel calls
    need = pc.any(pc.match_substring_regex(arr, _FULL_CASE_CLASS)).as_py()
    if need:
        for ch, rep in _FULL_CASE_EXPANSIONS:
            arr = pc.replace_substring(arr, ch, rep)
    return pc.utf8_upper(arr)


def col_nom_expr_vec(arr: pa.Array) -> pa.Array:
    """Vectorized transform_nom_expr (nom.rs:83-114)."""
    arr = pc.replace_substring_regex(arr, pattern=rf"^{_WS}+|{_WS}+$", replacement="")
    arr = _fold_upper_accents(_upper_full(arr))
    arr = pc.replace_substring_regex(
        arr, pattern=rf"^[^a-zA-ZÀ-ÿ\t\n\x0b\f\r \x{{85}}\p{{Z}}]+|[^a-zA-ZÀ-ÿ\t\n\x0b\f\r \x{{85}}\p{{Z}}]+$",
        replacement="",
    )
    arr = pc.replace_substring_regex(arr, pattern=r"//|_|/|&", replacement=" ET ", max_replacements=1)
    arr = pc.replace_substring_regex(
        arr, pattern=r"[^a-zA-Z0-9À-ÿ\t\n\x0b\f\r \x{85}\p{Z}\-'’]", replacement=""
    )
    arr = pc.replace_substring_regex(arr, pattern=r"\-+", replacement=" ")
    return pc.replace_substring_regex(arr, pattern=rf"{_WS}+", replacement=" ")


_EMAIL_VALID_RE = r"^[A-Z0-9._%+-]+@[A-Z0-9.-]+\.[A-Z]{2,}$"
_EMAIL_DOMAIN_RE = r"^[A-Z0-9._%+-]+@(?:[A-Z0-9-]*\.)*[A-Z0-9-]{2,}\.[A-Z]{2,4}$"


def col_email_expr_vec(arr: pa.Array) -> pa.Array:
    """Vectorized transform_email_expr (email.rs:65-125): uppercase, strip
    FIRST ['’&\\s]+ run, fix FIRST "@.", fold accents, validate (structure
    + >=2-char label before a 2-4 char TLD), strip domain hyphens."""
    arr = _upper_full(arr)
    arr = pc.replace_substring_regex(
        arr, pattern=rf"['’&\t\n\x0b\f\r \x{{85}}\p{{Z}}]+", replacement="", max_replacements=1
    )
    arr = pc.replace_substring_regex(arr, pattern=r"@\.", replacement="@", max_replacements=1)
    arr = _fold_upper_accents(arr)
    valid = pc.and_(
        pc.match_substring_regex(arr, _EMAIL_VALID_RE),
        pc.match_substring_regex(arr, _EMAIL_DOMAIN_RE),
    )
    parts = pc.extract_regex(arr, r"^(?P<local>[^@]+)@(?P<domain>[^@]+)$")
    local = pc.struct_field(parts, "local")
    domain = pc.replace_substring(pc.struct_field(parts, "domain"), "-", "")
    joined = pc.binary_join_element_wise(local, domain, "@")
    return pc.if_else(pc.fill_null(valid, False), joined, pa.scalar(None, pa.string()))


def _tel_fmt(d: pa.Array, prefix, spans: list[tuple[int, int]]) -> pa.Array:
    """Join fixed slices of the digit string with spaces after a prefix."""
    pieces = [pc.utf8_slice_codeunits(d, a, b) for a, b in spans]
    if isinstance(prefix, str):
        first = pa.nulls(len(d), pa.string()) if len(d) == 0 else pa.array([prefix] * len(d), pa.string())
    else:
        first = prefix
    return pc.binary_join_element_wise(first, *pieces, " ")


def col_telephone_vec(arr: pa.Array) -> pa.Array:
    """Vectorized transform_telephone (telephone.rs:7-84): ASCII digits
    only; length/prefix dispatch; paid prefixes {81,82,83,87,89} rejected
    on the national significant number; +33/+CC space formatting."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    d = pc.replace_substring_regex(arr, pattern=r"[^0-9]", replacement="")
    ln = pc.utf8_length(d)
    paid = "(81|82|83|87|89)"

    def case(length: int, ok_re: str | None, bad_re: str | None, fmt: pa.Array):
        cond = pc.equal(ln, length)
        if ok_re:
            cond = pc.and_(cond, pc.match_substring_regex(d, ok_re))
        if bad_re:
            cond = pc.and_(cond, pc.invert(pc.match_substring_regex(d, bad_re)))
        return cond, fmt

    cases = [
        case(10, r"^0", rf"^0{paid}", _tel_fmt(d, "+33", [(1, 2), (2, 4), (4, 6), (6, 8), (8, 10)])),
        case(11, r"^33", rf"^33{paid}", _tel_fmt(d, "+33", [(2, 3), (3, 5), (5, 7), (7, 9), (9, 11)])),
        case(
            12,
            r"^00",
            rf"^00{paid}",
            _tel_fmt(
                d,
                pc.binary_join_element_wise(pa.array(["+"] * len(d), pa.string()) if len(d) else pa.nulls(0, pa.string()), pc.utf8_slice_codeunits(d, 2, 4), ""),
                [(4, 5), (5, 7), (7, 9), (9, 11), (11, 13)],
            ),
        ),
        case(12, r"^330", rf"^330{paid}", _tel_fmt(d, "+33", [(3, 4), (4, 6), (6, 8), (8, 10), (10, 12)])),
        case(9, None, rf"^{paid}", _tel_fmt(d, "+33", [(0, 1), (1, 3), (3, 5), (5, 7), (7, 9)])),
    ]
    out = pa.nulls(len(d), pa.string())
    for cond, fmt in reversed(cases):
        out = pc.if_else(pc.fill_null(cond, False), fmt, out)
    return out


def col_prenom_expr_vec(arr: pa.Array) -> pa.Array:
    """Vectorized transform_prenom_expr (prenom.rs:88-144): the per-part
    Title-Case runs on FLATTENED list arrays — split by '-', split parts
    by ' ', case every sub-part in four Arrow kernel calls, then
    binary_join back up through the preserved offsets. No per-row Python."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    orig_null = pc.is_null(arr)
    a = pc.fill_null(arr, "")
    a = pc.replace_substring_regex(a, pattern=rf"^{_WS}+|{_WS}+$", replacement="")
    a = pc.replace_substring_regex(
        a, pattern=rf"[^À-ÿa-zA-Z\t\n\x0b\f\r \x{{85}}\p{{Z}}\-'’&]", replacement=""
    )
    a = pc.replace_substring_regex(a, pattern=r"&+", replacement=" ")
    a = pc.replace_substring_regex(a, pattern=rf"{_WS}+", replacement=" ")

    l1 = pc.split_pattern(a, pattern="-")  # rows -> parts
    f1 = pc.list_flatten(l1)
    # Python part.split() drops edge empties: trim part-edge spaces first
    parts = pc.replace_substring_regex(f1, pattern=r"^ +| +$", replacement="")
    l2 = pc.split_pattern(parts, pattern=" ")  # parts -> sub-parts
    f2 = pc.list_flatten(l2)
    first = _fold_accents(_upper_full(pc.utf8_slice_codeunits(f2, 0, 1)))
    rest = pc.utf8_lower(pc.utf8_slice_codeunits(f2, 1, 2_147_483_647))
    sub = pc.binary_join_element_wise(first, rest, "")

    def _plain(x):
        return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

    j2 = pc.binary_join(pa.ListArray.from_arrays(_plain(l2).offsets, _plain(sub)), " ")
    j1 = pc.binary_join(pa.ListArray.from_arrays(_plain(l1).offsets, _plain(j2)), "-")
    return pc.if_else(orig_null, pa.scalar(None, pa.string()), j1)


# case-preserving accent folds (strip_accent semantics, utils.rs:13-68)
_CASE_FOLDS = [
    ("àáâãäå", "a"), ("èéêë", "e"), ("ìíîï", "i"), ("òóôõö", "o"), ("ùúûü", "u"), ("ç", "c"), ("ñ", "n"),
    ("ÀÁÂÃÄÅ", "A"), ("ÈÉÊË", "E"), ("ÌÍÎÏ", "I"), ("ÒÓÔÕÖ", "O"), ("ÙÚÛÜ", "U"), ("Ç", "C"), ("Ñ", "N"),
]


def _fold_accents(arr: pa.Array) -> pa.Array:
    for chars, base in _CASE_FOLDS:
        arr = pc.replace_substring_regex(arr, pattern=f"[{chars}]", replacement=base)
    return arr


_SS_SENTINEL = ""  # private-use: protects ß through utf8_upper


def col_raison_sociale_vec(arr: pa.Array) -> pa.Array:
    """Vectorized transform_raison_sociale (raison_sociale.rs:12-37):
    accent fold, unwrap one layer of surrounding quotes, "" -> ",
    uppercase-except-ß."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = _fold_accents(arr)
    arr = pc.replace_substring_regex(arr, pattern=r'(?s)^"(.*)"$', replacement=r"\1", max_replacements=1)
    arr = pc.replace_substring(arr, '""', '"')
    arr = pc.replace_substring(arr, "ß", _SS_SENTINEL)
    for ch, rep in _FULL_CASE_EXPANSIONS[1:]:  # ß already protected
        arr = pc.replace_substring(arr, ch, rep)
    arr = pc.utf8_upper(arr)
    return pc.replace_substring(arr, _SS_SENTINEL, "ß")


_CIV_SPECIALS = pa.array(sorted(T.SPECIAL_CIVILITIES))
_CIV_M_RE = rf"(?:^|{_WS})(?:MONSIEUR|MR|MM|M\(ESPACE\)|M)(?:{_WS}|$)"
_CIV_MME_RE = rf"(?:^|{_WS})(?:MADAME|MADEMOISELLE|MME|MRS|MS|MLLE|MAD)(?:{_WS}|$)"


def col_civilite_vec(arr: pa.Array) -> pa.Array:
    """Vectorized transform_civilite (civilite.rs:7-50): trim+fold+upper,
    special-title rejection, punct -> space, token lookup, fixed
    MONSIEUR/MADAME output order. (The "M." map entry is unreachable:
    '.' is replaced by a space before tokenization.)"""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = pc.replace_substring_regex(arr, pattern=rf"^{_WS}+|{_WS}+$", replacement="")
    t = _fold_upper_accents(_upper_full(_fold_accents(t)))
    special = pc.is_in(t, value_set=_CIV_SPECIALS)
    t = pc.replace_substring_regex(t, pattern=r"[.,/&\\]", replacement=" ")
    has_m = pc.match_substring_regex(t, _CIV_M_RE)
    has_mme = pc.match_substring_regex(t, _CIV_MME_RE)
    null = pa.scalar(None, pa.string())
    out = pc.if_else(
        pc.and_(has_m, has_mme),
        pa.scalar("MONSIEUR MADAME"),
        pc.if_else(
            has_m, pa.scalar("MONSIEUR"), pc.if_else(has_mme, pa.scalar("MADAME"), null)
        ),
    )
    return pc.if_else(pc.fill_null(special, False), null, out)


# --- scalar-backed columns ---------------------------------------------------

col_nom = _scalar(T.transform_nom)
col_prenom = _scalar(T.transform_prenom)
col_civilite = col_civilite_vec  # RE2-vectorized, hypothesis-checked vs scalar
col_email = _scalar(T.transform_email)
col_telephone = col_telephone_vec  # RE2-vectorized, hypothesis-checked vs scalar
col_raison_sociale = col_raison_sociale_vec  # RE2-vectorized, hypothesis-checked vs scalar
# nom_expr / email_expr / prenom_expr use the RE2/list-kernel vectorized
# paths (hypothesis-checked equivalent to the scalars)
col_nom_expr = col_nom_expr_vec
col_prenom_expr = col_prenom_expr_vec
col_email_expr = col_email_expr_vec

TRANSFORMS: dict[str, ColumnFn] = {
    "nom": col_nom,
    "prenom": col_prenom,
    "civilite": col_civilite,
    "email": col_email,
    "telephone": col_telephone,
    "raison_sociale": col_raison_sociale,
    "nom_expr": col_nom_expr,
    "prenom_expr": col_prenom_expr,
    "email_expr": col_email_expr,
    "siren": col_siren,
    "siret": col_siret,
    "ape": col_ape,
    "code_naf": col_code_naf,
    "libelle_naf": col_libelle_naf,
    "pce": col_pce,
    "siret_successeur": col_siret_successeur,
}


class TransformChain:
    """column name -> transform name; callable over a pyarrow batch.

    Compiles the whole chain into a single ``map_batches`` UDF:
    ``ds.map_batches(chain, batch_format="pyarrow", zero_copy_batch=True)``.
    """

    def __init__(self, mapping: dict[str, str]):
        unknown = set(mapping.values()) - set(TRANSFORMS)
        if unknown:
            raise KeyError(f"unknown transforms: {sorted(unknown)}")
        self.mapping = dict(mapping)

    def __call__(self, batch: pa.Table) -> pa.Table:
        for col_name, tname in self.mapping.items():
            idx = batch.schema.get_field_index(col_name)
            if idx < 0:
                continue
            col = batch.column(idx)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out = TRANSFORMS[tname](col)
            batch = batch.set_column(idx, pa.field(col_name, pa.string()), out)
        return batch

    def apply_table(self, table: pa.Table) -> pa.Table:
        return self(table)
