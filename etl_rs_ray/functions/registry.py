"""Column-level Transform registry — the Ray-native ``Transform`` chain.

The reference dispatches per-column UDFs through a ``Transform`` enum +
``col_with_udf_expr`` (crates/libs/lib-etl/src/config.rs:99-107,
src/transforms.rs:29-47).  Here a transform is a named
``pa.Array -> pa.Array`` function; a :class:`TransformChain` maps column
names to transforms and compiles into ONE ``map_batches`` UDF over
zero-copy Arrow batches.

Vectorized pyarrow.compute (RE2) fast paths are used where they are
provably equivalent to the scalar semantics (pce, siret_successeur, siret,
siren, ape, code_naf, libelle_naf); the gnarly ones (nom, prenom, civilite,
email, telephone, raison_sociale) run the pinned scalar functions over the
batch with precompiled module-level regexes — mirroring the reference,
whose example pipelines also use the row-UDF variant for those
(examples/transform_jdd_normalisation.rs:40-52).
"""

from __future__ import annotations

from collections.abc import Callable

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


# --- scalar-backed columns ---------------------------------------------------

col_nom = _scalar(T.transform_nom)
col_prenom = _scalar(T.transform_prenom)
col_civilite = _scalar(T.transform_civilite)
col_email = _scalar(T.transform_email)
col_telephone = _scalar(T.transform_telephone)
col_raison_sociale = _scalar(T.transform_raison_sociale)
col_nom_expr = _scalar(T.transform_nom_expr)
col_prenom_expr = _scalar(T.transform_prenom_expr)
col_email_expr = _scalar(T.transform_email_expr)

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
