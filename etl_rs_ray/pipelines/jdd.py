"""JDD normalization pipeline (examples/transform_jdd_normalisation.rs:21-63).

Reference: Postgres ``SELECT * FROM "JDD"`` -> struct_to_dataframe ->
11 column transforms -> CSV.  Ray shape: any source (CSV fixture /
Parquet table) -> ONE ``map_batches(TransformChain)`` -> sink.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.registry import TransformChain
from ..sources.csv_source import read_csv_table

# examples/transform_jdd_normalisation.rs:40-52 — column -> transform;
# address / CODE POSTALE / REGION / PAYS pass through untouched
JDD_CHAIN = {
    "NOM": "nom_expr",
    "PRENOM": "prenom_expr",
    "CIVILITE": "civilite",
    "email": "email_expr",
    "TELEPHONE": "telephone",
    "RAISON_SOCIALE": "raison_sociale",
    "CODE_NAF": "code_naf",
    "APE": "ape",
    "SIRET": "siret",
    "SIREN": "siren",
    "LIBELE_NAF": "libelle_naf",
}


def jdd_chain() -> TransformChain:
    return TransformChain(JDD_CHAIN)


def jdd_normalize_dataset(ds, batch_size: int | None = None):
    """Distributed: one zero-copy Arrow map_batches over the whole chain."""
    return ds.map_batches(
        jdd_chain(), batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


def jdd_normalize_csv(csv_path: str) -> pa.Table:
    """Driver-side golden-fixture path: reference-dialect CSV in, normalized
    Arrow table out."""
    table = read_csv_table(csv_path)
    return jdd_chain().apply_table(table)
