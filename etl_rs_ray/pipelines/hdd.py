"""HDD deduplication pipeline (examples/transform_hdd_deduplication.rs:352-433).

Reference: Postgres -> struct_to_dataframe (everything stringified) ->
normalize 8 columns -> filter/partition by Nom -> rayon per-partition
cluster merge -> reconciliate -> CSV.

Ray shape: source -> map_batches(TransformChain) ->
groupby(Nom).map_groups(dedup_group) — the hash shuffle replaces the
driver-side HashMap<String, LazyFrame> partitioning (:282-311) and rayon
pool (:313-328); reconciliation happens inside each group.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.registry import TransformChain
from ..sources.csv_source import read_csv_table, stringify_numeric_columns
from ..stages.dedup_hdd import OUTPUT_COLUMNS, dedup_group, hdd_dedup_dataset

# examples/transform_hdd_deduplication.rs:370-381
HDD_CHAIN = {
    "PCE": "pce",
    "Nom": "nom_expr",
    "Prenom": "prenom_expr",
    "Email": "email_expr",
    "Telephone": "telephone",
    "Raison_sociale": "raison_sociale",
    "SIRET": "siret",
    "SIRET successeur": "siret_successeur",
}


def hdd_chain() -> TransformChain:
    return TransformChain(HDD_CHAIN)


def load_hdd_csv(csv_path: str) -> pa.Table:
    """Fixture load reproducing the CSV->Postgres->struct_to_dataframe value
    model: typed CSV (schemas/hdd.rs:71-101) -> all-string columns with
    f64->i64 truncation; ID = 1-based autoincrement
    (examples/csv_hdd_to_postgres.rs:84-90)."""
    import pyarrow.csv as pacsv

    from ..sources.csv_source import _strip_comments_to_tmp

    import os

    tmp = _strip_comments_to_tmp(csv_path)
    try:
        table = pacsv.read_csv(
            tmp,
            parse_options=pacsv.ParseOptions(delimiter=";"),
            convert_options=pacsv.ConvertOptions(
                strings_can_be_null=True,
                null_values=[""],
                column_types={
                    "Id_source": pa.int32(),
                    "PCE": pa.float64(),
                    "SIRET": pa.float64(),
                    "SIRET successeur": pa.float64(),
                    "Telephone": pa.float64(),
                },
            ),
        )
    finally:
        os.unlink(tmp)
    table = stringify_numeric_columns(table)
    ids = pa.array([str(i + 1) for i in range(table.num_rows)], pa.string())
    return table.append_column("ID", ids)


def hdd_deduplicate_table(table: pa.Table) -> pa.Table:
    """Driver-side golden path: normalize + single-process group dedup."""
    import pyarrow.compute as pc

    table = hdd_chain().apply_table(table)
    # partition by Nom locally (the distributed path uses groupby(Nom))
    noms = table.column("Nom")
    out = []
    seen = set()
    for i in range(table.num_rows):
        nom = noms[i].as_py()
        if nom in seen:
            continue
        seen.add(nom)
        if nom is None:
            group = table.filter(pc.is_null(noms))
        else:
            group = table.filter(pc.equal(noms, nom))
        out.append(dedup_group(group))
    return pa.concat_tables(out) if out else table


def hdd_deduplicate_dataset(ds, batch_size: int | None = None):
    """Distributed: normalize chain then groupby(Nom) cluster merge."""
    normalized = ds.map_batches(
        hdd_chain(), batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )
    return hdd_dedup_dataset(normalized)


__all__ = [
    "HDD_CHAIN",
    "OUTPUT_COLUMNS",
    "hdd_chain",
    "load_hdd_csv",
    "hdd_deduplicate_table",
    "hdd_deduplicate_dataset",
]
