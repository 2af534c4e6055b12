"""CSV source with the reference's dialect (src/csv.rs:5-39):
``;``-delimited, header row, ``#`` comment lines, empty field -> NULL,
all columns read as nullable strings.

Exposed both as a Ray Data reader (distributed) and a pyarrow loader
(driver-side fixtures). The reference's ``struct_to_dataframe``
(transforms/utils.rs:79-122) coerces numeric CSV fields to strings via
f64 -> i64 truncation — reproduced by :func:`stringify_numeric_columns`
for schemas like HDD that declare f64/i32 columns (schemas/hdd.rs:38-69).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data


def _options(column_names: list[str] | None = None):
    parse = pacsv.ParseOptions(delimiter=";")
    # empty string -> null; never infer types: everything is nullable utf8
    convert = pacsv.ConvertOptions(
        strings_can_be_null=True,
        quoted_strings_can_be_null=False,
        null_values=[""],
    )
    read = pacsv.ReadOptions(encoding="utf-8")
    return parse, convert, read


def _strip_comments_to_tmp(path: str) -> str:
    """pyarrow.csv has no comment-line support; pre-filter '#' lines.

    Fixture CSVs are small (driver-side); the distributed path reads
    parquet, not commented CSV.
    """
    import os
    import tempfile

    with open(path, "rb") as f:
        data = f.read()
    if data.startswith(b"\xef\xbb\xbf"):  # BOM, present in JDD fixture
        data = data[3:]
    lines = [ln for ln in data.split(b"\n") if not ln.startswith(b"#")]
    fd, tmp = tempfile.mkstemp(suffix=".csv", prefix="etlrs_csv_")
    with os.fdopen(fd, "wb") as f:
        f.write(b"\n".join(lines))
    return tmp


def read_csv_table(path: str, all_strings: bool = True) -> pa.Table:
    """Driver-side load of a reference-dialect CSV into an Arrow table."""
    import os

    tmp = _strip_comments_to_tmp(path)
    try:
        parse, convert, read = _options()
        # first pass to get column names, then force utf8 types
        head = pacsv.read_csv(tmp, parse_options=parse, read_options=read)
        if all_strings:
            convert = pacsv.ConvertOptions(
                strings_can_be_null=True,
                quoted_strings_can_be_null=False,
                null_values=[""],
                column_types={name: pa.string() for name in head.column_names},
            )
            return pacsv.read_csv(tmp, parse_options=parse, convert_options=convert, read_options=read)
        return head
    finally:
        os.unlink(tmp)


def read_csv_dataset(path: str, all_strings: bool = True) -> "ray.data.Dataset":
    """Distributed Ray Data read of a reference-dialect CSV."""
    parse = pacsv.ParseOptions(delimiter=";")
    kwargs = {}
    if all_strings:
        # column names unknown up-front for arbitrary files; read once cheaply
        head = read_csv_table(path)
        kwargs["convert_options"] = pacsv.ConvertOptions(
            strings_can_be_null=True,
            quoted_strings_can_be_null=False,
            null_values=[""],
            column_types={n: pa.string() for n in head.column_names},
        )
    return ray.data.read_csv(path, parse_options=parse, **kwargs)


def write_single_csv(table: pa.Table, path: str) -> None:
    """Collect-and-write CSV sink (S9 — the reference's CsvWriter finish,
    examples/transform_jdd_normalisation.rs:55-59): one file, header row,
    null -> empty. For distributed output use ``ds.write_csv`` /
    ``ds.write_parquet`` instead; this is the golden-fixture sink."""
    import os

    tmp = path + ".tmp"
    pacsv.write_csv(table, tmp)
    os.replace(tmp, path)


def stringify_numeric_columns(table: pa.Table) -> pa.Table:
    """Reproduce struct_to_dataframe's value model (transforms/utils.rs:79-122):
    every column becomes nullable utf8; numeric values are stringified via
    f64 -> i64 truncation (12345678910124.0 -> "12345678910124")."""
    cols = []
    for name in table.column_names:
        col = table.column(name)
        if pa.types.is_floating(col.type) or pa.types.is_integer(col.type):
            vals = [None if v is None else str(int(v)) for v in col.to_pylist()]
            cols.append(pa.array(vals, pa.string()))
        elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            cols.append(col.cast(pa.string()))
        else:
            cols.append(pa.array([None if v is None else str(v) for v in col.to_pylist()], pa.string()))
    return pa.table(dict(zip(table.column_names, cols)))
