"""Arrow schema unification for the merge stage (column add / widen).

The reference has a fixed, declared-twice schema (schemas/jdd.rs,
schemas/hdd.rs); the north rule requires evolution at merge time instead:
events may carry new columns or widened types, and the lake table unifies.

``pa.unify_schemas(..., promote_options="permissive")`` handles
null-filling added columns and numeric widening (int32->int64,
int->float64); we add explicit casts for the resulting schema so stored
buckets and incoming events always align.
"""

from __future__ import annotations

import pyarrow as pa


def unify_tables(tables: list[pa.Table]) -> pa.Table:
    """Concat with permissive promotion: added columns become nulls,
    narrower numerics widen."""
    tables = [t for t in tables if t is not None]
    if len(tables) == 1:
        return tables[0]
    return pa.concat_tables(tables, promote_options="permissive")


def evolve_to(table: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast/extend ``table`` to ``target`` (missing columns -> null)."""
    cols = []
    for field in target:
        if table.schema.get_field_index(field.name) >= 0:
            cols.append(table.column(field.name).cast(field.type))
        else:
            cols.append(pa.nulls(table.num_rows, field.type))
    return pa.table(cols, schema=target)


def unified_schema(schemas: list[pa.Schema]) -> pa.Schema:
    return pa.unify_schemas(schemas, promote_options="permissive")
