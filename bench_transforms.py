"""Per-transform kernel micro-bench: scalar UDF path vs vectorized
Arrow/RE2 expression path, one row per kernel pair — the analogue of the
reference's criterion expr-vs-UDF benchmark
(lib-etl/benches/transform_benchmark.rs:11-82), widened from 2 kernels
to every pair the registry exposes.

Single-process by design (it measures kernels, not Ray); run:
    python bench_transforms.py [--rows 100000]
Prints one JSON line: {"metric": "transform_kernel_us_per_row", ...}.
"""

from __future__ import annotations

import argparse
import json
import time

import pyarrow as pa

from etl_rs_ray.datagen import generate_contacts
from etl_rs_ray.functions import registry as R
from etl_rs_ray.functions import text as T

# (name, scalar fn, vectorized fn, source column in the contacts table)
PAIRS = [
    ("nom_expr", R._scalar(T.transform_nom_expr), R.col_nom_expr_vec, "NOM"),
    ("prenom_expr", R._scalar(T.transform_prenom_expr), R.col_prenom_expr_vec, "PRENOM"),
    ("civilite", R._scalar(T.transform_civilite), R.col_civilite_vec, "CIVILITE"),
    ("email_expr", R._scalar(T.transform_email_expr), R.col_email_expr_vec, "email"),
    ("telephone", R._scalar(T.transform_telephone), R.col_telephone_vec, "TELEPHONE"),
    (
        "raison_sociale",
        R._scalar(T.transform_raison_sociale),
        R.col_raison_sociale_vec,
        "RAISON_SOCIALE",
    ),
    ("pce", R._scalar(T.transform_pce), R.col_pce, "SIRET"),
    ("siret", R._scalar(T.transform_siret), R.col_siret, "SIRET"),
    ("siren", R._scalar(T.transform_siren), R.col_siren, "SIREN"),
    ("ape", R._scalar(T.transform_ape), R.col_ape, "APE"),
]


def _time(fn, arr: pa.Array, repeats: int = 3) -> float:
    best = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn(arr)
        w = time.perf_counter() - t0
        best = w if best is None else min(best, w)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    args = ap.parse_args()

    table = generate_contacts(args.rows, seed=42)
    out = {}
    for name, scalar_fn, vec_fn, col in PAIRS:
        if col not in table.column_names:
            continue
        arr = table.column(col).combine_chunks()
        # correctness first: the two paths must agree on this input
        agree = bool(vec_fn(arr).cast(pa.string()).equals(scalar_fn(arr)))
        s = _time(scalar_fn, arr)
        v = _time(vec_fn, arr)
        out[name] = {
            "scalar_us_per_row": round(s / args.rows * 1e6, 3),
            "vector_us_per_row": round(v / args.rows * 1e6, 3),
            "speedup": round(s / v, 1) if v > 0 else None,
            "agree": agree,
        }
    print(
        json.dumps(
            {
                "metric": "transform_kernel_us_per_row",
                "rows": args.rows,
                "kernels": out,
            }
        )
    )


if __name__ == "__main__":
    main()
