"""Pipeline config loader (S10 — io-config.json surface, src/config.rs:50-65)."""

from etl_rs_ray.config import PipelineConfig


def test_load_example_config():
    cfg = PipelineConfig.load("configs/pipeline-config.json")
    assert cfg.event_log.num_partitions == 8
    assert cfg.lake.num_buckets == 64
    assert cfg.lake.mode == "upsert"
    assert cfg.csv["jdd"].number_of_rows == 57
    assert cfg.csv["hdd"].table_name == "hdd"


def test_load_transforms_map():
    cfg = PipelineConfig.load("configs/pipeline-config.json")
    assert cfg.transforms["NOM"] == "nom_expr"
    assert cfg.transforms["SIRET"] == "siret"


def test_config_driven_pipeline_matches_golden(tmp_path):
    """The whole config-driven surface end to end: CSV -> row-index-keyed
    change events -> TransformChain normalize -> lake upsert — the final
    table's transformed columns equal the reference's committed golden
    output (JDD_normalisation_transformed.csv)."""
    import json

    import pyarrow as pa
    import pyarrow.csv as pacsv

    from etl_rs_ray.cli import run_pipeline
    from etl_rs_ray.config import PipelineConfig
    from etl_rs_ray.sources.lake import LakeTable

    base = PipelineConfig.load("configs/pipeline-config.json")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "event_log": {"log_dir": str(tmp_path / "log"), "num_partitions": 4},
        "lake": {"table_dir": str(tmp_path / "table"), "num_buckets": 8, "mode": "upsert"},
        "csv": {"jdd": {"table_name": "jdd",
                        "file_path": base.csv["jdd"].file_path,
                        "number_of_rows": 57}},
        "transforms": base.transforms,
    }))
    out = run_pipeline(PipelineConfig.load(str(cfg_path)), "jdd")
    assert out["committed"] and out["rows_total"] == 57

    snap = LakeTable(str(tmp_path / "table")).snapshot_table()
    rows = sorted(snap.to_pylist(), key=lambda r: r["path"])
    golden_path = base.csv["jdd"].file_path.replace(".csv", "_transformed.csv")
    # the golden output is comma-separated (unlike the ';' inputs)
    head = pacsv.read_csv(golden_path)
    golden = pacsv.read_csv(
        golden_path,
        convert_options=pacsv.ConvertOptions(
            strings_can_be_null=True,
            null_values=[""],
            column_types={n: pa.string() for n in head.column_names},
        ),
    ).to_pylist()
    cols = list(base.transforms)
    assert len(rows) == len(golden)
    for got, want in zip(rows, golden):
        for c in cols:
            assert got.get(c) == want.get(c), (got["path"], c, got.get(c), want.get(c))
