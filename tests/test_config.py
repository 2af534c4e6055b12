"""Pipeline config loader (S10 — io-config.json surface, src/config.rs:50-65)."""

from etl_rs_ray.config import PipelineConfig


def test_load_example_config():
    cfg = PipelineConfig.load("configs/pipeline-config.json")
    assert cfg.event_log.num_partitions == 8
    assert cfg.lake.num_buckets == 64
    assert cfg.lake.mode == "upsert"
    assert cfg.csv["jdd"].number_of_rows == 57
    assert cfg.csv["hdd"].table_name == "hdd"
