"""Pipeline IO config — the io-config.json surface (src/config.rs:50-65,
configs/io-config.json). JSON in, typed dataclasses out; used by CLI
entry points / ray job submit args."""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class CsvConfig:
    file_path: str
    table_name: str
    number_of_rows: int = -1


@dataclass
class EventLogConfig:
    """Kafka analogue (src/config.rs:19-23): topic -> log_dir, partitions."""

    log_dir: str
    num_partitions: int = 8


@dataclass
class LakeConfig:
    """Mongo/Postgres sink analogue (src/config.rs:32-36)."""

    table_dir: str
    num_buckets: int = 64
    mode: str = "upsert"  # upsert | overwrite | append


@dataclass
class PipelineConfig:
    event_log: EventLogConfig
    lake: LakeConfig
    csv: dict[str, CsvConfig] = field(default_factory=dict)
    # column -> transform name (functions/registry.TRANSFORMS), the
    # config-driven Transform chain (src/config.rs:50-65 maps columns to
    # Transform enum variants the same way)
    transforms: dict[str, str] = field(default_factory=dict)

    @classmethod
    def load(cls, file_path: str) -> "PipelineConfig":
        with open(file_path) as f:
            raw = json.load(f)
        return cls(
            event_log=EventLogConfig(**raw["event_log"]),
            lake=LakeConfig(**raw["lake"]),
            csv={k: CsvConfig(**v) for k, v in raw.get("csv", {}).items()},
            transforms=dict(raw.get("transforms", {})),
        )
