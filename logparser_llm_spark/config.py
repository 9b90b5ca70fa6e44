"""Configuration for the pipeline.

Mirrors the reference's pydantic config surface (reference
config_manager.py:30-122) with plain dataclasses — same knobs, same
defaults — plus Spark-specific scale knobs the reference doesn't have.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PreprocessingConfig:
    """Defaults match reference config_manager.py:75-86."""

    remove_timestamps: bool = False
    remove_ip_addresses: bool = False
    normalize_numbers: bool = True
    normalize_paths: bool = True
    lowercase: bool = False
    remove_duplicates: bool = True


@dataclass(frozen=True)
class TreeConfig:
    """Defaults match reference config_manager.py:50-60."""

    max_depth: int = 5
    min_cluster_size: int = 3
    token_delimiter: str = " "
    enable_fuzzy: bool = True
    fuzzy_threshold: float = 0.8


@dataclass(frozen=True)
class MergingConfig:
    """Defaults match reference config_manager.py:63-72."""

    enable_auto_merge: bool = True
    merge_threshold: float = 0.9
    max_edit_distance: int = 3


@dataclass(frozen=True)
class ScaleConfig:
    """Spark-side knobs (no reference equivalent; the reference is
    single-process — parser.py:168-172 ignores use_parallel)."""

    num_sinks: int = 8
    shuffle_partitions: int = 32
    discovery_partitions: int = 32       # partitions for the clustering pass
    salt_buckets: int = 16               # salting for skewed per-sink aggregates
    broadcast_pool_max_templates: int = 100_000
    arrow_max_records_per_batch: int = 10_000
    # True → clean/extract run as Python-re Arrow UDFs (byte-parity mode
    # for corpora with Java/Python regex divergence); False → JVM codegen
    arrow_parity_mode: bool = False
    # collect a min-line exemplar per template during discovery
    # (example_logs parity); disable to cut agg-buffer string traffic
    collect_examples: bool = True
    # emit the per-row ParsedLog variables map (reference parser.py:285-297)
    # — the one Arrow/Python stage in the pipeline; disable at 10^12 rows
    # if the variable map isn't consumed downstream
    include_variables: bool = True


@dataclass(frozen=True)
class PipelineConfig:
    preprocessing: PreprocessingConfig = field(default_factory=PreprocessingConfig)
    tree: TreeConfig = field(default_factory=TreeConfig)
    merging: MergingConfig = field(default_factory=MergingConfig)
    scale: ScaleConfig = field(default_factory=ScaleConfig)


DEFAULT_CONFIG = PipelineConfig()
