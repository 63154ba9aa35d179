"""Project IR: node types and the Manifest.

Mirrors the reference's data model (SURVEY.md §1.1):
- ModelNode      ~ core/dbt/contracts/graph/nodes.py:468
- SourceDefinition ~ core/dbt/artifacts/resources/v1/source_definition.py:59
- SeedNode       ~ core/dbt/artifacts/resources/v1/seed.py:28
- SnapshotNode   ~ core/dbt/contracts/graph/nodes.py:1124
- TestNode       ~ core/dbt/artifacts/resources/v1/config.py:165-182
- Manifest       ~ core/dbt/contracts/graph/manifest.py

unique_id scheme follows the reference: ``model.<project>.<name>``,
``source.<project>.<source>.<table>``, ``test.<project>.<name>``, …
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Optional


class NodeType(str, Enum):
    Model = "model"
    Source = "source"
    Seed = "seed"
    Snapshot = "snapshot"
    Test = "test"
    UnitTest = "unit_test"
    Operation = "operation"
    Analysis = "analysis"
    # metadata-only leaf nodes (semantic layer; NodeType enum
    # core/dbt/artifacts/resources/types.py:18-37) — no execution, NoOp
    # results in `build` (core/dbt/runners/no_op_runner.py:11-40)
    Exposure = "exposure"
    Metric = "metric"
    SemanticModel = "semantic_model"
    SavedQuery = "saved_query"
    Group = "group"


METADATA_NODE_TYPES = {
    NodeType.Exposure, NodeType.Metric, NodeType.SemanticModel,
    NodeType.SavedQuery, NodeType.Group,
}


class Materialization(str, Enum):
    View = "view"
    Table = "table"
    Incremental = "incremental"
    Ephemeral = "ephemeral"
    Snapshot = "snapshot"
    Seed = "seed"


@dataclass
class NodeConfig:
    """Per-node config, merged project defaults <- model YAML <- in-file config().

    Field set follows core/dbt/artifacts/resources/v1/config.py (the subset with
    execution semantics on Spark)."""

    materialized: str = "view"
    enabled: bool = True
    schema: Optional[str] = None
    tags: list[str] = field(default_factory=list)
    pre_hook: list[str] = field(default_factory=list)
    post_hook: list[str] = field(default_factory=list)
    # incremental family
    incremental_strategy: str = "append"  # append|merge|delete+insert|insert_overwrite|microbatch
    unique_key: Optional[str | list[str]] = None
    on_schema_change: str = "ignore"  # ignore|append_new_columns|sync_all_columns|fail
    full_refresh: Optional[bool] = None
    partition_by: Optional[str | list[str]] = None
    # microbatch (v1/config.py:84 lookback default 1)
    event_time: Optional[str] = None
    batch_size: Optional[str] = None  # hour|day|month|year
    begin: Optional[str] = None
    lookback: int = 1
    # snapshot (v1/snapshot.py:20-32)
    strategy: Optional[str] = None  # timestamp|check
    updated_at: Optional[str] = None
    check_cols: Optional[str | list[str]] = None  # list or "all"
    hard_deletes: str = "ignore"  # ignore|invalidate|new_record
    # tests (v1/config.py:165-230)
    severity: str = "error"
    where: Optional[str] = None
    limit: Optional[int] = None
    fail_calc: str = "count(*)"
    warn_if: str = "!= 0"
    error_if: str = "!= 0"
    store_failures: bool = False
    # seeds
    delimiter: str = ","
    column_types: dict[str, str] = field(default_factory=dict)
    # materialized views (v1/config.py:110-112 OnConfigurationChangeOption)
    on_configuration_change: str = "apply"  # apply | continue | fail
    # contracts + access (v1/config.py:33-36,124-127; model.py access)
    contract: dict[str, Any] = field(default_factory=dict)  # {enforced: bool}
    access: str = "protected"  # public | protected | private
    group: Optional[str] = None
    meta: dict[str, Any] = field(default_factory=dict)

    def merged(self, **overrides: Any) -> "NodeConfig":
        out = NodeConfig(**{**self.__dict__})
        for k, v in overrides.items():
            key = k.replace("+", "")
            if key in ("pre_hook", "post_hook", "tags") and isinstance(v, str):
                v = [v]
            if hasattr(out, key):
                setattr(out, key, v)
            else:
                out.meta[key] = v
        return out


@dataclass
class ManifestNode:
    unique_id: str
    name: str
    package_name: str
    path: str
    resource_type: NodeType
    raw_code: str = ""
    compiled_code: Optional[str] = None
    language: str = "sql"  # sql|python
    config: NodeConfig = field(default_factory=NodeConfig)
    depends_on: list[str] = field(default_factory=list)
    refs: list[tuple] = field(default_factory=list)
    sources: list[tuple[str, str]] = field(default_factory=list)
    description: str = ""
    columns: dict[str, dict] = field(default_factory=dict)
    # tests
    column_name: Optional[str] = None
    test_metadata: dict[str, Any] = field(default_factory=dict)
    attached_node: Optional[str] = None
    # sources
    source_name: Optional[str] = None
    identifier: Optional[str] = None  # path or table the source resolves to
    loaded_at_field: Optional[str] = None
    # custom freshness SQL, highest precedence (task/freshness.py:119-133)
    loaded_at_query: Optional[str] = None
    freshness: dict[str, Any] = field(default_factory=dict)
    fqn: list[str] = field(default_factory=list)

    @property
    def is_ephemeral(self) -> bool:
        return self.config.materialized == Materialization.Ephemeral.value

    def checksum(self) -> str:
        return hashlib.md5(self.raw_code.encode()).hexdigest()

    def get_materialization(self) -> str:
        return self.config.materialized


@dataclass
class Manifest:
    nodes: dict[str, ManifestNode] = field(default_factory=dict)
    sources: dict[str, ManifestNode] = field(default_factory=dict)
    macros: dict[str, Any] = field(default_factory=dict)
    docs: dict[str, str] = field(default_factory=dict)  # {% docs %} blocks
    project_name: str = "project"

    def add(self, node: ManifestNode) -> None:
        store = self.sources if node.resource_type == NodeType.Source else self.nodes
        if node.unique_id in store:
            raise ValueError(f"duplicate node {node.unique_id}")
        store[node.unique_id] = node

    def ref_lookup(self, name: str, package: Optional[str] = None) -> Optional[ManifestNode]:
        for node in self.nodes.values():
            if node.name == name and node.resource_type in (
                NodeType.Model,
                NodeType.Seed,
                NodeType.Snapshot,
            ):
                if package is None or node.package_name == package:
                    return node
        return None

    def source_lookup(self, source_name: str, table_name: str) -> Optional[ManifestNode]:
        # scan (not uid-construct): sources may come from package projects
        uid = f"source.{self.project_name}.{source_name}.{table_name}"
        found = self.sources.get(uid)
        if found is not None:
            return found
        for node in self.sources.values():
            if node.source_name == source_name and node.name == table_name:
                return node
        return None

    def writable(self) -> dict:
        """manifest.json-style artifact (schema-compatible subset of v12)."""

        def node_dict(n: ManifestNode) -> dict:
            return {
                "unique_id": n.unique_id,
                "name": n.name,
                "package_name": n.package_name,
                "path": n.path,
                "resource_type": n.resource_type.value,
                "raw_code": n.raw_code,
                "compiled_code": n.compiled_code,
                "config": {k: v for k, v in n.config.__dict__.items() if v not in (None, [], {})},
                "depends_on": {"nodes": n.depends_on},
                "checksum": n.checksum(),
            }

        return {
            "metadata": {
                "dbt_schema_version": "https://schemas.getdbt.com/dbt/manifest/v12.json",
                "project_name": self.project_name,
                "generator": "dbt_spark",
            },
            "nodes": {uid: node_dict(n) for uid, n in self.nodes.items()},
            "sources": {uid: node_dict(n) for uid, n in self.sources.items()},
            # macro source hashes — state:modified.macros comparison input
            # (selector_methods.py:637-665)
            "macros": {
                name: hashlib.md5(src.encode()).hexdigest()
                for name, src in self.macros.items()
                if isinstance(src, str)
            },
        }

    def write(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.writable(), f, indent=1, default=str)
