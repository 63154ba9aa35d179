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
    # unique_ids of {{ doc() }} references resolved from the description
    # (1.10 doc_blocks, reference manifest.py:1662-1697)
    doc_blocks: list[str] = field(default_factory=list)
    columns: dict[str, dict] = field(default_factory=dict)
    # raw (pre-render) schema-YAML config values, where the patch carried
    # them — the comparand for state_modified_compare_more_unrendered_values
    # (reference manifest field unrendered_config)
    unrendered_config: dict[str, Any] = field(default_factory=dict)
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
    # versioned models: first-class node fields like the reference
    # (core/dbt/contracts/graph/nodes.py:503,523) — populated from the
    # <name>_v<k> file convention + schema-YAML latest_version/
    # deprecation_date patches by project._finalize_versions
    version: Optional[int] = None
    latest_version: Optional[int] = None
    deprecation_date: Optional[Any] = None  # tz-aware datetime

    @property
    def is_latest_version(self) -> bool:
        # nodes.py:523 is_latest_version
        return self.version is not None and self.version == self.latest_version

    @property
    def is_past_deprecation_date(self) -> bool:
        # nodes.py:526 is_past_deprecation_date
        from datetime import datetime, timezone

        return (
            self.deprecation_date is not None
            and self.deprecation_date < datetime.now(timezone.utc)
        )

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
    # project+CLI vars active at parse time — written into metadata.env so
    # state_modified_compare_vars can diff them (reference ProjectFlags)
    vars: dict[str, Any] = field(default_factory=dict)
    # invocation identity stamped by the engine before artifact writes
    # (metadata.invocation_id + 1.10 metadata.invocation_started_at,
    # reference artifacts/schemas/base.py:58-62)
    invocation_id: Optional[str] = None
    invocation_started_at: Optional[str] = None
    # project-level `dispatch:` config (list of {macro_namespace,
    # search_order}) + installed package names — adapter.dispatch search
    # order inputs (core/dbt/config/project.py:775 get_macro_search_order,
    # providers.py:157-174 _get_search_packages)
    dispatch_config: list = field(default_factory=list)
    dependencies: list = field(default_factory=list)
    # package name -> its dbt_project.yml `restrict-access:` flag; gates
    # cross-package protected/private ref errors (config/project.py:640,
    # manifest.py:1502)
    restrict_access: dict = field(default_factory=dict)
    # custom {% materialization %} blocks:
    # name -> adapter ('spark'|'default') -> (body, package_name, is_root)
    # (reference find_materialization_macro_by_name candidates,
    # manifest.py:1005-1046)
    materialization_macros: dict = field(default_factory=dict)

    def add(self, node: ManifestNode) -> None:
        store = self.sources if node.resource_type == NodeType.Source else self.nodes
        if node.unique_id in store:
            raise ValueError(f"duplicate node {node.unique_id}")
        store[node.unique_id] = node
        self.__dict__.pop("_ref_index", None)

    def ref_lookup(self, name: str, package: Optional[str] = None) -> Optional[ManifestNode]:
        # name -> [uid] accelerator: ref() resolution is called a few times
        # per node, and the linear scan made a 2,000-model run O(n^2). Pure
        # fast path — a hit is re-validated against self.nodes (deletions)
        # and ANY miss falls through to the original full scan (nodes added
        # behind the index's back), so semantics are unchanged.
        idx = self.__dict__.get("_ref_index")
        if idx is None:
            idx = {}
            for node in self.nodes.values():
                if node.resource_type in (
                        NodeType.Model, NodeType.Seed, NodeType.Snapshot):
                    idx.setdefault(node.name, []).append(node.unique_id)
            self.__dict__["_ref_index"] = idx
        for uid in idx.get(name, ()):
            node = self.nodes.get(uid)
            if (
                node is not None
                and node.name == name
                and node.resource_type in (
                    NodeType.Model, NodeType.Seed, NodeType.Snapshot)
                and (package is None or node.package_name == package)
            ):
                return node
        for node in self.nodes.values():
            if node.name == name and node.resource_type in (
                NodeType.Model,
                NodeType.Seed,
                NodeType.Snapshot,
            ):
                if package is None or node.package_name == package:
                    return node
        # unversioned ref('name') to a VERSIONED model resolves to the
        # LATEST version (reference manifest.py resolve_ref: ref without
        # a version keyword targets latest_version) — nodes follow the
        # <name>_v<k> naming convention, so match on base + version
        best: Optional[ManifestNode] = None
        for node in self.nodes.values():
            if (
                node.resource_type == NodeType.Model
                and node.version is not None
                and node.name == f"{name}_v{node.version}"
                and (package is None or node.package_name == package)
            ):
                if node.is_latest_version:
                    return node
                if best is None or (node.version or 0) > (best.version or 0):
                    best = node
        return best

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
        """manifest.json artifact, jsonschema-valid against the reference's
        published v12 schema (/root/reference/schemas/dbt/manifest/v12.json;
        validated by tests/test_artifacts.py). Semantic-layer nodes route to
        their own top-level sections like the reference writer
        (core/dbt/contracts/graph/manifest.py WritableManifest)."""
        from datetime import datetime, timezone

        def _base(n: ManifestNode) -> dict:
            return {
                "name": n.name,
                "resource_type": n.resource_type.value,
                "package_name": n.package_name,
                "path": n.path,
                "original_file_path": n.path,
                "unique_id": n.unique_id,
                "fqn": n.fqn or [n.package_name, n.name],
            }

        def _config(n: ManifestNode) -> dict:
            return {
                k: v for k, v in n.config.__dict__.items() if v not in (None, [], {})
            }

        def node_dict(n: ManifestNode) -> dict:
            d = {
                **_base(n),
                "database": None,
                "schema": n.config.schema or "main",
                "alias": n.name,
                # FileHash shape (schema `checksum` — required object)
                "checksum": {"name": "md5", "checksum": n.checksum()},
                "raw_code": n.raw_code,
                "config": _config(n),
                # v12: seeds carry MacroDependsOn (no "nodes" key — seeds
                # cannot ref; reference v1/seed.py SeedNode.depends_on)
                "depends_on": (
                    {"macros": []}
                    if n.resource_type == NodeType.Seed
                    else {"macros": [], "nodes": n.depends_on}
                ),
                "description": n.description,
                "doc_blocks": list(n.doc_blocks),
                "tags": list(n.config.tags),
                "meta": n.config.meta,
                "unrendered_config": dict(n.unrendered_config),
            }
            if n.compiled_code is not None:
                d["compiled"] = True
                d["compiled_code"] = n.compiled_code
            if n.config.meta.get("time_spine"):
                # Model.time_spine artifact field (v1/model.py:26-35)
                d["time_spine"] = n.config.meta["time_spine"]
            if n.config.meta.get("freshness"):
                # Model.freshness artifact field (ModelFreshness,
                # v1/model.py:51-52 — build_after gating)
                d["freshness"] = n.config.meta["freshness"]
            if n.columns:
                # ColumnInfo shape (v12 columns section) — carries the
                # contract surface (data_type + constraints) so
                # state:modified.contract can compare against --state
                d["columns"] = {
                    name: {
                        "name": name,
                        "description": str(spec.get("description", "")),
                        "data_type": spec.get("data_type"),
                        "constraints": spec.get("constraints") or [],
                        "doc_blocks": list(spec.get("doc_blocks") or []),
                    }
                    for name, spec in n.columns.items()
                }
            if n.config.contract:
                d["contract"] = {
                    "enforced": bool(n.config.contract.get("enforced", False))
                }
            if n.resource_type == NodeType.Model:
                # versioned-model fields (WritableManifest model entries;
                # nodes.py:503,523) — null for unversioned models
                d["version"] = n.version
                d["latest_version"] = n.latest_version
                d["deprecation_date"] = (
                    n.deprecation_date.isoformat() if n.deprecation_date else None
                )
            if n.column_name:
                d["column_name"] = n.column_name
            if n.attached_node:
                d["attached_node"] = n.attached_node
            if n.test_metadata and n.resource_type == NodeType.Test:
                tm = n.test_metadata
                d["test_metadata"] = {
                    "name": str(tm.get("name", n.name)),
                    "kwargs": {
                        k: v for k, v in tm.items() if k != "name"
                    },
                }
            return d

        def source_dict(n: ManifestNode) -> dict:
            return {
                **_base(n),
                "database": None,
                "schema": n.config.schema or "main",
                "source_name": n.source_name or "",
                "source_description": "",
                "loader": "",
                "identifier": n.identifier or n.name,
                "description": n.description,
                "doc_blocks": list(n.doc_blocks),
                "config": _config(n),
                "meta": n.config.meta,
                "tags": list(n.config.tags),
            }

        def _metric_input(v: Any) -> Optional[dict]:
            if v is None:
                return None
            return {"name": str(v["name"] if isinstance(v, dict) else v)}

        def _window(v: Any) -> Optional[dict]:
            if not v:
                return None
            parts = str(v).split()
            if len(parts) == 2 and parts[0].isdigit():
                return {"count": int(parts[0]),
                        "granularity": parts[1].lower().rstrip("s")}
            return None

        def exposure_dict(n: ManifestNode) -> dict:
            m = n.config.meta
            return {
                **_base(n),
                "type": str(m.get("type", "analysis")).lower(),
                "owner": m.get("owner") or {},
                "description": n.description,
                "label": m.get("label"),
                "maturity": m.get("maturity"),
                "url": m.get("url"),
                "tags": list(n.config.tags),
                "meta": {},
                "config": {"enabled": True},
                "depends_on": {"macros": [], "nodes": n.depends_on},
            }

        def metric_dict(n: ManifestNode) -> dict:
            m = n.config.meta
            tp = m.get("type_params") or {}
            type_params: dict[str, Any] = {
                "measure": _metric_input(tp.get("measure")),
                "numerator": _metric_input(tp.get("numerator")),
                "denominator": _metric_input(tp.get("denominator")),
                "expr": str(tp["expr"]) if tp.get("expr") is not None else None,
                "window": _window(tp.get("window")),
                "grain_to_date": tp.get("grain_to_date"),
                "metrics": [
                    mi for mi in map(_metric_input, tp.get("metrics") or [])
                    if mi is not None
                ],
            }
            ctp = tp.get("conversion_type_params")
            if isinstance(ctp, dict):
                type_params["conversion_type_params"] = {
                    "base_measure": _metric_input(ctp.get("base_measure")),
                    "conversion_measure": _metric_input(ctp.get("conversion_measure")),
                    "entity": str(ctp.get("entity", "")),
                    "calculation": str(ctp.get("calculation", "conversion_rate")),
                    "window": _window(ctp.get("window")),
                }
            return {
                **_base(n),
                "description": n.description,
                "label": str(m.get("label", n.name)),
                "type": str(m.get("type", "simple")).lower(),
                "type_params": type_params,
                "filter": None,
                "meta": {},
                "tags": list(n.config.tags),
                "config": {"enabled": True},
                "depends_on": {"macros": [], "nodes": n.depends_on},
            }

        def _element_config(el: dict) -> dict:
            """dimension/measure/entity `config: {meta: ...}` passthrough —
            SemanticLayerElementConfig (reference
            core/dbt/artifacts/resources/v1/semantic_model.py:34-39,
            .changes/unreleased/Features-20250106-132829.yaml). Emitted only
            when the YAML carried it (schema default is null)."""
            cfg = el.get("config")
            if isinstance(cfg, dict) and isinstance(cfg.get("meta"), dict):
                return {"config": {"meta": dict(cfg["meta"])}}
            return {}

        def semantic_model_dict(n: ManifestNode) -> dict:
            m = n.config.meta
            dims = []
            for dim in m.get("dimensions") or []:
                d = {"name": str(dim["name"]), "type": str(dim["type"]).lower()}
                tp = dim.get("type_params") or {}
                if tp.get("time_granularity"):
                    d["type_params"] = {
                        "time_granularity": str(tp["time_granularity"]).lower()
                    }
                d.update(_element_config(dim))
                dims.append(d)
            return {
                **_base(n),
                "model": str(m.get("model", "")),
                "node_relation": {
                    "alias": n.name,
                    "schema_name": n.config.schema or "main",
                    "database": None,
                },
                "description": n.description,
                "entities": [
                    {"name": str(e["name"]), "type": str(e["type"]).lower(),
                     **_element_config(e)}
                    for e in m.get("entities") or []
                ],
                "dimensions": dims,
                "measures": [
                    {
                        "name": str(mm["name"]),
                        "agg": str(mm["agg"]).lower(),
                        **({"expr": str(mm["expr"])} if mm.get("expr") is not None else {}),
                        "create_metric": bool(mm.get("create_metric", False)),
                        **_element_config(mm),
                    }
                    for mm in m.get("measures") or []
                ],
                "config": {"enabled": True},
                "depends_on": {"macros": [], "nodes": n.depends_on},
            }

        def saved_query_dict(n: ManifestNode) -> dict:
            m = n.config.meta
            qp = m.get("query_params") or {}
            return {
                **_base(n),
                "query_params": {
                    "metrics": [str(x) for x in qp.get("metrics") or []],
                    "group_by": [str(x) for x in qp.get("group_by") or []],
                    "where": None,
                },
                "exports": [
                    {
                        "name": str(e.get("name", "")),
                        "config": {
                            "export_as": str(
                                (e.get("config") or {}).get("export_as", "table")
                            ).lower(),
                        },
                    }
                    for e in m.get("exports") or []
                ],
                "description": n.description,
                "config": {"enabled": True},
                # tags: union of the entry-level list and config.tags,
                # sorted unique — schema_yaml_readers.py:826-834 wrap_tags
                # (.changes/unreleased/Features-20241216-095435.yaml)
                "tags": sorted({
                    *(
                        [m["tags"]] if isinstance(m.get("tags"), str)
                        else [str(t) for t in m.get("tags") or []]
                    ),
                    *[str(t) for t in n.config.tags or []],
                }),
                "depends_on": {"macros": [], "nodes": n.depends_on},
            }

        def group_dict(n: ManifestNode) -> dict:
            return {
                "name": n.name,
                "resource_type": n.resource_type.value,
                "package_name": n.package_name,
                "path": n.path,
                "original_file_path": n.path,
                "unique_id": n.unique_id,
                "owner": n.config.meta.get("owner") or {},
            }

        def unit_test_dict(n: ManifestNode) -> dict:
            tm = n.test_metadata
            given = []
            for g in tm.get("given") or []:
                item: dict[str, Any] = {"input": str(g.get("input", ""))}
                if "rows" in g:
                    item["rows"] = g["rows"]
                if "format" in g:
                    item["format"] = g["format"]
                if "fixture" in g:
                    item["fixture"] = g["fixture"]
                given.append(item)
            expect = tm.get("expect") or {}
            return {
                **_base(n),
                "model": str(tm.get("model", "")),
                "given": given,
                "expect": {
                    k: v for k, v in expect.items()
                    if k in ("rows", "format", "fixture")
                } or {"rows": []},
                "description": n.description,
                "overrides": None,
                "config": {"enabled": True},
                "depends_on": {"macros": [], "nodes": n.depends_on},
            }

        def macro_dict(name: str, src: str) -> dict:
            if "." in name:
                pkg, _, mname = name.partition(".")
            else:
                pkg, mname = self.project_name, name
            return {
                "name": mname,
                "resource_type": "macro",
                "package_name": pkg,
                "path": "macros",
                "original_file_path": "macros",
                "unique_id": f"macro.{pkg}.{mname}",
                "macro_sql": src,
                "depends_on": {"macros": []},
                "description": "",
                "meta": {},
            }

        section_builders = {
            NodeType.Exposure: ("exposures", exposure_dict),
            NodeType.Metric: ("metrics", metric_dict),
            NodeType.SemanticModel: ("semantic_models", semantic_model_dict),
            NodeType.SavedQuery: ("saved_queries", saved_query_dict),
            NodeType.Group: ("groups", group_dict),
            NodeType.UnitTest: ("unit_tests", unit_test_dict),
        }
        doc: dict[str, Any] = {
            "metadata": {
                "dbt_schema_version": "https://schemas.getdbt.com/dbt/manifest/v12.json",
                "dbt_version": "1.10.0",
                "generated_at": datetime.now(timezone.utc).isoformat(),
                "invocation_id": self.invocation_id,
                "invocation_started_at": self.invocation_started_at,
                "project_name": self.project_name,
                "adapter_type": "spark",
                # env is a string->string map in the published v12 schema;
                # the active vars ride along as one JSON value so
                # state_modified_compare_vars can diff manifests
                "env": ({"DBT_SPARK_VARS": json.dumps(
                    {k: str(v) for k, v in sorted(self.vars.items())})}
                    if self.vars else {}),
            },
            "nodes": {},
            "sources": {uid: source_dict(n) for uid, n in self.sources.items()},
            "macros": {},
            "docs": {
                f"doc.{self.project_name}.{name}": {
                    "name": name,
                    "resource_type": "doc",
                    "package_name": self.project_name,
                    "path": "docs",
                    "original_file_path": "docs",
                    "unique_id": f"doc.{self.project_name}.{name}",
                    "block_contents": contents,
                }
                for name, contents in self.docs.items()
            },
            "exposures": {},
            "metrics": {},
            "groups": {},
            "selectors": {},
            "disabled": {},
            "saved_queries": {},
            "semantic_models": {},
            "unit_tests": {},
        }
        for uid, n in self.nodes.items():
            section, builder = section_builders.get(
                n.resource_type, ("nodes", node_dict)
            )
            doc[section][uid] = builder(n)
        for name, src in self.macros.items():
            if isinstance(src, str):
                d = macro_dict(name, src)
                doc["macros"][d["unique_id"]] = d
        # parent_map / child_map over every graph-participating entity
        parent_map: dict[str, list] = {}
        child_map: dict[str, list] = {}
        for store in (self.nodes, self.sources):
            for uid, n in store.items():
                parent_map[uid] = sorted(n.depends_on)
                child_map.setdefault(uid, [])
                for dep in n.depends_on:
                    child_map.setdefault(dep, []).append(uid)
        doc["parent_map"] = parent_map
        doc["child_map"] = {k: sorted(v) for k, v in child_map.items()}
        doc["group_map"] = {}
        return doc

    def write(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.writable(), f, indent=1, default=str)

    def semantic_manifest_dict(self) -> dict:
        """The ``semantic_manifest.json`` artifact the reference writes
        beside manifest.json (parser/manifest.py:2088-2091
        write_semantic_manifest → contracts/graph/semantic_manifest.py
        _get_pydantic_semantic_manifest): semantic models, metrics, saved
        queries, and the project configuration's time spines (declared
        model-level ``time_spine:`` configs plus the legacy
        ``metricflow_time_spine`` model when present)."""
        def _entry(n: ManifestNode) -> dict:
            out = dict(n.config.meta)
            out.setdefault("name", n.name)
            return out

        spines, legacy = [], None
        for n in self.nodes.values():
            if n.resource_type != NodeType.Model:
                continue
            ts = n.config.meta.get("time_spine")
            if ts:
                std = ts.get("standard_granularity_column")
                col = n.columns.get(std) or {}
                spines.append({
                    "node_relation": {"alias": n.name,
                                      "schema_name": n.config.schema or "main"},
                    "primary_column": {
                        "name": std,
                        "time_granularity": col.get("granularity") or "day"},
                    "custom_granularities":
                        ts.get("custom_granularities") or [],
                })
            elif n.name == "metricflow_time_spine":
                # legacy spine (semantic_manifest.py:218-227): day-grain
                # date_day model included for backward compatibility
                legacy = {"location": n.name, "column_name": "date_day",
                          "grain": "day"}
        return {
            "semantic_models": [
                _entry(n) for n in self.nodes.values()
                if n.resource_type == NodeType.SemanticModel],
            "metrics": [
                _entry(n) for n in self.nodes.values()
                if n.resource_type == NodeType.Metric],
            "saved_queries": [
                _entry(n) for n in self.nodes.values()
                if n.resource_type == NodeType.SavedQuery],
            "project_configuration": {
                "time_spines": spines,
                "time_spine_table_configurations":
                    [legacy] if legacy else [],
            },
        }

    def write_semantic_manifest(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.semantic_manifest_dict(), f, indent=1, default=str)
