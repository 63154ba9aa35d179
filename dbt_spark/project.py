"""Project loading + parsing: dbt_project.yml, models/*.sql(.py), schema YAML,
seeds, snapshots, singular tests → Manifest.

Mirrors the reference's parser pipeline (SURVEY.md §3.1 IR#1-#4:
core/dbt/parser/manifest.py:271-437) with the same resource discovery rules:
model files under model-paths, seeds under seed-paths, snapshots under
snapshot-paths, singular tests under test-paths, generic tests from YAML
``data_tests:``/``tests:`` keys (core/dbt/parser/generic_test_builders.py).
"""

from __future__ import annotations

import copy
import os
import re
from dataclasses import dataclass, field
from typing import Any, Optional

import yaml

from dbt_spark.plans.compile import CompilationError, parse_render
from dbt_spark.plans.manifest import (
    Manifest,
    ManifestNode,
    NodeConfig,
    NodeType,
)

GENERIC_TESTS = {"not_null", "unique", "accepted_values", "relationships"}


#: query-comment default: enabled, dbt's default JSON header, prepended
DEFAULT_QUERY_COMMENT = {
    "comment": None, "append": False, "job_label": False, "enabled": True,
}


@dataclass
class Project:
    name: str
    root: str
    profile: dict[str, Any] = field(default_factory=dict)
    model_paths: list[str] = field(default_factory=lambda: ["models"])
    seed_paths: list[str] = field(default_factory=lambda: ["seeds"])
    snapshot_paths: list[str] = field(default_factory=lambda: ["snapshots"])
    test_paths: list[str] = field(default_factory=lambda: ["tests"])
    macro_paths: list[str] = field(default_factory=lambda: ["macros"])
    analysis_paths: list[str] = field(default_factory=lambda: ["analyses"])
    packages: list[dict] = field(default_factory=list)
    vars: dict[str, Any] = field(default_factory=dict)
    model_config: dict[str, Any] = field(default_factory=dict)
    seed_config: dict[str, Any] = field(default_factory=dict)
    on_run_start: list[str] = field(default_factory=list)
    on_run_end: list[str] = field(default_factory=list)
    clean_targets: list[str] = field(default_factory=lambda: ["target", "dbt_packages"])
    # selectors.yml: {name: {definition, default?}} (core/dbt/config/selectors.py)
    selectors: dict[str, dict] = field(default_factory=dict)
    # external-nodes plugin modules (core/dbt/plugins/manager.py; injection
    # parser/manifest.py:827-853): each module's get_nodes(project) returns
    # [{name, location, file_format?, schema?}] injected as external models
    plugins: list[str] = field(default_factory=list)
    # artifact output dir (reference --target-path / DBT_TARGET_PATH /
    # target-path: key, cli/params.py "--target-path"; default <root>/target)
    target_path: str = ""
    # dbt_project.yml `flags:` — CLI-option defaults + behavior flags
    # (reference ProjectFlags, core/dbt/contracts/project.py:318)
    flags: dict = field(default_factory=dict)
    # dbt_project.yml `dispatch:` — [{macro_namespace, search_order}]
    # (core/dbt/config/project.py:429,775): reroutes adapter.dispatch
    # macro resolution per namespace (the dbt_utils→spark_utils shim idiom)
    dispatch: list = field(default_factory=list)
    # profiles.yml `secondary_profiles:` on the selected output — named
    # extra connection profiles resolved with the same target rules
    # (reference Profile.secondary_profiles, config/profile.py:63,328-357,
    # .changes/unreleased/Under the Hood-20250214-123853.yaml): no nesting,
    # no duplicate names, single-output targets infer their target name
    secondary_profiles: dict[str, dict] = field(default_factory=dict)
    # dbt_project.yml `restrict-access:` — when TRUE on a package, its
    # protected models reject ALL cross-package refs (and private models
    # reject cross-package refs even within a group); when false (default),
    # cross-package protected refs are allowed (core/dbt/config/
    # project.py:640, manifest.py:1502 is_invalid_protected_ref)
    restrict_access: bool = False
    # dbt_project.yml `query-comment:` — warehouse-side audit attribution
    # rendered onto every executed statement (core/dbt/config/project.py:208
    # _query_comment_from_cfg; rendering core/dbt/context/query_header.py).
    # Normalized: {comment: str|None (None = default JSON), append: bool,
    # job_label: bool, enabled: bool}
    query_comment: dict = field(
        default_factory=lambda: dict(DEFAULT_QUERY_COMMENT)
    )

    def __post_init__(self) -> None:
        if not self.target_path:
            self.target_path = os.path.join(self.root, "target")

    @classmethod
    def load(
        cls,
        project_dir: str,
        profile: Optional[dict] = None,
        target: Optional[str] = None,
        profile_name: Optional[str] = None,
        profiles_dir: Optional[str] = None,
        target_path: Optional[str] = None,
    ) -> "Project":
        if not os.path.isdir(project_dir):
            raise FileNotFoundError(f"project directory does not exist: {project_dir}")
        cfg_path = os.path.join(project_dir, "dbt_project.yml")
        if not os.path.exists(cfg_path):
            raise FileNotFoundError(
                f"no dbt_project.yml found in {project_dir} — not a dbt_spark project"
            )
        with open(cfg_path) as f:
            cfg = yaml.safe_load(f) or {}
        # reference DbtProjectYamlRenderer: env_var()/var() substitute in
        # project config values; vars: block itself is read pre-render
        cfg = _render_yaml_values(cfg, cfg.get("vars") or {})
        name = cfg.get("name", os.path.basename(os.path.abspath(project_dir)))
        prof = dict(profile or {})
        # profiles.yml search order mirrors the reference resolution
        # (--profiles-dir > DBT_PROFILES_DIR > project dir; config/profile.py)
        pdirs = [
            d for d in (
                profiles_dir, os.environ.get("DBT_PROFILES_DIR"), project_dir,
            ) if d
        ]
        prof_path = next(
            (os.path.join(d, "profiles.yml") for d in pdirs
             if os.path.exists(os.path.join(d, "profiles.yml"))),
            os.path.join(project_dir, "profiles.yml"),
        )
        if not prof and os.path.exists(prof_path):
            with open(prof_path) as f:
                # ProfileRenderer: env_var() substitution (credentials etc.)
                raw = _render_yaml_values(yaml.safe_load(f) or {}, {})
            # reference layout (config/profile.py:56-77): profiles.yml maps
            # profile-name -> {target: ..., outputs: {name: {...}}}; the
            # project's `profile:` key picks the entry, `target` (or the
            # --target override) picks the output. A flat `spark:` dict is
            # also accepted as shorthand.
            # --profile overrides the project's `profile:` key
            # (cli/params.py "--profile")
            entry = (
                raw.get(profile_name or cfg.get("profile"))
                or raw.get("spark")
                or {}
            )
            if profile_name and profile_name not in raw:
                raise KeyError(
                    f"profiles.yml: profile {profile_name!r} not found "
                    f"(available: {sorted(raw)})"
                )
            if isinstance(entry, dict) and "outputs" in entry:
                tgt = target or entry.get("target") or next(iter(entry["outputs"]))
                if tgt not in entry["outputs"]:
                    raise KeyError(
                        f"profiles.yml: target {tgt!r} not in outputs "
                        f"{sorted(entry['outputs'])}"
                    )
                prof = dict(entry["outputs"][tgt])
                prof.setdefault("target_name", tgt)
            elif isinstance(entry, dict):
                prof = dict(entry)
        secondary = _parse_secondary_profiles(prof, target)
        # require-dbt-version: the project refuses to load under an engine
        # version outside the range (reference core/dbt/config/project.py
        # validate_version / DbtProjectError; flags.version_check /
        # --no-version-check skips)
        req = cfg.get("require-dbt-version")
        flags_cfg = dict(cfg.get("flags") or {})
        if req and flags_cfg.get("version_check", True):
            from dbt_spark import __dbt_compat_version__
            from dbt_spark.plans.deps import SemVer, satisfies

            specs = [req] if isinstance(req, str) else [str(x) for x in req]
            if not satisfies(SemVer.parse(__dbt_compat_version__), specs):
                raise ValueError(
                    f"this project requires dbt version {specs}; "
                    f"running dbt_spark (dbt compat {__dbt_compat_version__}) "
                    "(set flags: {version_check: false} to skip)")
        tpath = (
            target_path
            or os.environ.get("DBT_TARGET_PATH")
            or cfg.get("target-path")
            or os.path.join(project_dir, "target")
        )
        if not os.path.isabs(tpath):
            tpath = os.path.join(os.path.abspath(project_dir), tpath)
        prof.setdefault("warehouse", os.path.join(tpath, "warehouse"))
        prof.setdefault("schema", "main")
        prof.setdefault("threads", 4)
        on_start = cfg.get("on-run-start", [])
        on_end = cfg.get("on-run-end", [])
        return cls(
            name=name,
            root=os.path.abspath(project_dir),
            profile=prof,
            model_paths=cfg.get("model-paths", ["models"]),
            seed_paths=cfg.get("seed-paths", ["seeds"]),
            snapshot_paths=cfg.get("snapshot-paths", ["snapshots"]),
            test_paths=cfg.get("test-paths", ["tests"]),
            macro_paths=cfg.get("macro-paths", ["macros"]),
            analysis_paths=cfg.get("analysis-paths", ["analyses"]),
            packages=cls._load_packages(project_dir),
            vars=cfg.get("vars", {}),
            model_config=cfg.get("models", {}),
            seed_config=cfg.get("seeds", {}),
            on_run_start=[on_start] if isinstance(on_start, str) else list(on_start),
            on_run_end=[on_end] if isinstance(on_end, str) else list(on_end),
            clean_targets=cfg.get("clean-targets", ["target", "dbt_packages"]),
            selectors=cls._load_selectors(project_dir),
            plugins=list(cfg.get("plugins", []) or []),
            target_path=tpath,
            flags=dict(cfg.get("flags") or {}),
            dispatch=cls._load_dispatch(cfg),
            query_comment=cls._load_query_comment(cfg),
            restrict_access=bool(cfg.get("restrict-access", False)),
            secondary_profiles=secondary,
        )

    @staticmethod
    def _load_query_comment(cfg: dict) -> dict:
        """`query-comment:` forms (core/dbt/config/project.py:208):
        absent → default JSON comment prepended; string → that template;
        null/empty string → disabled; dict → {comment, append, job-label}."""
        out = dict(DEFAULT_QUERY_COMMENT)
        if "query-comment" not in cfg:
            return out
        val = cfg.get("query-comment")
        if val is None or val == "":
            out["enabled"] = False
            return out
        if isinstance(val, str):
            out["comment"] = val
            return out
        if isinstance(val, dict):
            comment = val.get("comment")
            if comment is not None and not isinstance(comment, str):
                raise ValueError(
                    "dbt_project.yml: query-comment.comment must be a string")
            if comment == "":
                out["enabled"] = False
            out["comment"] = comment or None
            out["append"] = bool(val.get("append", False))
            out["job_label"] = bool(
                val.get("job-label", val.get("job_label", False)))
            return out
        raise ValueError(
            "dbt_project.yml: query-comment must be a string or mapping")

    @staticmethod
    def _load_dispatch(cfg: dict) -> list:
        """Validate the `dispatch:` block: each entry needs a string
        macro_namespace and a non-empty search_order list (the reference's
        Project contract rejects malformed entries at load)."""
        entries = cfg.get("dispatch") or []
        if not isinstance(entries, list):
            raise ValueError("dbt_project.yml: dispatch must be a list")
        out = []
        for e in entries:
            ns = isinstance(e, dict) and e.get("macro_namespace")
            order = isinstance(e, dict) and e.get("search_order")
            if not isinstance(ns, str) or not isinstance(order, list) or not order:
                raise ValueError(
                    "dbt_project.yml: each dispatch entry needs "
                    f"macro_namespace (string) and search_order (list): {e!r}"
                )
            out.append({"macro_namespace": ns,
                        "search_order": [str(p) for p in order]})
        return out

    @staticmethod
    def _load_selectors(project_dir: str) -> dict[str, dict]:
        """selectors.yml → {name: entry} (core/dbt/config/selectors.py)."""
        p = os.path.join(project_dir, "selectors.yml")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            doc = yaml.safe_load(f) or {}
        return {s["name"]: s for s in doc.get("selectors", []) or []}

    @staticmethod
    def _load_packages(project_dir: str) -> list[dict]:
        """packages.yml — the reference supports hub/git/local/tarball
        (core/dbt/deps/resolver.py:28); offline, only `local:` resolves here;
        other kinds are surfaced as errors at deps time."""
        p = os.path.join(project_dir, "packages.yml")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            doc = yaml.safe_load(f) or {}
        return list(doc.get("packages", []) or [])

    def _tree_config(self, tree: dict, rel_dir_parts: list[str]) -> dict[str, Any]:
        """Walk the models:/seeds: config hierarchy for a file's directory."""
        merged: dict[str, Any] = {}
        scope = tree.get(self.name, tree) if isinstance(tree, dict) else {}
        node: Any = scope
        chain = [scope] + [
            node := node.get(part, {}) if isinstance(node, dict) else {}
            for part in rel_dir_parts
        ]
        for level in chain:
            if isinstance(level, dict):
                merged.update(
                    {k.lstrip("+"): v for k, v in level.items() if k.startswith("+")}
                )
        return merged


def _parse_secondary_profiles(prof: dict, target: Optional[str]) -> dict:
    """Resolve `secondary_profiles:` on the selected output — named extra
    connection profiles using the SAME target-resolution rules as the
    primary (reference Profile.from_raw_profile_info, config/profile.py:
    305-362): the CLI --target override wins, then the entry's `target:`
    key, then single-output inference; nested secondary_profiles and
    duplicate names are profile errors. Mutates `prof` (pops the key) so
    the execution profile stays a flat credentials dict."""
    out: dict[str, dict] = {}
    for p in prof.pop("secondary_profiles", []) or []:
        if not isinstance(p, dict):
            continue
        for sname, sraw in p.items():
            if sname in out:
                raise ValueError(
                    f"profiles.yml: secondary profile {sname!r} is "
                    "already defined")
            if not isinstance(sraw, dict):
                continue
            if isinstance(sraw.get("outputs"), dict):
                stgt = target or sraw.get("target")
                if stgt is None and len(sraw["outputs"]) == 1:
                    # single-output inference (profile.py:279-281)
                    stgt = next(iter(sraw["outputs"]))
                stgt = stgt or "default"
                if stgt not in sraw["outputs"]:
                    raise KeyError(
                        f"profiles.yml: secondary profile {sname!r}: target "
                        f"{stgt!r} not in outputs {sorted(sraw['outputs'])}")
                sdata = dict(sraw["outputs"][stgt])
                sdata.setdefault("target_name", stgt)
            else:
                sdata = dict(sraw)
            if "secondary_profiles" in sdata:
                raise ValueError(
                    f"profiles.yml: secondary profile {sname!r} cannot have "
                    "nested secondary profiles")
            out[sname] = sdata
    return out


def _walk(root: str, subdirs: list[str], exts: tuple[str, ...]):
    for sub in subdirs:
        base = os.path.join(root, sub)
        if not os.path.isdir(base):
            continue
        for dirpath, _, files in os.walk(base):
            for fname in sorted(files):
                if fname.endswith(exts):
                    full = os.path.join(dirpath, fname)
                    yield full, os.path.relpath(full, root)


def macro_roots(
    project: Project, is_root: bool = True
) -> list[tuple[str, list[str], Optional[str]]]:
    """Ordered (root, subdirs, package_name) triples holding macro sources.

    Shared by parse_project and the partial-parse cache token
    (plans/partial.py): a macro edit anywhere in these roots changes the
    token and forces a full reparse, because macros run inside model
    parse-renders and can change a cached file's extraction (reference
    reparses macro-dependent files: core/dbt/parser/partial.py macro
    handling; validity gates core/dbt/parser/manifest.py:854-975)."""
    roots: list[tuple[str, list[str], Optional[str]]] = []
    if is_root:
        # built-in global macro package (the dbt-adapters "global project"
        # analog): dbt_utils-compatible idioms in the Spark dialect, loaded
        # FIRST so any project/package macro overrides them
        builtin = os.path.join(os.path.dirname(__file__), "include")
        if os.path.isdir(os.path.join(builtin, "global_macros")):
            roots.append((builtin, ["global_macros"], "dbt_utils"))
        # package macros join the global namespace BEFORE any model parses
        # (reference loads all macros first: load_and_parse_macros,
        # core/dbt/parser/manifest.py:677-704); root project loads LAST so its
        # macros win unqualified-name collisions (reference resolution order)
        for pkg_dir in _package_dirs(project):
            pkg_name = os.path.basename(pkg_dir)
            try:
                import yaml as _yaml

                with open(os.path.join(pkg_dir, "dbt_project.yml")) as f:
                    pkg_name = (_yaml.safe_load(f) or {}).get("name", pkg_name)
            except OSError:
                pass
            roots.append((pkg_dir, ["macros"], pkg_name))
    roots.append((project.root, project.macro_paths, None))
    # tests/generic/ holds {% test %} definitions, not singular tests
    # (reference: parser/manifest.py loads generic tests from both macro
    # paths and test_paths/generic)
    roots.append((
        project.root,
        [os.path.join(p, "generic") for p in project.test_paths],
        None,
    ))
    return roots


def parse_project(project: Project, cache=None, manifest: Optional[Manifest] = None) -> Manifest:
    """``cache`` is an optional plans.partial.ParseCache: files whose
    checksum is unchanged skip the Jinja parse-render (partial parsing,
    core/dbt/parser/partial.py:69-170). ``manifest`` given → parse INTO it
    (package projects merging into the root manifest, deps/resolver.py)."""
    from dbt_spark.plans.partial import file_checksum

    is_root = manifest is None
    if manifest is None:
        manifest = Manifest(project_name=project.name,
                            vars=dict(project.vars or {}))
    target_ctx = dict(
        project.profile,
        name=project.profile.get("target_name", "spark"),
        type="spark",
    )

    def cached(full, rel):
        if cache is None:
            return None, None
        ck = file_checksum(full)
        hit = cache.get(rel, ck)
        return ck, hit

    # --- macros first (models may call them at parse-render time) ---------
    from dbt_spark.plans.macros import (
        extract_generic_tests,
        extract_macros,
        extract_materializations,
    )

    if is_root:
        manifest.dispatch_config = list(project.dispatch)
    manifest.restrict_access[project.name] = bool(project.restrict_access)
    for mroot, mpaths, pkg_name in macro_roots(project, is_root=is_root):
        if pkg_name and pkg_name not in manifest.dependencies:
            manifest.dependencies.append(pkg_name)
        for full, rel in _walk(mroot, mpaths, (".sql",)):
            with open(full) as f:
                raw = f.read()
            for (mname, madapter), body in extract_materializations(raw).items():
                # custom {% materialization %} blocks (the reference's #1
                # extension point); locality recorded for the
                # require_explicit_package_overrides_for_builtin_
                # materializations gate (manifest.py:1026-1044)
                owner = pkg_name or project.name
                is_root_locality = pkg_name is None and is_root
                manifest.materialization_macros.setdefault(mname, {})[
                    madapter] = (body, owner, is_root_locality)
            found = dict(extract_macros(raw))
            found.update(extract_generic_tests(raw))
            if is_root:
                manifest.macros.update(found)
            else:
                # package merge into a root manifest: the root's macro pass
                # already registered every package source with the root
                # project loading LAST (its macros win unqualified-name
                # collisions — reference resolution order, MacroResolver
                # root-package precedence). Re-registering here must not
                # clobber a root override with the package version.
                for n, src in found.items():
                    manifest.macros.setdefault(n, src)
            # package-qualified access: {{ pkg.macro() }} (reference
            # MacroNamespace package namespacing). The owning project's
            # own macros are namespaced under its project name so
            # dispatch search orders naming the root project resolve
            # (providers.py:168 `[self.config.project_name, namespace]`).
            qual = pkg_name or project.name
            manifest.macros.update(
                {f"{qual}.{n}": src for n, src in found.items()}
            )

    # dispatch search-order inputs for every parse-phase render below
    # (live references: the lists keep filling as packages merge)
    dispatch_meta = {
        "config": manifest.dispatch_config,
        "root_project": manifest.project_name,
        "dependencies": manifest.dependencies,
    }

    # --- {% docs %} markdown blocks (DocumentationParser) ------------------
    from dbt_spark.plans.macros import extract_docs

    for full, rel in _walk(
        project.root, project.model_paths + project.macro_paths, (".md",)
    ):
        with open(full) as f:
            manifest.docs.update(extract_docs(f.read()))

    # --- models (sql + python) -------------------------------------------
    for full, rel in _walk(project.root, project.model_paths, (".sql", ".py")):
        ck, hit = cached(full, rel)
        if hit is not None:
            for n in hit:
                manifest.add(n)
            continue
        name = os.path.splitext(os.path.basename(rel))[0]
        rel_dir_parts = os.path.dirname(rel).split(os.sep)[1:]  # drop "models"
        with open(full) as f:
            raw = f.read()
        language = "python" if rel.endswith(".py") else "sql"
        if language == "sql":
            # static fast path first (reference parser/models.py:379-393
            # run_static_parser); full Jinja render is the always-correct
            # fallback for anything the extractor can't prove static
            from dbt_spark.plans.static_parser import extract_or_render

            refs, sources, config_calls = extract_or_render(
                raw, name,
                lambda raw=raw, name=name: parse_render(
                    raw, name, project.vars, target_ctx, macros=manifest.macros,
                dispatch_meta=dispatch_meta,
                ),
                flags=getattr(project, "flags", None),
            )
        else:
            refs, sources, config_calls = _parse_python_model(raw)
        dir_cfg = project._tree_config(project.model_config, rel_dir_parts)
        config = NodeConfig().merged(**dir_cfg).merged(**config_calls)
        node = ManifestNode(
            unique_id=f"model.{project.name}.{name}",
            name=name,
            package_name=project.name,
            path=rel,
            resource_type=NodeType.Model,
            raw_code=raw,
            language=language,
            config=config,
            refs=refs,
            sources=sources,
            fqn=[project.name, *rel_dir_parts, name],
        )
        manifest.add(node)
        if cache is not None:
            cache.put(rel, ck, [node])

    # --- seeds ------------------------------------------------------------
    for full, rel in _walk(project.root, project.seed_paths, (".csv",)):
        name = os.path.splitext(os.path.basename(rel))[0]
        rel_dir_parts = os.path.dirname(rel).split(os.sep)[1:]
        dir_cfg = project._tree_config(project.seed_config, rel_dir_parts)
        config = NodeConfig(materialized="seed").merged(**dir_cfg)
        manifest.add(
            ManifestNode(
                unique_id=f"seed.{project.name}.{name}",
                name=name,
                package_name=project.name,
                path=rel,
                resource_type=NodeType.Seed,
                config=config,
                fqn=[project.name, *rel_dir_parts, name],
            )
        )

    # --- snapshots --------------------------------------------------------
    for full, rel in _walk(project.root, project.snapshot_paths, (".sql",)):
        ck, hit = cached(full, rel)
        if hit is not None:
            for n in hit:
                manifest.add(n)
            continue
        with open(full) as f:
            raw = f.read()
        file_nodes = []
        for snap_name, body, cfg in _extract_snapshot_blocks(raw):
            _, refs, sources, config_calls = parse_render(
                body, snap_name, project.vars, target_ctx, macros=manifest.macros,
                dispatch_meta=dispatch_meta,
            )
            cfg.update(config_calls)
            config = NodeConfig(materialized="snapshot").merged(**cfg)
            _validate_snapshot_config(snap_name, config)
            snap_node = ManifestNode(
                unique_id=f"snapshot.{project.name}.{snap_name}",
                name=snap_name,
                package_name=project.name,
                path=rel,
                resource_type=NodeType.Snapshot,
                raw_code=body,
                config=config,
                refs=refs,
                sources=sources,
                fqn=[project.name, snap_name],
            )
            manifest.add(snap_node)
            file_nodes.append(snap_node)
        if cache is not None:
            cache.put(rel, ck, file_nodes)

    # --- singular tests ---------------------------------------------------
    for full, rel in _walk(project.root, project.test_paths, (".sql",)):
        if f"{os.sep}generic{os.sep}" in rel:
            continue  # generic test DEFINITIONS, parsed into macros above
        ck, hit = cached(full, rel)
        if hit is not None:
            for n in hit:
                manifest.add(n)
            continue
        name = os.path.splitext(os.path.basename(rel))[0]
        with open(full) as f:
            raw = f.read()
        _, refs, sources, config_calls = parse_render(
            raw, name, project.vars, target_ctx, macros=manifest.macros,
                dispatch_meta=dispatch_meta,
        )
        config = NodeConfig(materialized="test").merged(**config_calls)
        tnode = ManifestNode(
            unique_id=f"test.{project.name}.{name}",
            name=name,
            package_name=project.name,
            path=rel,
            resource_type=NodeType.Test,
            raw_code=raw,
            config=config,
            refs=refs,
            sources=sources,
            fqn=[project.name, name],
        )
        manifest.add(tnode)
        if cache is not None:
            cache.put(rel, ck, [tnode])

    # --- schema YAML (sources, model patches, generic tests) -------------
    # test_paths included: singular-test `data_tests:` patches live beside
    # the tests they configure (reference parses schema files under EVERY
    # resource path; SingularTestPatchParser, schemas.py:1183)
    for full, rel in _walk(
        project.root,
        project.model_paths + project.seed_paths + project.snapshot_paths
        + project.test_paths,
        (".yml", ".yaml"),
    ):
        with open(full) as f:
            raw_doc = yaml.safe_load(f) or {}
        doc = _render_yaml_values(copy.deepcopy(raw_doc), project.vars)
        _parse_sources(doc, project, manifest, rel)
        _parse_model_patches(doc, project, manifest, rel, raw_doc=raw_doc)
        _parse_unit_tests(doc, project, manifest, rel)
        _parse_metadata_nodes(doc, project, manifest, rel)

    # --- analyses: compile-only nodes (analysis-paths) --------------------
    for full, rel in _walk(project.root, project.analysis_paths, (".sql",)):
        name = os.path.splitext(os.path.basename(rel))[0]
        with open(full) as f:
            raw = f.read()
        _, refs, sources, config_calls = parse_render(
            raw, name, project.vars, target_ctx, macros=manifest.macros,
                dispatch_meta=dispatch_meta,
        )
        manifest.add(
            ManifestNode(
                unique_id=f"analysis.{project.name}.{name}",
                name=name,
                package_name=project.name,
                path=rel,
                resource_type=NodeType.Analysis,
                raw_code=raw,
                config=NodeConfig(materialized="view").merged(**config_calls),
                refs=refs,
                sources=sources,
                fqn=[project.name, name],
            )
        )

    # --- packages merge into the root manifest ----------------------------
    # local: resolve in place; git/tarball: resolve from dbt_packages/ after
    # `deps` installed them (deps/{local,git,tarball}.py)
    if is_root:
        for pkg_dir in _package_dirs(project):
            sub = Project.load(pkg_dir, profile=dict(project.profile))
            sub.vars = {**sub.vars, **project.vars}
            parse_project(sub, cache=None, manifest=manifest)
        _inject_plugin_nodes(project, manifest)
        # versions BEFORE ref resolution: an unversioned ref('name') to a
        # versioned model needs version/latest_version populated to land
        # on the latest version
        _finalize_versions(manifest)
        _resolve_depends_on(manifest)
        # semantic-manifest cross-checks: metric→measure→semantic-model and
        # saved-query→metric references become DAG edges; dangling ones raise
        from dbt_spark.plans.semantic import link_semantic_graph

        link_semantic_graph(manifest)
    return manifest


def _finalize_versions(manifest: Manifest) -> None:
    """Populate the first-class version/latest_version node fields
    (nodes.py:503,523) from the <name>_v<k> file convention: version is the
    parsed suffix; latest_version is the YAML-declared value (schema patch or
    legacy config.meta shim) else the max sibling version."""
    from dbt_spark.plans.graph import VERSION_RE

    groups: dict[str, list] = {}
    for node in manifest.nodes.values():
        if node.resource_type != NodeType.Model:
            continue
        m = VERSION_RE.match(node.name)
        if m is None:
            continue
        node.version = int(m.group("k"))
        groups.setdefault(m.group("base"), []).append(node)
    for siblings in groups.values():
        declared = next(
            (n.latest_version for n in siblings if n.latest_version is not None),
            None,
        )
        if declared is None:
            meta = next(
                (n.config.meta.get("latest_version") for n in siblings
                 if n.config.meta.get("latest_version") is not None),
                None,
            )
            declared = int(meta) if meta is not None else None
        latest = declared if declared is not None else max(
            n.version for n in siblings)
        for n in siblings:
            n.latest_version = latest


_YAML_CALL = re.compile(
    r"\{\{\s*(env_var|var)\(\s*['\"]([^'\"]+)['\"]"
    r"(?:\s*,\s*(?:['\"]([^'\"]*)['\"]|([^)\s]+)))?\s*\)\s*\}\}"
)


def _render_yaml_values(obj, project_vars: dict):
    """Substitute ``{{ env_var(...) }}`` / ``{{ var(...) }}`` inside
    schema-YAML string values (the reference renders schema files through
    the jinja SchemaYamlRenderer — core/dbt/config/renderer.py; most
    commonly used for source locations/credentials). Deliberately a targeted
    substitution rather than a full jinja render: other template constructs
    in YAML strings (``{{ doc(...) }}`` descriptions, fixture SQL) must pass
    through untouched for their own later render phases."""

    def sub(m: "re.Match[str]") -> str:
        fn, name = m.group(1), m.group(2)
        default = m.group(3) if m.group(3) is not None else m.group(4)
        if fn == "env_var":
            val = os.environ.get(name, default)
            if val is None:
                raise CompilationError(
                    f"env_var {name!r} is undefined (and no default given)")
            return str(val)
        return str(project_vars.get(name, default if default is not None else ""))

    def render(value):
        if isinstance(value, str) and "{{" in value:
            return _YAML_CALL.sub(sub, value)
        if isinstance(value, dict):
            return {k: render(v) for k, v in value.items()}
        if isinstance(value, list):
            return [render(v) for v in value]
        return value

    return render(obj)


def _inject_plugin_nodes(project: Project, manifest: Manifest) -> None:
    """External-nodes plugins (core/dbt/plugins/manager.py; injection
    parser/manifest.py:827-853): import each configured module (project root
    on sys.path), call ``get_nodes(project)``, inject the returned specs as
    external models — ref()-able relations whose data lives outside the
    project (maintained by another tool)."""
    if not project.plugins:
        return
    import importlib
    import sys

    if project.root not in sys.path:
        sys.path.insert(0, project.root)
    for mod_name in project.plugins:
        mod = importlib.import_module(mod_name)
        for spec in mod.get_nodes(project):
            name = spec["name"]
            node = ManifestNode(
                unique_id=f"model.{project.name}.{name}",
                name=name,
                package_name=project.name,
                path=f"<plugin:{mod_name}>",
                resource_type=NodeType.Model,
                raw_code="",
                fqn=[project.name, name],
            )
            node.config.materialized = "external"
            node.config.meta["external_location"] = spec["location"]
            node.config.meta["file_format"] = spec.get("file_format", "parquet")
            if spec.get("schema"):
                node.config.schema = spec["schema"]
            manifest.add(node)


def _package_dirs(project: Project) -> list[str]:
    """Resolvable package roots: ``local:`` paths in place, plus everything
    `dbt deps` installed into dbt_packages/ (git clones, tarball extracts)."""
    dirs: list[str] = []
    for pkg in project.packages:
        if "local" in pkg:
            pkg_dir = pkg["local"]
            if not os.path.isabs(pkg_dir):
                pkg_dir = os.path.join(project.root, pkg_dir)
            if os.path.isdir(pkg_dir):
                dirs.append(pkg_dir)
    installed_root = os.path.join(project.root, "dbt_packages")
    if os.path.isdir(installed_root):
        for d in sorted(os.listdir(installed_root)):
            full = os.path.join(installed_root, d)
            if os.path.exists(os.path.join(full, "dbt_project.yml")):
                dirs.append(full)
    return dirs


def _parse_python_model(raw: str) -> tuple[list[tuple], list[tuple[str, str]], dict]:
    """AST-extract dbt.ref/dbt.source/dbt.config calls from a python model
    (mirrors core/dbt/parser/models.py:34-160)."""
    import ast

    refs: list[tuple] = []
    sources: list[tuple[str, str]] = []
    config: dict[str, Any] = {}
    tree = ast.parse(raw)
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        func = node.func
        if isinstance(func, ast.Attribute) and isinstance(func.value, ast.Name):
            if func.value.id != "dbt":
                continue
            args = [a.value for a in node.args if isinstance(a, ast.Constant)]
            if func.attr == "ref" and args:
                refs.append((None, args[-1]) if len(args) == 1 else (args[0], args[1]))
            elif func.attr == "source" and len(args) == 2:
                sources.append((args[0], args[1]))
            elif func.attr == "config":
                for kw in node.keywords:
                    if isinstance(kw.value, ast.Constant) and kw.arg:
                        config[kw.arg] = kw.value.value
    return refs, sources, config


def _extract_snapshot_blocks(raw: str):
    """Parse ``{% snapshot name %}...{% endsnapshot %}`` blocks
    (core/dbt/parser/macros.py:50-56 block extraction)."""
    import re

    pattern = re.compile(
        r"{%-?\s*snapshot\s+(\w+)\s*-?%}(.*?){%-?\s*endsnapshot\s*-?%}", re.DOTALL
    )
    for m in pattern.finditer(raw):
        yield m.group(1), m.group(2).strip(), {}
    if not pattern.search(raw) and raw.strip():
        # bare-SQL snapshot file: filename becomes the snapshot name upstream
        return


def _validate_snapshot_config(name: str, config: NodeConfig) -> None:
    """core/dbt/artifacts/resources/v1/snapshot.py:44-72 validation."""
    # Any strategy that isn't 'check'/'timestamp' is a CUSTOM strategy and
    # passes parse validation (v1/snapshot.py:68-69: "If the strategy is not
    # 'check' or 'timestamp' it's a custom strategy") — it resolves to a
    # snapshot_<name>_strategy macro at materialization.
    if not config.strategy:
        raise CompilationError(
            f"snapshot {name}: snapshots must be configured with a 'strategy'"
        )
    if config.unique_key is None:
        raise CompilationError(f"snapshot {name}: unique_key is required")
    if config.strategy == "timestamp" and not config.updated_at:
        raise CompilationError(f"snapshot {name}: timestamp strategy requires updated_at")
    if config.strategy == "timestamp" and config.check_cols:
        raise CompilationError(
            f"snapshot {name}: a 'timestamp' snapshot should not have 'check_cols'"
        )
    if config.strategy == "check" and not config.check_cols:
        raise CompilationError(f"snapshot {name}: check strategy requires check_cols")


def _parse_sources(doc: dict, project: Project, manifest: Manifest, rel: str) -> None:
    for src in doc.get("sources", []) or []:
        src_name = src["name"]
        for table in src.get("tables", []) or []:
            tbl_name = table["name"]
            node = ManifestNode(
                unique_id=f"source.{project.name}.{src_name}.{tbl_name}",
                name=tbl_name,
                package_name=project.name,
                path=rel,
                resource_type=NodeType.Source,
                source_name=src_name,
                identifier=table.get("identifier", tbl_name),
                loaded_at_field=table.get("loaded_at_field", src.get("loaded_at_field")),
                loaded_at_query=table.get("loaded_at_query", src.get("loaded_at_query")),
                freshness=table.get("freshness", src.get("freshness", {})) or {},
                fqn=[project.name, src_name, tbl_name],
            )
            node.doc_blocks = _doc_refs(
                table.get("description", ""), manifest)
            node.description = _render_description(
                table.get("description", ""), manifest)
            node.config.meta["location"] = table.get("meta", {}).get(
                "location", src.get("meta", {}).get("location")
            )
            node.config.meta["file_format"] = table.get("meta", {}).get("file_format", "parquet")
            # external: block (ExternalTable, reference
            # core/dbt/artifacts/resources/v1/source_definition.py:37-49):
            # the typed way to declare an externally-managed table's
            # location/file_format/partitions. Partition columns are
            # hive-style directory partitions — Spark's scan discovers and
            # prunes them natively, so the plumbing here is metadata +
            # validation (names and data types required, :27-35)
            ext = table.get("external") or src.get("external")
            if isinstance(ext, dict):
                if ext.get("location"):
                    node.config.meta["location"] = ext["location"]
                if ext.get("file_format"):
                    node.config.meta["file_format"] = ext["file_format"]
                parts = []
                for p in ext.get("partitions") or []:
                    if isinstance(p, str):
                        parts.append(p)
                        continue
                    if not (isinstance(p, dict) and p.get("name")
                            and p.get("data_type")):
                        raise CompilationError(
                            "External partition columns must have names and "
                            f"data types (source {src_name}.{tbl_name})")
                    parts.append(p["name"])
                if parts:
                    node.config.meta["external_partitions"] = parts
                node.config.meta["external"] = {
                    k: v for k, v in ext.items()
                    if k in ("location", "file_format", "row_format",
                             "tbl_properties", "partitions")}
            manifest.add(node)
            _attach_column_tests(table, node, project, manifest, is_source=True)


def _as_deprecation_date(value):
    """Normalize a YAML deprecation_date (date, datetime, or ISO string) to a
    tz-aware datetime; naive values are taken as UTC (the reference compares
    against datetime.now().astimezone(), nodes.py:526)."""
    import datetime as _dt

    if value is None:
        return None
    if isinstance(value, str):
        value = _dt.datetime.fromisoformat(value)
    if isinstance(value, _dt.date) and not isinstance(value, _dt.datetime):
        value = _dt.datetime(value.year, value.month, value.day)
    if value.tzinfo is None:
        value = value.replace(tzinfo=_dt.timezone.utc)
    return value


def _parse_model_patches(doc: dict, project: Project, manifest: Manifest,
                         rel: str, raw_doc: Optional[dict] = None) -> None:
    # raw_doc = the same YAML BEFORE env_var/var substitution: config
    # values from it become node.unrendered_config, the comparand for
    # state:modified under state_modified_compare_more_unrendered_values
    # (reference ProjectFlags + manifest unrendered_config)
    raw_cfg_by_name: dict[tuple[str, str], dict] = {}
    if raw_doc:
        for section in ("models", "seeds", "snapshots"):
            for patch in raw_doc.get(section, []) or []:
                if isinstance(patch, dict) and patch.get("config"):
                    raw_cfg_by_name[(section, patch.get("name"))] = patch["config"]
    # YAML-defined snapshots: an entry under `snapshots:` carrying a
    # `relation:` property IS the snapshot — no SQL file exists; the body
    # is synthesized as `select * from {{ relation }}` (reference
    # core/dbt/parser/schemas.py:276-330 _add_yaml_snapshot_nodes_to_manifest,
    # dbt 1.9 "snapshots in YAML")
    for patch in doc.get("snapshots", []) or []:
        if not isinstance(patch, dict) or "relation" not in patch:
            continue
        if "name" not in patch:
            raise CompilationError(
                f"{rel}: a snapshot must define the 'name' property")
        name = patch["name"]
        uid = f"snapshot.{project.name}.{name}"
        if uid in manifest.nodes:
            continue
        relation = str(patch["relation"]).strip()
        # accepts positional package + a version/v keyword arg, matching the
        # reference's statically_parse_ref_or_source grammar
        # (core/dbt/parser/schemas.py: ref('x'), ref('pkg','x'),
        # ref('x', version=2), ref('x', v=2))
        m_ref = re.fullmatch(
            r"ref\(\s*['\"]([^'\"]+)['\"]\s*"
            r"(?:,\s*['\"]([^'\"]+)['\"]\s*)?"
            r"(?:,\s*(?:version|v)\s*=\s*([0-9]+)\s*)?\)", relation)
        m_src = re.fullmatch(
            r"source\(\s*['\"]([^'\"]+)['\"]\s*,\s*['\"]([^'\"]+)['\"]\s*\)",
            relation)
        refs, sources = [], []
        if m_src:
            sources = [(m_src.group(1), m_src.group(2))]
        elif m_ref:
            if m_ref.group(2):
                pkg, nm = m_ref.group(1), m_ref.group(2)
            else:
                pkg, nm = None, m_ref.group(1)
            if m_ref.group(3):
                # versioned ref resolves to the <name>_v<k> node, same
                # convention as the runtime ref(name, version=) surface
                nm = f"{nm}_v{m_ref.group(3)}"
            refs = [(pkg, nm)]
        else:
            raise CompilationError(
                f"snapshot {name}: 'relation' must be a ref(...) or "
                f"source(...) expression, got {relation!r}")
        config = NodeConfig(materialized="snapshot").merged(
            **(patch.get("config") or {}))
        _validate_snapshot_config(name, config)
        manifest.add(ManifestNode(
            unique_id=uid,
            name=name,
            package_name=project.name,
            path=rel,
            resource_type=NodeType.Snapshot,
            raw_code="select * from {{ " + relation + " }}",
            config=config,
            refs=refs,
            sources=sources,
            fqn=[project.name, name],
        ))

    for section in ("models", "seeds", "snapshots"):
        for patch in doc.get(section, []) or []:
            uid_prefix = {"models": "model", "seeds": "seed", "snapshots": "snapshot"}[section]
            uid = f"{uid_prefix}.{project.name}.{patch['name']}"
            node = manifest.nodes.get(uid)
            if section == "models" and (
                "latest_version" in patch or "deprecation_date" in patch
                or "versions" in patch
            ):
                # versioned-model patch: under this engine's <name>_v<k> file
                # convention a patch for the BASE name carries
                # latest_version/deprecation_date for every sibling version
                # (reference: the schema-YAML versions block, nodes.py:503)
                base = patch["name"]
                for vnode in manifest.nodes.values():
                    if vnode.resource_type != NodeType.Model:
                        continue
                    m = re.fullmatch(rf"{re.escape(base)}_v(\d+)", vnode.name)
                    if m is None and vnode.name != base:
                        continue
                    if patch.get("latest_version") is not None:
                        vnode.latest_version = int(patch["latest_version"])
                    if patch.get("deprecation_date") is not None:
                        vnode.deprecation_date = _as_deprecation_date(
                            patch["deprecation_date"])
                for ventry in patch.get("versions", []) or []:
                    vnode = manifest.nodes.get(
                        f"model.{project.name}.{base}_v{ventry.get('v')}")
                    if vnode is not None and ventry.get("deprecation_date"):
                        vnode.deprecation_date = _as_deprecation_date(
                            ventry["deprecation_date"])
            if node is None:
                continue
            node.doc_blocks = _doc_refs(patch.get("description", ""), manifest)
            node.description = _render_description(
                patch.get("description", ""), manifest
            )
            if patch.get("config"):
                node.config = node.config.merged(**patch["config"])
                raw_cfg = raw_cfg_by_name.get((section, patch.get("name")))
                if raw_cfg:
                    node.unrendered_config = copy.deepcopy(raw_cfg)
            if section == "models" and patch.get("time_spine"):
                # model-level time_spine: config (reference
                # core/dbt/parser/schemas.py:730-744 → TimeSpine on the
                # Model artifact, v1/model.py:26-35); consumed by the
                # metric compiler's join_to_timespine / custom grains
                ts = patch["time_spine"] or {}
                node.config.meta["time_spine"] = {
                    "standard_granularity_column":
                        ts.get("standard_granularity_column"),
                    "custom_granularities": [
                        {"name": cg.get("name"),
                         "column_name": cg.get("column_name")}
                        for cg in ts.get("custom_granularities") or []],
                }
            if section == "models" and patch.get("freshness"):
                # model-level freshness: build_after (reference
                # ModelFreshness/ModelBuildAfter, v1/model.py:38-52, parsed
                # core/dbt/parser/schemas.py:730-752): the runner skips a
                # rebuild while the stored relation is younger than
                # count×period and/or upstreams haven't moved
                ba = (patch["freshness"] or {}).get("build_after") or {}
                period = str(ba.get("period", "hour")).lower()
                if period not in ("minute", "hour", "day"):
                    raise CompilationError(
                        f"model {patch['name']}: freshness build_after "
                        f"period {period!r} must be minute | hour | day")
                dep = str(ba.get("depends_on", "any")).lower()
                if dep not in ("any", "all"):
                    raise CompilationError(
                        f"model {patch['name']}: freshness build_after "
                        f"depends_on {dep!r} must be any | all")
                try:
                    # count defaults to 0 exactly like the reference's
                    # ModelBuildAfter (v1/model.py:44-47): with count 0 the
                    # time gate always passes and rebuilds are driven purely
                    # by upstream movement (depends_on)
                    count = int(ba.get("count", 0))
                except (TypeError, ValueError):
                    raise CompilationError(
                        f"model {patch['name']}: freshness build_after "
                        f"count {ba.get('count')!r} must be an integer")
                node.config.meta["freshness"] = {
                    "build_after": {"count": count, "period": period,
                                    "depends_on": dep}}
            for col in patch.get("columns", []) or []:
                col = dict(col)
                # per-column doc_blocks + rendered description
                # (reference _process_docs_for_node, manifest.py:1709-1711)
                col["doc_blocks"] = _doc_refs(
                    col.get("description", ""), manifest)
                col["description"] = _render_description(
                    col.get("description", ""), manifest)
                node.columns[col["name"]] = col
            if node.config.meta.get("time_spine"):
                # the reference validates at parse: the standard granularity
                # column must exist in the model's columns AND declare a
                # granularity (contracts/graph/semantic_manifest.py:140-148)
                std = node.config.meta["time_spine"].get(
                    "standard_granularity_column")
                col = node.columns.get(std)
                if col is None:
                    raise CompilationError(
                        f"model {node.name}: time_spine "
                        f"standard_granularity_column {std!r} is not declared "
                        "in the model's columns")
                if not col.get("granularity"):
                    raise CompilationError(
                        f"model {node.name}: time_spine column {std!r} needs "
                        "a `granularity:` key (day/week/month/quarter/year)")
            _attach_column_tests(patch, node, project, manifest, is_source=False)

    # top-level `data_tests:` patches target SINGULAR tests by name
    # (reference SingularTestPatchParser, core/dbt/parser/schemas.py:
    # 1183-1228; 1.10 Fixes-20241212: yaml configs for singular tests) —
    # description + config merge onto the parsed tests/*.sql node
    for patch in doc.get("data_tests", []) or []:
        if not isinstance(patch, dict) or "name" not in patch:
            continue
        tnode = manifest.nodes.get(f"test.{project.name}.{patch['name']}")
        if tnode is None or tnode.resource_type != NodeType.Test:
            continue
        if patch.get("description") is not None:
            tnode.description = _render_description(
                str(patch["description"]), manifest)
        if patch.get("meta"):
            tnode.config.meta.update(dict(patch["meta"]))
        if patch.get("config"):
            tnode.config = tnode.config.merged(**patch["config"])


def _attach_column_tests(
    patch: dict, node: ManifestNode, project: Project, manifest: Manifest, is_source: bool
) -> None:
    """YAML data_tests:/tests: keys → TestNodes (generic_test_builders.py:69-300)."""

    def add_test(test_spec: Any, column: Optional[str]) -> None:
        if isinstance(test_spec, str):
            test_name, kwargs = test_spec, {}
        elif isinstance(test_spec, dict):
            test_name, kwargs = next(iter(test_spec.items()))
            kwargs = dict(kwargs or {})
        else:
            return
        cfg_kwargs = kwargs.pop("config", {}) or {}
        for k in ("severity", "where", "limit", "warn_if", "error_if", "fail_calc",
                  "store_failures"):
            if k in kwargs:
                cfg_kwargs[k] = kwargs.pop(k)
        # namespaced names (`dbt_utils.equal_rowcount`) flatten with `_`
        # (reference: TestBuilder fqn/name building)
        parts = [test_name.replace(".", "_"), node.name]
        if column:
            parts.append(column)
        ident = "_".join(parts)
        uid = f"test.{project.name}.{ident}"
        i = 2
        while uid in manifest.nodes:
            uid = f"test.{project.name}.{ident}_{i}"
            i += 1
        tnode = ManifestNode(
            unique_id=uid,
            name=ident,
            package_name=project.name,
            path=node.path,
            resource_type=NodeType.Test,
            config=NodeConfig(materialized="test").merged(**cfg_kwargs),
            column_name=column,
            test_metadata={"name": test_name, "kwargs": kwargs},
            attached_node=node.unique_id,
            fqn=[project.name, ident],
        )
        tnode.depends_on.append(node.unique_id)
        # any kwarg written as a ref()/source() expression (`to:` on
        # relationships, `compare_model:` on dbt_utils tests, ...) is a
        # graph dependency — parse-render each to capture it (reference:
        # generic_test_builders.py renders kwargs through Jinja)
        where_cfg = getattr(tnode.config, "where", None)
        for v in list(kwargs.values()) + ([where_cfg] if where_cfg else []):
            if not isinstance(v, str):
                continue
            # anchored, matching operators/tests.py::_REF_CALL_RE — a value
            # IS a ref()/source() expression, not merely contains one
            if re.match(r"^\s*(ref|source)\s*\(", v.replace("{{", "").lstrip()):
                _, refs, sources, _ = parse_render(
                    "{{ " + v.replace("{{", "").replace("}}", "") + " }}",
                    ident,
                    project.vars,
                    {},
                )
                tnode.refs.extend(refs)
                tnode.sources.extend(sources)
            elif "{{" in v:
                # EMBEDDED refs: jinja subexpressions inside a larger SQL
                # string (introspective `config.where` / kwarg subqueries —
                # the reference's custom-generic-test-config fixture idiom,
                # tests/functional/schema_tests/fixtures.py:402-470). Each
                # embedded call is a graph dependency too.
                for m in re.finditer(
                        r"\{\{\s*(ref|source)\s*\(([^)]*)\)\s*\}\}", v):
                    _, refs, sources, _ = parse_render(
                        f"{{{{ {m.group(1)}({m.group(2)}) }}}}",
                        ident, project.vars, {},
                    )
                    tnode.refs.extend(refs)
                    tnode.sources.extend(sources)
        manifest.add(tnode)

    for col in patch.get("columns", []) or []:
        for spec in (col.get("data_tests") or col.get("tests") or []):
            add_test(spec, col["name"])
    for spec in (patch.get("data_tests") or patch.get("tests") or []):
        add_test(spec, None)


def _validate_access(
    consumer: ManifestNode, target: ManifestNode, manifest: Manifest
) -> None:
    """access: private → same group only (plus no cross-package under
    restrict-access); protected → cross-package refs error ONLY when the
    target's package sets `restrict-access: true`; public → anyone
    (core/dbt/context/providers.py:603-622;
    core/dbt/contracts/graph/manifest.py:1502 is_invalid_protected_ref /
    is_invalid_private_ref gate on the target package's restrict-access,
    core/dbt/config/project.py:640)."""
    access = getattr(target.config, "access", "protected")
    if access == "public":
        return
    cross_package = target.package_name != consumer.package_name
    restricted = bool(manifest.restrict_access.get(target.package_name))
    if access == "private":
        if (target.config.group or consumer.config.group) and (
            target.config.group != consumer.config.group
        ):
            raise CompilationError(
                f"{consumer.unique_id}: cannot ref private model "
                f"'{target.name}' (group {target.config.group!r} != "
                f"{consumer.config.group!r})"
            )
        if cross_package and restricted:
            raise CompilationError(
                f"{consumer.unique_id}: cannot ref private model "
                f"'{target.name}' across packages — "
                f"{target.package_name!r} sets restrict-access"
            )
        return
    # protected (default): any ref within the package; cross-package refs
    # are valid unless the defining package opts into restrict-access
    if cross_package and restricted:
        raise CompilationError(
            f"{consumer.unique_id}: cannot ref protected model "
            f"'{target.name}' from package {consumer.package_name!r} "
            f"({target.package_name!r} sets restrict-access; "
            "set access: public to export it)"
        )


def _render_description(text: str, manifest: Manifest) -> str:
    """Render {{ doc('name') }} references in YAML descriptions
    (core/dbt/parser/manifest.py process_docs :1235)."""
    if not text or "{{" not in text:
        return text
    try:
        import jinja2  # noqa: F401

        return jinja2.Environment().from_string(text).render(
            doc=lambda *args: manifest.docs.get(args[-1], "")
        )
    except Exception:  # noqa: BLE001 — a description must never crash
        # parse (reference Fixes-20250218: _get_doc_blocks crashed when
        # .format was called on a doc ref); fall back to the raw text
        return text


def _doc_refs(text: str, manifest: Manifest) -> list[str]:
    """doc_blocks for a description: unique_ids of every resolving
    {{ doc('name') }} reference, in order of appearance (reference
    _get_doc_blocks, core/dbt/parser/manifest.py:1662-1697 — appended per
    occurrence, 1.10 feature Features-20250122-170328). Unresolvable
    names are skipped, like the reference's resolve_doc None branch."""
    if not text or "{{" not in text:
        return []
    found: list[str] = []

    def _doc(*args: str) -> str:
        name = args[-1]
        if name in manifest.docs:
            found.append(f"doc.{manifest.project_name}.{name}")
        return manifest.docs.get(name, "")

    try:
        import jinja2  # noqa: F401

        jinja2.Environment().from_string(text).render(doc=_doc)
    except Exception:  # noqa: BLE001 — same contract as the renderer
        return []
    return found


def _parse_unit_tests(doc: dict, project: Project, manifest: Manifest, rel: str) -> None:
    """YAML ``unit_tests:`` → UnitTest nodes (parser
    core/dbt/parser/unit_tests.py:60-198; definition schema
    core/dbt/artifacts/resources/v1/unit_test_definition.py:60-77)."""
    for ut in doc.get("unit_tests", []) or []:
        name = ut["name"]
        model = ut["model"]
        node = ManifestNode(
            unique_id=f"unit_test.{project.name}.{model}.{name}",
            name=name,
            package_name=project.name,
            path=rel,
            resource_type=NodeType.UnitTest,
            config=NodeConfig(materialized="unit").merged(**(ut.get("config") or {})),
            test_metadata={
                "model": model,
                "given": ut.get("given", []) or [],
                "expect": ut.get("expect", {}) or {},
                "overrides": ut.get("overrides", {}) or {},
            },
            attached_node=f"model.{project.name}.{model}",
            fqn=[project.name, model, name],
        )
        manifest.add(node)


def _parse_metadata_nodes(doc: dict, project: Project, manifest: Manifest, rel: str) -> None:
    """Exposures / metrics / semantic models / saved queries / groups —
    metadata-only leaf nodes (parsers
    core/dbt/parser/schema_yaml_readers.py:85,189,511,739,476). They join the
    DAG (refs captured) but never execute."""
    from dbt_spark.plans.semantic import validate_entry

    sections = {
        "exposures": NodeType.Exposure,
        "metrics": NodeType.Metric,
        "semantic_models": NodeType.SemanticModel,
        "saved_queries": NodeType.SavedQuery,
        "groups": NodeType.Group,
    }
    for section, ntype in sections.items():
        for entry in doc.get(section, []) or []:
            # typed validation BEFORE node creation: required fields, enum
            # membership, name shape (plans/semantic.py mirrors the
            # reference's YAML-reader checks)
            validate_entry(section, entry)
            name = entry["name"]
            node = ManifestNode(
                unique_id=f"{ntype.value}.{project.name}.{name}",
                name=name,
                package_name=project.name,
                path=rel,
                resource_type=ntype,
                description=entry.get("description", ""),
                config=NodeConfig(materialized="metadata").merged(
                    **(entry.get("config") or {})
                ),
                fqn=[project.name, name],
            )
            node.config.meta.update({
                k: v for k, v in entry.items()
                if k not in ("name", "description", "config")
            })
            # capture refs from depends_on/model strings: "ref('x')" forms
            dep_strings = []
            if isinstance(entry.get("depends_on"), list):
                dep_strings += [str(s) for s in entry["depends_on"]]
            if entry.get("model"):
                dep_strings.append(str(entry["model"]))
            for s in dep_strings:
                if "ref(" in s or "source(" in s:
                    _, refs, sources, _ = parse_render(
                        "{{ " + s.replace("{{", "").replace("}}", "") + " }}",
                        name, project.vars, {},
                    )
                    node.refs += refs
                    node.sources += sources
            manifest.add(node)


def _resolve_depends_on(manifest: Manifest) -> None:
    """process_refs/process_sources (core/dbt/parser/manifest.py:1138,1307)
    + private/protected access validation (providers.py:603-622)."""
    for node in list(manifest.nodes.values()):
        for package, name in node.refs:
            found = manifest.ref_lookup(name, package)
            if found is None:
                raise CompilationError(f"{node.unique_id}: ref('{name}') does not exist")
            _validate_access(node, found, manifest)
            if found.unique_id not in node.depends_on:
                node.depends_on.append(found.unique_id)
        for src_name, tbl_name in node.sources:
            found = manifest.source_lookup(src_name, tbl_name)
            if found is None:
                raise CompilationError(
                    f"{node.unique_id}: source('{src_name}', '{tbl_name}') does not exist"
                )
            if found.unique_id not in node.depends_on:
                node.depends_on.append(found.unique_id)
