"""Partial parsing: per-file parse cache keyed by content checksum.

Reference: msgpack-cached manifest + file-checksum diff; only changed files
are reparsed, with validity gates forcing a full reparse when vars/profile
change (core/dbt/parser/partial.py:69-170 build_file_diff :99; gates
core/dbt/parser/manifest.py:854-975; state-check hash :992-1063).

Here the unit of caching is the per-file parse artifact (the rendered
refs/sources/config extraction — the expensive Jinja phase); dependency
resolution and graph linking always re-run (they're global and cheap:
~0.1 s for 2,000 models)."""

from __future__ import annotations

import copy
import hashlib
import os
import pickle
from typing import Optional

from dbt_spark.plans.manifest import ManifestNode

CACHE_VERSION = 2


def file_checksum(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


class ParseCache:
    """{f"{relpath}:{checksum}": [ManifestNode, ...]} — a file can yield
    several nodes (snapshot blocks).

    ``env_vars`` records every ``env_var()`` name read during the cached
    parses with the os.environ value observed at the time (None = unset,
    default used). A later load whose environment disagrees on ANY recorded
    name cold-starts the cache — the reference's env-var validity gate
    (core/dbt/parser/manifest.py:854-975), coarsened from per-file to
    whole-cache (over-invalidates, never stale)."""

    def __init__(self, entries: Optional[dict] = None, token: str = "",
                 env_vars: Optional[dict] = None) -> None:
        self.entries: dict[str, list[ManifestNode]] = entries or {}
        self.token = token
        self.env_vars: dict[str, Optional[str]] = env_vars or {}
        self.hits = 0
        self.misses = 0

    @classmethod
    def load(cls, path: str, token: str) -> "ParseCache":
        """token = hash of vars/profile/config-trees/macro-sources/version;
        mismatch → cold cache (the reference's full-reparse validity gates)."""
        try:
            with open(path, "rb") as f:
                payload = pickle.load(f)
            if payload.get("version") != CACHE_VERSION or payload.get("token") != token:
                return cls(token=token)
            recorded = payload.get("env_vars") or {}
            if any(os.environ.get(k) != v for k, v in recorded.items()):
                return cls(token=token)
            return cls(payload["entries"], token, recorded)
        except (OSError, pickle.PickleError, EOFError, AttributeError, KeyError):
            return cls(token=token)

    def save(self, path: str, env_vars: Optional[dict] = None) -> None:
        """``env_vars``: names read by THIS parse (cache-hit files never
        re-render, so their earlier recordings are kept via merge)."""
        if env_vars:
            self.env_vars.update(env_vars)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(
                {"version": CACHE_VERSION, "token": self.token,
                 "entries": self.entries, "env_vars": self.env_vars},
                f,
                protocol=pickle.HIGHEST_PROTOCOL,
            )
        os.replace(tmp, path)

    def get(self, rel: str, checksum: str) -> Optional[list[ManifestNode]]:
        found = self.entries.get(f"{rel}:{checksum}")
        if found is None:
            self.misses += 1
            return None
        self.hits += 1
        # deep copy: the manifest mutates nodes (YAML patches, depends_on)
        out = []
        for node in found:
            clone = copy.deepcopy(node)
            clone.depends_on = []
            out.append(clone)
        return out

    def put(self, rel: str, checksum: str, nodes: list[ManifestNode]) -> None:
        self.entries[f"{rel}:{checksum}"] = [copy.deepcopy(n) for n in nodes]


def cache_token(vars: dict, profile: dict) -> str:
    """Render-affecting inputs; change → full reparse (manifest.py:992-1063)."""
    return hashlib.md5(
        repr((CACHE_VERSION, sorted(vars.items()), sorted(profile.items()))).encode()
    ).hexdigest()


def macro_digest(project) -> str:
    """Digest of every macro-source file (built-in global package, installed
    packages, project macro paths, tests/generic). Macros execute inside
    model/snapshot/test parse-renders, so an edited macro can change a
    byte-identical model file's extraction — the reference reparses
    macro-dependent files (core/dbt/parser/partial.py); here any macro edit
    cold-starts the cache (correct, coarser)."""
    from dbt_spark.project import _walk, macro_roots

    h = hashlib.md5()
    for mroot, mpaths, pkg_name in macro_roots(project, is_root=True):
        for full, rel in _walk(mroot, mpaths, (".sql",)):
            h.update(rel.encode())
            h.update(file_checksum(full).encode())
    return h.hexdigest()


def project_cache_token(project) -> str:
    """The full validity-gate token for a project: vars + config trees +
    profile + macro sources (runner.parse and the fuzz harness share this
    so the gate itself is what gets tested)."""
    return cache_token(
        {**project.vars,
         "__models__": repr(project.model_config),
         "__seeds__": repr(project.seed_config),
         "__macros__": macro_digest(project),
         # dispatch reroutes macro resolution INSIDE parse-renders; a
         # config edit can change a byte-identical model's extraction
         "__dispatch__": repr(project.dispatch),
         "__restrict__": repr(project.restrict_access)},
        project.profile,
    )
