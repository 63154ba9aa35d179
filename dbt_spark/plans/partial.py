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

CACHE_VERSION = 1


def file_checksum(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


class ParseCache:
    """{f"{relpath}:{checksum}": [ManifestNode, ...]} — a file can yield
    several nodes (snapshot blocks)."""

    def __init__(self, entries: Optional[dict] = None, token: str = "") -> None:
        self.entries: dict[str, list[ManifestNode]] = entries or {}
        self.token = token
        self.hits = 0
        self.misses = 0

    @classmethod
    def load(cls, path: str, token: str) -> "ParseCache":
        """token = hash of vars/profile/version; mismatch → cold cache
        (the reference's full-reparse validity gates)."""
        try:
            with open(path, "rb") as f:
                payload = pickle.load(f)
            if payload.get("version") != CACHE_VERSION or payload.get("token") != token:
                return cls(token=token)
            return cls(payload["entries"], token)
        except (OSError, pickle.PickleError, EOFError, AttributeError, KeyError):
            return cls(token=token)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(
                {"version": CACHE_VERSION, "token": self.token, "entries": self.entries},
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
