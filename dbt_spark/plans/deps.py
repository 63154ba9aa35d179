"""Package dependency resolution: hub-style registry packages with semver
range solving.

Reference semantics from dbt-core's deps machinery:
- ``packages.yml`` hub entries carry ``package: org/name`` plus ``version:``
  as an exact pin, a range string, or a list of range strings
  (core/dbt/deps/registry.py:30 RegistryUnpinnedPackage).
- Duplicate requirements for the same package are *intersected* and one
  version satisfying every range is chosen — the highest
  (deps/resolver.py:28 PackageListing incorporate/resolved).
- Installed packages can declare their own ``packages.yml``; resolution runs
  to a fixpoint over the transitive closure (deps/resolver.py resolve_packages
  loops until no new packages appear).

The public hub needs network, which this engine does not assume. Instead the
registry is a LOCAL MIRROR directory (``registry:`` path in packages.yml, the
``DBT_SPARK_REGISTRY`` env var, or ``<project>/package_registry/``) laid out
exactly like hub metadata:

    <registry>/<org>/<name>/<version>/dbt_project.yml ...   (unpacked)
    <registry>/<org>/<name>/<version>.tar.gz                (or tarballs)

Version solving is identical either way; only the transport differs
(documented deviation: filesystem mirror instead of https hub).
"""

from __future__ import annotations

import os
import re
import shutil
import tarfile
from dataclasses import dataclass
from typing import Iterable, Optional


class DepsError(Exception):
    pass


_SEMVER_RE = re.compile(
    r"^(?P<major>\d+)\.(?P<minor>\d+)\.(?P<patch>\d+)"
    r"(?:-(?P<pre>[0-9A-Za-z.-]+))?$"
)


@dataclass(frozen=True)
class SemVer:
    """Semantic version with dbt-hub ordering: 1.2.3-rc1 < 1.2.3."""

    major: int
    minor: int
    patch: int
    pre: Optional[str] = None

    @classmethod
    def parse(cls, text: str) -> "SemVer":
        m = _SEMVER_RE.match(text.strip().lstrip("v="))
        if m is None:
            raise DepsError(f"cannot parse version {text!r}")
        return cls(
            int(m.group("major")), int(m.group("minor")), int(m.group("patch")),
            m.group("pre"),
        )

    @property
    def _key(self) -> tuple:
        # a prerelease sorts before its release; compare prerelease ids
        # numerically when both are digits (semver.org rule 11)
        pre_key: tuple
        if self.pre is None:
            pre_key = (1,)
        else:
            parts = tuple(
                (0, int(p)) if p.isdigit() else (1, p)
                for p in self.pre.split(".")
            )
            pre_key = (0, parts)
        return (self.major, self.minor, self.patch, pre_key)

    def __lt__(self, other: "SemVer") -> bool:
        return self._key < other._key

    def __le__(self, other: "SemVer") -> bool:
        return self._key <= other._key

    def __str__(self) -> str:
        base = f"{self.major}.{self.minor}.{self.patch}"
        return f"{base}-{self.pre}" if self.pre else base


_OP_RE = re.compile(r"^(?P<op>>=|<=|==|>|<|=|~>)?\s*(?P<ver>.+)$")


def _match_one(candidate: SemVer, clause: str) -> bool:
    m = _OP_RE.match(clause.strip())
    if m is None:
        raise DepsError(f"cannot parse version clause {clause!r}")
    op = m.group("op") or "=="
    ver = SemVer.parse(m.group("ver"))
    if op in ("==", "="):
        return candidate._key == ver._key
    if op == ">=":
        return ver <= candidate
    if op == "<=":
        return candidate <= ver
    if op == ">":
        return ver < candidate
    if op == "<":
        return candidate < ver
    if op == "~>":
        # pessimistic: >= ver, < next minor (ruby/hub convention)
        upper = SemVer(ver.major, ver.minor + 1, 0)
        return ver <= candidate and candidate < upper
    raise DepsError(f"unknown version operator {op!r}")


def satisfies(candidate: SemVer, specs: Iterable[str]) -> bool:
    """True iff the candidate satisfies EVERY clause of every spec.

    A spec may itself be comma-joined (">=0.8.0,<0.9.0") — the reference
    accepts both that and list-of-strings form."""
    for spec in specs:
        for clause in str(spec).split(","):
            if clause.strip() and not _match_one(candidate, clause):
                return False
    return True


def _norm_specs(version_field) -> list[str]:
    if version_field is None:
        return []
    if isinstance(version_field, (list, tuple)):
        return [str(v) for v in version_field]
    return [str(version_field)]


class RegistryMirror:
    """Filesystem mirror of hub metadata (see module docstring for layout)."""

    def __init__(self, root: str) -> None:
        self.root = root

    def available_versions(self, package: str) -> dict[SemVer, str]:
        """{version: path-to-dir-or-tarball} for org/name."""
        pkg_dir = os.path.join(self.root, *package.split("/"))
        if not os.path.isdir(pkg_dir):
            raise DepsError(
                f"package {package!r} not found in registry mirror {self.root!r}"
            )
        out: dict[SemVer, str] = {}
        for entry in os.listdir(pkg_dir):
            full = os.path.join(pkg_dir, entry)
            try:
                if os.path.isdir(full):
                    out[SemVer.parse(entry)] = full
                elif entry.endswith((".tar.gz", ".tgz", ".tar")):
                    ver = entry.split(".tar")[0]
                    out[SemVer.parse(ver)] = full
            except DepsError:
                continue  # non-version entries are ignored
        if not out:
            raise DepsError(f"no versions of {package!r} in mirror {self.root!r}")
        return out

    def install(self, src: str, dest: str) -> None:
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        if os.path.isdir(src):
            shutil.copytree(src, dest)
        else:
            os.makedirs(dest, exist_ok=True)
            with tarfile.open(src) as tf:
                tf.extractall(dest, filter="data")
            entries = os.listdir(dest)
            if len(entries) == 1 and os.path.isdir(os.path.join(dest, entries[0])):
                inner = os.path.join(dest, entries[0])
                for item in os.listdir(inner):
                    shutil.move(os.path.join(inner, item), dest)
                os.rmdir(inner)
        if not os.path.exists(os.path.join(dest, "dbt_project.yml")):
            raise DepsError(f"package at {src} has no dbt_project.yml")


def resolve_registry(
    packages: list[dict],
    registry_root: str,
    install_root: str,
    max_rounds: int = 10,
) -> list[tuple[str, str, str]]:
    """Solve and install every hub-style entry (and their transitive hub
    deps). Returns [(package, chosen_version, install_path)].

    Version solving mirrors deps/resolver.py: requirements for the same
    package from every requester are intersected; the highest mirror version
    satisfying the intersection wins; an empty intersection is an error
    naming the conflicting specs."""
    import yaml

    mirror = RegistryMirror(registry_root)
    requirements: dict[str, list[str]] = {}
    queue = [p for p in packages if "package" in p]
    for p in queue:
        requirements.setdefault(p["package"], []).extend(_norm_specs(p.get("version")))

    installed: dict[str, SemVer] = {}
    out: list[tuple[str, str, str]] = []
    for _ in range(max_rounds):
        progress = False
        for package, specs in sorted(requirements.items()):
            candidates = mirror.available_versions(package)
            viable = [v for v in candidates if satisfies(v, specs)]
            # prereleases only win when explicitly pinned (hub behavior)
            stable = [v for v in viable if v.pre is None]
            pick_from = stable or viable
            if not pick_from:
                raise DepsError(
                    f"version conflict for {package!r}: no version satisfies "
                    f"{specs} (available: {sorted(map(str, candidates))})"
                )
            chosen = max(pick_from)
            if installed.get(package) == chosen:
                continue
            dest = os.path.join(install_root, package.split("/")[-1])
            mirror.install(candidates[chosen], dest)
            installed[package] = chosen
            out = [t for t in out if t[0] != package]
            out.append((package, str(chosen), dest))
            progress = True
            # transitive hub deps of the installed package
            sub = os.path.join(dest, "packages.yml")
            if os.path.exists(sub):
                with open(sub) as f:
                    sub_pkgs = (yaml.safe_load(f) or {}).get("packages", [])
                for sp in sub_pkgs:
                    if "package" in sp:
                        requirements.setdefault(sp["package"], []).extend(
                            _norm_specs(sp.get("version"))
                        )
        if not progress:
            break
    else:
        raise DepsError("dependency resolution did not converge")
    return out
