"""Package-hub registry protocol client (HTTP transport for `dbt deps`).

Speaks the public hub protocol the reference implements in
core/dbt/clients/registry.py:

- ``GET {base}/api/v1/index.json``            -> list of package names
- ``GET {base}/api/v1/{org}/{name}.json``     -> {"name", "namespace",
  "versions": {ver: {"name", "packages", "downloads": {"tarball": url}, ...}},
  optional "redirectnamespace"/"redirectname"}

Reference semantics mirrored here:
- response-shape validation: top keys {name, versions}, per-version keys
  {name, packages, downloads} (registry.py:68-99); a malformed body is
  treated as retryable, like the reference's ContentDecodingError path.
- retries: 5 attempts with backoff on connection errors AND malformed
  bodies (registry.py:37-40, dbt_common connection_exception_retry).
- redirects: ``redirectnamespace``/``redirectname`` re-point the package and
  the new coordinates are fetched (registry.py:103-122).
- compatibility: a version's ``require_dbt_version`` range list filters
  installable versions unless the check is disabled (registry.py:131-161).
- base URL override: ``DBT_PACKAGE_HUB_URL`` (registry.py:23-26).

Download integrity goes beyond the reference: when version metadata carries
``downloads.sha1`` / ``downloads.sha256`` the fetched tarball is verified
before extraction (pinning; a mismatch is a hard DepsError, not retried).

Transport is stdlib ``urllib`` so the engine adds no HTTP dependency.
"""

from __future__ import annotations

import hashlib
import json
import os
import tarfile
import tempfile
import time
import urllib.error
import urllib.request
from typing import Any, Callable, Optional

from dbt_spark.plans.deps import DepsError, SemVer, _norm_specs, satisfies

DEFAULT_HUB_URL = "https://hub.getdbt.com/"
RETRY_ATTEMPTS = 5
_EXPECTED_TOP_KEYS = {"name", "versions"}
_EXPECTED_VERSION_KEYS = {"name", "packages", "downloads"}


class RegistryProtocolError(DepsError):
    """Malformed hub response — retryable, mirroring the reference's
    ContentDecodingError handling (registry.py:58-99)."""


def _with_retries(fn: Callable[[], Any], attempts: int = RETRY_ATTEMPTS,
                  backoff: float = 0.05) -> Any:
    """connection_exception_retry semantics: transient transport failures and
    malformed bodies retry with backoff; anything else raises through."""
    last: Exception | None = None
    for attempt in range(attempts):
        try:
            return fn()
        except (urllib.error.URLError, TimeoutError, ConnectionError,
                RegistryProtocolError, json.JSONDecodeError) as e:
            last = e
            if attempt < attempts - 1:
                time.sleep(backoff * (2 ** attempt))
    raise DepsError(f"registry request failed after {attempts} attempts: {last}")


class HubClient:
    """Client for a hub-protocol registry (the public hub or any mirror
    serving the same ``api/v1`` JSON layout)."""

    def __init__(self, base_url: Optional[str] = None, *,
                 attempts: int = RETRY_ATTEMPTS, timeout: float = 30.0) -> None:
        base = base_url or os.environ.get("DBT_PACKAGE_HUB_URL") or DEFAULT_HUB_URL
        self.base_url = base if base.endswith("/") else base + "/"
        self.attempts = attempts
        self.timeout = timeout
        self._cache: dict[str, dict[str, Any]] = {}
        self.redirects: list[tuple[str, str]] = []  # (old_nwo, new_nwo)

    # -- transport ---------------------------------------------------------
    def _url(self, name: str) -> str:
        return f"{self.base_url}api/v1/{name}.json"

    def _get_json(self, url: str) -> Any:
        def fetch() -> Any:
            with urllib.request.urlopen(url, timeout=self.timeout) as resp:
                if resp.status >= 400:  # pragma: no cover - urllib raises first
                    raise RegistryProtocolError(f"HTTP {resp.status} for {url}")
                return json.loads(resp.read().decode("utf-8"))
        return _with_retries(fetch, self.attempts)

    # -- protocol ----------------------------------------------------------
    def index(self) -> list[str]:
        """All package names the registry knows (registry.py:164-171)."""
        out = self._get_json(self._url("index"))
        if not isinstance(out, list):
            raise RegistryProtocolError(
                f"expected index to be a list, got {type(out).__name__}")
        return out

    def _package_raw(self, name: str) -> dict[str, Any]:
        def fetch() -> dict[str, Any]:
            response = self._get_json(self._url(name))
            if not isinstance(response, dict):
                raise RegistryProtocolError(
                    f"expected a dict response, got {type(response).__name__}")
            missing = _EXPECTED_TOP_KEYS - set(response)
            if missing:
                raise RegistryProtocolError(
                    f"response for {name!r} missing top-level keys {missing}")
            versions = response["versions"]
            if versions:
                all_keys = set().union(*(set(v) for v in versions.values()))
                missing_v = _EXPECTED_VERSION_KEYS - all_keys
                if missing_v:
                    raise RegistryProtocolError(
                        f"version metadata for {name!r} missing keys {missing_v}")
                extra = set().difference(*(set(v) for v in versions.values()))
                if extra:
                    raise RegistryProtocolError(
                        f"version metadata keys differ across versions: {extra}")
            return response
        return _with_retries(fetch, self.attempts)

    def package(self, name: str) -> dict[str, Any]:
        """{version: metadata}, following ownership/name redirects
        (registry.py:103-122)."""
        if name in self._cache:
            return self._cache[name]
        response = self._package_raw(name)
        if response.get("redirectnamespace") or response.get("redirectname"):
            use_ns = response.get("redirectnamespace") or response.get("namespace")
            use_name = response.get("redirectname") or response.get("name")
            new_nwo = f"{use_ns}/{use_name}"
            if new_nwo != name:
                self.redirects.append((name, new_nwo))
                response = self._package_raw(new_nwo)
        versions = response["versions"]
        self._cache[name] = versions
        return versions

    def package_version(self, name: str, version: str) -> dict[str, Any]:
        versions = self.package(name)
        if version not in versions:
            raise DepsError(f"{name}@{version} not on the registry "
                            f"(has: {sorted(versions)})")
        return versions[version]

    # -- install -----------------------------------------------------------
    def download(self, url: str, dest_path: str, *,
                 sha1: Optional[str] = None, sha256: Optional[str] = None) -> None:
        def fetch() -> bytes:
            with urllib.request.urlopen(url, timeout=self.timeout) as resp:
                return resp.read()
        blob = _with_retries(fetch, self.attempts)
        if sha1 and hashlib.sha1(blob).hexdigest() != sha1:
            raise DepsError(f"sha1 mismatch for {url}; refusing to install")
        if sha256 and hashlib.sha256(blob).hexdigest() != sha256:
            raise DepsError(f"sha256 mismatch for {url}; refusing to install")
        with open(dest_path, "wb") as f:
            f.write(blob)

    def install(self, name: str, version: str, install_root: str) -> str:
        """Fetch + verify + extract one pinned version; returns install path."""
        import shutil

        info = self.package_version(name, version)
        downloads = info.get("downloads") or {}
        tar_url = downloads.get("tarball")
        if not tar_url:
            raise DepsError(f"{name}@{version} has no tarball download")
        dest = os.path.join(install_root, name.split("/")[-1])
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        os.makedirs(dest, exist_ok=True)
        with tempfile.NamedTemporaryFile(suffix=".tar.gz", delete=False) as tmp:
            tmp_path = tmp.name
        try:
            self.download(tar_url, tmp_path,
                          sha1=downloads.get("sha1"),
                          sha256=downloads.get("sha256"))
            with tarfile.open(tmp_path) as tf:
                tf.extractall(dest, filter="data")
        finally:
            os.unlink(tmp_path)
        entries = os.listdir(dest)
        if len(entries) == 1 and os.path.isdir(os.path.join(dest, entries[0])):
            inner = os.path.join(dest, entries[0])
            for item in os.listdir(inner):
                shutil.move(os.path.join(inner, item), dest)
            os.rmdir(inner)
        if not os.path.exists(os.path.join(dest, "dbt_project.yml")):
            raise DepsError(f"{name}@{version} tarball has no dbt_project.yml")
        return dest


def _installable_versions(client: HubClient, package: str, specs: list[str],
                          dbt_version: Optional[str],
                          version_check: bool) -> dict[SemVer, str]:
    """Spec-satisfying, dbt-compatible versions -> version string."""
    versions = client.package(package)
    out: dict[SemVer, str] = {}
    for ver_str, info in versions.items():
        try:
            ver = SemVer.parse(ver_str)
        except DepsError:
            continue
        if not satisfies(ver, specs):
            continue
        if version_check and dbt_version is not None:
            req = info.get("require_dbt_version") or []
            if not isinstance(req, list):
                req = [req]
            if req and not satisfies(SemVer.parse(dbt_version), [
                    c for r in req for c in str(r).split(",") if c.strip()]):
                continue
        out[ver] = ver_str
    return out


def resolve_hub(
    packages: list[dict],
    client: HubClient,
    install_root: str,
    *,
    dbt_version: Optional[str] = None,
    version_check: bool = True,
    max_rounds: int = 10,
) -> list[tuple[str, str, str]]:
    """Solve and install hub entries over HTTP, including transitive deps.

    Same fixpoint/intersection algorithm as plans/deps.py resolve_registry
    (reference deps/resolver.py:28): requirements for a package from every
    requester intersect; the highest installable version wins; prereleases
    only win when explicitly pinned. Transitive requirements come from the
    chosen version's ``packages`` metadata (the hub publishes each version's
    own packages.yml there — deps/registry.py RegistryPackageMetadata), with
    the installed tree's packages.yml as fallback for hub mirrors that leave
    ``packages`` empty.
    """
    import yaml

    requirements: dict[str, list[str]] = {}
    for p in packages:
        if "package" in p:
            requirements.setdefault(p["package"], []).extend(
                _norm_specs(p.get("version")))

    installed: dict[str, SemVer] = {}
    out: list[tuple[str, str, str]] = []
    for _ in range(max_rounds):
        progress = False
        for package, specs in sorted(requirements.items()):
            candidates = _installable_versions(
                client, package, specs, dbt_version, version_check)
            if not candidates:
                raise DepsError(
                    f"version conflict for {package!r}: no installable version "
                    f"satisfies {specs} (available: "
                    f"{sorted(client.package(package))})")
            stable = [v for v in candidates if v.pre is None]
            chosen = max(stable or candidates)
            if installed.get(package) == chosen:
                continue
            dest = client.install(package, candidates[chosen], install_root)
            installed[package] = chosen
            out = [t for t in out if t[0] != package]
            out.append((package, candidates[chosen], dest))
            progress = True
            # transitive: version metadata first, installed packages.yml second
            info = client.package_version(package, candidates[chosen])
            sub_pkgs = list(info.get("packages") or [])
            sub_yml = os.path.join(dest, "packages.yml")
            if not sub_pkgs and os.path.exists(sub_yml):
                with open(sub_yml) as f:
                    sub_pkgs = (yaml.safe_load(f) or {}).get("packages", [])
            for sp in sub_pkgs:
                if isinstance(sp, dict) and "package" in sp:
                    requirements.setdefault(sp["package"], []).extend(
                        _norm_specs(sp.get("version")))
        if not progress:
            break
    else:
        raise DepsError("dependency resolution did not converge")
    return out
