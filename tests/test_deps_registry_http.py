"""Hub-protocol registry over HTTP (plans/registry_http.py) against a local
in-process server — reference parity for core/dbt/clients/registry.py
(endpoints, response validation, redirects, retries, require_dbt_version
compat filtering) and deps/resolver.py (range intersection, transitive solve).
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from dbt_spark.plans.deps import DepsError
from dbt_spark.plans.registry_http import HubClient, resolve_hub
from dbt_spark.runner import Engine


def _tarball(pkg_name: str, extra: dict[str, str] | None = None) -> bytes:
    """In-memory tar.gz of a minimal package (hub archives wrap a top dir)."""
    buf = io.BytesIO()
    files = {"dbt_project.yml": f"name: {pkg_name}\n"}
    files.update(extra or {})
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for rel, content in files.items():
            data = content.encode()
            info = tarfile.TarInfo(f"{pkg_name}-pkg/{rel}")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def _version_info(name: str, ver: str, base_url: str, blob: bytes,
                  packages: list | None = None,
                  require: list | None = None) -> dict:
    info = {
        "name": name,
        "packages": packages or [],
        "downloads": {
            "tarball": f"{base_url}dl/{name}-{ver}.tar.gz",
            "sha256": hashlib.sha256(blob).hexdigest(),
        },
    }
    if require is not None:
        info["require_dbt_version"] = require
    return info


@pytest.fixture()
def hub(tmp_path):
    """Local hub-protocol server. Yields (base_url, state dict)."""
    state = {
        "blobs": {},      # filename -> tarball bytes
        "json": {},       # api path suffix (e.g. "org/utils") -> payload
        "flaky": {},      # api path suffix -> remaining bad responses
        "hits": [],       # request log
    }

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence
            pass

        def _send(self, code: int, body: bytes, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            state["hits"].append(self.path)
            if self.path.startswith("/dl/"):
                fname = self.path[len("/dl/"):]
                blob = state["blobs"].get(fname)
                if blob is None:
                    self._send(404, b"{}")
                else:
                    self._send(200, blob, "application/gzip")
                return
            if self.path.startswith("/api/v1/") and self.path.endswith(".json"):
                key = self.path[len("/api/v1/"):-len(".json")]
                if state["flaky"].get(key, 0) > 0:
                    state["flaky"][key] -= 1
                    # malformed body: a list, not the expected dict
                    self._send(200, b'["garbage"]')
                    return
                payload = state["json"].get(key)
                if payload is None:
                    self._send(404, b"{}")
                else:
                    self._send(200, json.dumps(payload).encode())
                return
            self._send(404, b"{}")

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base_url = f"http://127.0.0.1:{srv.server_address[1]}/"

    # --- fake hub content: org/utils (3 versions), org/base, old/legacy ---
    utils_080 = _tarball("utils", {
        "macros/m.sql":
            "{% macro cents(col) %}({{ col }} * 100){% endmacro %}"})
    utils_090 = _tarball("utils", {
        "macros/m.sql":
            "{% macro cents(col) %}({{ col }} * 100){% endmacro %}"})
    utils_095 = _tarball("utils")
    base_110 = _tarball("base")
    state["blobs"] = {
        "utils-0.8.0.tar.gz": utils_080,
        "utils-0.9.0.tar.gz": utils_090,
        "utils-0.9.5.tar.gz": utils_095,
        "base-1.1.0.tar.gz": base_110,
    }
    state["json"]["org/utils"] = {
        "name": "utils", "namespace": "org",
        "versions": {
            "0.8.0": _version_info("utils", "0.8.0", base_url, utils_080),
            # 0.9.0 drags org/base in via hub version metadata `packages`
            "0.9.0": _version_info(
                "utils", "0.9.0", base_url, utils_090,
                packages=[{"package": "org/base", "version": [">=1.0.0"]}]),
            # 0.9.5 is incompatible with this engine's dbt version (1.10.x)
            "0.9.5": _version_info(
                "utils", "0.9.5", base_url, utils_095,
                require=[">=2.0.0"]),
        },
    }
    state["json"]["org/base"] = {
        "name": "base", "namespace": "org",
        "versions": {
            "1.1.0": _version_info("base", "1.1.0", base_url, base_110),
        },
    }
    # ownership+name redirect: old/legacy -> org/utils (registry.py:103-122)
    state["json"]["old/legacy"] = {
        "name": "legacy", "namespace": "old",
        "redirectnamespace": "org", "redirectname": "utils",
        "versions": {
            "0.0.1": _version_info("legacy", "0.0.1", base_url, utils_080),
        },
    }
    state["json"]["index"] = ["org/utils", "org/base", "old/legacy"]

    yield base_url, state
    srv.shutdown()
    srv.server_close()


def test_hub_client_protocol(hub):
    base_url, state = hub
    client = HubClient(base_url, timeout=5)
    assert client.index() == ["org/utils", "org/base", "old/legacy"]
    versions = client.package("org/utils")
    assert set(versions) == {"0.8.0", "0.9.0", "0.9.5"}
    info = client.package_version("org/utils", "0.9.0")
    assert info["packages"][0]["package"] == "org/base"
    # redirects re-point to the new coordinates and are recorded
    redirected = client.package("old/legacy")
    assert set(redirected) == {"0.8.0", "0.9.0", "0.9.5"}
    assert ("old/legacy", "org/utils") in client.redirects


def test_hub_client_retries_malformed_then_succeeds(hub):
    base_url, state = hub
    state["flaky"]["org/base"] = 2  # two garbage bodies, then good
    client = HubClient(base_url, timeout=5)
    versions = client.package("org/base")
    assert set(versions) == {"1.1.0"}
    base_hits = [h for h in state["hits"] if "org/base" in h]
    assert len(base_hits) == 3  # 2 failures + 1 success


def test_hub_client_gives_up_after_attempts(hub):
    base_url, state = hub
    state["flaky"]["org/base"] = 99
    client = HubClient(base_url, attempts=3, timeout=5)
    with pytest.raises(DepsError, match="after 3 attempts"):
        client.package("org/base")


def test_hub_response_shape_validation(hub):
    base_url, state = hub
    state["json"]["bad/topkeys"] = {"name": "topkeys"}  # missing versions
    state["json"]["bad/verkeys"] = {
        "name": "verkeys",
        "versions": {"1.0.0": {"name": "verkeys"}},  # missing packages/downloads
    }
    client = HubClient(base_url, attempts=1, timeout=5)
    with pytest.raises(DepsError, match="missing top-level keys"):
        client.package("bad/topkeys")
    with pytest.raises(DepsError, match="missing keys"):
        client.package("bad/verkeys")


def test_hub_sha256_pinning_rejects_tampered_tarball(hub, tmp_path):
    base_url, state = hub
    # corrupt the served bytes without updating the advertised sha256
    state["blobs"]["base-1.1.0.tar.gz"] = _tarball("base", {"evil.txt": "x"})
    client = HubClient(base_url, timeout=5)
    with pytest.raises(DepsError, match="sha256 mismatch"):
        client.install("org/base", "1.1.0", str(tmp_path))


def test_resolve_hub_transitive_and_compat(hub, tmp_path):
    """Highest installable version wins: 0.9.5 exists but requires dbt>=2.0,
    so 0.9.0 is chosen; its hub `packages` metadata drags org/base in."""
    base_url, _ = hub
    client = HubClient(base_url, timeout=5)
    out = resolve_hub(
        [{"package": "org/utils", "version": [">=0.8.0"]}],
        client, str(tmp_path), dbt_version="1.10.0",
    )
    got = {name: ver for name, ver, _ in out}
    assert got == {"org/utils": "0.9.0", "org/base": "1.1.0"}
    assert os.path.exists(tmp_path / "utils" / "dbt_project.yml")
    assert os.path.exists(tmp_path / "base" / "dbt_project.yml")
    # with the version check off, 0.9.5 wins (registry.py:147-161 semantics)
    out2 = resolve_hub(
        [{"package": "org/utils", "version": [">=0.8.0"]}],
        HubClient(base_url, timeout=5), str(tmp_path / "nocheck"),
        dbt_version="1.10.0", version_check=False,
    )
    assert dict((n, v) for n, v, _ in out2)["org/utils"] == "0.9.5"


def test_engine_deps_over_http_hub(hub, project_dir, spark, monkeypatch):
    """`deps` end-to-end over the HTTP hub: DBT_PACKAGE_HUB_URL selects the
    live-protocol transport; installed macros compile inside models."""
    base_url, _ = hub
    files = {
        "dbt_project.yml": "name: hubhttp\n",
        "packages.yml": (
            "packages:\n"
            "  - package: org/utils\n    version: ['>=0.8.0', '<0.9.0']\n"
        ),
        "models/pennies.sql": "select {{ utils.cents(1) }} as c",
    }
    root = project_dir(files)
    monkeypatch.setenv("DBT_PACKAGE_HUB_URL", base_url)
    monkeypatch.delenv("DBT_SPARK_REGISTRY", raising=False)
    eng = Engine(root, spark=spark)
    r = eng.invoke(["deps"])
    assert r.success, [x.message for x in r.results]
    msgs = {x.unique_id: x.message for x in r.results}
    assert msgs["package.hub.org/utils"].startswith("0.8.0 ->")
    eng2 = Engine(root, spark=spark)
    r2 = eng2.invoke(["run"])
    assert r2.success, [x.message for x in r2.results]
    assert [x["c"] for x in eng2.store.read("main", "pennies").collect()] == [100]


def test_redirect_fires_deprecation_event(hub, project_dir, spark, monkeypatch):
    """Installing via a redirected package name fires the reference's
    package-redirect deprecation (D001) into the structured log."""
    base_url, _ = hub
    files = {
        "dbt_project.yml": "name: hubredir\n",
        "packages.yml": (
            "packages:\n  - package: old/legacy\n    version: ['>=0.8.0', '<0.9.0']\n"
        ),
    }
    root = project_dir(files)
    monkeypatch.setenv("DBT_PACKAGE_HUB_URL", base_url)
    eng = Engine(root, spark=spark)
    r = eng.invoke(["deps"])
    assert r.success, [x.message for x in r.results]
    log_path = os.path.join(root, "target", "logs", "dbt.log.jsonl")
    events = [json.loads(l) for l in open(log_path) if l.strip()]
    dep = [e for e in events
           if e["info"]["name"] == "PackageRedirectDeprecation"]
    assert dep and dep[0]["info"]["code"] == "D001"
    assert dep[0]["data"]["new_name"] == "org/utils"
