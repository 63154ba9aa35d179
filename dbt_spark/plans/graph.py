"""DAG linking, scheduling queue, and node selection.

- Linker mirrors core/dbt/compilation.py:131-206 (edge per depends_on, cycle
  check).
- GraphQueue mirrors core/dbt/graph/queue.py:19-121: priority-topological
  scheduling where a node's score is its generation depth; ``mark_done``
  unlocks successors. Worker threads each drive independent Spark actions
  (Spark is thread-safe; the session uses the FAIR scheduler).
- add_test_edges mirrors core/dbt/compilation.py:208-435: in `build`, tests
  block downstream models so bad data never propagates.
- Selector implements the graph-operator subset of the reference DSL
  (core/dbt/graph/selector_methods.py): name/fqn, tag:, source:, path:,
  config.materialized:, with +/n+ prefix/suffix expansion, unions (space),
  intersections (,) and --exclude.
"""

from __future__ import annotations

import heapq
import re
import threading
from typing import Iterable, Optional

import networkx as nx

from dbt_spark.plans.manifest import Manifest, ManifestNode, NodeType


class DagError(Exception):
    pass


class Linker:
    def __init__(self) -> None:
        self.graph = nx.DiGraph()

    def link_graph(self, manifest: Manifest) -> nx.DiGraph:
        for uid, node in {**manifest.sources, **manifest.nodes}.items():
            self.graph.add_node(uid)
            for dep in node.depends_on:
                self.graph.add_node(dep)
                self.graph.add_edge(dep, uid)
        cycles = list(nx.simple_cycles(self.graph))
        if cycles:
            raise DagError(f"dependency cycle detected: {cycles[0]}")
        return self.graph


def add_test_edges(graph: nx.DiGraph, manifest: Manifest) -> nx.DiGraph:
    """test -> downstream-of-tested-model edges (compilation.py:208-435)."""
    g = graph.copy()
    for uid, node in manifest.nodes.items():
        if node.resource_type == NodeType.UnitTest and node.attached_node:
            # unit tests run BEFORE the model they test
            # (model_to_unit_test_map, core/dbt/task/build.py:104-135)
            if node.attached_node in manifest.nodes:
                g.add_edge(uid, node.attached_node)
            continue
        if node.resource_type != NodeType.Test:
            continue
        tested = [d for d in node.depends_on if d in manifest.nodes]
        # the test's own upstream closure must never become its downstream —
        # e.g. a relationships test attached to the child model refs the
        # parent too; the child is both a dep and a successor-of-dep
        # (reference's second-order edges exclude upstream nodes,
        # compilation.py:310-365)
        upstream: set[str] = set(tested)
        for dep in tested:
            upstream |= nx.ancestors(graph, dep)
        for dep in tested:
            for succ in list(graph.successors(dep)):
                succ_node = manifest.nodes.get(succ)
                if (
                    succ_node is not None
                    and succ_node.resource_type != NodeType.Test
                    and succ not in upstream
                ):
                    g.add_edge(uid, succ)
    cycles = list(nx.simple_cycles(g))
    if cycles:
        raise DagError(f"test edges created a cycle: {cycles[0]}")
    return g


class GraphQueue:
    """Thread-safe priority-topological queue (graph/queue.py:19-121)."""

    def __init__(self, graph: nx.DiGraph, selected: set[str]) -> None:
        # subsetting must PRESERVE transitive ordering through removed
        # nodes (reference graph/graph.py get_subset_graph: "the edges
        # between the remaining nodes are preserved"): an ephemeral model
        # between two materialized ones is never executed, but its
        # consumer still must not run before the ephemeral's own upstreams
        # (caught by the round-9 catalog fuzz: m4 -> ephemeral m3 -> m1
        # scheduled m4 before m1)
        g = graph.copy()
        for n in [x for x in list(g.nodes) if x not in selected]:
            preds, succs = list(g.predecessors(n)), list(g.successors(n))
            g.add_edges_from(
                (p, s) for p in preds for s in succs if p != s)
            g.remove_node(n)
        self.graph = g
        self._scores = self._get_scores(self.graph)
        self._lock = threading.Lock()
        self._in_degree = {n: self.graph.in_degree(n) for n in self.graph.nodes}
        self._ready: list[tuple[int, str]] = []
        self._in_progress: set[str] = set()
        self._done: set[str] = set()
        for n, deg in self._in_degree.items():
            if deg == 0:
                heapq.heappush(self._ready, (self._scores[n], n))

    @staticmethod
    def _get_scores(graph: nx.DiGraph) -> dict[str, int]:
        scores: dict[str, int] = {}
        for i, generation in enumerate(nx.topological_generations(graph)):
            for n in generation:
                scores[n] = i
        return scores

    def get(self) -> Optional[str]:
        with self._lock:
            if not self._ready:
                return None
            _, node = heapq.heappop(self._ready)
            self._in_progress.add(node)
            return node

    def mark_done(self, node: str) -> None:
        with self._lock:
            self._in_progress.discard(node)
            self._done.add(node)
            for succ in self.graph.successors(node):
                self._in_degree[succ] -= 1
                if self._in_degree[succ] == 0:
                    heapq.heappush(self._ready, (self._scores[succ], succ))

    def mark_failed(self, node: str) -> set[str]:
        """Mark failed; return all (transitive) descendants to skip
        (runnable.py:459 _mark_dependent_errors)."""
        with self._lock:
            self._in_progress.discard(node)
            self._done.add(node)
            skipped = set(nx.descendants(self.graph, node))
            for s in skipped:
                self._done.add(s)
                self._in_degree[s] = -1
            return skipped

    def empty(self) -> bool:
        with self._lock:
            return not self._ready and not self._in_progress

    def remaining(self) -> int:
        with self._lock:
            return len(self.graph.nodes) - len(self._done)


_GRAPH_OP_RE = re.compile(r"^(?P<at>@)?(?P<pre>(\d*)\+)?(?P<body>[^+]+?)(?P<post>\+(\d*))?$")


def _changed_macros(state: dict) -> frozenset[str]:
    """Names of macros whose source hash differs from the --state manifest,
    expanded transitively through macro→macro calls (the reference recurses
    the same way: selector_methods.py:637-665 check_macros_modified). Cached
    on the state dict — computed once per selection."""
    cached = state.get("__changed_macros__")
    if cached is not None:
        return cached
    import hashlib

    old: dict = state.get("__macros__") or {}
    cur_src: dict = state.get("__manifest_macros__") or {}
    changed: set[str] = set()
    if old or cur_src:
        cur_hash = {
            name: hashlib.md5(src.encode()).hexdigest() for name, src in cur_src.items()
        }
        if old:  # states written before macro hashes existed: skip the check
            changed = {
                n for n in (set(cur_hash) | set(old))
                if cur_hash.get(n) != old.get(n)
            }
            # transitive: a macro whose body calls a changed macro is changed
            while True:
                more = {
                    n for n, src in cur_src.items()
                    if n not in changed and any(c in src for c in changed)
                }
                if not more:
                    break
                changed |= more
    result = frozenset(changed)
    state["__changed_macros__"] = result
    return result


def _contract_state_new(node: ManifestNode) -> tuple:
    """Contract-relevant fingerprint of a live node: (enforced, sorted
    (column, data_type, constraints))."""
    enforced = bool((node.config.contract or {}).get("enforced", False))
    cols = tuple(sorted(
        (name, str(spec.get("data_type")), str(spec.get("constraints") or []))
        for name, spec in (node.columns or {}).items()
    ))
    return (enforced, cols)


def _contract_state_old(old: dict) -> tuple:
    """Same fingerprint from a --state manifest.json node entry."""
    enforced = bool((old.get("contract") or {}).get("enforced", False))
    cols = tuple(sorted(
        (name, str(spec.get("data_type")), str(spec.get("constraints") or []))
        for name, spec in (old.get("columns") or {}).items()
    ))
    return (enforced, cols)


def _metadata_artifact(node: ManifestNode) -> Optional[dict]:
    """The node's manifest.json section entry (exposures/metrics/groups/
    semantic_models/saved_queries/unit_tests) — the content-comparison unit
    for state:modified on non-checksummed node types."""
    from dbt_spark.plans.manifest import Manifest

    m = Manifest(project_name=node.package_name)
    store = m.sources if node.resource_type == NodeType.Source else m.nodes
    store[node.unique_id] = node
    doc = m.writable()
    for sec in ("sources", "exposures", "metrics", "groups", "semantic_models",
                "saved_queries", "unit_tests"):
        entry = doc.get(sec, {}).get(node.unique_id)
        if entry is not None:
            return entry
    return None


VERSION_RE = re.compile(r"^(?P<base>.+)_v(?P<k>\d+)$")


def _match_version(node: ManifestNode, value: str, all_nodes: Optional[dict]) -> bool:
    if node.resource_type != NodeType.Model:
        return False
    m = VERSION_RE.match(node.name)
    if value == "none":
        return m is None
    if m is None:
        return False
    k = int(m.group("k"))
    base = m.group("base")
    if node.latest_version is not None:
        # first-class field set by project._finalize_versions (nodes.py:503)
        latest = node.latest_version
    else:
        # hand-built manifests (tests) that skipped finalization: derive from
        # siblings / the legacy config.meta shim
        siblings = [
            int(sm.group("k"))
            for n in (all_nodes or {}).values()
            if n.resource_type == NodeType.Model
            and (sm := VERSION_RE.match(n.name)) is not None
            and sm.group("base") == base
        ] or [k]
        declared = node.config.meta.get("latest_version")
        latest = int(declared) if declared is not None else max(siblings)
    if value == "latest":
        return k == latest
    if value == "prerelease":
        return k > latest
    if value == "old":
        return k < latest
    raise DagError(f"unknown version selector '{value}'")


def _match_method(
    node: ManifestNode,
    body: str,
    state: Optional[dict] = None,
    all_nodes: Optional[dict] = None,
) -> bool:
    if ":" in body:
        method, _, value = body.partition(":")
        if method == "state":
            # state:modified / state:new vs a --state manifest.json
            # (core/dbt/graph/selector_methods.py:610-700; content comparison
            # ~ same_body via raw_code checksum + config dict equality)
            if state is None:
                raise DagError("state: selector requires --state <dir with manifest.json>")
            old = state.get(node.unique_id)
            if value == "new":
                return old is None
            if value in ("modified", "modified.body", "modified.configs",
                         "modified.macros", "modified.contract"):
                if old is None:
                    return True
                if "checksum" not in old:
                    # semantic-layer / unit-test section entries carry no
                    # checksum — the reference compares parsed content
                    # (selector_methods.py same_contents); compare the
                    # artifact dicts directly
                    return _metadata_artifact(node) != old
                old_ck = old.get("checksum")
                if isinstance(old_ck, dict):  # v12 FileHash object form
                    old_ck = old_ck.get("checksum")
                if value in ("modified", "modified.body") and old_ck != node.checksum():
                    return True
                if value in ("modified", "modified.configs"):
                    new_cfg = {
                        k: v
                        for k, v in node.config.__dict__.items()
                        if v not in (None, [], {})
                    }
                    old_cfg = dict(old.get("config", {}))
                    if state.get("__compare_unrendered__"):
                        # behavior flag state_modified_compare_more_
                        # unrendered_values (reference ProjectFlags): config
                        # keys whose UNRENDERED schema-YAML values are known
                        # on both sides compare unrendered — an env_var()
                        # rendering differently between environments is not
                        # a modification; editing the template is
                        new_un = node.unrendered_config or {}
                        old_un = old.get("unrendered_config") or {}
                        for k in set(new_un) & set(old_un):
                            if str(new_un[k]) != str(old_un[k]):
                                return True
                            new_cfg.pop(k, None)
                            old_cfg.pop(k, None)
                    if {k: str(v) for k, v in new_cfg.items()} != {
                        k: str(v) for k, v in old_cfg.items()
                    }:
                        return True
                if value in ("modified", "modified.configs") and (
                    "latest_version" in old or "version" in old
                ):
                    # versioned-model surface: a latest_version bump or a
                    # deprecation_date change IS a modification (reference
                    # ModelNode.same_contents compares these node fields);
                    # artifacts written before the fields existed skip
                    dep = (node.deprecation_date.isoformat()
                           if node.deprecation_date else None)
                    if (node.version, node.latest_version, dep) != (
                        old.get("version"), old.get("latest_version"),
                        old.get("deprecation_date"),
                    ):
                        return True
                if value in ("modified", "modified.macros"):
                    changed = _changed_macros(state)
                    if changed and any(name in node.raw_code for name in changed):
                        return True
                if value == "modified" and state.get("__compare_vars__"):
                    # behavior flag state_modified_compare_vars: a node is
                    # modified when the value of a var() it references
                    # changed between the state manifest and this invocation
                    oldv = state.get("__vars__") or {}
                    curv = state.get("__current_vars__") or {}
                    names = re.findall(
                        r"""var\(\s*['"]([^'"]+)""", node.raw_code)
                    if any(oldv.get(n) != curv.get(n) for n in names
                           if n in oldv or n in curv):
                        return True
                if value in ("modified", "modified.contract") and (
                    "contract" in old or "columns" in old
                ):
                    # contract surface = enforced flag + per-column
                    # data_type/constraints (reference same_contract /
                    # build_contract_checksum, nodes.py:637,697); artifacts
                    # written before the fields existed skip the comparison
                    # instead of reading as all-modified
                    if _contract_state_new(node) != _contract_state_old(old):
                        return True
                return False
            raise DagError(f"unknown state selector '{value}'")
        if method == "result":
            # result:<status> vs the --state dir's run_results.json
            # (selector_methods.py ResultSelectorMethod; used by retry flows)
            if state is None or "__results__" not in state:
                raise DagError(
                    "result: selector requires --state <dir with run_results.json>"
                )
            return state["__results__"].get(node.unique_id) == value
        if method == "tag":
            return value in node.config.tags
        if method == "group":
            return node.config.group == value
        if method == "package":
            return node.package_name == value
        if method == "access":
            return getattr(node.config, "access", "protected") == value
        if method == "test_type":
            # generic (YAML-built, has test_metadata) vs singular (SQL file)
            # vs unit (selector_methods.py:45-66)
            if node.resource_type == NodeType.UnitTest:
                return value == "unit"
            if node.resource_type != NodeType.Test:
                return False
            return value == ("generic" if node.test_metadata else "singular")
        if method == "test_name":
            return bool(node.test_metadata) and node.test_metadata.get("name") == value
        if method == "file":
            import os as _os

            return _os.path.basename(node.path) == value
        if method == "source":
            # source:<name>, source:<name>.<table>, source:<pkg>.<name>.<table>
            # (reference SourceSelectorMethod 1/2/3-part forms)
            if node.resource_type != NodeType.Source:
                return False
            if value == "*" or node.source_name == value:
                return True
            parts = value.split(".")
            if len(parts) == 2:
                return [node.source_name, node.name] == parts
            if len(parts) == 3:
                return [node.package_name, node.source_name, node.name] == parts
            return False
        if method == "path":
            return bool(re.fullmatch(value.replace("*", ".*"), node.path))
        if method == "resource_type":
            return node.resource_type.value == value
        if method in ("exposure", "metric", "semantic_model", "saved_query",
                      "unit_test"):
            # per-resource-type name selectors (selector_methods.py:45-66:
            # exposure/metric/semantic_model/saved_query/unit_test methods)
            wanted = {
                "exposure": NodeType.Exposure,
                "metric": NodeType.Metric,
                "semantic_model": NodeType.SemanticModel,
                "saved_query": NodeType.SavedQuery,
                "unit_test": NodeType.UnitTest,
            }[method]
            if node.resource_type != wanted:
                return False
            return value == "*" or bool(
                re.fullmatch(value.replace("*", ".*"), node.name)
            )
        if method == "version":
            # version:latest|old|none|prerelease over the <name>_v<k> naming
            # convention this engine uses for versioned models
            # (VersionSelectorMethod, selector_methods.py). `prerelease` is
            # a version above the declared latest_version (config.meta).
            return _match_version(node, value, all_nodes)
        if method == "source_status":
            # source_status:fresher+ — sources whose max_loaded_at advanced
            # vs the --state dir's sources.json (SourceStatusSelectorMethod)
            if value != "fresher":
                raise DagError(f"unknown source_status selector '{value}'")
            if state is None or "__source_status__" not in state:
                raise DagError(
                    "source_status: requires --state <dir with sources.json>"
                )
            if node.resource_type != NodeType.Source:
                return False
            cur = (state.get("__current_source_status__") or {}).get(node.unique_id)
            old = state["__source_status__"].get(node.unique_id)
            return cur is not None and (old is None or cur > old)
        if method.startswith("config."):
            attr = method.split(".", 1)[1]
            return str(getattr(node.config, attr, node.config.meta.get(attr))) == value
        if method == "fqn":
            pat = value.replace("*", ".*")
            return bool(re.fullmatch(pat, ".".join(node.fqn or [node.name])))
        raise DagError(f"unknown selector method '{method}'")
    if "*" in body:
        # bare glob specs match the node name OR its dotted fqn path —
        # reference bare selectors are fqn-style (selector_spec.py)
        pat = body.replace("*", ".*")
        return bool(
            re.fullmatch(pat, node.name)
            or re.fullmatch(pat, ".".join(node.fqn or [node.name]))
        )
    if node.name == body or node.unique_id == body:
        return True
    # dotted fqn paths, with or without the package prefix (reference
    # selector_methods.py fqn matching; also what `ls` prints by default)
    if "." in body:
        fqn = node.fqn or [node.package_name, node.name]
        parts = body.split(".")
        return parts == fqn or parts == fqn[1:]
    return False


def _expand(graph: nx.DiGraph, seed: set[str], pre: Optional[str], post: Optional[str]) -> set[str]:
    out = set(seed)
    if pre is not None:
        depth = int(pre[:-1]) if len(pre) > 1 else None
        for n in seed:
            anc = nx.ancestors(graph, n) if depth is None else {
                a for a in nx.ancestors(graph, n)
                if nx.shortest_path_length(graph, a, n) <= depth
            }
            out |= anc
    if post is not None:
        depth = int(post[1:]) if len(post) > 1 else None
        for n in seed:
            desc = nx.descendants(graph, n) if depth is None else {
                d for d in nx.descendants(graph, n)
                if nx.shortest_path_length(graph, n, d) <= depth
            }
            out |= desc
    return out


def select_nodes(
    manifest: Manifest,
    graph: nx.DiGraph,
    select: Optional[Iterable[str]] = None,
    exclude: Optional[Iterable[str]] = None,
    state: Optional[dict] = None,
    indirect: str = "eager",
    selector_def=None,
) -> set[str]:
    all_nodes = {**manifest.sources, **manifest.nodes}
    universe = set(all_nodes)
    if state is not None:
        # current macro sources, for state:modified.macros comparison
        state.setdefault(
            "__manifest_macros__",
            {n: s for n, s in manifest.macros.items() if isinstance(s, str)},
        )

    def eval_spec(spec: str) -> set[str]:
        # intersection components separated by ','
        parts = spec.split(",")
        result: Optional[set[str]] = None
        for part in parts:
            m = _GRAPH_OP_RE.match(part.strip())
            if m is None:
                raise DagError(f"cannot parse selector '{part}'")
            body, pre, post = m.group("body"), m.group("pre"), m.group("post")
            seed = {
                uid for uid, n in all_nodes.items()
                if _match_method(n, body, state, all_nodes)
            }
            if m.group("at"):
                # @node: node + descendants + all ancestors of those
                # (selector_spec.py at-operator)
                desc = _expand(graph, seed, None, "+")
                expanded = _expand(graph, desc, "+", None) & universe
            else:
                expanded = _expand(graph, seed, pre, post) & universe
            result = expanded if result is None else (result & expanded)
        return result or set()

    def eval_definition(defn) -> set[str]:
        """YAML selector definition tree (core/dbt/config/selectors.py):
        string specs, {method,value,parents,children,...} leaves, and
        union/intersection lists with nested exclude entries."""
        if isinstance(defn, str):
            return eval_spec(defn)
        if not isinstance(defn, dict):
            raise DagError(f"bad selector definition {defn!r}")
        if "union" in defn or "intersection" in defn:
            op = "union" if "union" in defn else "intersection"
            result: Optional[set[str]] = None
            excluded: set[str] = set()
            for child in defn[op]:
                if isinstance(child, dict) and "exclude" in child:
                    for e in child["exclude"]:
                        excluded |= eval_definition(e)
                    continue
                part = eval_definition(child)
                if result is None:
                    result = part
                elif op == "union":
                    result |= part
                else:
                    result &= part
            return (result or set()) - excluded
        if "exclude" in defn:
            out = set(universe)
            for e in defn["exclude"]:
                out -= eval_definition(e)
            return out
        # method leaf: {method, value, parents?, children?, *_depth?, childrens_parents?}
        method = defn.get("method", "fqn")
        value = defn["value"]
        spec = value if method == "fqn" else f"{method}:{value}"
        if defn.get("childrens_parents"):
            spec = f"@{spec}"
        else:
            if defn.get("parents"):
                depth = defn.get("parents_depth")
                spec = f"{depth if depth else ''}+{spec}"
            if defn.get("children"):
                depth = defn.get("children_depth")
                spec = f"{spec}+{depth if depth else ''}"
        return eval_spec(spec)

    if selector_def is not None:
        selected = eval_definition(selector_def)
        selected |= _indirect_tests(manifest, selected, indirect)
    elif select:
        selected = set()
        for spec in select:
            selected |= eval_spec(spec)
        selected |= _indirect_tests(manifest, selected, indirect)
    else:
        selected = set(universe)
    for spec in exclude or []:
        selected -= eval_spec(spec)
    return selected


def _indirect_tests(manifest: Manifest, selected: set[str], mode: str) -> set[str]:
    """Indirect test selection (reference IndirectSelection,
    core/dbt/graph/selector.py expand_selection): tests attach to an explicit
    selection without being named.

    eager (default): include a test if ANY of its parents is selected;
    cautious/buildable: only if ALL parents are selected; empty: none.
    """
    if mode == "empty":
        return set()
    extra: set[str] = set()
    for uid, node in manifest.nodes.items():
        if node.resource_type not in (NodeType.Test, NodeType.UnitTest):
            continue
        if uid in selected:
            continue
        parents = [d for d in node.depends_on if d in manifest.nodes or d in manifest.sources]
        if not parents:
            continue
        hit = (
            any(p in selected for p in parents)
            if mode == "eager"
            else all(p in selected for p in parents)
        )
        if hit:
            extra.add(uid)
    return extra
