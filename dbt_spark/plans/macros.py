"""Macro parsing + the Jinja macro namespace (the UDF-of-SQL-text unit).

Reference: ``{% macro %}`` blocks are extracted per file and become callable
Jinja functions available to every model render
(core/dbt/parser/macros.py:33-60, MacroGenerator core/dbt/clients/jinja.py:49).
``adapter.dispatch(name)`` resolves ``spark__name`` → ``default__name`` →
``name`` (core/dbt/context/providers.py:126-224, dispatch :177).

Spark-first deviation: materializations stay native Python operators
(operators/), so ``{% materialization %}`` blocks are parsed but ignored with
a warning rather than executed — the dispatch table in operators/__init__.py
is the analog.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jinja2

MACRO_BLOCK_RE = re.compile(
    r"({%-?\s*macro\s+(\w+)\s*\(.*?{%-?\s*endmacro\s*-?%})",
    re.DOTALL,
)
MATERIALIZATION_BLOCK_RE = re.compile(
    r"{%-?\s*materialization\s+(\w+)\s*,\s*"
    r"(?:(default)|adapter\s*=\s*['\"](\w+)['\"])\s*-?%}"
    r"(.*?){%-?\s*endmaterialization\s*-?%}",
    re.DOTALL,
)
_WRAPPED_RELATION_RE = re.compile(
    r"^\(\s*select\s+\*\s+from\s+([A-Za-z0-9_.`]+)", re.IGNORECASE
)
TEST_BLOCK_RE = re.compile(
    # {% test name(args) %} body {% endtest %} — generic test definitions
    r"{%-?\s*test\s+(\w+)\s*(\(.*?\))\s*-?%}(.*?){%-?\s*endtest\s*-?%}",
    re.DOTALL,
)


DOCS_BLOCK_RE = re.compile(
    r"{%-?\s*docs\s+(\w+)\s*-?%}(.*?){%-?\s*enddocs\s*-?%}", re.DOTALL
)


def extract_macros(raw: str) -> dict[str, str]:
    """name -> full ``{% macro %}…{% endmacro %}`` source text."""
    return {m.group(2): m.group(1) for m in MACRO_BLOCK_RE.finditer(raw)}


def extract_materializations(raw: str) -> dict[tuple[str, str], str]:
    """(name, adapter) -> body for every ``{% materialization name,
    default|adapter='spark' %}…{% endmaterialization %}`` block (reference
    parses these into Macro nodes named materialization_<name>_<adapter>,
    core/dbt/parser/macros.py block extraction; dispatch specificity
    manifest.py:1005-1046 find_materialization_macro_by_name)."""
    out: dict[tuple[str, str], str] = {}
    for m in MATERIALIZATION_BLOCK_RE.finditer(raw):
        name, default_kw, adapter, body = m.groups()
        out[(name, adapter or "default")] = body
    return out


def extract_docs(raw: str) -> dict[str, str]:
    """{% docs name %} text {% enddocs %} → name → markdown text
    (DocumentationParser; referenced via doc() in YAML descriptions)."""
    return {m.group(1): m.group(2).strip() for m in DOCS_BLOCK_RE.finditer(raw)}


def extract_generic_tests(raw: str) -> dict[str, str]:
    """{% test x(model, column_name) %} → macro named test_x (reference
    renames test blocks to ``test_<name>`` macros, parser/macros.py:97-99)."""
    out = {}
    for m in TEST_BLOCK_RE.finditer(raw):
        name, args, body = m.groups()
        out[f"test_{name}"] = (
            f"{{% macro test_{name}{args} %}}{body}{{% endmacro %}}"
        )
    return out


_TEMPLATE_CACHE: dict[tuple[int, str], Any] = {}


def _compiled(env: jinja2.Environment, source: str) -> Any:
    """Compile-once cache for macro preludes (keyed by env identity + source).
    make_module() per render stays (it binds the caller's context); only the
    parse/compile step — the expensive part — is amortized."""
    key = (id(env), source)
    tpl = _TEMPLATE_CACHE.get(key)
    if tpl is None:
        if len(_TEMPLATE_CACHE) > 256:
            _TEMPLATE_CACHE.clear()
        tpl = env.from_string(source)
        _TEMPLATE_CACHE[key] = tpl
    return tpl


class MacroReturn(Exception):
    """Raised by the ``return(value)`` macro global; caught at the macro-call
    boundary so the call evaluates to ``value`` (reference
    core/dbt/clients/jinja.py MacroReturn)."""

    def __init__(self, value: Any) -> None:
        super().__init__("macro return")
        self.value = value


def _macro_return(value: Any = None) -> Any:
    raise MacroReturn(value)


def _catch_macro_return(macro: Any) -> Any:
    def call(*args: Any, **kwargs: Any) -> Any:
        try:
            return macro(*args, **kwargs)
        except MacroReturn as r:
            return r.value

    call.__name__ = getattr(macro, "name", None) or getattr(
        macro, "__name__", "macro")
    call._dbt_macro = macro
    return call


class MacroNamespace:
    """Lazily-instantiated Jinja macro module bound to a render context.

    All macro sources are concatenated into one template module created with
    the caller's context, so macros can call ``ref``/``source``/``var``/
    ``run_query``/other macros — matching the reference's shared macro
    namespace (MacroNamespaceBuilder semantics).
    """

    def __init__(self, env: jinja2.Environment, macro_sources: dict[str, str]) -> None:
        self.env = env
        self.sources = dict(macro_sources)

    def bind(self, ctx: dict[str, Any]) -> dict[str, Any]:
        """Return {macro_name: callable} with macros evaluated in ``ctx``.

        Dotted keys (``pkg.macro``) become package namespaces: ``bound['pkg']``
        is an object whose attributes are that package's macros, built from a
        module where the package's own definitions are appended last so they
        win name collisions (reference package macro namespacing).

        ``return(value)`` inside a macro short-circuits it and makes the CALL
        evaluate to ``value`` (any object, not just text) — the reference's
        MacroReturn escape (core/dbt/clients/jinja.py MacroReturn), which
        list-returning package macros (dbt_utils.get_column_values) rely on."""
        flat = {k: v for k, v in self.sources.items() if "." not in k}
        pkgs: dict[str, dict[str, str]] = {}
        for k, v in self.sources.items():
            if "." in k:
                p, n = k.split(".", 1)
                pkgs.setdefault(p, {})[n] = v
        if not flat and not pkgs:
            return {}
        mvars = dict(ctx)
        mvars.setdefault("return", _macro_return)
        bound: dict[str, Any] = {}
        if flat:
            # one module for the whole flat namespace: macros can call each
            # other regardless of order (Jinja resolves intra-module calls at
            # call time, not definition time). Template COMPILATION is cached
            # by source hash (module-level) — a 2,000-model parse renders
            # 2,000 times but compiles the macro prelude once.
            module = _compiled(self.env, "\n".join(flat.values())).make_module(
                vars=mvars
            )
            bound = {
                name: _catch_macro_return(getattr(module, name))
                for name in flat
                if hasattr(module, name)
            }
        from types import SimpleNamespace

        for p, names in pkgs.items():
            if all(flat.get(n) == src for n, src in names.items()):
                # package sources identical to their flat bindings (no
                # collision): reuse the flat module, skip a second build
                ns = SimpleNamespace(
                    **{n: bound[n] for n in names if n in bound}
                )
            else:
                srcs = [v for k, v in flat.items() if k not in names]
                srcs.extend(names.values())
                pmod = _compiled(self.env, "\n".join(srcs)).make_module(
                    vars=mvars
                )
                ns = SimpleNamespace(
                    **{n: _catch_macro_return(getattr(pmod, n))
                       for n in names if hasattr(pmod, n)}
                )
            bound.setdefault(p, ns)
        return bound


def make_dispatcher(
    macros: dict[str, Any],
    adapter_type: str = "spark",
    dispatch_config: Optional[list] = None,
    root_project: Optional[str] = None,
    dependencies: Optional[list] = None,
):
    """``adapter.dispatch(name, macro_namespace=...)`` with the reference's
    full search-order semantics (core/dbt/context/providers.py:126-224):

    - search packages: the project-level ``dispatch:`` config entry matching
      ``macro_namespace`` wins (``search_order`` list,
      core/dbt/config/project.py:775 get_macro_search_order); else, if the
      namespace is an installed dependency, ``[root_project, namespace]``;
      else the global namespace (providers.py:157-174 _get_search_packages).
    - within each package, prefixes ``{adapter}__`` then ``default__``
      (providers.py:150-155 _get_adapter_macro_prefixes).
    - failure raises CompilationError listing every attempted name
      (providers.py:218-221), after one repo-specific lenience: the bare
      unprefixed name in the global namespace (kept for macros written
      without the ``default__`` convention).

    ``macros`` is the BOUND namespace from MacroNamespace.bind: flat macro
    callables plus per-package attribute namespaces.
    """
    from dbt_spark.plans.compile import CompilationError

    prefixes = (adapter_type, "default")
    deps = set(dependencies or ())

    def _get_from_package(package: Optional[str], search_name: str):
        if package is None:
            return macros.get(search_name)
        ns = macros.get(package)
        member = getattr(ns, search_name, None) if ns is not None else None
        if callable(member):
            return member
        return None

    def _search_packages(namespace: Optional[str]) -> list:
        if namespace is None:
            return [None]
        if not isinstance(namespace, str):
            raise CompilationError(
                f"In adapter.dispatch, got a {type(namespace).__name__} "
                f"macro_namespace argument ({namespace!r}), but "
                "macro_namespace should be None or a string."
            )
        for entry in dispatch_config or ():
            if entry.get("macro_namespace") == namespace:
                return list(entry.get("search_order") or [])
        if namespace in deps:
            return [root_project, namespace]
        return [None]

    def dispatch(name: str, macro_namespace: Optional[str] = None):
        if "." in name:
            pkg, bare = name.split(".", 1)
            raise CompilationError(
                f'In adapter.dispatch, got a macro name of "{name}", but "." '
                f"is not a valid macro name component. Did you mean "
                f'`adapter.dispatch("{bare}", macro_namespace="{pkg}")`?'
            )
        attempts = []
        for package in _search_packages(macro_namespace):
            for prefix in prefixes:
                search_name = f"{prefix}__{name}"
                attempts.append(
                    search_name if package is None
                    else f"{package}.{search_name}"
                )
                found = _get_from_package(package, search_name)
                if found is not None:
                    return found
        if macro_namespace is None and name in macros and callable(macros[name]):
            return macros[name]
        searched = ", ".join(repr(a) for a in attempts)
        raise CompilationError(
            f"In dispatch: No macro named '{name}' found within namespace: "
            f"'{macro_namespace}'\n    Searched for: {searched}"
        )

    return dispatch


class RelationProxy:
    """`this` / relation objects with .database/.schema/.identifier/.name that
    stringify to the addressable identifier (reference Relation contract —
    providers.py:1670-1703 `this`)."""

    def __init__(self, identifier: str, schema: str = "main", name: str = "") -> None:
        self._ident = identifier
        self.schema = schema
        self.identifier = name or identifier
        self.name = name or identifier
        self.database = None

    def __str__(self) -> str:  # noqa: DunderStr
        return self._ident

    def __repr__(self) -> str:
        return self._ident

    # dbt Relation API subset used by common macros
    def include(self, **kwargs: Any) -> "RelationProxy":
        return self

    def render(self) -> str:
        return self._ident


class ColumnInfo:
    """dbt's api.Column subset (name/dtype/data_type/quoted) — what macros
    read from adapter.get_columns_in_relation results."""

    def __init__(self, name: str, dtype: str) -> None:
        self.name = name
        self.dtype = dtype
        self.column = name

    @property
    def data_type(self) -> str:
        return self.dtype

    @property
    def quoted(self) -> str:
        return f"`{self.name}`"

    def is_string(self) -> bool:
        return self.dtype in ("string", "varchar")

    def is_numeric(self) -> bool:
        return any(t in self.dtype for t in ("int", "long", "double", "float", "decimal"))

    def __repr__(self) -> str:
        return f"Column({self.name} {self.dtype})"


class RuntimeAdapter:
    """Runtime ``adapter.*`` wrapper over the relation store — the execute-
    phase analog of BaseDatabaseWrapper (core/dbt/context/providers.py:126-224).
    Package macros introspect relations through exactly this subset."""

    def __init__(self, ctx: Any) -> None:
        self._ctx = ctx
        self.dispatch = None  # bound by _bind_macros

    def _split(self, relation: Any) -> tuple[str, str]:
        schema = getattr(relation, "schema", None) or "main"
        name = getattr(relation, "name", None) or str(relation)
        m = _WRAPPED_RELATION_RE.match(str(relation))
        if m and getattr(relation, "name", None) is None:
            # generic tests receive `model` as "(SELECT * FROM rel [WHERE ..])"
            # (the where-subquery contract, reference get_where_subquery) —
            # unwrap so introspective macros (star/equality) can read columns
            name = m.group(1)
        if self._ctx.store.get(schema, name) is None and "__" in name:
            # identifier-form "schema__name" fallback
            s, _, n = name.partition("__")
            if self._ctx.store.get(s, n) is not None:
                return s, n
        return schema, name

    def get_relation(
        self, database: Any = None, schema: Any = None, identifier: Any = None
    ) -> Optional[RelationProxy]:
        schema = str(schema or "main")
        identifier = str(identifier or "")
        rel = self._ctx.store.get(schema, identifier)
        if rel is None:
            return None
        proxy = RelationProxy(f"{schema}__{identifier}", schema=schema, name=identifier)
        proxy.type = rel.kind
        return proxy

    def load_relation(self, relation: Any) -> Optional[RelationProxy]:
        schema, name = self._split(relation)
        return self.get_relation(schema=schema, identifier=name)

    def get_relations_by_pattern(
        self,
        schema_pattern: str = "%",
        table_pattern: str = "%",
        exclude: str = "",
    ) -> list["RelationProxy"]:
        """SQL-LIKE pattern listing over the relation store (the
        information_schema query dbt_utils.get_relations_by_pattern runs on
        a warehouse; % = any run, _ = any char, case-insensitive)."""

        def rx(p: str):
            esc = re.escape(str(p)).replace("%", ".*").replace("_", ".")
            return re.compile(f"^{esc}$", re.IGNORECASE)

        s_rx, t_rx = rx(schema_pattern), rx(table_pattern)
        x_rx = rx(exclude) if exclude else None
        out = []
        for rel in self._ctx.store.list_relations():
            if not s_rx.match(rel.schema) or not t_rx.match(rel.name):
                continue
            if x_rx is not None and x_rx.match(rel.name):
                continue
            out.append(
                RelationProxy(rel.identifier, schema=rel.schema, name=rel.name)
            )
        return sorted(out, key=lambda r: (r.schema, r.name))

    def get_columns_in_relation(self, relation: Any) -> list[ColumnInfo]:
        schema, name = self._split(relation)
        rel = self._ctx.store.get(schema, name)
        if rel is None:
            return []
        df = self._ctx.store.read(rel.schema, rel.name)
        return [ColumnInfo(f.name, f.dataType.simpleString()) for f in df.schema.fields]

    def drop_relation(self, relation: Any) -> str:
        schema, name = self._split(relation)
        self._ctx.store.drop(schema, name)
        return ""

    def create_schema(self, relation: Any = None) -> str:
        return ""  # schemas are directories created lazily by the store

    def list_relations(self, database: Any = None, schema: Any = None) -> list[RelationProxy]:
        out = []
        for rel in self._ctx.store.list_relations(str(schema) if schema else None):
            p = RelationProxy(rel.identifier, schema=rel.schema, name=rel.name)
            p.type = rel.kind
            out.append(p)
        return out

    def quote(self, identifier: str) -> str:
        return f"`{identifier}`"

    # type helpers (dbt.type_* macro backing; adapters expose these as
    # convert_*_type classmethods)
    def type_string(self) -> str:
        return "string"

    def type_timestamp(self) -> str:
        return "timestamp"

    def type_int(self) -> str:
        return "bigint"

    def type_numeric(self) -> str:
        return "decimal(28,6)"


class QueryResult:
    """Driver-side result of run_query — the agate.Table analog kept tiny
    (SURVEY §1.2: agate only ever holds test summaries / previews)."""

    def __init__(self, columns: list[str], rows: list[tuple]) -> None:
        self.column_names = columns
        self.columns = {c: [r[i] for r in rows] for i, c in enumerate(columns)}
        self.rows = rows

    def __iter__(self):
        return iter(self.rows)

    def __len__(self) -> int:
        return len(self.rows)
