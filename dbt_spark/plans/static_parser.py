"""Static-parser fast path: extract ref/source/config from a model's Jinja
WITHOUT rendering it.

Reference parity: dbt-core's ModelParser first tries a Rust static extractor
(``dbt_extractor``) that pulls ``ref``/``source``/``config`` calls out of the
template and only falls back to a full Jinja render when the template uses
anything it cannot prove static (core/dbt/parser/models.py:236-434,
``run_static_parser`` :379-393; the experimental sample mode :394-466 runs
both paths and reports disagreements).

This implementation uses jinja2's own parser instead of Rust: ``Environment
.parse()`` produces the template AST without compiling or executing it, and a
conservative whitelist walk either extracts the calls or refuses. The
whitelist guarantees equivalence with the rendered path by construction —
any AST node that could change what the render-time ``ref``/``source``/
``config`` hooks observe (loops, conditionals, ``set``, filters, macro
calls, attribute access like ``config.get``) aborts static extraction.

Modes (DBT_SPARK_STATIC_PARSER):
- ``on`` (default): static first, silent fallback to render.
- ``off``: always render (the reference's ``--no-static-parser``).
- ``sample``: run BOTH and compare, raising on disagreement — the
  correctness harness for the fast path itself (reference sampling mode,
  models.py:394-466, surfaced there as tracking events).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jinja2
from jinja2 import nodes as j

#: statement/expression node types that cannot affect what the three capture
#: hooks see when they appear around plain {{ ref/source/config }} outputs
_SAFE_CONTAINERS = (j.Template, j.Output, j.TemplateData)

ExtractResult = tuple[list[tuple], list[tuple[str, str]], dict]


def _const(node: j.Node) -> Any:
    """Literal value of a provably-constant expression node, else raise."""
    if isinstance(node, j.Const):
        return node.value
    if isinstance(node, (j.List, j.Tuple)):
        return [_const(x) for x in node.items]
    if isinstance(node, j.Dict):
        return {_const(p.key): _const(p.value) for p in node.items}
    if isinstance(node, j.Neg) and isinstance(node.node, j.Const):
        return -node.node.value
    raise _NotStatic(f"non-literal argument: {type(node).__name__}")


class _NotStatic(Exception):
    pass


def _capture_call(call: j.Call, refs: list, sources: list, config: dict) -> None:
    if not isinstance(call.node, j.Name):
        raise _NotStatic(f"call to {type(call.node).__name__}")
    fname = call.node.name
    if call.dyn_args is not None or call.dyn_kwargs is not None:
        raise _NotStatic("dynamic call arguments")
    if fname == "ref":
        args = [_const(a) for a in call.args]
        kwargs = {k.key: _const(k.value) for k in call.kwargs}
        extra = set(kwargs) - {"version", "v"}
        if extra:
            raise _NotStatic(f"ref() kwarg {extra}")
        if not args or len(args) > 2 or not all(isinstance(a, str) for a in args):
            raise _NotStatic("ref() non-string or wrong arity")
        version = kwargs.get("version", kwargs.get("v"))
        name = args[-1]
        if version is not None:
            # same versioned-ref resolution as the rendered path
            # (plans/compile.py parse_render; providers.py:576-673)
            name = f"{name}_v{version}"
        refs.append((None, name) if len(args) == 1 else (args[0], name))
    elif fname == "source":
        args = [_const(a) for a in call.args]
        if call.kwargs or len(args) != 2 or not all(isinstance(a, str) for a in args):
            raise _NotStatic("source() shape")
        sources.append((args[0], args[1]))
    elif fname == "config":
        if call.args:
            raise _NotStatic("config() positional args")
        for k in call.kwargs:
            config[k.key] = _const(k.value)
    else:
        raise _NotStatic(f"call to {fname}()")


def _walk(node: j.Node, refs: list, sources: list, config: dict) -> None:
    if isinstance(node, j.Call):
        _capture_call(node, refs, sources, config)
        return  # argument subtrees already validated by _const
    if not isinstance(node, _SAFE_CONTAINERS):
        raise _NotStatic(type(node).__name__)
    for child in node.iter_child_nodes():
        _walk(child, refs, sources, config)


def static_extract(raw_code: str) -> Optional[ExtractResult]:
    """(refs, sources, config_calls) if the template is provably static,
    else None (caller falls back to the full render)."""
    try:
        tree = jinja2.Environment().parse(raw_code)
    except jinja2.TemplateError:
        return None  # let the rendered path surface the error with context
    refs: list[tuple] = []
    sources: list[tuple[str, str]] = []
    config: dict = {}
    try:
        _walk(tree, refs, sources, config)
    except _NotStatic:
        return None
    return refs, sources, config


def parser_mode(flags: "dict | None" = None) -> str:
    """DBT_SPARK_STATIC_PARSER env wins; else dbt_project.yml
    ``flags: {static_parser: false}`` / ``use_experimental_parser: true``
    (reference ProjectFlags static_parser/use_experimental_parser — the
    experimental parser maps to the cross-checking ``sample`` mode)."""
    env = os.environ.get("DBT_SPARK_STATIC_PARSER")
    if env is not None:
        mode = env.lower()
        return mode if mode in ("on", "off", "sample") else "on"
    f = flags or {}
    if f.get("static_parser") is False:
        return "off"
    if f.get("use_experimental_parser"):
        return "sample"
    return "on"


def extract_or_render(
    raw_code: str,
    name: str,
    render_fn,
    flags: "dict | None" = None,
) -> tuple[list[tuple], list[tuple[str, str]], dict]:
    """Static fast path with render fallback; ``render_fn()`` must return the
    full parse_render tuple. ``sample`` mode cross-checks both paths."""
    mode = parser_mode(flags)
    if mode == "off":
        _, refs, sources, config = render_fn()
        return refs, sources, config
    static = static_extract(raw_code)
    if static is None:
        _, refs, sources, config = render_fn()
        return refs, sources, config
    if mode == "sample":
        _, refs, sources, config = render_fn()
        if (refs, sources, config) != static:
            raise AssertionError(
                f"static parser disagreement on {name}: "
                f"static={static} rendered={(refs, sources, config)}"
            )
    return static


#: parse env matching plans.compile._ENV's text-shaping options, so a plan
#: rebuilt from the AST is byte-identical to a real jinja render
_RENDER_ENV = jinja2.Environment(keep_trailing_newline=True)

#: raw_code -> render plan (None = provably-not-static); bounded
_PLAN_MEMO: dict[str, Any] = {}
_MISS = object()


def static_render_parts(raw_code: str) -> Optional[list]:
    """Render PLAN for a provably-static template, else None.

    A static template (same whitelist as ``static_extract``) renders as a
    straight concatenation of its literal text and the values of its
    ``ref``/``source``/``config`` calls — no template compile, no exec, no
    context. The plan is a list of parts: ``str`` literals,
    ``("ref", package_or_None, name)`` (version already folded into the
    name, mirroring ``_capture_call``), ``("source", src, table)``, and
    ``("config",)`` (renders as the empty string, exactly like the runtime
    ``config()`` hook). Memoized per raw_code: the 2,000-model run pays one
    jinja PARSE per model here instead of parse + compile + exec."""
    plan = _PLAN_MEMO.get(raw_code, _MISS)
    if plan is not _MISS:
        return plan
    try:
        tree = _RENDER_ENV.parse(raw_code)
    except jinja2.TemplateError:
        plan = None
    else:
        try:
            plan = _plan_parts(tree)
        except _NotStatic:
            plan = None
    if len(_PLAN_MEMO) < 8192:
        _PLAN_MEMO[raw_code] = plan
    return plan


def _plan_parts(tree: j.Template) -> list:
    parts: list = []
    for nd in tree.body:
        if isinstance(nd, j.TemplateData):
            parts.append(nd.data)
            continue
        if not isinstance(nd, j.Output):
            raise _NotStatic(type(nd).__name__)
        for child in nd.nodes:
            if isinstance(child, j.TemplateData):
                parts.append(child.data)
                continue
            if not isinstance(child, j.Call):
                raise _NotStatic(type(child).__name__)
            refs: list = []
            sources: list = []
            config: dict = {}
            _capture_call(child, refs, sources, config)
            if refs:
                parts.append(("ref", refs[0][0], refs[0][1]))
            elif sources:
                parts.append(("source", sources[0][0], sources[0][1]))
            else:
                parts.append(("config",))
    return parts
