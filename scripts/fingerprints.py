"""Per-key change fingerprints for the sweep-rotation contract.

VERDICT r11 #2: round 11 changed 48 keys (43 oracle strings + the
5-key VersionedTable engine path) but shipped the previous round's
``_SWEEP_PRIORITY`` verbatim, so 34 changed keys reached the driver
with no CORRECTNESS row for their current program. The rotation rule
("changed keys MUST sit inside the sweep cap",
``__spark_entry__.py``) was human-enforced and failed under a short
round — this module mechanizes it.

A key's fingerprint is ``md5`` over:

* its registered ORACLE string (the EXPANDED text stored in
  ``ORACLES`` — so an ``sql_dsum``/``_sql_finite`` helper edit that
  changes the emitted SQL changes every consumer's fingerprint, which
  is exactly what the r11 incident needed), and
* the SOURCE of its engine function plus the transitive closure of
  package-defined callables/classes it references — resolved both
  through module-level globals (``co_names`` of the function and its
  nested code objects) and through function-LOCAL
  ``from map_reduce_subnet_spark... import X`` statements (the
  repo's dominant import style inside query bodies). This is how a
  ``functions/stable.py::_finite`` or ``sources/versioned.py``
  rewrite fingers every downstream key.

Ritual (pinned by tests/test_correctness.py):

* ``python scripts/fingerprints.py`` regenerates
  ``scripts/fingerprints.json``. Regenerate ONLY in the same change
  that rotates ``_SWEEP_PRIORITY`` for the round — the committed
  file means "the registry state the CURRENT sweep list was written
  against".
* The pinned test recomputes fingerprints and asserts every key that
  differs from (or is absent from) the committed file appears in
  ``_SWEEP_PRIORITY``. Editing an oracle or engine path without
  rotating the sweep list fails the suite.

Grounding: the oracle-vs-engine exact-match contract the project
generalizes (reference neurons/validator.py:134-141 — a validator
only trusts responses it re-verified against its own oracle).
"""

from __future__ import annotations

import ast
import hashlib
import importlib
import inspect
import io
import json
import os
import sys
import textwrap

_PKG = "map_reduce_subnet_spark"


def _normalize(src: str) -> str:
    """AST round-trip: drops comments and strips docstrings so a
    DOC-ONLY edit to a query function does not change its fingerprint
    (a docstring cannot change driver-visible behavior, so it must
    not consume a sweep slot). Oracle strings are hashed separately
    and verbatim — SQL text changes always finger their keys."""
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return src
    for node in ast.walk(tree):
        if isinstance(
            node,
            (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
        ):
            body = node.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                body[0] = ast.Expr(value=ast.Constant(value=""))
    return ast.unparse(tree)


def _package_obj_source(obj) -> str | None:
    """Normalized source for a function/class defined in the package."""
    mod = getattr(obj, "__module__", None) or ""
    if not (mod == _PKG or mod.startswith(_PKG + ".")):
        return None
    try:
        return _normalize(inspect.getsource(obj))
    except (OSError, TypeError):
        return None


def _local_package_imports(src: str):
    """Objects pulled in by function-local ``from <pkg>... import``.

    Query bodies import helpers locally (keeps module import cheap),
    which hides them from ``__globals__`` — parse the source instead.
    """
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        return
    for node in ast.walk(tree):
        if not isinstance(node, ast.ImportFrom) or node.level:
            continue
        if not (node.module or "").startswith(_PKG):
            continue
        try:
            mod = importlib.import_module(node.module)
        except ImportError:
            continue
        for alias in node.names:
            obj = getattr(mod, alias.name, None)
            if obj is None:
                # `from pkg.sub import module as m`: the parent
                # package only carries the submodule ATTRIBUTE after
                # something imports it, so getattr alone makes the
                # fingerprint depend on import history (measured:
                # scan/sink_python_datasource changed fingerprints
                # after any suite ran their queries). Import the
                # submodule explicitly so resolution is
                # deterministic.
                try:
                    obj = importlib.import_module(
                        f"{node.module}.{alias.name}"
                    )
                except ImportError:
                    continue
            yield obj


def _referenced_globals(fn):
    """Objects reachable through co_names of fn + nested code objects."""
    code_objs = [fn.__code__]
    i = 0
    while i < len(code_objs):
        for const in code_objs[i].co_consts:
            if inspect.iscode(const):
                code_objs.append(const)
        i += 1
    names = set()
    for c in code_objs:
        names.update(c.co_names)
    g = getattr(fn, "__globals__", {})
    for name in names:
        if name in g:
            yield g[name]


def _code_names(fn) -> set[str]:
    """co_names of fn plus every nested code object (lambdas,
    closures) — covers both global references and ATTRIBUTE names."""
    code_objs = [fn.__code__]
    i = 0
    while i < len(code_objs):
        for const in code_objs[i].co_consts:
            if inspect.iscode(const):
                code_objs.append(const)
        i += 1
    names: set[str] = set()
    for c in code_objs:
        names.update(c.co_names)
    return names


def _closure_sources(fn, seen: set[int], out: list[str]) -> None:
    src = _package_obj_source(fn)
    if src is None or id(fn) in seen:
        return
    seen.add(id(fn))
    out.append(src)
    names = _code_names(fn)
    referenced = list(_referenced_globals(fn))
    referenced.extend(_local_package_imports(src))
    # classes: recurse into their methods' references too
    for obj in referenced:
        if inspect.ismodule(obj):
            # cross-module helpers are referenced as module
            # attributes (`tx.shingles(...)`): the attribute name
            # sits in co_names next to the module's own name, so
            # resolve each co_name AGAINST the module — per-attribute
            # precision (an edit to functions/text.py fingers only
            # the keys that actually reach the edited helper, not
            # every key that imports the module). Over-inclusion from
            # a coincidentally-shared name is harmless (a few extra
            # sources in the bag); under-inclusion would miss real
            # changes, so both the module's own functions AND classes
            # resolve here.
            mname = getattr(obj, "__name__", "")
            if not (mname == _PKG or mname.startswith(_PKG + ".")):
                continue
            for name in sorted(names):
                attr = getattr(obj, name, None)
                if inspect.isfunction(attr):
                    _closure_sources(attr, seen, out)
                elif inspect.isclass(attr):
                    csrc = _package_obj_source(attr)
                    if csrc is not None and id(attr) not in seen:
                        seen.add(id(attr))
                        out.append(csrc)
        elif inspect.isclass(obj):
            csrc = _package_obj_source(obj)
            if csrc is not None and id(obj) not in seen:
                seen.add(id(obj))
                out.append(csrc)
                for _, meth in inspect.getmembers(obj, inspect.isfunction):
                    for sub in list(_referenced_globals(meth)) + list(
                        _local_package_imports(
                            _package_obj_source(meth) or ""
                        )
                    ):
                        if inspect.isfunction(sub):
                            _closure_sources(sub, seen, out)
        elif inspect.isfunction(obj):
            _closure_sources(obj, seen, out)


def compute_fingerprints() -> dict[str, str]:
    from map_reduce_subnet_spark.operators import ORACLES, QUERIES

    fps: dict[str, str] = {}
    for key in sorted(QUERIES):
        srcs: list[str] = []
        _closure_sources(QUERIES[key], set(), srcs)
        # the closure's DISCOVERY order depends on set iteration
        # (per-process hash randomization) — canonicalize to a sorted
        # de-duplicated bag so the digest is content-only
        parts = [ORACLES.get(key, "")] + sorted(set(srcs))
        blob = "\0".join(parts).encode()
        fps[key] = hashlib.md5(blob).hexdigest()
    return fps


FINGERPRINT_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fingerprints.json"
)


def main() -> None:
    sys.path.insert(
        0,
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    fps = compute_fingerprints()
    with io.open(FINGERPRINT_FILE, "w") as f:
        json.dump(fps, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(fps)} fingerprints to {FINGERPRINT_FILE}")


if __name__ == "__main__":
    main()
