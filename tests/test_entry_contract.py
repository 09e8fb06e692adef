"""Driver-contract source guards for ``__ray_entry__.py``:

- no duplicate keys in the queries() / oracle_sql() dict LITERALS —
  Python silently keeps the last duplicate, which shadows an operator
  while every sweep still prints green for the name (this bit round 4:
  a second ``orders_profile`` hid the first);
- every oracle_sql() key has a queries() entry;
- the module never calls ray.init()/ray.shutdown() (the driver owns
  the session).
"""

from __future__ import annotations

import ast
from pathlib import Path

ENTRY = Path(__file__).resolve().parent.parent / "__ray_entry__.py"


def _dict_literal_keys(func: ast.FunctionDef) -> list[str]:
    """String keys of the (single) returned dict literal."""
    for node in ast.walk(func):
        if isinstance(node, ast.Return) and isinstance(node.value, ast.Dict):
            return [
                k.value
                for k in node.value.keys
                if isinstance(k, ast.Constant) and isinstance(k.value, str)
            ]
    raise AssertionError(f"{func.name} has no returned dict literal")


def _funcs():
    tree = ast.parse(ENTRY.read_text())
    return {
        n.name: n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name in ("queries", "oracle_sql")
    }


def test_no_duplicate_keys_in_entry_dicts():
    funcs = _funcs()
    for name, fn in funcs.items():
        keys = _dict_literal_keys(fn)
        dups = sorted({k for k in keys if keys.count(k) > 1})
        assert not dups, f"{name}() has duplicate keys: {dups}"


def test_every_oracle_has_a_query():
    funcs = _funcs()
    q = set(_dict_literal_keys(funcs["queries"]))
    o = set(_dict_literal_keys(funcs["oracle_sql"]))
    assert o <= q, f"oracle_sql keys missing from queries(): {sorted(o - q)}"


def test_entry_module_never_owns_the_ray_session():
    tree = ast.parse(ENTRY.read_text())
    calls = [
        node.func.attr
        for node in ast.walk(tree)
        if isinstance(node, ast.Call)
        and isinstance(node.func, ast.Attribute)
        and isinstance(node.func.value, ast.Name)
        and node.func.value.id == "ray"
    ]
    assert "init" not in calls and "shutdown" not in calls
