"""Structural driver-window freshness: which catalog entries need a
fresh driver correctness row, derived from evidence + code instead of
a hand-maintained list.

The round-3 and round-4 verdicts both caught the same bug class: an
entry is rewritten AFTER its last green driver row, but the hand-kept
``_CHECK_FIRST`` / ``_DRIVER_GREEN`` lists still file it under "green,
code unchanged" (ann_ivf in r3, fact_build_star in r4).  This module
makes the policy structural:

1. **Evidence**: scan ``CORRECTNESS_r*.json`` for each entry's latest
   attesting row (hash green, or rows-only-by-design), and recover the
   exact commit that row attests — the parent of the driver commit
   that added the round's results file.
2. **Code**: build each entry's dependency closure at FUNCTION
   granularity by walking the query function's AST — same-module
   helpers, cross-module from-imports, ``alias.attr`` uses of project
   modules, and the entry's ``ORACLES[key]`` SQL expression — and
   fingerprint every reachable object (docstring-stripped ``ast.dump``,
   so comment/formatting/citation edits don't count as changes).
3. **Staleness**: an entry is stale iff any object in its closure
   fingerprints differently between the attested commit (``git show``)
   and the current worktree.

``plan_order`` then derives the driver window head with zero
hand-listed staleness: never-checked entries, then entries whose
latest row was red, then stale greens; fresh greens sort to the tail
oldest-attestation-first so the window's spare budget re-attests the
oldest evidence.
"""

from __future__ import annotations

import ast
import functools
import json
import re
import subprocess
from pathlib import Path

PKG = "azure_nyctaxi_lambda_elt_spark"
PKG_DIR = Path(__file__).resolve().parents[1]
REPO = PKG_DIR.parent


# --------------------------------------------------------------- git

def _git(*args: str) -> str | None:
    try:
        r = subprocess.run(
            ["git", *args], cwd=REPO, capture_output=True, text=True,
            timeout=30)
    except Exception:
        return None
    return r.stdout if r.returncode == 0 else None


@functools.lru_cache(maxsize=None)
def _attest_commit(round_file: str) -> str | None:
    """The code a round's CORRECTNESS rows attest: the parent of the
    driver commit that ADDED the results file."""
    out = _git("log", "--diff-filter=A", "--format=%H", "--",
               round_file)
    if not out or not out.strip():
        return None
    added_in = out.strip().splitlines()[-1]
    parent = _git("rev-parse", f"{added_in}^")
    return parent.strip() if parent else None


@functools.lru_cache(maxsize=None)
def _src_at(commit: str, rel: str) -> str | None:
    """File source at a commit (None when absent there)."""
    return _git("show", f"{commit}:{rel}")


# --------------------------------------------------- module analysis

def _strip_docstrings(tree: ast.AST) -> ast.AST:
    for node in list(ast.walk(tree)):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef, ast.Module)):
            body = node.body
            if (body and isinstance(body[0], ast.Expr)
                    and isinstance(body[0].value, ast.Constant)
                    and isinstance(body[0].value.value, str)):
                node.body = body[1:] or [ast.Pass()]
    return tree


def _fp(node: ast.AST) -> str:
    return ast.dump(_strip_docstrings(node))


class _Mod:
    """One project module's AST, indexed for dependency walking."""

    def __init__(self, rel: str, src: str):
        self.rel = rel
        self.tree = ast.parse(src)
        # top-level object name -> defining nodes (redefs kept)
        self.objects: dict[str, list[ast.AST]] = {}
        # entry key -> ORACLES[key] value-expression nodes
        self.oracle_nodes: dict[str, list[ast.AST]] = {}
        # local name -> project module relpath (import ... as alias)
        self.alias_mod: dict[str, str] = {}
        # local name -> (module relpath, object name) (from-imports)
        self.from_obj: dict[str, tuple[str, str]] = {}

        for node in self.tree.body:
            names: list[str] = []
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                names = [node.name]
            elif isinstance(node, ast.Assign):
                names = [t.id for t in node.targets
                         if isinstance(t, ast.Name)]
                self._index_oracle_assign(node)
            elif isinstance(node, ast.AnnAssign) and isinstance(
                    node.target, ast.Name):
                names = [node.target.id]
            for n in names:
                self.objects.setdefault(n, []).append(node)
        # an initial `ORACLES = {...}` dict literal: split per key so
        # one SQL edit doesn't fingerprint every entry as changed
        for defs in (self.objects.get("ORACLES") or []):
            val = getattr(defs, "value", None)
            if isinstance(val, ast.Dict):
                for k, v in zip(val.keys, val.values):
                    if isinstance(k, ast.Constant) and isinstance(
                            k.value, str):
                        self.oracle_nodes.setdefault(
                            k.value, []).append(v)
        # imports anywhere in the module (function-scoped included)
        pkg_of_module = rel[:-3].split("/")[:-1]
        for node in ast.walk(self.tree):
            self._collect_import(node, pkg_of_module)

    def _index_oracle_assign(self, node: ast.Assign) -> None:
        for t in node.targets:
            if (isinstance(t, ast.Subscript)
                    and isinstance(t.value, ast.Name)
                    and t.value.id == "ORACLES"
                    and isinstance(t.slice, ast.Constant)
                    and isinstance(t.slice.value, str)):
                self.oracle_nodes.setdefault(
                    t.slice.value, []).append(node.value)

    def _collect_import(self, node: ast.AST,
                        pkg_of_module: list[str]) -> None:
        if isinstance(node, ast.Import):
            for a in node.names:
                parts = a.name.split(".")
                if parts[0] != PKG:
                    continue
                rel = "/".join(parts) + ".py"
                if (REPO / rel).exists():
                    self.alias_mod[a.asname or parts[-1]] = rel
        elif isinstance(node, ast.ImportFrom):
            if node.level == 0:
                if not (node.module or "").startswith(PKG):
                    return
                base = node.module.split(".")
            else:
                base = pkg_of_module[:len(pkg_of_module)
                                     - (node.level - 1)]
                if node.module:
                    base = base + node.module.split(".")
            if not base or base[0] != PKG:
                return
            base_file = "/".join(base) + ".py"
            for a in node.names:
                sub = "/".join(base + [a.name]) + ".py"
                local = a.asname or a.name
                if (REPO / sub).exists():
                    self.alias_mod[local] = sub
                elif (REPO / base_file).exists():
                    self.from_obj[local] = (base_file, a.name)


def _load(rel: str) -> _Mod | None:
    """Worktree module (shares the snapshot cache)."""
    return _mod_at(None, rel)


# Dep = (module relpath, object name | None); None = whole module.
Dep = tuple


# sentinel module path for "this entry key's oracle SQL, wherever
# it is assigned" — finer than depending on the whole ORACLES dict
_ORACLE_DEP = "<oracles>"


def _deps_of_node(mod: _Mod, node: ast.AST) -> set[Dep]:
    deps: set[Dep] = set()
    attr_bases: set[int] = set()
    for n in ast.walk(node):
        if (isinstance(n, ast.Attribute)
                and isinstance(n.value, ast.Name)
                and n.value.id in mod.alias_mod):
            deps.add((mod.alias_mod[n.value.id], n.attr))
            attr_bases.add(id(n.value))
        elif (isinstance(n, ast.Subscript)
                and isinstance(n.value, ast.Name)
                and n.value.id == "ORACLES"
                and isinstance(n.slice, ast.Constant)
                and isinstance(n.slice.value, str)):
            # ORACLES["other_key"] reference (oracle aliasing): depend
            # on that key's SQL, not on the whole ORACLES literal
            deps.add((_ORACLE_DEP, n.slice.value))
            attr_bases.add(id(n.value))
    for n in ast.walk(node):
        if not isinstance(n, ast.Name) or id(n) in attr_bases:
            continue
        nm = n.id
        if nm in mod.from_obj:
            deps.add(mod.from_obj[nm])
        elif nm in mod.alias_mod:
            deps.add((mod.alias_mod[nm], None))
        elif nm in mod.objects:
            deps.add((mod.rel, nm))
    return deps


def closure(rel: str, name: str | None,
            extra_nodes: list[tuple[_Mod, ast.AST]] = ()) -> set[Dep]:
    """Transitive function-level dependency closure of one object,
    optionally seeded with extra (module, node) pairs (oracle SQL
    expressions)."""
    seen: set[Dep] = set()
    stack: list[Dep] = [(rel, name)]
    for m, nd in extra_nodes:
        stack.extend(_deps_of_node(m, nd))
    while stack:
        cur = stack.pop()
        if cur in seen:
            continue
        seen.add(cur)
        r, nm = cur
        if r == _ORACLE_DEP:
            # recurse into the aliased oracle's own expression deps
            for m2, nd in _oracle_seed(nm):
                stack.extend(_deps_of_node(m2, nd))
            continue
        if nm is None:
            continue
        m = _load(r)
        if m is None:
            continue
        nodes = m.objects.get(nm)
        if nodes is None:
            # attribute not a top-level object there → whole module
            seen.add((r, None))
            continue
        for nd in nodes:
            stack.extend(_deps_of_node(m, nd))
    return seen


# ----------------------------------------------------- fingerprints

@functools.lru_cache(maxsize=None)
def _mod_at(commit: str | None, rel: str) -> _Mod | None:
    """Parsed module at a commit, or at the worktree (commit=None) —
    cached so each (snapshot, module) parses exactly once."""
    if commit is None:
        p = REPO / rel
        src = p.read_text() if p.exists() else None
    else:
        src = _src_at(commit, rel)
    if src is None:
        return None
    try:
        return _Mod(rel, src)
    except SyntaxError:
        return None


@functools.lru_cache(maxsize=None)
def _fingerprint(commit: str | None, rel: str, name: str | None,
                 oracle_key: str | None = None) -> str:
    """Fingerprint one object (or whole module) in one snapshot;
    missing files/objects fingerprint as sentinels (≠ anything)."""
    m = _mod_at(commit, rel)
    if m is None:
        return f"<missing-file:{commit}>"
    if oracle_key is not None:
        nodes = m.oracle_nodes.get(oracle_key)
        return ("\n".join(_fp(n) for n in nodes)
                if nodes else "<missing-oracle>")
    if name is None:
        return _fp(m.tree)
    nodes = m.objects.get(name)
    return "\n".join(_fp(n) for n in nodes) if nodes else "<missing>"


@functools.lru_cache(maxsize=None)
def _plans_rels() -> tuple[str, ...]:
    return tuple(sorted(
        f"{PKG}/plans/{p.name}" for p in (PKG_DIR / "plans").glob("*.py")))


@functools.lru_cache(maxsize=None)
def _oracle_fp(commit: str | None, key: str) -> str:
    """Fingerprint of ORACLES[key]'s SQL expression(s) across all
    plans modules at one snapshot."""
    parts = []
    for rel in _plans_rels():
        m = _mod_at(commit, rel)
        if m is None:
            continue
        for nd in m.oracle_nodes.get(key, []):
            parts.append(_fp(nd))
    return "\n".join(parts) if parts else "<no-oracle>"


def _dep_changed(dep: Dep, commit: str,
                 oracle_key: str | None = None) -> bool:
    rel, name = dep
    if rel == _ORACLE_DEP:
        return _oracle_fp(None, name) != _oracle_fp(commit, name)
    return (_fingerprint(None, rel, name, oracle_key)
            != _fingerprint(commit, rel, name, oracle_key))


# -------------------------------------------------------- evidence

def _round_files() -> list[tuple[int, str]]:
    out = []
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", p.name)
        if m:
            out.append((int(m.group(1)), p.name))
    return sorted(out)


def _row_attests(row: dict, key: str, oracles: dict) -> bool:
    if row.get("hash_match"):
        return True
    # rows-only-by-design: the driver ran it and recorded rows; that
    # is the strongest row such an entry can ever have
    return row.get("err") == "no_oracle" and key not in oracles


def evidence(oracles: dict) -> dict[str, dict]:
    """Per entry: latest attesting round + commit, latest checked
    round (red rows count as checked, not attested)."""
    ev: dict[str, dict] = {}
    for rnd, fname in _round_files():
        try:
            data = json.loads((REPO / fname).read_text())
        except Exception:
            continue
        commit = _attest_commit(fname)
        for key, row in data.items():
            e = ev.setdefault(key, {"last_green_round": None,
                                    "attest_commit": None,
                                    "last_checked_round": None})
            e["last_checked_round"] = rnd
            if _row_attests(row, key, oracles) and commit:
                e["last_green_round"] = rnd
                e["attest_commit"] = commit
    return ev


# ------------------------------------------------------- top level

def _entry_target(func) -> tuple[str, str | None] | None:
    """(module relpath, function name) for a registered callable."""
    f = func
    while hasattr(f, "func"):  # functools.partial chains
        f = f.func
    mod = getattr(f, "__module__", "") or ""
    if not mod.startswith(PKG):
        return None
    rel = mod.replace(".", "/") + ".py"
    name = getattr(f, "__name__", None)
    if name == "<lambda>" or name is None:
        return (rel, None)
    return (rel, name)


def _oracle_seed(key: str) -> list[tuple[_Mod, ast.AST]]:
    """(module, value-node) pairs for this entry's ORACLES[key]
    assignments across all plans modules."""
    seeds = []
    for rel in _plans_rels():
        m = _load(rel)
        if m:
            for nd in m.oracle_nodes.get(key, []):
                seeds.append((m, nd))
    return seeds


def compute(queries: dict, oracles: dict) -> dict[str, dict]:
    """Freshness record per entry:
    last_green_round / attest_commit / last_checked_round /
    stale (bool) / changed (list of "module:object" that moved)."""
    ev = evidence(oracles)
    out: dict[str, dict] = {}
    for key, func in queries.items():
        rec = dict(ev.get(key, {"last_green_round": None,
                                "attest_commit": None,
                                "last_checked_round": None}))
        rec["stale"] = False
        rec["changed"] = []
        commit = rec["attest_commit"]
        if rec["last_green_round"] is not None and commit:
            target = _entry_target(func)
            if target is None:
                rec["stale"] = True
                rec["changed"] = ["<unresolvable-entry>"]
            else:
                deps = closure(*target, extra_nodes=_oracle_seed(key))
                if key in oracles:
                    deps.add((_ORACLE_DEP, key))
                changed = [f"{r}:{n or '*'}" for (r, n) in sorted(
                    deps, key=lambda d: (d[0], d[1] or ""))
                    if _dep_changed((r, n), commit)]
                if changed:
                    rec["stale"] = True
                    rec["changed"] = changed
        out[key] = rec
    return out


_SESSION_REL = f"{PKG}/session.py"


def plan_order(queries: dict, oracles: dict,
               pin_first: list[str] = ()) -> list[str]:
    """Driver-window order with zero hand-listed staleness:
    [manual pins] + [never checked] + [latest row red] + [stale
    greens] + [fresh greens, oldest attestation first].

    Stale greens are themselves prioritized: entries whose changed
    deps go beyond session.py (plan/operator/oracle rewrites — the
    class both the r3 and r4 verdicts caught going unattested) come
    before entries stale only through an engine-conf tweak, and
    within each class the oldest attestation goes first — so when the
    stale set exceeds the driver's ~50-entry window, the riskiest
    evidence refreshes first and the rest drains over rounds."""
    fresh = compute(queries, oracles)
    pins = [k for k in pin_first if k in queries]
    never, red, stale, green = [], [], [], []
    for k in queries:
        if k in pins:
            continue
        rec = fresh[k]
        if rec["last_checked_round"] is None:
            never.append(k)
        elif rec["last_green_round"] is None or (
                rec["last_checked_round"] > rec["last_green_round"]):
            red.append(k)
        elif rec["stale"]:
            stale.append(k)
        else:
            green.append(k)

    def conf_only(k: str) -> bool:
        return all(c.startswith(f"{_SESSION_REL}:")
                   for c in fresh[k]["changed"])

    stale.sort(key=lambda k: (conf_only(k),
                              fresh[k]["last_green_round"]))
    green.sort(key=lambda k: fresh[k]["last_green_round"])
    return pins + never + red + stale + green
