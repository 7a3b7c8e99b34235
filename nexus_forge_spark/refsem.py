"""Pure-Python interpreter of the reference's record-at-a-time semantics.

Used as the EXPECTED side of differential tests and tools/parity_report.py:
the reference package itself is not installable here (hjson/rdflib/pyshacl
absent), so these ~100 lines re-state its documented behavior from scratch:

* _X / ref_apply_rules / ref_map — DictionaryMapper._map_one + _apply_rules
  (kgforge/specializations/mappers/dictionaries.py:31-62);
* demo_resolve — DemoResolver._resolve (…/resolvers/demo_resolver.py:41-110);
* _ForgeStub — the forge.format/resolve/attach surface rules call into.

flatten/_norm turn nested outputs into (case, path, value) fact sets for
set-comparison (bools/ints normalized so engine type widths don't matter).
"""

from __future__ import annotations

FORMATTERS = {"identifier": "https://kg.example.ch/{}/{}"}

EXACT = "EXACT_MATCH"
EXACT_CI = "EXACT_CASE_INSENSITIVE_MATCH"
BEST = "BEST_MATCH"
ALL = "ALL_MATCHES"


# ------------------------------------------------------------ expected side

class _X:
    """Attribute view over a record dict (the reference's wrap_dict,
    kgforge/core/commons/dictionaries.py): missing key -> AttributeError."""

    def __init__(self, d: dict):
        object.__setattr__(self, "_d", d)

    def __getattr__(self, k):
        try:
            v = self._d[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return _X(v) if isinstance(v, dict) else v


def demo_resolve(rows: list[dict], text: str, strategy: str,
                 props=("label", "acronym"), limit: int = 10):
    """DemoResolver._resolve semantics (demo_resolver.py:41-110)."""
    cands = []
    for i, r in enumerate(rows):
        if r.get("deprecated"):
            continue
        first = next((r[p] for p in props if r.get(p) is not None), None)
        if first is None:
            continue
        for po, p in enumerate(props):
            v = r.get(p)
            if v is None:
                continue
            if strategy == EXACT:
                hit = text == v
            elif strategy == EXACT_CI:
                hit = text.lower() == v.lower()
            else:
                hit = text.lower() in v.lower()
            if hit:
                score = 0.0 if strategy in (EXACT, EXACT_CI) else float(len(first) - len(text))
                cands.append((score, i, po, r))
    cands.sort(key=lambda c: (c[0], c[1], c[2]))  # stable: dict order ties
    if not cands:
        return None if strategy != ALL else []
    shaped = []
    seen = set()
    for score, i, po, r in cands:
        if i in seen:
            continue
        seen.add(i)
        shaped.append(
            ({"id": r["id"], "type": r.get("type"), "label": r.get("label")}, score, len(shaped) + 1)
        )
    if strategy == ALL:
        return shaped[:limit]
    return shaped[0]


class _ForgeStub:
    """forge.* surface available inside mapping rules."""

    def __init__(self, dicts: dict):
        self._dicts = dicts

    def format(self, name: str, *args) -> str:
        return FORMATTERS[name].format(*args)

    def resolve(self, text, scope=None, target=None, type=None, strategy=BEST):
        rows = self._dicts.get((scope, target)) or self._dicts.get((scope, None))
        if rows is None or text is None:
            return None
        hit = demo_resolve(rows, str(text), strategy)
        if hit is None or hit == []:
            return None
        return hit[0] if isinstance(hit, tuple) else [h[0] for h in hit]

    def attach(self, path, content_type=None):
        # LazyAction executed at register time -> distribution record
        # (core/forge.py:798-809, commons/actions.py:62-113)
        return {"type": "DataDownload", "contentUrl": path, "encodingFormat": content_type}


def ref_apply_rules(value, variables):
    """_apply_rules (dictionaries.py:51-62): recursive walk, leaf = eval with
    literal fallback on TypeError/NameError/SyntaxError only."""
    if isinstance(value, dict):
        return {k: ref_apply_rules(v, variables) for k, v in value.items()}
    if isinstance(value, list):
        return [ref_apply_rules(v, variables) for v in value]
    if isinstance(value, str):
        try:
            return eval(value, dict(variables))  # noqa: S307 — the reference's own mechanism
        except (TypeError, NameError, SyntaxError):
            return value
    return value


def ref_map(record: dict, rules: dict, forge: _ForgeStub) -> dict:
    return ref_apply_rules(rules, {"x": _X(record), "forge": forge})


# ------------------------------------------------------------ fact algebra

def _norm(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v == int(v):
        return str(int(v))
    return str(v)


def flatten(case: str, v, path: str, out: set):
    if isinstance(v, dict):
        for k, sv in v.items():
            flatten(case, sv, f"{path}.{k}" if path else k, out)
    elif isinstance(v, (list, tuple)):
        for i, sv in enumerate(v):
            flatten(case, sv, f"{path}[{i}]", out)
    elif v is not None:
        out.add((case, path, _norm(v)))




# ---------------------------------------------------- Dataset PROV helpers

PROV_SPECS = {
    "contribution": ("Contribution", "agent", "Agent", ["id", "type"]),
    "generation": ("Generation", "activity", "Activity", ["id", "type"]),
    "derivation": ("Derivation", "entity", "Entity", ["id", "type", "name"]),
    "invalidation": ("Invalidation", "activity", "Activity", ["id", "type"]),
}


def ref_set(dataset: dict, attr: str, data) -> None:
    """_set accumulation (specializations/resources/datasets.py:190-205)."""
    if attr in dataset:
        value = dataset[attr]
        if isinstance(value, list):
            value.extend(data) if isinstance(data, list) else value.append(data)
        else:
            dataset[attr] = [value, *data] if isinstance(data, list) else [value, data]
    else:
        dataset[attr] = data


def ref_reshape(resource: dict, keep: list[str], versioned: bool) -> dict:
    """forge.reshape on a dict (core/reshaping.py:35-78): keep present
    dotted paths; versioned rewrites id -> id?_version=<_rev>."""
    out: dict = {}
    for path in keep:
        node, src = out, resource
        parts = path.split(".")
        ok = True
        for p in parts[:-1]:
            if not isinstance(src, dict) or p not in src:
                ok = False
                break
            src = src[p]
            node = node.setdefault(p, {})
        leaf = parts[-1]
        if not ok or not isinstance(src, dict) or leaf not in src:
            continue
        v = src[leaf]
        if leaf == "id" and versioned:
            v = f"{v}?_version={resource['_rev']}"
        node[leaf] = v
    return out


def ref_add_prov(dataset: dict, attr: str, resource, versioned=True, **kwargs) -> dict:
    """_add_prov_property + _set (datasets.py:66-124)."""
    prov_type, ref_prop, ref_type, keep = PROV_SPECS[attr]
    if isinstance(resource, str):
        if versioned:
            raise ValueError("resource:str requires versioned=False")
        reference = {"type": ref_type, "id": resource}
    else:
        reference = ref_reshape(resource, keep, versioned)
    node = {"type": prov_type, **kwargs, ref_prop: reference}
    ref_set(dataset, attr, node)
    return dataset


def ref_add_parts(dataset: dict, parts: list[dict], versioned=True) -> dict:
    """add_parts (datasets.py:42-47)."""
    keep = ["id", "type", "name", "distribution.contentUrl"]
    ref_set(dataset, "hasPart", [ref_reshape(p, keep, versioned) for p in parts])
    return dataset
