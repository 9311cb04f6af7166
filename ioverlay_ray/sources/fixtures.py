"""Golden-fixture conformance corpus loader + comparison.

Loads the reference's JSON test corpora (boolean: 162 cases, string: 12
cases — tests/data.rs:25-60) and reimplements the rotation-invariant,
variant-tolerant comparison (tests/util.rs:8-71): a contour matches
under any cyclic shift; a result passes if it equals any listed variant;
shape and hole ORDER must match exactly.
"""

from __future__ import annotations

import json
import os
from typing import List

BOOLEAN_DIR = "/root/reference/iOverlay/tests/boolean"
STRING_DIR = "/root/reference/iOverlay/tests/string"

BOOLEAN_RULE_KEYS = ["subject", "clip", "intersect", "union", "difference",
                     "inverseDifference", "xor"]


def load_boolean_case(index: int, base_dir: str = BOOLEAN_DIR) -> dict:
    with open(os.path.join(base_dir, f"test_{index}.json")) as f:
        d = json.load(f)
    fill = d.get("fillRule")
    d["fill_rule"] = {None: "evenodd", 0: "evenodd", 1: "nonzero"}[fill]
    d["subj"] = [[tuple(p) for p in c] for c in d["subjPaths"]]
    d["clip_paths"] = [[tuple(p) for p in c] for c in d["clipPaths"]]
    return d


def boolean_case_count(base_dir: str = BOOLEAN_DIR) -> int:
    return len([n for n in os.listdir(base_dir) if n.endswith(".json")])


def _maybe_json(v):
    return json.loads(v) if isinstance(v, str) else v


def load_string_case(index: int, base_dir: str = STRING_DIR) -> dict:
    """String corpus case (tests/string/test_N.json): keys fillRule,
    body (one shape = list of contours), string (list of open paths),
    slice / clip_direct / clip_invert (lists of acceptable variants)."""
    with open(os.path.join(base_dir, f"test_{index}.json")) as f:
        d = json.load(f)
    fill = d.get("fillRule")
    out = {
        "fill_rule": {None: "evenodd", 0: "evenodd", 1: "nonzero"}[fill],
        "body": [[tuple(p) for p in c] for c in _maybe_json(d["body"])],
        "string": [[tuple(p) for p in c] for c in _maybe_json(d["string"])],
        "slice": [[[[tuple(p) for p in c] for c in s] for s in variant]
                  for variant in _maybe_json(d["slice"])],
        "clip_direct": [[[tuple(p) for p in path] for path in variant]
                        for variant in _maybe_json(d["clip_direct"])],
        "clip_invert": [[[tuple(p) for p in path] for path in variant]
                        for variant in _maybe_json(d["clip_invert"])],
    }
    return out


def string_case_count(base_dir: str = STRING_DIR) -> int:
    return len([n for n in os.listdir(base_dir) if n.endswith(".json")])


def paths_equal(a: List, b: List) -> bool:
    """Exact polyline list equality (tests/util.rs:75-83)."""
    return [[tuple(p) for p in path] for path in a] == \
           [[tuple(p) for p in path] for path in b]


def paths_one_of(result: List, variants: List) -> bool:
    return any(paths_equal(result, v) for v in variants)


def contours_equal_cyclic(a: List, b: List) -> bool:
    if len(a) != len(b):
        return False
    n = len(a)
    if n == 0:
        return True
    a = [tuple(p) for p in a]
    b = [tuple(p) for p in b]
    first = b[0]
    for shift in range(n):
        if a[shift] != first:
            continue
        if all(a[(i + shift) % n] == b[i] for i in range(n)):
            return True
    return False


def shapes_equal(a: List, b: List) -> bool:
    if len(a) != len(b):
        return False
    for s0, s1 in zip(a, b):
        if len(s0) != len(s1):
            return False
        for c0, c1 in zip(s0, s1):
            if not contours_equal_cyclic(c0, c1):
                return False
    return True


def shapes_one_of(result: List, variants: List) -> bool:
    return any(shapes_equal(result, v) for v in variants)
