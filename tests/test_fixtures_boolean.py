"""Golden-fixture conformance: the reference's executed boolean corpus.

The reference runner (tests/overlay_tests.rs:17-50) executes fixture
indices 0..143 and 150..152 under all solver strategies; fixtures
144-149 and 153-161 exist on disk but are not part of its suite (their
expectations are inconsistent with their inputs), so we pin the same
executed set. All 7 overlay rules per case, output_direction=Clockwise
(matching the runner's options), rotation-invariant variant-tolerant
compare (tests/util.rs:8-71).
"""

import pytest

from ioverlay_ray.geometry.overlay import build_graph
from ioverlay_ray.sources import fixtures

EXECUTED = list(range(144)) + [150, 151, 152]


@pytest.mark.parametrize("index", EXECUTED)
def test_boolean_fixture(index):
    case = fixtures.load_boolean_case(index)
    graph = build_graph(case["subj"], case["clip_paths"], case["fill_rule"],
                        clockwise=True)
    for key in fixtures.BOOLEAN_RULE_KEYS:
        if key not in case:
            continue
        rule = key.lower().replace("inversedifference", "inverse_difference")
        result = graph.extract(rule) if graph else []
        assert fixtures.shapes_one_of(result, case[key]), (
            f"fixture {index} rule {key} mismatch")
