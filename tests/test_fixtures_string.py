"""String corpus conformance: slice + clip (direct and invert) against
the reference's 12 golden JSON fixtures (tests/string_tests.rs:15-45)."""

import pytest

from ioverlay_ray.geometry import string_ops
from ioverlay_ray.sources import fixtures


@pytest.mark.parametrize("index", range(fixtures.string_case_count()))
def test_string_case(index):
    case = fixtures.load_string_case(index)
    fr = case["fill_rule"]

    sliced = string_ops.slice_by_paths(case["body"], case["string"], fr)
    assert fixtures.shapes_one_of(sliced, case["slice"]), \
        f"slice mismatch case {index}"

    direct = string_ops.clip_paths(case["body"], case["string"], fr,
                                   invert=False, boundary_included=False)
    assert fixtures.paths_one_of(direct, case["clip_direct"]), \
        f"clip_direct mismatch case {index}: {direct}"

    inverted = string_ops.clip_paths(case["body"], case["string"], fr,
                                     invert=True, boundary_included=False)
    assert fixtures.paths_one_of(inverted, case["clip_invert"]), \
        f"clip_invert mismatch case {index}: {inverted}"
