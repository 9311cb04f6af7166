"""Edge-granularity overlay with user data propagation (the UDF hook)."""

from ioverlay_ray.geometry.edge_overlay import EdgeDataOps, edge_overlay


def rect_edges(x0, y0, x1, y1, tag):
    pts = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
    return [(pts[i - 1], pts[i], frozenset([tag])) for i in range(4)]


UNION_OPS = EdgeDataOps(
    merge=lambda ld, lc, rd, rc, oc: ld | rd)


def test_data_survives_split():
    subj = rect_edges(0, 0, 10, 10, "A")
    clip = rect_edges(5, 5, 15, 15, "B")
    out = edge_overlay(subj, clip, "union", "nonzero", UNION_OPS)
    assert out
    tags = set()
    for ax, ay, bx, by, fill, data in out:
        assert isinstance(data, frozenset)
        tags |= data
        # every split sub-edge keeps a provenance tag
        assert data
    assert tags == {"A", "B"}


def test_shared_edge_merges_data():
    # two squares sharing the full edge x=10: the shared edge collapses
    # and its payload is the union of both provenances
    subj = rect_edges(0, 0, 10, 10, "L")
    clip = rect_edges(10, 0, 20, 10, "R")
    out = edge_overlay(subj, clip, "union", "nonzero", UNION_OPS)
    shared = [d for ax, ay, bx, by, f, d in out
              if ax == 10 and bx == 10]
    # the shared boundary is interior to the union -> excluded by the
    # rule mask; check the separate-vector path instead via subject rule
    out_subj = edge_overlay(subj, clip, "subject", "nonzero", UNION_OPS)
    shared = [d for ax, ay, bx, by, f, d in out_subj
              if ax == 10 and bx == 10]
    assert shared and shared[0] == {"L", "R"}


def test_reversed_callback_applied():
    seen = []
    ops = EdgeDataOps(
        merge=lambda ld, lc, rd, rc, oc: ld,
        reversed=lambda d: (seen.append(d) or d))
    # edge given right-to-left must be direction-normalized -> reversed()
    subj = [((10, 0), (0, 0), "x"), ((10, 10), (10, 0), "y"),
            ((0, 10), (10, 10), "z"), ((0, 0), (0, 10), "w")]
    edge_overlay(subj, [], "subject", "nonzero", ops)
    assert seen  # at least one edge was normalized


def test_split_callback_ctx():
    ctxs = []

    def split(ctx, d):
        ctxs.append(ctx)
        return d + "_l", d + "_r"

    ops = EdgeDataOps(merge=lambda ld, lc, rd, rc, oc: ld, split=split)
    # crossing rectangles force splits on the boundary edges
    subj = rect_edges(0, 0, 10, 10, "A")
    subj = [(a, b, "A") for a, b, _ in subj]
    clip = [(a, b, "B") for a, b, _ in rect_edges(5, -5, 15, 5, "B")]
    out = edge_overlay(subj, clip, "xor", "nonzero", ops)
    assert ctxs  # splits happened
    assert any(str(d).endswith(("_l", "_r")) for *_, d in out)
