"""Distributed connected components over an edge Dataset.

The missing last step of every near-duplicate pipeline: LSH/SimHash/
embedding candidate PAIRS -> duplicate CLUSTERS (label every doc with
the min doc_id of its component; keep one representative per cluster).

Why raw actors and not Dataset groupbys: label propagation is an
ITERATIVE algorithm with shared mutable state (the label table) — the
one shape the Dataset API genuinely can't express. A Dataset version
costs two sort-shuffle barriers per round (~tens of seconds of fixed
overhead each on small data, a full materialized exchange per round on
big data); the BSP form here keeps labels sharded across
``num_partitions`` actors and moves only the per-round messages,
peer-to-peer through the object store (the driver routes object REFS
between shards — ``num_returns=P`` remote calls + a transpose — and
never touches data).

Round structure (min-label propagation with pointer doubling, the
shortcutting idea of Kiveris et al., "Connected Components in
MapReduce and Beyond"):

- phase1: every shard emits, per destination shard, (a) edge messages
  ``label(u) -> v`` for its edges ``u->v`` and (b) doubling queries
  ``who is label(label(v))?`` addressed to the shard owning
  ``label(v)``.
- phase2: shards stash incoming edge messages and answer the doubling
  queries from their local label table, emitting replies to the
  querying node's shard.
- fold: min over {current label} u {edge messages} u {doubling
  replies} per node; returns the shard's changed count so the driver
  can stop when a round changes nothing.

Labels only decrease, and doubling halves the pointer depth each
round, so chains converge in O(log diameter) rounds instead of
O(diameter). Every label value is a node id that owns a label row
(init labels are incident node ids; propagated labels are prior
labels), so doubling lookups always hit.

Scale shape: node ids hash-shard every structure (hot nodes spread
because bucketing is on the mixed hash); per-shard work per round is a
few vectorized searchsorted/min-reduceat passes — no Python loop per
node; the driver only ever sees per-round changed counts and object
refs. No whole-graph materialization anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

_EMPTY = np.empty(0, np.int64)


def _mix_part(ids: np.ndarray, num_parts: int) -> np.ndarray:
    h = ids.astype(np.int64).view(np.uint64).copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    return (h % np.uint64(num_parts)).astype(np.int64)


def _split_by_part(part: np.ndarray, arrays: list[np.ndarray],
                   num_parts: int) -> list[tuple[np.ndarray, ...]]:
    """Sort rows by ``part`` and cut into ``num_parts`` slices."""
    order = np.argsort(part, kind="stable")
    part_s = part[order]
    sorted_arrays = [a[order] for a in arrays]
    bounds = np.searchsorted(part_s, np.arange(num_parts + 1))
    return [tuple(a[bounds[p]:bounds[p + 1]] for a in sorted_arrays)
            for p in range(num_parts)]


@ray.remote
def _route_edges(block: pa.Table, num_parts: int):
    """Symmetrize one edge block and split it by src shard (the one
    ingest exchange — peer-to-peer via the object store)."""
    if block.num_rows == 0:  # schema-less empty blocks from unions
        s = d = _EMPTY
    else:
        s = block.column("src").to_numpy().astype(np.int64)
        d = block.column("dst").to_numpy().astype(np.int64)
    src = np.concatenate([s, d])
    dst = np.concatenate([d, s])
    parts = _split_by_part(_mix_part(src, num_parts), [src, dst], num_parts)
    out = [pa.table({"src": pa.array(ps, pa.int64()),
                     "dst": pa.array(pd, pa.int64())})
           for ps, pd in parts]
    return out[0] if num_parts == 1 else tuple(out)


@ray.remote(num_cpus=0, scheduling_strategy="SPREAD")
class _CCShard:
    """One label-table shard. Owns every node whose mixed hash lands
    in this partition; holds its incident (symmetrized) edges.

    num_cpus=0: shards spend their life blocked between rounds and do
    only microseconds-scale vectorized work per call; reserving a CPU
    per shard would deadlock the routing tasks they wait on whenever
    num_partitions >= cluster CPUs (and would waste cores between
    rounds). SPREAD keeps the label table sharded across nodes on a
    real cluster."""

    def __init__(self, part: int, num_parts: int):
        self.part = part
        self.P = num_parts
        self.ids = _EMPTY          # sorted unique owned node ids
        self.lab = _EMPTY          # current label per owned node
        self.e_src_idx = _EMPTY    # edge source, as index into ids
        self.e_dst = _EMPTY        # edge destination (global id)
        self.e_dst_part = _EMPTY   # precomputed owner of e_dst
        self._stash: list[tuple[np.ndarray, np.ndarray]] = []

    def ingest(self, *blocks: pa.Table) -> int:
        src = np.concatenate(
            [b.column("src").to_numpy().astype(np.int64) for b in blocks]
        ) if blocks else _EMPTY
        dst = np.concatenate(
            [b.column("dst").to_numpy().astype(np.int64) for b in blocks]
        ) if blocks else _EMPTY
        self.ids = np.unique(src)
        self.e_src_idx = np.searchsorted(self.ids, src).astype(np.int64)
        self.e_dst = dst
        self.e_dst_part = _mix_part(dst, self.P)
        # init label: min incident neighbour (dst side), floored by the
        # node's own id — one vectorized min-reduce over sorted edges
        lab = self.ids.copy()
        if len(src):
            order = np.argsort(self.e_src_idx, kind="stable")
            si = self.e_src_idx[order]
            dv = dst[order]
            starts = np.flatnonzero(
                np.concatenate(([True], si[1:] != si[:-1])))
            mins = np.minimum.reduceat(dv, starts)
            np.minimum.at(lab, si[starts], mins)
        self.lab = lab
        return len(self.ids)

    def _lookup(self, nodes: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self.ids, nodes)
        assert len(self.ids) and (pos < len(self.ids)).all() \
            and (self.ids[np.minimum(pos, len(self.ids) - 1)]
                 == nodes).all(), "label lookup for a non-owned node"
        return self.lab[pos]

    def phase1(self):
        """Emit per-shard (edge-message dst, edge-message label,
        query node, query label) quadruples."""
        m_dst = self.e_dst
        m_lab = self.lab[self.e_src_idx]
        q_node = self.ids
        q_lab = self.lab
        msg_parts = _split_by_part(self.e_dst_part, [m_dst, m_lab], self.P)
        qry_parts = _split_by_part(_mix_part(q_lab, self.P),
                                   [q_node, q_lab], self.P)
        out = [msg_parts[p] + qry_parts[p] for p in range(self.P)]
        return out[0] if self.P == 1 else tuple(out)

    def phase2(self, *inbox):
        """Stash edge messages; answer doubling queries; emit replies
        (node, label(label(node))) back to each node's shard."""
        r_node: list[np.ndarray] = []
        r_lab: list[np.ndarray] = []
        for m_dst, m_lab, q_node, q_lab in inbox:
            if len(m_dst):
                self._stash.append((m_dst, m_lab))
            if len(q_node):
                r_node.append(q_node)
                r_lab.append(self._lookup(q_lab))
        node = np.concatenate(r_node) if r_node else _EMPTY
        lab = np.concatenate(r_lab) if r_lab else _EMPTY
        parts = _split_by_part(_mix_part(node, self.P), [node, lab], self.P)
        return parts[0] if self.P == 1 else tuple(parts)

    def fold(self, *inbox) -> int:
        """Min-fold stashed edge messages + doubling replies into the
        label table; return this shard's changed-node count."""
        cand = self._stash + [t for t in inbox if len(t[0])]
        self._stash = []
        if not cand:
            return 0
        nodes = np.concatenate([c[0] for c in cand])
        labs = np.concatenate([c[1] for c in cand])
        new = self.lab.copy()
        np.minimum.at(new, np.searchsorted(self.ids, nodes), labs)
        changed = int(np.count_nonzero(new < self.lab))
        self.lab = new
        return changed

    def labels_table(self) -> pa.Table:
        return pa.table({"id": pa.array(self.ids, pa.int64()),
                         "label": pa.array(self.lab, pa.int64())})


def connected_components(edges, num_partitions: int = 16,
                         max_iters: int = 64):
    """Edge Dataset (``src``, ``dst`` int64) -> label Dataset
    (``id``, ``label``) with ``label`` = min node id of the component.

    Only nodes incident to an edge appear in the output; callers that
    want isolated nodes labelled include self-loop edges (see
    ``pipelines/relational.q_neardup_clusters``).
    """
    import ray.data

    P = num_partitions
    blocks = edges.to_arrow_refs()
    routed = [_route_edges.options(num_returns=P if P > 1 else None)
              .remote(b, P) for b in blocks]
    if P == 1:
        routed = [[r] for r in routed]
    shards = [_CCShard.remote(i, P) for i in range(P)]
    sizes = ray.get([shards[i].ingest.remote(*[routed[b][i]
                                               for b in range(len(blocks))])
                     for i in range(P)])
    if sum(sizes) == 0:
        return ray.data.from_arrow(
            pa.table({"id": pa.array([], pa.int64()),
                      "label": pa.array([], pa.int64())}))
    live = [i for i in range(P) if sizes[i]]
    changed = None  # max_iters=0 => explicit "no rounds", init labels
    for _ in range(max_iters):
        o1 = {i: shards[i].phase1.options(
            num_returns=P if P > 1 else None).remote() for i in live}
        if P == 1:
            o1 = {i: [r] for i, r in o1.items()}
        o2 = {i: shards[i].phase2.options(
            num_returns=P if P > 1 else None).remote(
                *[o1[j][i] for j in live]) for i in live}
        if P == 1:
            o2 = {i: [r] for i, r in o2.items()}
        changed = ray.get([shards[i].fold.remote(*[o2[j][i] for j in live])
                           for i in live])
        if sum(changed) == 0:
            break
    else:
        if changed is not None and sum(changed):
            raise RuntimeError(
                f"connected_components did not converge in {max_iters} "
                f"rounds (last round still changed {sum(changed)} "
                "labels); raise max_iters — labels would be wrong")
    return ray.data.from_arrow_refs(
        [shards[i].labels_table.remote() for i in live])
