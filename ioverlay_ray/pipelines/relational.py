"""Relational + training-data query pipelines over the test tables.

Every function takes sf_dir and returns a small pandas DataFrame, and
is built Ray-Data-first: pruned-column read_parquet -> vectorized
map_batches partial aggregation -> one small groupby / driver-side
finalize. Monetary aggregates are returned as integer cents so results
hash identically to the DuckDB oracles in __ray_entry__.oracle_sql.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data


def _read(sf_dir: str, table: str, columns=None,
          num_blocks: int | None = None) -> "ray.data.Dataset":
    # the test tables are single-row-group files; without an explicit
    # block target Ray reads each as ONE block and every downstream
    # map stage becomes a single task.  The auto block count follows
    # BOTH the cluster (>= CPUs tasks) and the data (blocks bounded to
    # ~16 MB of file bytes): count-only blocks let a big corpus hand
    # each worker a 50+ MB text slice, and Python-object stages (gram
    # explosion) then degrade super-linearly in GC/heap churn — the
    # 4M-doc curation rehearsal measured 120 s at 8 cpus with 8 blocks
    # vs ~70 s with byte-bounded blocks.
    path = os.path.join(sf_dir, f"{table}.parquet")
    if num_blocks is None:
        size = os.path.getsize(path)
        cpus = int(ray.cluster_resources().get("CPU", 8))
        # one block per ~MB up to the cluster width (tiny tables stay
        # at 8 blocks — more tasks than data is pure overhead), and
        # never let a block exceed ~16 MB of file bytes (oversized
        # text slices degrade Python-object stages super-linearly)
        num_blocks = max(8, min(cpus, size >> 20), size >> 24)
    return ray.data.read_parquet(path, columns=columns,
                                 override_num_blocks=num_blocks)


def _small_table(sf_dir: str, table: str, columns=None,
                 filters=None) -> pa.Table:
    """Driver-side read of a dimension table (broadcast side). Pass
    ``filters`` for point/range lookups on big tables — the predicate
    pushes down to row-group pruning, so the driver never holds more
    than the matching rows (at 100 TB a key-partitioned layout makes
    this a few file reads, not a scan)."""
    return pq.read_table(os.path.join(sf_dir, f"{table}.parquet"),
                         columns=columns, filters=filters)


def _query_vectors(sf_dir: str, n: int) -> pd.DataFrame:
    """The first-n-vec_ids query/init matrix every ANN / k-means entry
    uses: a pushdown-filtered read (vec_id < n), never the whole
    embeddings table on the driver."""
    qt = _small_table(sf_dir, "embeddings", ["vec_id", "embedding"],
                      filters=[("vec_id", "<", n)])
    return qt.to_pandas().sort_values("vec_id")


def _embedding_dim(sf_dir: str) -> int:
    """Embedding dimensionality from ONE row (first record batch of
    the first row group), not a full driver read."""
    pf = pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet"))
    first = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    return len(first.column("embedding")[0].as_py())

def _conc(compute_bound: bool = False):
    """Actor-pool width for the stages that still want a PINNED pool
    (most query stages moved to stages/util.stage_fn task pools — the
    per-call actor spin-up costs 1.3-1.7 s on this host). Mixed
    pipelines cap at a quarter of the CPUs as backpressure;
    compute-dominated stages autoscale (min 2, max cpus-2)."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8))
    if compute_bound:
        return (2, max(2, cpus - 2))
    return min(8, max(2, cpus // 4))



# ---------------------------------------------------------------------------
# Core relational operators
# ---------------------------------------------------------------------------

def q_events_distinct_users(sf_dir: str) -> pd.DataFrame:
    """COUNT(DISTINCT) per group, 100-TB shaped: per-batch partial
    dedup shrinks the stream before the wire, ONE hash exchange on the
    full (event_type, user_id) pair (hash_aggregate buckets on the pair
    hash, so one event_type's users spread over all partitions — a hot
    group cannot pin a worker), then a tiny per-type sum of per-bucket
    distinct counts. Exact, not a sketch; the sketch variant (HLL)
    would replace only the exchange payload."""
    from ..stages.agg import hash_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[["event_type", "user_id"]] \
            .drop_duplicates()
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    pairs = ds.map_batches(partial, batch_format="pyarrow")
    # one exchange: distinct pairs via min-aggregate on the pair itself
    uniq = hash_aggregate(pairs, ["event_type", "user_id"],
                          {"one": ("user_id", "min")})

    def count_per_type(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("event_type", as_index=False) \
            .agg(n_users=("user_id", "size"))
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    parts = uniq.map_batches(count_per_type,
                             batch_format="pyarrow").to_pandas()
    out = parts.groupby("event_type", as_index=False)["n_users"].sum()
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


def q_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-style groupby aggregate with per-batch partial combine."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["base"] = df["l_extendedprice"]
        df["disc"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"), sum_base=("base", "sum"),
            sum_disc=("disc", "sum"), count_order=("l_quantity", "size"))
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
        sum_qty=("sum_qty", "sum"), sum_base=("sum_base", "sum"),
        sum_disc=("sum_disc", "sum"), count_order=("count_order", "sum"))
    out["sum_qty"] = out["sum_qty"].round().astype(np.int64)
    out["sum_base_cents"] = (out["sum_base"] * 100).round().astype(np.int64)
    out["sum_disc_cents"] = (out["sum_disc"] * 100).round().astype(np.int64)
    out["count_order"] = out["count_order"].astype(np.int64)
    return out[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents",
                "sum_disc_cents", "count_order"]]


def q_top_orders(sf_dir: str) -> pd.DataFrame:
    """Filter + global top-10 via per-block partial top-k (no global
    sort shuffle: only 10 rows leave each block)."""
    from ..stages.topk import global_topk
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderstatus", "o_totalprice"])
    ds = ds.filter(expr="o_orderstatus == 'O'")
    top = global_topk(ds, "o_totalprice", 10, descending=True,
                      tie_cols=["o_orderkey"])
    top["total_cents"] = (top["o_totalprice"] * 100).round().astype(np.int64)
    return top[["o_orderkey", "total_cents"]]


def q_nation_customers(sf_dir: str) -> pd.DataFrame:
    """Broadcast join: nation dim shipped once via ray.put, customer
    table streams; partial counts then a tiny groupby."""
    nation = _small_table(sf_dir, "nation", ["n_nationkey", "n_name"])
    lookup = dict(zip(nation.column("n_nationkey").to_pylist(),
                      nation.column("n_name").to_pylist()))
    lookup_ref = ray.put(lookup)

    class CountPerNation:
        def __init__(self, ref):
            lookup = ray.get(ref)
            self.key_arr = np.array(sorted(lookup), dtype=np.int64)
            self.names_sorted = np.array(
                [lookup[k] for k in self.key_arr], dtype=object)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = np.asarray(batch.column("c_nationkey"), dtype=np.int64)
            # keys are small ints (nation dim); bincount then map count
            # slots to names via the sorted key array — no per-row dict
            counts = np.bincount(keys, minlength=int(self.key_arr[-1]) + 1)
            present = np.nonzero(counts)[0]
            names = self.names_sorted[np.searchsorted(self.key_arr, present)]
            return pa.table({
                "n_name": pa.array(names.tolist(), pa.string()),
                "num_customers": pa.array(counts[present], pa.int64())})

    from ..stages.util import stage_fn
    ds = _read(sf_dir, "customer", ["c_nationkey"])
    parts = ds.map_batches(stage_fn(CountPerNation, lookup_ref),
                           batch_format="pyarrow").to_pandas()
    out = parts.groupby("n_name", as_index=False)["num_customers"].sum()
    out["num_customers"] = out["num_customers"].astype(np.int64)
    return out


def q_order_revenue_topk(sf_dir: str) -> pd.DataFrame:
    """lineitem revenue per order (partial combine + groupby sum), then
    broadcast-join order attributes; top 20 by revenue."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["rev"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        g = df.groupby("l_orderkey", as_index=False)["rev"].sum()
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    from ..stages.agg import hash_aggregate
    from ..stages.topk import global_topk
    parts = ds.map_batches(partial, batch_format="pyarrow")
    rev_ds = hash_aggregate(parts, ["l_orderkey"],
                            {"revenue": ("rev", "sum")})
    # top-20 via per-block partial top-k: only 20 rows leave each
    # aggregate block, never one-row-per-orderkey to the driver
    rev = global_topk(rev_ds, "revenue", 20, descending=True,
                      tie_cols=["l_orderkey"])
    # attach attributes for the 20 winners only: pushdown key-filtered
    # read, never the whole orders table driver-side
    keys = [int(k) for k in rev["l_orderkey"]]
    orders = _small_table(sf_dir, "orders",
                          ["o_orderkey", "o_orderpriority"],
                          filters=[("o_orderkey", "in", keys)]).to_pandas()
    out = rev.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    out["revenue_cents"] = (out["revenue"] * 100).round().astype(np.int64)
    return out[["o_orderkey", "o_orderpriority", "revenue_cents"]]


def q_part_brands(sf_dir: str) -> pd.DataFrame:
    """Distinct/groupby-count over a categorical column."""
    ds = _read(sf_dir, "part", ["p_brand"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("p_brand", as_index=False).size()
        df.columns = ["p_brand", "n_parts"]
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("p_brand", as_index=False)["n_parts"].sum()
    out["n_parts"] = out["n_parts"].astype(np.int64)
    return out


def q_events_daily(sf_dir: str) -> pd.DataFrame:
    """Windowed (daily) aggregate per event type."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
        g = df.groupby(["day", "event_type"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"))
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby(["day", "event_type"], as_index=False).agg(
        n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
    out["n_events"] = out["n_events"].astype(np.int64)
    out["value_cents"] = (out["sum_value"] * 100).round().astype(np.int64)
    return out[["day", "event_type", "n_events", "value_cents"]]


# ---------------------------------------------------------------------------
# Training-data operators (documents / embeddings)
# ---------------------------------------------------------------------------

def q_doc_dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: hash-partition by content key, keep min doc_id."""
    from ..stages.dedup import exact_key_stage
    from ..stages.agg import hash_aggregate
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    keyed = ds.map_batches(exact_key_stage, batch_format="pyarrow")
    kept = hash_aggregate(keyed, ["content_key"],
                          {"doc_id": ("doc_id", "min")}).to_pandas()
    out = kept[["doc_id"]].sort_values("doc_id").reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out


def dedup_state_dir(sf_dir: str) -> str:
    """Deterministic persisted-state location for incremental dedup —
    a stable md5 digest of the corpus path (NOT builtin hash(), which
    is randomized per process via PYTHONHASHSEED), so the wave-1 state
    is reachable from any process and no per-process dirs leak."""
    import tempfile
    sf_tag = hashlib.md5(
        os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    return os.path.join(
        tempfile.gettempdir(), f"ioverlay_dedup_state_{sf_tag}")


def q_incremental_dedup(sf_dir: str) -> pd.DataFrame:
    """INCREMENTAL ingest dedup — the shape a 100-TB pipeline actually
    runs (corpora arrive in waves; rescanning history per wave is
    O(corpus) instead of O(wave)): wave 1 (doc_id < cut) deduplicates
    and PERSISTS its (content_key, min doc_id) state as
    hash-partitioned parquet; wave 2 deduplicates against the
    persisted state by unioning its keyed rows with the state READ
    (never wave 1's texts) into one min-aggregate. The final kept set
    provably equals the one-shot dedup (min per key is associative),
    which is exactly what the SQL oracle computes over the full
    corpus."""
    import shutil

    from ..stages.agg import hash_aggregate
    from ..stages.dedup import exact_key_stage

    cut = int(_read(sf_dir, "documents", ["doc_id"])
              .max("doc_id")) // 2 + 1
    state_dir = dedup_state_dir(sf_dir)
    shutil.rmtree(state_dir, ignore_errors=True)

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    keyed = docs.map_batches(exact_key_stage, batch_format="pyarrow")

    # wave 1: dedup + persist state (the resumable artifact)
    w1 = keyed.filter(expr=f"doc_id < {cut}")
    hash_aggregate(w1, ["content_key"], {"doc_id": ("doc_id", "min")}) \
        .write_parquet(state_dir)

    # wave 2: dedup against the persisted state only
    w2 = keyed.filter(expr=f"doc_id >= {cut}")
    state = ray.data.read_parquet(state_dir)
    merged = hash_aggregate(
        w2.union(state), ["content_key"],
        {"doc_id": ("doc_id", "min")}).to_pandas()
    out = merged[["doc_id"]].sort_values("doc_id").reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out


def q_doc_decontaminate(sf_dir: str, n: int = 8) -> pd.DataFrame:
    """Benchmark n-gram decontamination: flag corpus documents sharing
    any whitespace 8-gram with the benchmark subset (doc_id % 23 == 0
    stands in for the held-out eval sets). Small side broadcast once
    via ray.put + per-worker set (stages/dedup.DecontaminateStage);
    the corpus side is one shuffle-free scan."""
    from ..stages.dedup import DecontaminateStage, benchmark_grams
    from ..stages.util import stage_fn
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def bench_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"))
        return batch.filter(pa.array((ids % 23) == 0))

    bench_texts = [r["text"] for r in
                   ds.map_batches(bench_rows,
                                  batch_format="pyarrow").take_all()]
    bench_ref = ray.put(benchmark_grams(bench_texts, n))

    def corpus_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"))
        return batch.filter(pa.array((ids % 23) != 0))

    out = (ds.map_batches(corpus_rows, batch_format="pyarrow")
           .map_batches(stage_fn(DecontaminateStage, bench_ref, n),
                        batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_doc_tfidf_terms(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Distributed TF-IDF top-k terms per document (training-data
    keyword extraction / term-importance filter), 100-TB shaped:

    1. (doc_id, term, tf) rows per batch (vectorized Counter rows);
    2. document frequency via ONE hash exchange over the term key
       (hash_aggregate count of distinct doc-term rows);
    3. tf rows join df through a second term-hash exchange (tagged
       union + per-partition vectorized merge — both sides partition
       by the SAME pandas hash, no broadcast of the vocabulary);
    4. per-doc top-k by score through the grouped-topk combiner
       (map-side k-per-group, exchange is k x docs rows).

    Scoring uses the log-free integer idf surrogate
    score = tf * 1e6 // df — monotone in tf/df, exactly reproducible
    in both numpy and DuckDB (float ln() could differ by 1 ulp and
    flip a rank), so the oracle is a strict hash match."""
    from ..stages.agg import hash_aggregate
    from ..stages.text import tfidf_term_rows
    from ..stages.topk import grouped_topk

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    tf = docs.map_batches(tfidf_term_rows, batch_format="pyarrow")
    dfreq = hash_aggregate(tf, ["term"], {"df": ("doc_id", "count")})
    joined = _tagged_join(tf, dfreq, ["term"], ["doc_id", "tf"], ["df"])

    def score_rows(batch: pa.Table) -> pa.Table:
        tfv = np.asarray(batch.column("tf"), np.int64)
        dfv = np.asarray(batch.column("df"), np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "term": batch.column("term"),
            "score": pa.array((tfv * 1_000_000) // dfv, pa.int64()),
        })

    scored = joined.map_batches(score_rows, batch_format="pyarrow")
    top = grouped_topk(scored, ["doc_id"], "score", k,
                       tie_cols=["term"], rank_col="rnk").to_pandas()
    top["rnk"] = top["rnk"].astype(np.int64)
    top["doc_id"] = top["doc_id"].astype(np.int64)
    top["score"] = top["score"].astype(np.int64)
    return top[["doc_id", "rnk", "term", "score"]]         .sort_values(["doc_id", "rnk"]).reset_index(drop=True)


def _tagged_join(left, right, keys, left_cols, right_cols, P: int = 32):
    """Distributed inner hash join on ``keys``: tagged union
    partitioned by the shared key hash, per-partition vectorized
    merge — both sides move through ONE exchange, no broadcast of
    either. Payload columns (``left_cols`` / ``right_cols``) must be
    int64. At 100 TB this is the join shape for two big sides; small
    sides go through ray.put broadcast instead."""
    from ..stages.agg import _part_of
    all_cols = list(keys) + list(left_cols) + list(right_cols)

    def tag(side: int, cols):
        def fn(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                # explicit types: pandas would infer null-typed key
                # columns from an empty frame and break the union
                cols_t = {k: pa.array([], batch.schema.field(k).type)
                          for k in keys}
                for c in list(left_cols) + list(right_cols) \
                        + ["side", "part"]:
                    cols_t[c] = pa.array([], pa.int64())
                return pa.table(cols_t)
            d = batch.to_pandas()
            out = pd.DataFrame({k: d[k] for k in keys})
            for c in left_cols:
                out[c] = d[c] if side == 0 else np.int64(0)
            for c in right_cols:
                out[c] = d[c] if side == 1 else np.int64(0)
            out["side"] = np.int64(side)
            out["part"] = _part_of(out, list(keys), P)
            return pa.Table.from_pandas(
                out, preserve_index=False).replace_schema_metadata(None)
        return fn

    both = left.map_batches(tag(0, left_cols), batch_format="pyarrow") \
        .union(right.map_batches(tag(1, right_cols),
                                 batch_format="pyarrow"))

    def join_part(group: pa.Table) -> pa.Table:
        g = group.to_pandas()
        lt = g[g["side"] == 0][list(keys) + list(left_cols)]
        rt = g[g["side"] == 1][list(keys) + list(right_cols)]
        m = lt.merge(rt, on=list(keys))
        if len(m) == 0:
            return pa.table({c: pa.array([], group.schema.field(c).type)
                             for c in all_cols})
        return pa.Table.from_pandas(
            m[all_cols], preserve_index=False).replace_schema_metadata(None)

    return both.groupby("part").map_groups(join_part,
                                           batch_format="pyarrow")


def q_doc_lm_fluency(sf_dir: str) -> pd.DataFrame:
    """Bigram language-model fluency scoring (the CCNet/KenLM-style
    model-based quality signal): train add-one-smoothed bigram counts
    over the corpus, then score every document by the sum of its
    bigrams' smoothed milli-probabilities — all in EXACT integers
    (score per occurrence = (1000*(c2+1)) // (c1+V)), so the SQL
    oracle is a strict hash match (float ln() could differ by 1 ulp
    between numpy and DuckDB; the integer surrogate is monotone in
    the same ratio). 100-TB shape:

    1. per-doc bigram partials (map-side Counter combiner, one row per
       distinct bigram per doc);
    2. vocabulary size V: map-side distinct + one token-key exchange,
       count only;
    3. model + scoring in ONE w1-hash exchange: every (w1, *) gram
       row co-locates, so c2(w1,w2) and c1(w1) are complete inside
       each part group and score there too — the model stays
       DISTRIBUTED (never collected or broadcast) and the exchange
       count is 2 (vocab + w1), not 5;
    4. per-doc sum is a final doc_id aggregate.

    The materialize() pins the one text scan's combined gram/token
    rows (they feed the vocab exchange AND the scoring exchange) in
    the object store — Ray Data would otherwise re-execute the full
    text scan per consumer; blocks spill to disk at scale, nothing is
    collected to the driver."""
    from ..stages.agg import hash_aggregate
    from ..stages.text import bigram_rows, distinct_token_rows

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def gram_and_token_rows(batch: pa.Table) -> pa.Table:
        # ONE text scan feeds both branches: kind=0 bigram rows,
        # kind=1 distinct-token rows (token riding in w1)
        g = bigram_rows(batch)
        t = distinct_token_rows(batch)
        gt = pa.table({
            "kind": pa.array(np.zeros(len(g), np.int64)),
            "doc_id": g.column("doc_id"),
            "w1": g.column("w1"),
            "w2": g.column("w2"),
            "tf": g.column("tf"),
        })
        tt = pa.table({
            "kind": pa.array(np.ones(len(t), np.int64)),
            "doc_id": pa.array(np.zeros(len(t), np.int64)),
            "w1": t.column("w"),
            "w2": pa.array([""] * len(t), pa.string()),
            "tf": pa.array(np.zeros(len(t), np.int64)),
        })
        return pa.concat_tables([gt, tt])

    combined = docs.map_batches(gram_and_token_rows,
                                batch_format="pyarrow").materialize()
    vocab = hash_aggregate(
        combined.filter(expr="kind == 1").map_batches(
            lambda b: b.select(["w1"]).rename_columns(["w"]),
            batch_format="pyarrow"),
        ["w"], {"n": ("w", "count")})
    V = int(vocab.count())

    # ONE w1-hash exchange: every (w1, *) gram row co-locates, so the
    # model counts c2(w1,w2) and c1(w1) are both complete inside the
    # part group — count and score in the same pass (collapses the
    # former c2 exchange + c1 exchange + two tagged joins)
    from ..stages.agg import _part_of
    P = 32

    def tag_w1(batch: pa.Table) -> pa.Table:
        t = batch.select(["doc_id", "w1", "w2", "tf"])
        d = t.to_pandas()
        d["part"] = _part_of(d, ["w1"], P)
        return pa.Table.from_pandas(
            d, preserve_index=False).replace_schema_metadata(None)

    def score_group(group: pa.Table) -> pa.Table:
        g = group.to_pandas()
        c2 = g.groupby(["w1", "w2"])["tf"].transform("sum")
        c1 = g.groupby("w1")["tf"].transform("sum")
        tf = g["tf"].to_numpy(np.int64)
        s = tf * ((1000 * (c2.to_numpy(np.int64) + 1))
                  // (c1.to_numpy(np.int64) + V))
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64),
                               pa.int64()),
            "n_bigrams": pa.array(tf, pa.int64()),
            "s": pa.array(s, pa.int64()),
        })

    scored = (combined.filter(expr="kind == 0")
              .map_batches(tag_w1, batch_format="pyarrow")
              .groupby("part").map_groups(score_group,
                                          batch_format="pyarrow"))
    out = hash_aggregate(scored, ["doc_id"], {
        "n_bigrams": ("n_bigrams", "sum"),
        "fluency_milli": ("s", "sum"),
    }).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype(np.int64)


def q_order_gaps(sf_dir: str) -> pd.DataFrame:
    """Per-key LAG window (feature engineering: days since the
    customer's previous order): ONE hash exchange on o_custkey, then a
    group-local vectorized sort + diff — the standard distributed
    window shape (partition by key, order within partition; no global
    sort). First order per customer gets gap_days = -1 (SQL
    COALESCE)."""
    from ..stages.agg import _part_of
    P = 32

    def tag(batch: pa.Table) -> pa.Table:
        d = batch.to_pandas()
        d["part"] = _part_of(d, ["o_custkey"], P)
        return pa.Table.from_pandas(
            d, preserve_index=False).replace_schema_metadata(None)

    def gaps(group: pa.Table) -> pa.Table:
        g = group.to_pandas().sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        days = g["o_orderdate"].to_numpy() \
            .astype("datetime64[D]").astype(np.int64)
        cust = g["o_custkey"].to_numpy()
        gap = np.empty(len(g), np.int64)
        gap[0:1] = -1
        if len(g) > 1:
            same = cust[1:] == cust[:-1]
            gap[1:] = np.where(same, days[1:] - days[:-1], -1)
        return pa.table({
            "o_orderkey": pa.array(g["o_orderkey"].to_numpy(), pa.int64()),
            "gap_days": pa.array(gap, pa.int64()),
        })

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate"])
    out = (ds.map_batches(tag, batch_format="pyarrow")
           .groupby("part").map_groups(gaps, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("o_orderkey").reset_index(drop=True) \
        .astype(np.int64)


def q_epoch_shuffle_head(sf_dir: str, seed: int = 7,
                         k: int = 100) -> pd.DataFrame:
    """Deterministic training-epoch shuffle: every document gets a
    seeded LCG shuffle key (key = ((doc_id % 2^31) * 1103515245
    + seed) % 2^31 — the pre-mod bounds the product under 2^62, so
    the BIGINT arithmetic is overflow-free for EVERY int64 doc_id and
    identical in numpy and SQL) and the epoch order is ascending key.
    A trainer at 100 TB
    range-partitions on the key (ds.sort is the one legitimate
    all-to-all here — shuffling IS an exchange) and streams epochs by
    partition; this query materializes the first k positions of epoch
    order through the partial-top-k combiner (k rows per block leave,
    no global sort) as the verifiable head."""
    from ..stages.topk import global_topk

    def keyed(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), np.int64)
        key = ((ids % np.int64(1 << 31)) * np.int64(1103515245)
               + np.int64(seed)) % np.int64(1 << 31)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "shuffle_key": pa.array(key, pa.int64())})

    ds = _read(sf_dir, "documents", ["doc_id"])
    top = global_topk(ds.map_batches(keyed, batch_format="pyarrow"),
                      "shuffle_key", k, descending=False,
                      tie_cols=["doc_id"])
    top = top.reset_index(drop=True)
    top["epoch_pos"] = np.arange(len(top), dtype=np.int64)
    return top[["epoch_pos", "doc_id", "shuffle_key"]].astype(np.int64)


def q_doc_token_stats(sf_dir: str) -> pd.DataFrame:
    from ..stages.text import token_stats
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(token_stats, batch_format="pyarrow").to_pandas()


def q_doc_repetition(sf_dir: str) -> pd.DataFrame:
    """Per-doc token repetition features (the repetition filter):
    shuffle-free map_batches scan."""
    from ..stages.text import repetition_stats
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(repetition_stats,
                          batch_format="pyarrow").to_pandas()


def q_doc_quality(sf_dir: str) -> pd.DataFrame:
    from ..stages.text import quality_features
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(quality_features, batch_format="pyarrow").to_pandas()


def q_doc_lang(sf_dir: str) -> pd.DataFrame:
    from ..stages.text import lang_id
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(lang_id, batch_format="pyarrow").to_pandas()


def q_doc_fingerprint(sf_dir: str) -> pd.DataFrame:
    from ..stages.text import fingerprint
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(fingerprint, batch_format="pyarrow").to_pandas()


def q_doc_chunks(sf_dir: str, window: int = 64,
                 stride: int = 48) -> pd.DataFrame:
    """Context-window chunking (training-sequence preparation): each
    document's token stream split into overlapping windows — a
    shuffle-free flat map whose output cardinality exceeds the input's.
    One chunk row per (doc, window start); geometry fully vectorized
    inside chunk_windows."""
    import functools

    from ..stages.text import chunk_windows
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        functools.partial(chunk_windows, window=window, stride=stride),
        batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


def q_doc_bm25(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Distributed BM25 keyword ranking (k1=6/5, b=3/4) over the
    documents table with EXACT integer scoring, so the DuckDB oracle
    hash-matches bit-for-bit:

        A   = S // N                     (integer avgdl)
        idf = N - df + 1                 (integer doc-frequency surrogate)
        score_milli = (22*A*idf*tf*1000) // (10*A*tf + 3*A + 9*dl)

    which is floor(1000 * idf*tf*(k1+1) / (tf + k1*(1-b+b*dl/A))) in
    exact rational arithmetic. 100-TB shape: ONE full-text scan emits
    the narrow int feature table (doc_id, dl, tf per query term); the
    corpus stats (N, S, df) reduce to one tiny row; scoring is a
    vectorized scan over the narrow table; ranking is the partial-topk
    combiner (no global sort)."""
    import numpy as np

    from ..stages.text import BM25_TERMS, bm25_features
    from ..stages.topk import grouped_topk

    feats = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        bm25_features, batch_format="pyarrow").materialize()
    # corpus stats: per-block partials -> one tiny driver-side sum
    def stats_partial(b: pa.Table) -> pa.Table:
        row = {"n_docs": [b.num_rows],
               "s": [int(np.asarray(b.column("dl")).sum())]}
        for t in BM25_TERMS:
            row[f"df_{t}"] = [int((np.asarray(b.column(f"tf_{t}")) > 0)
                                  .sum())]
        return pa.table(row)

    stats = feats.map_batches(stats_partial,
                              batch_format="pyarrow").to_pandas().sum()
    n_docs, s = int(stats["n_docs"]), int(stats["s"])
    avgdl = s // n_docs

    def score(b: pa.Table, term: str) -> pa.Table:
        tf = np.asarray(b.column(f"tf_{term}"), dtype=np.int64)
        dl = np.asarray(b.column("dl"), dtype=np.int64)
        keep = tf > 0
        tf, dl = tf[keep], dl[keep]
        idf = n_docs - int(stats[f"df_{term}"]) + 1
        sc = (22 * avgdl * idf * 1000 * tf) // (
            10 * avgdl * tf + 3 * avgdl + 9 * dl)
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)[keep]
        return pa.table({
            "term": pa.array([term] * len(ids), pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "tf": pa.array(tf, pa.int64()),
            "dl": pa.array(dl, pa.int64()),
            "score_milli": pa.array(sc, pa.int64()),
        })

    def score_all(b: pa.Table) -> pa.Table:
        return pa.concat_tables([score(b, t) for t in BM25_TERMS])

    scored = feats.map_batches(score_all, batch_format="pyarrow")
    top = grouped_topk(scored, ["term"], "score_milli", k,
                       tie_cols=["doc_id"], rank_col="rnk").to_pandas()
    for c in ("doc_id", "tf", "dl", "score_milli", "rnk"):
        top[c] = top[c].astype(np.int64)
    return top[["term", "rnk", "doc_id", "tf", "dl", "score_milli"]] \
        .sort_values(["term", "rnk"]).reset_index(drop=True)


def q_pack_sequences(sf_dir: str, capacity: int = 2048,
                     n_shards: int = 16) -> pd.DataFrame:
    """Training-sequence packing: documents greedily packed in doc_id
    order into fixed-capacity token buffers WITHIN hash shards
    (shard = doc_id % n_shards) — the standard distributed shape, since
    greedy packing is inherently sequential but shards are independent;
    at 100 TB each shard packs its own partition and global pack ids
    are (shard, local pack_id). Docs longer than capacity truncate to
    capacity. One narrow scan emits (doc_id, shard, seq_len); one
    groupby(shard) packs with O(#packs) searchsorted probes."""
    import numpy as np

    from ..stages.text import pack_greedy, space_token_counts

    def features(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        n = space_token_counts(b.column("text").to_pylist())
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "shard": pa.array(ids % n_shards, pa.int64()),
            "seq_len": pa.array(np.minimum(n, capacity), pa.int64()),
        })

    def pack_shard(g: pa.Table) -> pa.Table:
        order = np.argsort(np.asarray(g.column("doc_id")), kind="stable")
        ids = np.asarray(g.column("doc_id"), dtype=np.int64)[order]
        seq = np.asarray(g.column("seq_len"), dtype=np.int64)[order]
        shard = np.asarray(g.column("shard"), dtype=np.int64)[order]
        pid, off = pack_greedy(seq, capacity)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "shard": pa.array(shard, pa.int64()),
            "seq_len": pa.array(seq, pa.int64()),
            "pack_id": pa.array(pid, pa.int64()),
            "pack_off": pa.array(off, pa.int64()),
        })

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = (ds.map_batches(features, batch_format="pyarrow")
           .groupby("shard")
           .map_groups(pack_shard, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_source_mix(sf_dir: str) -> pd.DataFrame:
    """Curriculum / data-mixture sampling: apportion HALF the corpus's
    token budget across sources by target weight w(srcK) = K%4 + 1,
    then keep each doc by the deterministic modular-hash predicate at
    its source's integer permille rate

        keep_permille_s = min(1000, (1000*T*w_s) // (W_total*tok_s))
        keep doc  iff  hash(doc_id) % 1000 < keep_permille_s

    — the standard two-phase mixture shape at 100 TB: ONE narrow scan
    to per-source token totals (tiny combiner exchange), rates
    broadcast (|sources| entries), ONE filtered scan with a per-source
    aggregate combiner. Hash sampling keeps membership reproducible
    and resumable (no RNG state). Emits per-source
    (source, w, tok_total, keep_permille, n_kept, tokens_kept)."""
    import numpy as np

    from ..stages.agg import hash_aggregate
    from ..stages.text import space_token_counts

    def features(b: pa.Table) -> pa.Table:
        n = space_token_counts(b.column("text").to_pylist())
        return pa.table({"doc_id": b.column("doc_id"),
                         "source": b.column("source"),
                         "n_tokens": pa.array(n, pa.int64())})

    feats = _read(sf_dir, "documents", ["doc_id", "source", "text"]).map_batches(
        features, batch_format="pyarrow").materialize()

    totals = hash_aggregate(
        feats, ["source"], {"tok_total": ("n_tokens", "sum"),
                            "n_docs": ("n_tokens", "count")}).to_pandas()
    weights = {s: int(s.removeprefix("src")) % 4 + 1
               for s in totals["source"]}
    w_total = sum(weights.values())
    t_budget = int(totals["tok_total"].sum()) // 2
    permille = {
        s: min(1000, (1000 * t_budget * weights[s])
               // (w_total * int(tok)))
        for s, tok in zip(totals["source"], totals["tok_total"])}

    def keep_stage(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # rates via a dictionary-encode + take (vectorized; the
        # per-source table is |sources| entries)
        codes = pc.dictionary_encode(b.column("source")).combine_chunks()
        rate = np.array([permille[s] for s in
                         codes.dictionary.to_pylist()], dtype=np.int64)[
            np.asarray(codes.indices)]
        keep = (_sample_hash(ids) % 1000) < rate
        return pa.table({
            "source": b.column("source").filter(pa.array(keep)),
            "n_tokens": b.column("n_tokens").filter(pa.array(keep)),
        })

    kept = hash_aggregate(
        feats.map_batches(keep_stage, batch_format="pyarrow"),
        ["source"], {"n_kept": ("n_tokens", "count"),
                     "tokens_kept": ("n_tokens", "sum")}).to_pandas()

    out = totals.merge(kept, on="source", how="left")
    out["n_kept"] = out["n_kept"].fillna(0).astype(np.int64)
    out["tokens_kept"] = out["tokens_kept"].fillna(0).astype(np.int64)
    out["w"] = out["source"].map(weights).astype(np.int64)
    out["keep_permille"] = out["source"].map(permille).astype(np.int64)
    for c in ("tok_total", "n_docs"):
        out[c] = out[c].astype(np.int64)
    return out[["source", "w", "tok_total", "n_docs", "keep_permille",
                "n_kept", "tokens_kept"]] \
        .sort_values("source").reset_index(drop=True)


def q_customer_order_dist(sf_dir: str) -> pd.DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): a big-big
    LEFT OUTER hash join as ONE tagged exchange — order counts are
    pre-aggregated per batch (combiner: at most one row per custkey per
    batch crosses the wire, never one per order), customer rows ride
    the same exchange with a presence tag, and the groupby merge emits
    zero for customers with no orders while dropping orphan order keys.
    The distribution is a second tiny groupby on the count."""
    import numpy as np

    from ..stages.agg import hash_aggregate

    def order_partial(b: pa.Table) -> pa.Table:
        keys = np.asarray(b.column("o_custkey"), dtype=np.int64)
        uniq, cnt = np.unique(keys, return_counts=True)
        return pa.table({
            "custkey": pa.array(uniq, pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            "is_cust": pa.array(np.zeros(len(uniq), np.int64), pa.int64()),
        })

    def cust_rows(b: pa.Table) -> pa.Table:
        keys = np.asarray(b.column("c_custkey"), dtype=np.int64)
        z = np.zeros(len(keys), np.int64)
        return pa.table({
            "custkey": pa.array(keys, pa.int64()),
            "cnt": pa.array(z, pa.int64()),
            "is_cust": pa.array(z + 1, pa.int64()),
        })

    orders = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        order_partial, batch_format="pyarrow")
    custs = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        cust_rows, batch_format="pyarrow")
    per_cust = hash_aggregate(
        orders.union(custs), ["custkey"],
        {"n_orders": ("cnt", "sum"), "present": ("is_cust", "max")})

    def keep_customers(b: pa.Table) -> pa.Table:
        present = np.asarray(b.column("present"), dtype=np.int64) == 1
        n = np.asarray(b.column("n_orders"), dtype=np.int64)[present]
        return pa.table({"n_orders": pa.array(n, pa.int64())})

    dist = hash_aggregate(
        per_cust.map_batches(keep_customers, batch_format="pyarrow"),
        ["n_orders"], {"custdist": ("n_orders", "count")}).to_pandas()
    dist["n_orders"] = dist["n_orders"].astype(np.int64)
    dist["custdist"] = dist["custdist"].astype(np.int64)
    return dist.sort_values("n_orders").reset_index(drop=True)


def q_doc_dup_spans(sf_dir: str, n: int = 8) -> pd.DataFrame:
    """ExactSubstr-style duplicated-span detection (the corpus
    SELF-join flavor of n-gram dedup, per Lee et al. "Deduplicating
    Training Data Makes Language Models Better"): for every document,
    how many of its distinct whitespace 8-gram spans also occur in at
    least one OTHER document.

    100-TB shape: ONE gram-hash exchange — (doc_id, gram) rows
    (distinct per doc, built per batch) partition by gram hash; inside
    each partition the duplicate decision is group-local (all rows of
    a gram share its partition) and collapses immediately to per-doc
    partial counts, so the second exchange is at most one row per
    (doc, partition). No gram string ever leaves the first exchange."""
    import numpy as np

    from ..stages.agg import _part_of, hash_aggregate

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    P = 32

    def gram_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        d, g = [], []
        for did, t in zip(ids, texts):
            toks = t.split(" ")
            for gram in {" ".join(toks[i:i + n])
                         for i in range(len(toks) - n + 1)}:
                d.append(did)
                g.append(gram)
        if not d:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "gram": pa.array([], pa.string()),
                             "part": pa.array([], pa.int64())})
        df = pd.DataFrame({"doc_id": d, "gram": g})
        df["part"] = _part_of(df, ["gram"], P)
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    def partial_counts(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        dup = df.groupby("gram")["doc_id"].transform("size") >= 2
        out = df.assign(dup=dup.astype(np.int64)).groupby(
            "doc_id", as_index=False).agg(
            n_spans=("gram", "size"), n_dup_spans=("dup", "sum"))
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    partials = (docs.map_batches(gram_rows, batch_format="pyarrow")
                .groupby("part")
                .map_groups(partial_counts, batch_format="pyarrow"))

    def zero_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        z = np.zeros(len(ids), np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_spans": pa.array(z, pa.int64()),
                         "n_dup_spans": pa.array(z, pa.int64())})

    zeros = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        zero_rows, batch_format="pyarrow")
    out = hash_aggregate(
        partials.union(zeros), ["doc_id"],
        {"n_spans": ("n_spans", "sum"),
         "n_dup_spans": ("n_dup_spans", "sum")}).to_pandas()
    for c in ("doc_id", "n_spans", "n_dup_spans"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def q_vocab_topk(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Tokenizer-vocabulary induction: the exact global top-k corpus
    vocabulary (lowercase alphanumeric-run tokens) with counts — the
    first step of training a tokenizer over a 100-TB corpus. Shape:
    per-batch Counter pre-aggregation (the exchange carries at most
    one row per distinct term per batch, never one per token), one
    term-hash aggregate, then the global top-k combiner (per-block
    partial top-k -> one tiny merge; no global sort)."""
    import numpy as np

    from ..stages.agg import hash_aggregate
    from ..stages.text import _TERM_RE
    from ..stages.topk import global_topk

    def term_partials(b: pa.Table) -> pa.Table:
        from collections import Counter
        c = Counter()
        for t in b.column("text").to_pylist():
            c.update(_TERM_RE.findall(t.lower()))
        return pa.table({
            "term": pa.array(list(c.keys()), pa.string()),
            "cnt": pa.array(list(c.values()), pa.int64()),
        })

    counts = hash_aggregate(
        _read(sf_dir, "documents", ["text"])
        .map_batches(term_partials, batch_format="pyarrow"),
        ["term"], {"cnt": ("cnt", "sum")})
    top = global_topk(counts, "cnt", k, tie_cols=["term"])
    top["rnk"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top["cnt"] = top["cnt"].astype(np.int64)
    return top[["rnk", "term", "cnt"]].reset_index(drop=True)


def q_doc_quality_filter(sf_dir: str, q: float = 0.75) -> pd.DataFrame:
    """Corpus-level quality filtering (the C4/Gopher-style pipeline
    stage): score every document by its distinct-token ratio permille
    (score = 1000*n_distinct // n_tokens — the repetition-quality
    signal), find the exact corpus p75 of the score WITHOUT a sort
    (streaming histogram refinement over the cached narrow score table
    — stages/quantile.py), broadcast the threshold, and keep documents
    at or above it. At 100 TB the score table is two int columns; the
    quantile passes stream from the object store and the filter is one
    vectorized scan."""
    import numpy as np

    from ..stages.quantile import exact_grouped_quantiles
    from ..stages.text import space_token_counts

    def score_rows(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        n_tok = space_token_counts(texts)
        n_dis = np.array([len(set(t.split(" "))) for t in texts],
                         dtype=np.int64)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "g": pa.array(np.zeros(len(texts), np.int64), pa.int64()),
            "score": pa.array(1000 * n_dis // n_tok, pa.int64()),
        })

    scores = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score_rows, batch_format="pyarrow").materialize()
    thr_df = exact_grouped_quantiles(scores, "g", "score", [q])
    thr = int(thr_df["value"].iloc[0])

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.greater_equal(b.column("score"), thr)
        return b.filter(mask).select(["doc_id", "score"])

    out = scores.map_batches(keep, batch_format="pyarrow").to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["score"] = out["score"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def curation_survivors(sf_dir: str, q: float = 0.75,
                       capacity: int = 2048, n_shards: int = 16):
    """Stages 1-3 of the curation flagship, returning the MATERIALIZED
    survivor Dataset (doc_id, shard, seq_len) — the narrow table the
    per-shard packing (and the checkpointed writer) consumes.

    END-TO-END training-data curation — the composed flagship of the
    LLM surface, each stage the already-oracle-proven operator:

      1. quality filter  — distinct-token-ratio score >= exact corpus
         p75 (histogram-refinement quantile, threshold broadcast);
      2. exact dedup     — content-key hash exchange keeping the min
         doc_id per identical text (text rides the one exchange, as a
         real pipeline materializing the deduped corpus must);
      3. dup-span filter — 8-gram corpus self-join over the SURVIVORS;
         drop docs whose duplicated spans exceed half their spans;
      4. sequence packing — survivors greedily packed per hash shard
         into capacity-token training buffers.

    4 exchanges total (dedup key, gram key, per-doc aggregate, pack
    shard); every inter-stage table is narrow ints except the one
    text-carrying dedup exchange. Emits (doc_id, shard, seq_len,
    pack_id, pack_off) for the final packed sequences."""
    import numpy as np

    from ..stages.agg import hash_aggregate
    from ..stages.dedup import exact_key_stage
    from ..stages.quantile import exact_grouped_quantiles
    from ..stages.text import pack_greedy, space_token_counts

    # block count follows the cluster AND the data (_read default =
    # max(8, CPUs, bytes/16MB)): the formerly pinned num_blocks=8
    # capped every narrow stage at 8-way parallelism (0.44 scaling
    # efficiency 8->32 cpus at 500k docs) and count-only blocks handed
    # workers 50+ MB text slices (super-linear degradation in the gram
    # stage's Python-object churn).  Results are block-count invariant:
    # every stage is content-keyed.
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    # -- stage 1: corpus-quantile quality threshold ----------------
    def score_rows(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        n_tok = space_token_counts(texts)
        n_dis = np.array([len(set(t.split(" "))) for t in texts],
                         dtype=np.int64)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "g": pa.array(np.zeros(len(texts), np.int64), pa.int64()),
            "score": pa.array(1000 * n_dis // n_tok, pa.int64()),
        })

    scores = docs.map_batches(score_rows,
                              batch_format="pyarrow").materialize()
    thr = int(exact_grouped_quantiles(scores, "g", "score",
                                      [q])["value"].iloc[0])

    def keep_quality(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        n_tok = space_token_counts(texts)
        n_dis = np.array([len(set(t.split(" "))) for t in texts],
                         dtype=np.int64)
        keep = (1000 * n_dis // n_tok) >= thr
        return pa.table({
            "doc_id": b.column("doc_id").filter(pa.array(keep)),
            "text": b.column("text").filter(pa.array(keep)),
            "n_tokens": pa.array(n_tok[keep], pa.int64()),
        })

    kept = docs.map_batches(keep_quality, batch_format="pyarrow")

    # -- stage 2: exact dedup (min doc_id per content key) ---------
    # one content-key hash exchange with the text riding it (a
    # materializing pipeline must ship the text once); the exchange
    # keys on a PARTITION id (hash(content_key) % P2, the stage-3
    # pattern) so the winner selection is one vectorized
    # drop-duplicates per partition — grouping on the raw key made
    # Ray call the UDF once per distinct key (125k pandas calls at
    # 500k docs: 16 of the 24 s wall; this form removes that).
    P2 = 64

    def key_rows(b: pa.Table) -> pa.Table:
        from ..stages.agg import _part_of
        k = exact_key_stage(b.select(["doc_id", "text"]))
        df = pd.DataFrame({"content_key": k.column("content_key")})
        return k.append_column("n_tokens", b.column("n_tokens")) \
            .append_column("text", b.column("text")) \
            .append_column("part", pa.array(
                _part_of(df, ["content_key"], P2), pa.int64()))

    def dedup_part(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        win = df.sort_values(["content_key", "doc_id"]) \
            .drop_duplicates("content_key", keep="first")
        return pa.Table.from_pandas(
            win[["doc_id", "text", "n_tokens"]],
            preserve_index=False).replace_schema_metadata(None)

    deduped = (kept.map_batches(key_rows, batch_format="pyarrow")
               .groupby("part")
               .map_groups(dedup_part, batch_format="pyarrow")
               ).materialize()

    # -- stage 3: dup-span filter over the survivors ---------------
    P = 32

    def gram_rows(batch: pa.Table) -> pa.Table:
        from ..stages.agg import _part_of
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        d, g = [], []
        for did, t in zip(ids, texts):
            toks = t.split(" ")
            for gram in {" ".join(toks[i:i + 8])
                         for i in range(len(toks) - 7)}:
                d.append(did)
                g.append(gram)
        if not d:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "gram": pa.array([], pa.string()),
                             "part": pa.array([], pa.int64())})
        df = pd.DataFrame({"doc_id": d, "gram": g})
        df["part"] = _part_of(df, ["gram"], P)
        return pa.Table.from_pandas(
            df, preserve_index=False).replace_schema_metadata(None)

    def partial_counts(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        dup = df.groupby("gram")["doc_id"].transform("size") >= 2
        out = df.assign(dup=dup.astype(np.int64)).groupby(
            "doc_id", as_index=False).agg(
            n_spans=("gram", "size"), n_dup=("dup", "sum"))
        out["n_tokens"] = np.int64(0)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    partials = (deduped.map_batches(gram_rows, batch_format="pyarrow")
                .groupby("part")
                .map_groups(partial_counts, batch_format="pyarrow"))

    def carry_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        z = np.zeros(n, np.int64)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_spans": pa.array(z, pa.int64()),
            "n_dup": pa.array(z, pa.int64()),
            "n_tokens": b.column("n_tokens"),
        })

    per_doc = hash_aggregate(
        partials.union(deduped.map_batches(carry_rows,
                                           batch_format="pyarrow")),
        ["doc_id"], {"n_spans": ("n_spans", "sum"),
                     "n_dup": ("n_dup", "sum"),
                     "n_tokens": ("n_tokens", "max")})

    # -- stage 4: pack survivors per hash shard --------------------
    def survivors(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        n_spans = np.asarray(b.column("n_spans"), dtype=np.int64)
        n_dup = np.asarray(b.column("n_dup"), dtype=np.int64)
        n_tok = np.asarray(b.column("n_tokens"), dtype=np.int64)
        keep = 2 * n_dup <= n_spans
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "shard": pa.array(ids[keep] % n_shards, pa.int64()),
            "seq_len": pa.array(np.minimum(n_tok[keep], capacity),
                                pa.int64()),
        })

    def pack_shard(g: pa.Table) -> pa.Table:
        order = np.argsort(np.asarray(g.column("doc_id")), kind="stable")
        ids = np.asarray(g.column("doc_id"), dtype=np.int64)[order]
        seq = np.asarray(g.column("seq_len"), dtype=np.int64)[order]
        shard = np.asarray(g.column("shard"), dtype=np.int64)[order]
        pid, off = pack_greedy(seq, capacity)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "shard": pa.array(shard, pa.int64()),
            "seq_len": pa.array(seq, pa.int64()),
            "pack_id": pa.array(pid, pa.int64()),
            "pack_off": pa.array(off, pa.int64()),
        })

    return per_doc.map_batches(survivors,
                               batch_format="pyarrow").materialize()


def _pack_shard_group(capacity: int):
    import numpy as np

    from ..stages.text import pack_greedy

    def fn(g: pa.Table) -> pa.Table:
        order = np.argsort(np.asarray(g.column("doc_id")), kind="stable")
        ids = np.asarray(g.column("doc_id"), dtype=np.int64)[order]
        seq = np.asarray(g.column("seq_len"), dtype=np.int64)[order]
        shard = np.asarray(g.column("shard"), dtype=np.int64)[order]
        pid, off = pack_greedy(seq, capacity)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "shard": pa.array(shard, pa.int64()),
            "seq_len": pa.array(seq, pa.int64()),
            "pack_id": pa.array(pid, pa.int64()),
            "pack_off": pa.array(off, pa.int64()),
        })
    return fn


def q_curation_pipeline(sf_dir: str, q: float = 0.75,
                        capacity: int = 2048,
                        n_shards: int = 16) -> pd.DataFrame:
    """Stage 4 over curation_survivors: survivors greedily packed per
    hash shard into capacity-token training buffers. See
    curation_survivors for the full pipeline contract."""
    import numpy as np

    surv = curation_survivors(sf_dir, q, capacity, n_shards)
    out = (surv.groupby("shard")
           .map_groups(_pack_shard_group(capacity),
                       batch_format="pyarrow")
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def curation_to_parquet(sf_dir: str, out_dir: str, q: float = 0.75,
                        capacity: int = 2048,
                        n_shards: int = 16) -> dict:
    """The curation flagship with RESUMABLE partitioned output
    (north-rule checkpoint clause): the global stages build the
    survivor table once; each pack shard is then an independent
    recovery unit written atomically via state/checkpoint.py — a
    killed job re-runs only unfinished shards on resume, and the
    manifest records lineage (pipeline + shard) and metrics (rows,
    wall seconds) per partition."""
    from ..state.checkpoint import Shard, run_checkpointed

    surv = curation_survivors(sf_dir, q, capacity, n_shards)
    shards = [Shard(shard_id=f"{k:05d}",
                    lineage={"pipeline": "curation", "shard": k,
                             "input": sf_dir})
              for k in range(n_shards)]

    def run_shard(shard: Shard):
        import pyarrow.compute as pc
        k = shard.lineage["shard"]
        part = surv.map_batches(
            lambda b, _k=k: b.filter(pc.equal(b.column("shard"), _k)),
            batch_format="pyarrow")
        return part.groupby("shard").map_groups(
            _pack_shard_group(capacity), batch_format="pyarrow")

    config = {"q": q, "capacity": capacity, "n_shards": n_shards,
              "input": sf_dir}
    return run_checkpointed(shards, run_shard, out_dir, config)


def _minhash_candidates_ds(sf_dir: str):
    """MinHash+LSH candidate pairs as a DATASET (no driver
    materialization): signatures -> band keys -> groupby band -> buckets
    with >1 distinct member -> distinct (min_doc, max_doc)."""
    from ..stages.agg import hash_aggregate
    from ..stages.dedup import minhash_band_rows
    # ~8 blocks: enough parallelism while each task's per-worker
    # shingle cache still amortizes over hundreds of docs
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    bands = ds.map_batches(minhash_band_rows, batch_format="pyarrow")
    counts = hash_aggregate(bands, ["band_key"], {
        "members": ("doc_id", "count"),
        "min_doc": ("doc_id", "min"),
        "max_doc": ("doc_id", "max"),
    })

    def keep_pairs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.and_(pc.greater(batch.column("members"), 1),
                       pc.not_equal(batch.column("min_doc"),
                                    batch.column("max_doc")))
        return batch.filter(mask).select(["min_doc", "max_doc"])

    pairs = counts.map_batches(keep_pairs, batch_format="pyarrow")
    # distinct over (min_doc, max_doc): tiny hash-partitioned aggregate
    return hash_aggregate(pairs, ["min_doc", "max_doc"],
                          {"n": ("min_doc", "count")}, num_partitions=8) \
        .select_columns(["min_doc", "max_doc"])


def q_minhash_bands(sf_dir: str) -> pd.DataFrame:
    """MinHash+LSH near-dup candidates: signature -> band keys ->
    groupby band -> buckets with >1 member."""
    out = _minhash_candidates_ds(sf_dir).to_pandas()
    return out.sort_values(["min_doc", "max_doc"]).reset_index(drop=True) \
        .astype(np.int64)


def q_neardup_clusters(sf_dir: str) -> pd.DataFrame:
    """Near-duplicate CLUSTERING — the last step of the dedup pipeline:
    MinHash+LSH candidate pairs -> connected components (distributed
    min-label propagation, stages/cc.py) -> every doc labelled with its
    cluster's min doc_id. Docs in no candidate pair are their own
    cluster (self-loop edges keep them in the node set). A 100-TB dedup
    keeps rows WHERE doc_id = cluster_id; the full (doc, cluster) map
    is returned so the oracle checks every assignment."""
    from ..stages.cc import connected_components
    cand = _minhash_candidates_ds(sf_dir)

    def cand_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("min_doc"),
                         "dst": batch.column("max_doc")})

    def self_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("doc_id"),
                         "dst": batch.column("doc_id")})

    edges = (cand.map_batches(cand_edges, batch_format="pyarrow")
             .union(_read(sf_dir, "documents", ["doc_id"])
                    .map_batches(self_edges, batch_format="pyarrow")))
    labels = connected_components(edges, num_partitions=8)
    out = labels.to_pandas().rename(
        columns={"id": "doc_id", "label": "cluster_id"})
    return out.sort_values("doc_id").reset_index(drop=True).astype(np.int64)


def q_cluster_capped_sample(sf_dir: str, k: int = 2) -> pd.DataFrame:
    """Per-cluster sampling CAP — the curation step after dedup
    clustering: keep at most k docs per near-dup cluster (lowest doc_id
    first, deterministic). Composition of two existing distributed
    stages: CC labels (BSP min-label) -> grouped-topk combiner keyed by
    cluster (map-side k-per-group, exchange is k x clusters rows). A
    100-TB curation run writes the kept doc_ids; singletons pass
    through untouched."""
    from ..stages.cc import connected_components
    from ..stages.topk import grouped_topk
    cand = _minhash_candidates_ds(sf_dir)

    def cand_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("min_doc"),
                         "dst": batch.column("max_doc")})

    def self_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("doc_id"),
                         "dst": batch.column("doc_id")})

    edges = (cand.map_batches(cand_edges, batch_format="pyarrow")
             .union(_read(sf_dir, "documents", ["doc_id"])
                    .map_batches(self_edges, batch_format="pyarrow")))
    labels = connected_components(edges, num_partitions=8)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"cluster_id": batch.column("label"),
                         "doc_id": batch.column("id")})

    kept = grouped_topk(labels.map_batches(rename,
                                           batch_format="pyarrow"),
                        ["cluster_id"], "doc_id", k,
                        descending=False, rank_col="rnk").to_pandas()
    kept = kept.astype(np.int64)
    return kept[["cluster_id", "rnk", "doc_id"]]         .sort_values(["cluster_id", "rnk"]).reset_index(drop=True)


def q_simhash(sf_dir: str) -> pd.DataFrame:
    from ..stages.dedup import SimHashStage
    from ..stages.util import stage_fn
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # stage_fn task pool: the ±1 contribution cache builds once per
    # worker; no per-call actor spin-up (1.68 -> 0.37 s warm at sf0.1)
    return ds.map_batches(stage_fn(SimHashStage),
                          batch_format="pyarrow").to_pandas()


def _embedding_neardup_pairs_ds(sf_dir: str, threshold: float = 0.4,
                                n_planes: int = 8):
    """Embedding-cosine near-duplicate PAIRS as a Dataset, 100TB-shaped:
    hyperplane LSH buckets (fixed seed-11 planes, same as
    q_ann_lsh_buckets) colocate candidates via a bucket groupby, then
    each bucket runs a LOCAL all-pairs cosine — never a whole-corpus
    broadcast or global matmul."""
    from ..stages.ann import HyperplaneLSHStage

    class BucketKeep(HyperplaneLSHStage):
        """bucket + keep the embedding for the bucket-local verify."""

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = HyperplaneLSHStage.__call__(self, batch)
            return out.append_column("embedding",
                                     batch.column("embedding"))

    def local_pairs(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_numpy().astype(np.int64)
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "sim_e3": pa.array([], pa.int64())})
        from ..stages.ann import embedding_matrix
        mat = embedding_matrix(group)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ mat.T
        rows, cols = np.nonzero(np.triu(sims > threshold, k=1))
        ia = np.minimum(ids[rows], ids[cols])
        ib = np.maximum(ids[rows], ids[cols])
        return pa.table({
            "id_a": pa.array(ia, pa.int64()),
            "id_b": pa.array(ib, pa.int64()),
            "sim_e3": pa.array(
                np.round(sims[rows, cols] * 1000).astype(np.int64),
                pa.int64()),
        })

    dim = _embedding_dim(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    from ..stages.util import stage_fn
    buckets = ds.map_batches(stage_fn(BucketKeep, dim, n_planes),
                             batch_format="pyarrow")
    return buckets.groupby("bucket").map_groups(
        local_pairs, batch_format="pyarrow")


def q_embedding_neardup(sf_dir: str, threshold: float = 0.4,
                        n_planes: int = 8) -> pd.DataFrame:
    """Near-dup pairs (see _embedding_neardup_pairs_ds). The SQL oracle
    reproduces the plane signs and bucket-local cosine with the plane
    vectors embedded as literals."""
    out = _embedding_neardup_pairs_ds(sf_dir, threshold,
                                      n_planes).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                             "id_b": pd.Series([], dtype=np.int64),
                             "sim_e3": pd.Series([], dtype=np.int64)})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True) \
        .astype(np.int64)


def q_embedding_neardup_clusters(sf_dir: str) -> pd.DataFrame:
    """SEMANTIC dedup end to end: embedding near-dup pairs closed into
    clusters by the distributed connected-components stage (the same
    min-label BSP as q_neardup_clusters); every vector labelled with
    its cluster's min vec_id, singletons self-labelled via self-loop
    edges. A 100-TB semantic dedup keeps WHERE vec_id = cluster_id."""
    from ..stages.cc import connected_components
    pairs = _embedding_neardup_pairs_ds(sf_dir)

    def pair_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("id_a"),
                         "dst": batch.column("id_b")})

    def self_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("vec_id"),
                         "dst": batch.column("vec_id")})

    edges = (pairs.map_batches(pair_edges, batch_format="pyarrow")
             .union(_read(sf_dir, "embeddings", ["vec_id"])
                    .map_batches(self_edges, batch_format="pyarrow")))
    labels = connected_components(edges, num_partitions=8)
    out = labels.to_pandas().rename(
        columns={"id": "vec_id", "label": "cluster_id"})
    return out.sort_values("vec_id").reset_index(drop=True).astype(np.int64)


def q_kmeans_embeddings(sf_dir: str, k: int = 8,
                        iters: int = 3) -> pd.DataFrame:
    """Distributed k-means (Lloyd's) over the embedding column —
    semantic clustering for data curation. Init = the embeddings of
    vec_ids 0..k-1 (data-deterministic, no RNG; fetched via the same
    small-side take as the ANN query matrices — at scale a filtered
    read). Each iteration: broadcast centroids, per-block partial sums
    (k x d rows per BLOCK, never per row), tiny driver reduce,
    centroids re-quantized to the 1e-6 grid so the unrolled SQL oracle
    replays the iterations from exactly equal state (stages/kmeans.py)."""
    from ..stages.kmeans import kmeans_assign, kmeans_fit
    qdf = _query_vectors(sf_dir, k)
    init = np.array(qdf["embedding"].tolist(), dtype=np.float64)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents = kmeans_fit(ds, init, iters=iters, concurrency=_conc())
    out = kmeans_assign(ds, cents, concurrency=_conc()).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True).astype(np.int64)


def q_ann_cosine_topk(sf_dir: str, n_queries: int = 8, k: int = 5) -> pd.DataFrame:
    """Brute-force cosine top-k: query matrix broadcast once, one
    float64 matmul per batch, tiny final merge."""
    from ..stages.ann import CosineTopKStage, merge_topk
    qdf = _query_vectors(sf_dir, n_queries)
    queries = np.array(qdf["embedding"].tolist(), dtype=np.float64)
    qref = ray.put(queries)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    from ..stages.ann import cosine_topk_fn
    partials = ds.map_batches(
        cosine_topk_fn(qref, qdf["vec_id"].tolist(), k),
        batch_format="pyarrow")
    return merge_topk(pa.Table.from_pandas(partials.to_pandas()),
                      k).to_pandas()


def q_ann_ivf_topk(sf_dir: str, n_queries: int = 8, k_lists: int = 16,
                   nprobe: int = 4, k: int = 5) -> pd.DataFrame:
    """IVF ANN: coarse quantization to fixed seeded unit centroids,
    per-query scan restricted to the nprobe closest lists (the
    inverted-file scale path; at 10^12 rows lists are hash-partitioned
    and only probed partitions are read). SQL-checked: the centroids
    are data-independent, so the oracle embeds them as literals."""
    from ..stages.ann import IVFScanStage, merge_topk
    qdf = _query_vectors(sf_dir, n_queries)
    queries = np.array(qdf["embedding"].tolist(), dtype=np.float64)
    qref = ray.put(queries)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    from ..stages.util import stage_fn
    partials = ds.map_batches(
        stage_fn(IVFScanStage, qref, qdf["vec_id"].tolist(), k_lists,
                 nprobe, k),
        batch_format="pyarrow")
    return merge_topk(pa.Table.from_pandas(partials.to_pandas()),
                      k).to_pandas()


def q_embedding_quantize(sf_dir: str) -> pd.DataFrame:
    """Int8 embedding quantization (the 4-bytes->1-byte-per-dim memory
    reduction an ANN index applies before sharding): global
    per-dimension min/max via a distributed partial-minmax exchange
    (one row per dim per BLOCK, never per vector), then per-vector
    codes q_d = floor((x_d - mn_d) * 255 / (mx_d - mn_d)) in one
    broadcast-scaled scan (constant-span dims code to 0). The code
    expression is the identical IEEE-double formula in numpy and
    DuckDB, so floor() is exact and the oracle is a strict hash match.
    Output: per-vector code checksums (sum/min/max) — at 100 TB the
    uint8 matrix itself is written back partitioned, never
    collected."""
    from ..stages.agg import hash_aggregate
    from ..stages.ann import embedding_matrix

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def part_minmax(batch: pa.Table) -> pa.Table:
        m = embedding_matrix(batch)
        if m.shape[0] == 0:
            return pa.table({"d": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({
            "d": pa.array(np.arange(m.shape[1], dtype=np.int64)),
            "mn": pa.array(m.min(axis=0)),
            "mx": pa.array(m.max(axis=0)),
        })

    mm = hash_aggregate(
        ds.map_batches(part_minmax, batch_format="pyarrow"),
        ["d"], {"mn": ("mn", "min"), "mx": ("mx", "max")},
        num_partitions=8).to_pandas().sort_values("d")
    lo = mm["mn"].to_numpy(dtype=np.float64)
    hi = mm["mx"].to_numpy(dtype=np.float64)
    ref = ray.put((lo, hi))

    def codes(batch: pa.Table) -> pa.Table:
        mn, mx = ray.get(ref)
        m = embedding_matrix(batch)
        if m.shape[0] == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "code_sum": pa.array([], pa.int64()),
                "code_min": pa.array([], pa.int64()),
                "code_max": pa.array([], pa.int64())})
        span = mx - mn
        ok = span > 0
        q = np.zeros(m.shape, dtype=np.int64)
        q[:, ok] = np.floor(
            (m[:, ok] - mn[ok]) * 255.0 / span[ok]).astype(np.int64)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "code_sum": pa.array(q.sum(axis=1), pa.int64()),
            "code_min": pa.array(q.min(axis=1), pa.int64()),
            "code_max": pa.array(q.max(axis=1), pa.int64()),
        })

    out = ds.map_batches(codes, batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True) \
        .astype(np.int64)


def q_ann_lsh_buckets(sf_dir: str, n_planes: int = 8) -> pd.DataFrame:
    """LSH-bucketed ANN scale path: hyperplane signatures -> bucket
    groupby (deterministic seed; rows-only check). At 10^12 rows this
    replaces the all-pairs matmul with a bucket-local search."""
    from ..stages.agg import hash_aggregate
    from ..stages.ann import HyperplaneLSHStage
    dim = _embedding_dim(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    from ..stages.util import stage_fn
    buckets = ds.map_batches(stage_fn(HyperplaneLSHStage, dim, n_planes),
                             batch_format="pyarrow")
    out = hash_aggregate(buckets, ["bucket"], {
        "members": ("vec_id", "count"),
        "min_vec": ("vec_id", "min"),
        "max_vec": ("vec_id", "max"),
    }, num_partitions=8).to_pandas()
    return out.sort_values("bucket").reset_index(drop=True).astype(np.int64)


def q_event_sessions(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Gap-based sessionization (the stateful streaming-window op):
    events exchange on user_id % P (a PARTITION id, not the raw user
    key — grouping on the key itself makes Ray Data call the UDF once
    per distinct user, the per-group-call pitfall fixed in the
    curation dedup this round); each partition sorts by (user, ts)
    once and cuts every user's sessions in one vectorized pass,
    matching the SQL lag/cumsum window oracle."""
    gap_us = gap_minutes * 60 * 1_000_000
    P = 32

    def tag(b: pa.Table) -> pa.Table:
        uid = np.asarray(b.column("user_id"), dtype=np.int64)
        return b.append_column("part", pa.array(uid % P, pa.int64()))

    def sessionize_part(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(["user_id", "ts"])
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].astype("int64").to_numpy()  # microseconds
        new = np.concatenate(([True], (uid[1:] != uid[:-1])
                              | (np.diff(ts) > gap_us)))
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [len(ts)]))
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "session_start": pa.array(ts[starts] // 1_000_000,
                                      pa.int64()),
            "n_events": pa.array((ends - starts).astype(np.int64),
                                 pa.int64()),
            "duration_s": pa.array(
                ts[ends - 1] // 1_000_000 - ts[starts] // 1_000_000,
                pa.int64()),
        })

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    out = (ds.map_batches(tag, batch_format="pyarrow")
           .groupby("part")
           .map_groups(sessionize_part, batch_format="pyarrow")
           ).to_pandas()
    return out.sort_values(["user_id", "session_start"]) \
        .reset_index(drop=True)


def q_top_orders_per_priority(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Grouped top-k (stages/topk.py): top 3 orders by price within
    each order priority. Map-side combiner keeps k rows per group per
    batch, so the exchange is k x |groups| rows however big the input;
    the final per-group merge emits a dense rank matching the
    row_number() SQL oracle."""
    from ..stages.topk import grouped_topk
    ds = _read(sf_dir, "orders",
               ["o_orderpriority", "o_orderkey", "o_totalprice"])
    top = grouped_topk(ds, ["o_orderpriority"], "o_totalprice", k,
                       descending=True, tie_cols=["o_orderkey"])
    out = top.to_pandas()
    out["total_cents"] = (out["o_totalprice"] * 100).round() \
        .astype(np.int64)
    out["rnk"] = out["rnk"].astype(np.int64)
    return out[["o_orderpriority", "rnk", "o_orderkey", "total_cents"]] \
        .sort_values(["o_orderpriority", "rnk"]).reset_index(drop=True)


def q_price_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact grouped percentiles (stages/quantile.py): p50/p90 of
    extended price per return flag via streaming histogram refinement
    — no shuffle, no sort, the value column never leaves the workers;
    matches DuckDB quantile_disc exactly (same k = ceil(q*n)
    selection)."""
    from ..stages.quantile import exact_grouped_quantiles
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    ds = ds.materialize()  # 3 passes stream from object store, not disk
    out = exact_grouped_quantiles(ds, "l_returnflag", "l_extendedprice",
                                  [0.5, 0.9])
    wide = out.pivot(index="l_returnflag", columns="q",
                     values="value").reset_index()
    wide["p50_cents"] = (wide[0.5] * 100).round().astype(np.int64)
    wide["p90_cents"] = (wide[0.9] * 100).round().astype(np.int64)
    return wide[["l_returnflag", "p50_cents", "p90_cents"]] \
        .sort_values("l_returnflag").reset_index(drop=True)


def q_events_sliding(sf_dir: str) -> pd.DataFrame:
    """Sliding calendar-window aggregate: 7-day trailing event count
    and value sum per event type. Heavy lifting is the distributed
    daily pre-aggregate (map-side partial combine); the window then
    runs vectorized over the tiny (day x type) frame via prefix sums
    with a searchsorted lower bound — day gaps handled exactly like
    the SQL RANGE frame."""
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = (df["ts"].astype("int64") // 86_400_000_000) \
            .astype(np.int64)
        g = df.groupby(["day", "event_type"], as_index=False).agg(
            n=("value", "size"), v=("value", "sum"))
        return pa.Table.from_pandas(
            g, preserve_index=False).replace_schema_metadata(None)

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    daily = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    daily = daily.groupby(["day", "event_type"], as_index=False).agg(
        n=("n", "sum"), v=("v", "sum"))

    rows = []
    for etype, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day")
        days = grp["day"].to_numpy()
        cn = np.concatenate(([0], np.cumsum(grp["n"].to_numpy())))
        cv = np.concatenate(([0.0], np.cumsum(grp["v"].to_numpy())))
        lo = np.searchsorted(days, days - 6, side="left")
        idx = np.arange(1, len(days) + 1)
        rows.append(pd.DataFrame({
            "day": pd.to_datetime(days * 86400, unit="s")
            .strftime("%Y-%m-%d"),
            "event_type": etype,
            "n7": (cn[idx] - cn[lo]).astype(np.int64),
            "value7_cents": np.round(
                (cv[idx] - cv[lo]) * 100).astype(np.int64),
        }))
    out = pd.concat(rows, ignore_index=True)
    return out.sort_values(["event_type", "day"]).reset_index(drop=True)


def q_customers_no_urgent(sf_dir: str) -> pd.DataFrame:
    """Distributed ANTI join (customers with no URGENT order), 100-TB
    shaped: the right side is predicate-pruned at the read, both sides
    are tag-unioned onto one narrow schema and exchanged ONCE
    (hash_aggregate on custkey: has_order = max(side), bal_cents =
    sum(bal) — orders rows carry bal 0 and c_custkey is unique, so the
    sum is the customer's balance), then a vectorized filter keeps
    has_order == 0. No broadcast, no per-key Python groups; flipping
    the filter to has_order == 1 is the SEMI join."""
    import pyarrow.compute as pc

    from ..stages.agg import hash_aggregate

    def cust_prep(batch: pa.Table) -> pa.Table:
        bal = pc.round(pc.multiply(batch.column("c_acctbal"), 100.0))
        return pa.table({
            "key": batch.column("c_custkey"),
            "side": pa.array(np.zeros(len(batch), np.int64)),
            "bal": bal.cast(pa.int64()),
        })

    def ord_prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("o_orderpriority"),
                                  "1-URGENT"))
        return pa.table({
            "key": t.column("o_custkey"),
            "side": pa.array(np.ones(len(t), np.int64)),
            "bal": pa.array(np.zeros(len(t), np.int64)),
        })

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]) \
        .map_batches(cust_prep, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]) \
        .map_batches(ord_prep, batch_format="pyarrow")
    agg = hash_aggregate(cust.union(orders), ["key"],
                         {"has_order": ("side", "max"),
                          "bal_cents": ("bal", "sum")})

    def keep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("has_order"), 0))
        return pa.table({"c_custkey": t.column("key"),
                         "bal_cents": t.column("bal_cents")})

    out = agg.map_batches(keep, batch_format="pyarrow").to_pandas()
    if len(out) == 0:
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype=np.int64),
                            "bal_cents": pd.Series([], dtype=np.int64)})
    return out.sort_values("c_custkey").reset_index(drop=True) \
        .astype(np.int64)


def q_part_value_range(sf_dir: str) -> pd.DataFrame:
    """Range (interval) join: count events whose value falls in each
    part's derived [p_size*2, p_size*2 + 30) bracket. Scale shape:
    the interval table is the SMALL side — its sorted endpoints are
    broadcast once, and each event batch answers ALL intervals with
    two searchsorted calls over its locally sorted values (partial
    counts, one tiny final sum); no shuffle, no per-pair work."""
    part = _small_table(sf_dir, "part", ["p_partkey", "p_size"])
    pk = part.column("p_partkey").to_numpy().astype(np.int64)
    lo = part.column("p_size").to_numpy().astype(np.float64) * 2.0
    hi = lo + 30.0
    iv_ref = ray.put((pk, lo, hi))

    class RangeCountStage:
        def __init__(self, ref):
            self.pk, self.lo, self.hi = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = np.sort(batch.column("value").to_numpy(
                zero_copy_only=False).astype(np.float64))
            n = np.searchsorted(v, self.hi, side="left") \
                - np.searchsorted(v, self.lo, side="left")
            return pa.table({
                "p_partkey": pa.array(self.pk, pa.int64()),
                "n_events": pa.array(n.astype(np.int64), pa.int64()),
            })

    from ..stages.util import stage_fn
    ds = _read(sf_dir, "events", ["value"])
    parts = ds.map_batches(stage_fn(RangeCountStage, iv_ref),
                           batch_format="pyarrow").to_pandas()
    out = parts.groupby("p_partkey", as_index=False)["n_events"].sum()
    out = out[out["n_events"] > 0]
    return out.sort_values("p_partkey").reset_index(drop=True) \
        .astype(np.int64)


def q_event_asof_order(sf_dir: str) -> pd.DataFrame:
    """As-of join: each event looks up the customer's most recent order
    at event time (hash-partitioned co-group + vectorized rank-packed
    merge, stages/asof.py; DuckDB window oracle)."""
    from ..stages.asof import asof_join
    import pyarrow.compute as pc

    # key-domain bound via a streaming aggregate (parquet column stats
    # make this metadata-only per file), not a driver column read
    ncust = int(_read(sf_dir, "orders", ["o_custkey"])
                .max("o_custkey")) + 1

    def ev_prep(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "event_id": batch.column("event_id"),
            "asof_key": pa.array(uid % ncust, pa.int64()),
            "ts": batch.column("ts"),
        })

    def ord_prep(batch: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(batch.column("o_totalprice"), 100.0))
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "o_orderdate": batch.column("o_orderdate"),
            "o_orderkey": batch.column("o_orderkey"),
            "total_cents": cents.cast(pa.int64()),
        })

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"]) \
        .map_batches(ev_prep, batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_orderkey",
                    "o_totalprice"]) \
        .map_batches(ord_prep, batch_format="pyarrow")
    out = asof_join(
        events, orders,
        left_key="asof_key", left_t="ts",
        right_key="o_custkey", right_t="o_orderdate",
        right_id="o_orderkey",
        left_cols={"event_id": "event_id"},
        right_cols={"o_orderkey": "o_orderkey",
                    "total_cents": "total_cents"}).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True) \
        .astype(np.int64)


def q_jaccard_verify(sf_dir: str, threshold_e3: int = 300) -> pd.DataFrame:
    """Near-dup detection end to end, 100TB-shaped: MinHash+LSH candidate
    pairs (a Dataset) are joined BACK to the documents table with two
    distributed hash joins on doc_id — no whole-corpus broadcast — and
    each joined batch verifies exact n-gram Jaccard locally; emits pairs
    with jaccard >= threshold."""
    from ..stages.dedup import jaccard
    # materialize between joins: two chained lazy JoinOperators can
    # resource-deadlock (join aggregator actors + upstream map tasks
    # all waiting on CPUs); the candidate table is O(near-dups), far
    # smaller than the corpus, so the barrier is cheap at any scale
    cand = _minhash_candidates_ds(sf_dir).materialize()
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    j1 = cand.join(docs, "inner", 8, on=("min_doc",), right_on=("doc_id",),
                   right_suffix="_a").materialize()
    j2 = j1.join(docs, "inner", 8, on=("max_doc",), right_on=("doc_id",),
                 right_suffix="_b")

    def verify(batch: pa.Table) -> pa.Table:
        a = batch.column("min_doc").to_pylist()
        b = batch.column("max_doc").to_pylist()
        # the two joins leave one text column per side
        names = batch.column_names
        ta = batch.column("text" if "text" in names else "text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        oa, ob, oj = [], [], []
        for x, y, tx, ty in zip(a, b, ta, tb):
            j = int(round(jaccard(tx, ty) * 1000))
            if j >= threshold_e3:
                oa.append(x); ob.append(y); oj.append(j)
        return pa.table({
            "min_doc": pa.array(oa, pa.int64()),
            "max_doc": pa.array(ob, pa.int64()),
            "jaccard_e3": pa.array(oj, pa.int64()),
        })

    out = j2.map_batches(verify, batch_format="pyarrow").to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"min_doc": pd.Series([], dtype=np.int64),
                             "max_doc": pd.Series([], dtype=np.int64),
                             "jaccard_e3": pd.Series([], dtype=np.int64)})
    return out.sort_values(["min_doc", "max_doc"]).reset_index(drop=True) \
        .astype(np.int64)


def q_doc_minhash(sf_dir: str) -> pd.DataFrame:
    """Full MinHash signatures per document as a comma-joined string
    (SQL-checked against the permutation arithmetic oracle)."""
    from ..stages.dedup import MinHashStage
    from ..stages.util import stage_fn
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    sigs = ds.map_batches(stage_fn(MinHashStage),
                          batch_format="pyarrow").to_pandas()
    sigs["sig"] = sigs["minhash"].map(
        lambda v: ",".join(str(int(x)) for x in v))
    return sigs[["doc_id", "sig"]].sort_values("doc_id")         .reset_index(drop=True)


# ---------------------------------------------------------------------------
# Deterministic sampling (training-data pipelines): sample membership is
# a pure function of doc_id, so resumed / re-sharded runs keep exactly
# the same sample and any engine (here: DuckDB oracle) reproduces it.
# ---------------------------------------------------------------------------

_SAMPLE_MULT = 2654435761          # Knuth multiplicative hash constant
_SAMPLE_MOD = 4294967296           # 2^32


def _sample_hash(ids: np.ndarray) -> np.ndarray:
    # uint64 arithmetic: int64 would silently wrap for id >= ~3.47e9
    # while the DuckDB oracle computes exactly, diverging membership.
    h = (ids.astype(np.uint64) * np.uint64(_SAMPLE_MULT)) \
        % np.uint64(_SAMPLE_MOD)
    return h.astype(np.int64)


def q_doc_sample_hash(sf_dir: str) -> pd.DataFrame:
    """~10% deterministic sample of documents: keep doc when
    hash(doc_id) % 100 < 10. Pure per-batch map — no shuffle, no
    state; scales as a single streaming pass."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def stage(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        bucket = _sample_hash(ids) % 100
        keep = bucket < 10
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "sample_bucket": pa.array(bucket[keep], pa.int64()),
        })

    out = ds.map_batches(stage, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_doc_sample_stratified(sf_dir: str) -> pd.DataFrame:
    """Per-language stratified 20% sample: rank documents within their
    predicted language by the deterministic hash (doc_id tiebreak) and
    keep the first ceil(n/5) of each stratum. Distributed shape:
    per-batch language ID, then ONE groupby(lang) exchange with a
    vectorized per-group rank."""
    from ..stages.text import lang_id
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    langs = ds.map_batches(lang_id, batch_format="pyarrow")

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["doc_id"].to_numpy(np.int64)
        hv = _sample_hash(ids)
        order = np.lexsort((ids, hv))
        k = (len(ids) + 4) // 5
        sel = np.sort(order[:k])
        return pd.DataFrame({
            "doc_id": ids[sel],
            "pred_lang": group["pred_lang"].to_numpy()[sel],
        })

    out = langs.groupby("pred_lang").map_groups(pick).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Sketch-based scan primitives (stages/sketch.py)
# ---------------------------------------------------------------------------

def q_events_kmv_distinct(sf_dir: str) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT user_id) via a KMV sketch: one
    shuffle-free pass, k*8 bytes per block, tiny driver merge — the
    100-TB shape for cardinality estimation (vs the exact pair-hash
    exchange of q_events_distinct_users). Deterministic: the oracle
    replays the multiplicative hash and the floor-division estimator
    in HUGEINT, so the estimate hash-matches bit-for-bit."""
    from ..stages.sketch import kmv_distinct
    ds = _read(sf_dir, "events", ["user_id"])
    return kmv_distinct(ds, "user_id", k=64)


def q_events_heavy_users(sf_dir: str) -> pd.DataFrame:
    """EXACT phi-heavy hitters (users with >= ceil(0.8% of all events))
    without ever exchanging raw rows: per-block Misra-Gries summaries
    (mergeable, no false negatives above N/(m+1)) -> driver candidate
    merge -> second pass exact-counts ONLY the <= m candidates against
    a broadcast sorted key array. At 10^9 users this replaces the full
    groupby exchange with two scans + an m-row driver table."""
    from ..stages.sketch import heavy_hitters
    ds = _read(sf_dir, "events", ["user_id"])
    return heavy_hitters(ds, "user_id", phi_num=8, phi_den=1000)


def q_lineitem_bloom_revenue(sf_dir: str) -> pd.DataFrame:
    """Revenue by return flag for lineitems of URGENT orders, shaped as
    a Bloom-prefiltered exact semi-join: the build side (urgent order
    keys) becomes a 2^20-bit Bloom filter (per-block partial bitmaps,
    AggregateFn OR-reduction, ~128 KB broadcast once), the probe side drops
    non-members batch-locally and partial-aggregates survivors per
    (orderkey, flag), and ONE co-partitioned hash exchange verifies
    survivors against the true key set — false positives are removed
    there, so the result is exact while the exchange carries only
    bloom-surviving groups (~|semi-join| rows, not |lineitem|)."""
    import pyarrow.compute as pc

    from ..stages.agg import _part_of, hash_aggregate
    from ..stages.sketch import bloom_mask, build_bloom
    from ..stages.util import stage_fn

    LOG2_M, K, P = 20, 4, 32

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def okeys(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("o_orderpriority"),
                                  "1-URGENT"))
        return pa.table({"key": t.column("o_orderkey")})

    build = orders.map_batches(okeys, batch_format="pyarrow")
    words_ref = ray.put(build_bloom(build, "key", LOG2_M, K))

    class ProbeStage:
        def __init__(self, ref):
            self.words = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            keep = bloom_mask(df["l_orderkey"].to_numpy(), self.words,
                              LOG2_M, K)
            d = df[keep].copy()
            d["rev"] = d["l_extendedprice"] * (1.0 - d["l_discount"])
            g = d.groupby(["l_orderkey", "l_returnflag"], as_index=False) \
                .agg(rev=("rev", "sum"), n=("rev", "size"))
            out = pd.DataFrame({
                "key": g["l_orderkey"].astype(np.int64),
                "flag": g["l_returnflag"],
                "rev": g["rev"],
                "n": g["n"].astype(np.int64),
                "side": np.int64(0),
            })
            out["part"] = _part_of(out, ["key"], P)
            return pa.Table.from_pandas(
                out, preserve_index=False).replace_schema_metadata(None)

    def btag(batch: pa.Table) -> pa.Table:
        out = pd.DataFrame({
            "key": batch.column("key").to_numpy(zero_copy_only=False)
            .astype(np.int64),
            "flag": "",
            "rev": 0.0,
            "n": np.int64(0),
            "side": np.int64(1),
        })
        out["part"] = _part_of(out, ["key"], P)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    survivors = _read(sf_dir, "lineitem",
                      ["l_orderkey", "l_returnflag", "l_extendedprice",
                       "l_discount"]) \
        .map_batches(stage_fn(ProbeStage, words_ref),
                     batch_format="pyarrow")
    both = survivors.union(build.map_batches(btag, batch_format="pyarrow"))

    def verify(group: pa.Table) -> pa.Table:
        g = group.to_pandas()
        true_keys = g.loc[g["side"] == 1, "key"].to_numpy(np.int64)
        left = g[g["side"] == 0]
        ok = left["key"].isin(true_keys)
        keep = left[ok]
        return pa.Table.from_pandas(
            keep[["flag", "rev", "n"]],
            preserve_index=False).replace_schema_metadata(None)

    joined = both.groupby("part").map_groups(verify,
                                             batch_format="pyarrow")
    agg = hash_aggregate(joined, ["flag"],
                         {"revenue": ("rev", "sum"),
                          "n_items": ("n", "sum")},
                         num_partitions=4).to_pandas()
    agg["revenue_cents"] = (agg["revenue"] * 100).round().astype(np.int64)
    out = agg.rename(columns={"flag": "l_returnflag"})
    out["n_items"] = out["n_items"].astype(np.int64)
    return out[["l_returnflag", "revenue_cents", "n_items"]] \
        .sort_values("l_returnflag").reset_index(drop=True)
