"""Driver contract for the Ray-Data-native overlay engine.

``entry()`` runs the flagship H3-partitioned boolean-overlay spatial
join at sf0.001 scale; ``queries()`` exposes one pipeline per
implemented operator family (SURVEY.md §2 + training-data ops);
``oracle_sql()`` gives DuckDB equivalents for the SQL-expressible ones.
Geometry answers are checked through arithmetic oracles (rect interval
math, range PIP, integer kNN) so the overlay kernel itself is inside
the verified path.

Ray is initialised by the caller — nothing here calls ray.init().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF001 = "/root/testdata/sf0.001"


def _harden_worker_imports() -> None:
    """If the driver launched from outside the repo, Ray workers may not
    have the repo on their import path (Ray snapshots sys.path at
    ray.init, before this module is imported). Fall back to shipping the
    package by value through cloudpickle."""
    if os.getcwd() == _REPO:
        return
    try:
        import importlib
        import pkgutil

        from ray import cloudpickle
        import ioverlay_ray  # noqa: F401
        # import EVERY module of the package so all of them get
        # registered by value (workers have no repo on sys.path)
        for m in pkgutil.walk_packages(ioverlay_ray.__path__,
                                       prefix="ioverlay_ray."):
            try:
                importlib.import_module(m.name)
            except Exception:
                pass
        for name, mod in list(sys.modules.items()):
            if name.startswith("ioverlay_ray") and mod is not None:
                try:
                    cloudpickle.register_pickle_by_value(mod)
                except Exception:
                    pass
    except Exception:
        pass


def entry() -> Any:
    _harden_worker_imports()
    from ioverlay_ray.pipelines import flagship
    ds = flagship.images_dataset(256)
    res = flagship.overlay_join(ds, "intersect")
    return flagship.tile_summary(res)


def queries() -> dict[str, Callable[[str], Any]]:
    _harden_worker_imports()
    from ioverlay_ray.pipelines import geometry_queries as gq
    from ioverlay_ray.pipelines import giant_pip as gp
    from ioverlay_ray.pipelines import media as mq
    from ioverlay_ray.pipelines import relational as rq
    q = {
        # core relational operators (map/filter/agg/join/sort/distinct)
        "q_pricing_summary": rq.q_pricing_summary,
        "q_top_orders": rq.q_top_orders,
        "q_nation_customers": rq.q_nation_customers,
        "q_order_revenue_topk": rq.q_order_revenue_topk,
        "q_part_brands": rq.q_part_brands,
        "q_events_daily": rq.q_events_daily,
        # exact COUNT(DISTINCT) per group (pair-hash exchange)
        "q_events_distinct_users": rq.q_events_distinct_users,
        # sketch scans (stages/sketch.py): one shuffle-free pass each;
        # the oracles replay the 64-bit multiplicative hash / integer
        # threshold math in HUGEINT so results hash-match bit-for-bit
        "q_events_kmv_distinct": rq.q_events_kmv_distinct,
        "q_events_heavy_users": rq.q_events_heavy_users,
        # Bloom-prefiltered exact semi-join (broadcast 128 KB bitmap)
        "q_lineitem_bloom_revenue": rq.q_lineitem_bloom_revenue,
        "q_event_sessions": rq.q_event_sessions,
        # training-data ops
        "q_event_asof_order": rq.q_event_asof_order,
        "q_part_value_range": rq.q_part_value_range,
        # distributed anti join (single tagged hash exchange)
        "q_customers_no_urgent": rq.q_customers_no_urgent,
        "q_top_orders_per_priority": rq.q_top_orders_per_priority,
        "q_price_quantiles": rq.q_price_quantiles,
        "q_events_sliding": rq.q_events_sliding,
        "q_doc_dedup_exact": rq.q_doc_dedup_exact,
        "q_doc_sample_hash": rq.q_doc_sample_hash,
        "q_doc_sample_stratified": rq.q_doc_sample_stratified,
        "q_doc_token_stats": rq.q_doc_token_stats,
        # incremental ingest dedup (wave 2 against persisted wave-1
        # state; final kept set equals one-shot dedup)
        "q_incremental_dedup": rq.q_incremental_dedup,
        # benchmark n-gram decontamination (broadcast small side)
        "q_doc_decontaminate": rq.q_doc_decontaminate,
        # token repetition filter features (shuffle-free scan)
        "q_doc_repetition": rq.q_doc_repetition,
        # distributed TF-IDF (integer idf surrogate; strict hash match)
        "q_doc_tfidf_terms": rq.q_doc_tfidf_terms,
        "q_doc_quality": rq.q_doc_quality,
        "q_doc_lang": rq.q_doc_lang,
        "q_doc_fingerprint": rq.q_doc_fingerprint,
        # context-window chunking (training-sequence preparation)
        "q_doc_chunks": rq.q_doc_chunks,
        # distributed BM25 keyword ranking (exact integer scoring)
        "q_doc_bm25": rq.q_doc_bm25,
        # bigram-LM fluency scoring (model counts + scoring fused into
        # ONE w1-hash exchange; exact integer milli-probabilities)
        "q_doc_lm_fluency": rq.q_doc_lm_fluency,
        # deterministic training-epoch shuffle (seeded LCG key;
        # verifiable head via the partial-top-k combiner)
        "q_epoch_shuffle_head": rq.q_epoch_shuffle_head,
        # per-key LAG window (days since previous order; one hash
        # exchange + group-local sort, no global sort)
        "q_order_gaps": rq.q_order_gaps,
        # training-sequence packing within hash shards
        "q_pack_sequences": rq.q_pack_sequences,
        # curriculum mixture sampling to a token budget
        "q_source_mix": rq.q_source_mix,
        # big-big LEFT OUTER hash join (Q13 shape, tagged exchange)
        "q_customer_order_dist": rq.q_customer_order_dist,
        # ExactSubstr-style duplicated-span detection (corpus self-join)
        "q_doc_dup_spans": rq.q_doc_dup_spans,
        # tokenizer-vocabulary induction (exact global top-100 terms)
        "q_vocab_topk": rq.q_vocab_topk,
        # corpus-quantile quality filter (exact p75 threshold, no sort)
        "q_doc_quality_filter": rq.q_doc_quality_filter,
        # END-TO-END curation: quality -> dedup -> span filter -> pack
        "q_curation_pipeline": rq.q_curation_pipeline,
        "q_minhash_bands": rq.q_minhash_bands,
        "q_neardup_clusters": rq.q_neardup_clusters,
        # curation: at most k docs kept per near-dup cluster
        "q_cluster_capped_sample": rq.q_cluster_capped_sample,
        "q_doc_minhash": rq.q_doc_minhash,
        "q_jaccard_verify": rq.q_jaccard_verify,
        "q_simhash": rq.q_simhash,
        "q_ann_cosine_topk": rq.q_ann_cosine_topk,
        "q_ann_ivf_topk": rq.q_ann_ivf_topk,
        "q_embedding_neardup": rq.q_embedding_neardup,
        "q_embedding_neardup_clusters": rq.q_embedding_neardup_clusters,
        "q_kmeans_embeddings": rq.q_kmeans_embeddings,
        "q_ann_lsh_buckets": rq.q_ann_lsh_buckets,
        # int8 embedding quantization (distributed minmax + exact
        # floor codes; checksum columns hash-matched)
        "q_embedding_quantize": rq.q_embedding_quantize,
        # geometry engine (SQL-checked via arithmetic oracles)
        "q_rect_intersect_area": gq.q_rect_intersect_area,
        "q_pip_count": gq.q_pip_count,
        "q_knn_centers": gq.q_knn_centers,
        "q_rect_relate": gq.q_rect_relate,
        "q_clip_segments": gq.q_clip_segments,
        "q_dissolve_area": gq.q_dissolve_area,
        "q_giant_pip": gp.q_giant_pip,
        "q_tiled_overlay": gq.q_tiled_overlay,  # SQL-checked since r2
        # r3: the reference's integer perf workloads (test_1/4/5/8)
        # through their distributed index-math pipelines; the oracle is
        # the closed-form count/area arithmetic (windmill's per-cell
        # area constant is pinned by the whole-scene kernel parity test)
        "q_ref_workloads": gq.q_ref_workloads,
        # geometry engine (rows-only; fixture corpus is gated by the
        # 147-case golden pytest suite with variant-aware compare —
        # the golden variants are ambiguous, so no single-valued SQL)
        "q_overlay_fixture_corpus": gq.q_overlay_fixture_corpus,
        # SQL-checked since r3: closed-form tile/pairs/footprint-area
        # recompute + kernel-bound boolean invariants
        "q_flagship_tiles": gq.q_flagship_tiles,
        # multimodal (SQL-checked since r2: generator-recompute VALUES
        # oracles verify the encode->parquet->decode round trip)
        "q_image_decode_stats": mq.q_image_decode_stats,
        # lossy-codec round-trip: decoded-pixel PSNR>=40dB invariant
        "q_image_psnr": mq.q_image_psnr,
        "q_image_embed_topk": mq.q_image_embed_topk,
        # image dedup: phash banding + Hamming verify; the SQL oracle
        # reproduces banding/candidates/verify from generator phashes
        "q_image_phash_neardup": mq.q_image_phash_neardup,
        # caption byte-equality through write->read (input_hint invariant)
        "q_image_caption_roundtrip": mq.q_image_caption_roundtrip,
        # SQL-checked since r2: exact-rational winding recompute oracle
        "q_raster_scanlines": mq.q_raster_scanlines,
        # raster zonal statistics over a vector zone (generator-
        # recompute VALUES oracle; exact integer channel sums)
        "q_zonal_stats": mq.q_zonal_stats,
    }
    # The driver verifies the FIRST 50 entries per round (dict order).
    # Rotate least-recently-verified rows to the front so every query
    # gets a driver row across consecutive rounds: these 21 were green
    # in CORRECTNESS_r03 but outside r04's 50-query window (18 rows) or
    # have never had a driver row (q_embedding_quantize, q_image_psnr,
    # q_zonal_stats — pytest + local oracle gated only).
    first = [
        "q_embedding_quantize",
        "q_image_psnr",
        "q_zonal_stats",
        "q_ann_lsh_buckets",
        "q_clip_segments",
        "q_dissolve_area",
        "q_flagship_tiles",
        "q_giant_pip",
        "q_image_caption_roundtrip",
        "q_image_decode_stats",
        "q_image_embed_topk",
        "q_image_phash_neardup",
        "q_kmeans_embeddings",
        "q_knn_centers",
        "q_overlay_fixture_corpus",
        "q_pip_count",
        "q_raster_scanlines",
        "q_rect_intersect_area",
        "q_rect_relate",
        "q_ref_workloads",
        "q_tiled_overlay",
    ]
    head = {k: q[k] for k in first}
    head.update((k, v) for k, v in q.items() if k not in head)
    return head


def _planes_cte(dim: int = 64, n_planes: int = 8, seed: int = 11) -> str:
    """The hyperplane-LSH projection as a SQL VALUES literal — the SAME
    numpy generator call as stages/ann.py HyperplaneLSHStage, with
    repr() floats (exact double round-trip), so DuckDB reproduces the
    bucket signs bit-for-bit."""
    import numpy as np
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(
            i, ", ".join(repr(float(v)) for v in planes[:, i]))
        for i in range(n_planes))
    return f"planes(pid, pv) AS (VALUES {rows})"


def _ivf_cents_cte(dim: int = 64, k_lists: int = 16, seed: int = 13) -> str:
    """Fixed seeded unit centroids as SQL literals — the SAME numpy
    generation as stages/ann.py IVFScanStage (repr doubles, exact)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((k_lists, dim))
    c = c / np.linalg.norm(c, axis=1, keepdims=True)
    rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(
            i, ", ".join(repr(float(v)) for v in c[i]))
        for i in range(k_lists))
    return f"cents(cid, cv) AS (VALUES {rows})"


def _flagship_tiles_oracle(n_images: int = 512, seed: int = 42) -> str:
    """Invariant oracle for q_flagship_tiles: (w, h) per image from the
    SAME generator as sources/synth.py make_images_table_range, tile
    assignment and subject-footprint area recomputed closed-form in SQL
    (stages/tile.py cell_of_bbox with resolution 4 -> cell size 2^18);
    the boolean kernel bounds are TRUE literals the Ray side evaluates
    against its actual intersect areas / shape counts."""
    from ioverlay_ray.sources.synth import _rng
    rows = []
    for i in range(n_images):
        rng = _rng(seed, i)
        w = int(rng.integers(16, 64))
        h = int(rng.integers(16, 64))
        rows.append(f"({i}, {w}, {h})")
    vals = ", ".join(rows)
    return f"""
        WITH imgs(pair_id, w, h) AS (VALUES {vals}),
        cells AS (
            SELECT (CAST(4 AS BIGINT) << 48)
                 | (((((pair_id % 1024) * 4096 + (w * 16) // 2)
                      // 262144) % 16777216) << 24)
                 | ((((pair_id // 1024) * 4096 + (h * 16) // 2)
                      // 262144) % 16777216) AS tile_id,
                   2 * (w * 16) * (h * 16) AS sa
            FROM imgs)
        SELECT tile_id, COUNT(*) AS pairs,
               CAST(SUM(sa) AS BIGINT) AS subj_area2,
               TRUE AS area_ok, TRUE AS shapes_ok
        FROM cells GROUP BY tile_id ORDER BY tile_id
    """


def _band_key_expr() -> str:
    from ioverlay_ray.stages.dedup import band_key_sql_expr
    return band_key_sql_expr("bnd", "vs", 4)


# MinHash+LSH candidate-pair CTE chain (shared by the
# q_minhash_bands oracle and the q_neardup_clusters recursive-CTE
# closure oracle): signatures (md5 shingle hashes through 64 fixed
# perms), 16 bands of 4 rows keyed by the vectorized polynomial mix
# (dedup.band_key_sql_expr replays it exactly), buckets with
# >1 distinct doc.
_MINHASH_CTES = """t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\\s+') AS toks
                FROM documents WHERE trim(text) != ''
            ), sh AS (
                SELECT doc_id,
                       CASE WHEN array_length(toks) < 5
                            THEN array_to_string(toks, ' ')
                            ELSE array_to_string(toks[i + 1:i + 5], ' ') END
                           AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(range(0, GREATEST(1, array_length(toks) - 4)))
                                 AS i
                      FROM t)
            ), hv AS (
                SELECT doc_id,
                       CAST(md5_number_upper(shingle) & 2147483647 AS BIGINT)
                           AS h
                FROM sh
            ), perms(k, a, b) AS (VALUES (0, 2029167940, 2132991552), (1, 1342382292, 25327476), (2, 1469265226, 208719315), (3, 1926751965, 413180457), (4, 1241873584, 2080950717), (5, 1665772334, 1486127662), (6, 1790251936, 1893744462), (7, 483628758, 430799658), (8, 119253155, 1548284816), (9, 644602188, 793573183), (10, 612176794, 1050150559), (11, 1875941738, 8019223), (12, 1959843383, 1326161203), (13, 11307155, 1782513925), (14, 1073283950, 1425262065), (15, 1763574598, 331702645), (16, 282266799, 1146331533), (17, 1711693563, 574665130), (18, 255728785, 2072097652), (19, 1004882659, 1890498904), (20, 1753345571, 399930127), (21, 650757181, 1094767427), (22, 733587778, 2018102210), (23, 597914449, 1819241300), (24, 1545052023, 1520252679), (25, 547328271, 1373782154), (26, 2126996168, 90439481), (27, 955794088, 1592940979), (28, 1026816911, 1016862180), (29, 1083509135, 196485315), (30, 1251001414, 525027445), (31, 1188626512, 1162097506), (32, 1094029749, 1560763481), (33, 2137820579, 1090432573), (34, 1734444720, 1316294024), (35, 1702228508, 1871187062), (36, 1503827931, 1473219433), (37, 1336119720, 775808658), (38, 732347575, 1381360663), (39, 2123775744, 1284590501), (40, 1001222388, 232416243), (41, 462371909, 127241932), (42, 1814811279, 1417675531), (43, 344052723, 832432953), (44, 1841358261, 1284902936), (45, 1315418783, 693715270), (46, 246345230, 484582549), (47, 94364744, 322551461), (48, 955111941, 819442989), (49, 76622815, 1753072728), (50, 303992515, 861136854), (51, 1105715321, 814854448), (52, 2083627518, 1235630862), (53, 1001169815, 2101845076), (54, 1736125123, 842335582), (55, 1969602794, 1266997512), (56, 1768373431, 943789710), (57, 1351253091, 1299348410), (58, 947894554, 957152603), (59, 1104059238, 1370087223), (60, 571810498, 1175000481), (61, 1067027577, 1452665836), (62, 814704260, 2054636806), (63, 531534248, 323814804)
            ), m AS (
                SELECT doc_id, k, MIN((a * h + b) % 2147483647) AS v
                FROM hv CROSS JOIN perms GROUP BY doc_id, k
            ), band AS (
                SELECT doc_id, CAST(k // 4 AS INTEGER) AS bnd,
                       list(v ORDER BY k) AS vs
                FROM m GROUP BY doc_id, k // 4
            ), keys AS (
                SELECT doc_id, {band_key_expr} AS band_key
                FROM band
            ), buckets AS (
                SELECT band_key, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
                FROM keys GROUP BY band_key
                HAVING COUNT(*) > 1 AND MIN(doc_id) != MAX(doc_id)
            )""".format(band_key_expr=_band_key_expr())


def _neardup_ctes() -> str:
    """LSH-bucketed embedding near-dup pair CTE chain (shared by the
    q_embedding_neardup oracle and the q_embedding_neardup_clusters
    recursive closure): buckets from the literal seed-11 hyperplanes,
    same-bucket pairs only (the scale path), bucket-local cosine."""
    return f"""{_planes_cte()},
            n AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings
            ), b AS (
                SELECT n.vec_id,
                       CAST(SUM(CASE WHEN list_dot_product(n.e, p.pv) > 0
                            THEN 1 << p.pid ELSE 0 END) AS BIGINT) AS bucket
                FROM n CROSS JOIN planes p GROUP BY n.vec_id
            ), pairs AS (
                SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
                       list_cosine_similarity(na.e, nb.e) AS sim
                FROM b a JOIN b b2
                  ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
                JOIN n na ON na.vec_id = a.vec_id
                JOIN n nb ON nb.vec_id = b2.vec_id
            )"""


def _kmeans_sql(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    """Unrolled Lloyd's k-means as SQL, replaying stages/kmeans.py
    exactly: init = embeddings of vec_ids 0..k-1, L2 assignment with
    (distance, cid) tie-break, per-dimension means re-quantized to the
    1e-6 grid (floor(x*1e6+0.5)/1e6 — identical in numpy and DuckDB)
    after every iteration, final assignment against c{iters}."""
    parts = [f"""
            -- distributed k-means oracle: {iters} Lloyd iterations
            WITH n AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings
            ), pos(i) AS (SELECT unnest(range(1, {dim + 1}))),
            c0 AS (SELECT vec_id AS cid, e AS cv FROM n
                   WHERE vec_id < {k})"""]
    for t in range(1, iters + 1):
        parts.append(f""",
            a{t} AS (
                SELECT vec_id, cid FROM (
                    SELECT n.vec_id, c.cid,
                           row_number() OVER (PARTITION BY n.vec_id
                               ORDER BY list_distance(n.e, c.cv), c.cid)
                               AS rn
                    FROM n CROSS JOIN c{t - 1} c) WHERE rn = 1
            ), m{t} AS (
                SELECT a.cid, pos.i,
                       FLOOR(AVG(n.e[pos.i]) * 1e6 + 0.5) / 1e6 AS v
                FROM a{t} a JOIN n USING (vec_id) CROSS JOIN pos
                GROUP BY a.cid, pos.i
            ), c{t} AS (
                SELECT c.cid,
                       CASE WHEN COUNT(m.v) = 0 THEN ANY_VALUE(c.cv)
                            ELSE list(m.v ORDER BY m.i) END AS cv
                FROM c{t - 1} c LEFT JOIN m{t} m USING (cid)
                GROUP BY c.cid)""")
    parts.append(f"""
            SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM (
                SELECT n.vec_id, c.cid,
                       row_number() OVER (PARTITION BY n.vec_id
                           ORDER BY list_distance(n.e, c.cv), c.cid) AS rn
                FROM n CROSS JOIN c{iters} c) WHERE rn = 1
            ORDER BY vec_id""")
    return "".join(parts)


def _fixture_corpus_oracle() -> str:
    from ioverlay_ray.pipelines.fixture_oracle import FIXTURE_CORPUS_SQL
    return FIXTURE_CORPUS_SQL


def oracle_sql() -> dict[str, str]:
    return {
        "q_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(ROUND(SUM(l_quantity)) AS BIGINT) AS sum_qty,
                   CAST(ROUND(SUM(l_extendedprice) * 100) AS BIGINT) AS sum_base_cents,
                   CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS sum_disc_cents,
                   COUNT(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "q_top_orders": """
            SELECT o_orderkey,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
            FROM orders WHERE o_orderstatus = 'O'
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "q_nation_customers": """
            SELECT n_name, COUNT(*) AS num_customers
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "q_order_revenue_topk": """
            SELECT o_orderkey, o_orderpriority,
                   CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS revenue_cents
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderkey, o_orderpriority
            ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, o_orderkey
            LIMIT 20
        """,
        "q_part_brands": """
            SELECT p_brand, COUNT(*) AS n_parts FROM part GROUP BY p_brand
        """,
        "q_events_daily": """
            SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
                   COUNT(*) AS n_events,
                   CAST(ROUND(SUM(value) * 100) AS BIGINT) AS value_cents
            FROM events GROUP BY 1, 2
        """,
        "q_top_orders_per_priority": """
            SELECT o_orderpriority, rnk, o_orderkey, total_cents
            FROM (SELECT o_orderpriority, o_orderkey,
                         CAST(ROUND(o_totalprice * 100) AS BIGINT)
                             AS total_cents,
                         row_number() OVER (
                             PARTITION BY o_orderpriority
                             ORDER BY o_totalprice DESC, o_orderkey)
                             AS rnk
                  FROM orders)
            WHERE rnk <= 3 ORDER BY o_orderpriority, rnk
        """,
        "q_price_quantiles": """
            SELECT l_returnflag,
                   CAST(ROUND(quantile_disc(l_extendedprice, 0.5) * 100)
                        AS BIGINT) AS p50_cents,
                   CAST(ROUND(quantile_disc(l_extendedprice, 0.9) * 100)
                        AS BIGINT) AS p90_cents
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "q_events_sliding": """
            WITH daily AS (
                SELECT CAST(ts AS DATE) AS d, event_type,
                       COUNT(*) AS n, SUM(value) AS v
                FROM events GROUP BY 1, 2
            )
            SELECT strftime(d, '%Y-%m-%d') AS day, event_type,
                   CAST(SUM(n) OVER w AS BIGINT) AS n7,
                   CAST(ROUND(SUM(v) OVER w * 100) AS BIGINT)
                       AS value7_cents
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY d
                         RANGE BETWEEN INTERVAL 6 DAYS PRECEDING
                         AND CURRENT ROW)
            ORDER BY event_type, day
        """,
        "q_event_sessions": """
            WITH e AS (
                SELECT user_id, ts,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
                FROM events
            ), s AS (
                SELECT user_id, ts,
                       SUM(CASE WHEN prev IS NULL
                                OR ts - prev > INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
                FROM e
            )
            SELECT user_id,
                   CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
                   COUNT(*) AS n_events,
                   CAST(floor(epoch(MAX(ts))) - floor(epoch(MIN(ts))) AS BIGINT)
                       AS duration_s
            FROM s GROUP BY user_id, sid
        """,
        "q_doc_dedup_exact": """
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
            ORDER BY doc_id
        """,
        "q_incremental_dedup": """
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
            ORDER BY doc_id
        """,
        "q_doc_decontaminate": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t
                FROM documents),
            grams AS (
                SELECT doc_id,
                       array_to_string(
                           t[CAST(i AS BIGINT):CAST(i AS BIGINT)+7],
                           ' ') AS g
                FROM toks, UNNEST(range(1, array_length(t) - 6)) AS u(i)
                WHERE array_length(t) >= 8),
            bench AS (
                SELECT DISTINCT g AS bg FROM grams WHERE doc_id % 23 = 0)
            SELECT gr.doc_id,
                   COUNT(DISTINCT gr.g) AS n_contaminated
            FROM grams gr JOIN bench b ON gr.g = b.bg
            WHERE gr.doc_id % 23 <> 0
            GROUP BY gr.doc_id
            ORDER BY gr.doc_id
        """,
        "q_doc_repetition": """
            WITH tok AS (
                SELECT doc_id, UNNEST(string_split(text, ' ')) AS t
                FROM documents),
            cnt AS (
                SELECT doc_id, t, COUNT(*) AS c
                FROM tok GROUP BY doc_id, t)
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   CAST(MAX(c) AS BIGINT) AS top_count
            FROM cnt GROUP BY doc_id ORDER BY doc_id
        """,
        "q_doc_token_stats": """
            SELECT doc_id,
                   CAST(array_length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(array_length(regexp_extract_all(
                       text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9[:space:]]'))
                       AS BIGINT) AS n_subtokens
            FROM documents
        """,
        "q_doc_lang": """
            WITH p AS (
                SELECT doc_id, ' ' || lower(text) || ' ' AS s FROM documents
            ), sc AS (
                SELECT doc_id,
                  (length(s)-length(replace(s,' the ','')))/5
                + (length(s)-length(replace(s,' and ','')))/5
                + (length(s)-length(replace(s,' of ','')))/4
                + (length(s)-length(replace(s,' ing ','')))/5 AS en_s,
                  (length(s)-length(replace(s,' der ','')))/5
                + (length(s)-length(replace(s,' und ','')))/5
                + (length(s)-length(replace(s,' die ','')))/5
                + (length(s)-length(replace(s,' sch','')))/4 AS de_s,
                  (length(s)-length(replace(s,' le ','')))/4
                + (length(s)-length(replace(s,' les ','')))/5
                + (length(s)-length(replace(s,' de ','')))/4
                + (length(s)-length(replace(s,' une ','')))/5 AS fr_s,
                  (length(s)-length(replace(s,' el ','')))/4
                + (length(s)-length(replace(s,' los ','')))/5
                + (length(s)-length(replace(s,' que ','')))/5
                + (length(s)-length(replace(s,' una ','')))/5 AS es_s
                FROM p
            )
            SELECT doc_id,
                   CASE WHEN GREATEST(en_s, de_s, fr_s, es_s) = 0 THEN 'und'
                        WHEN en_s = GREATEST(en_s, de_s, fr_s, es_s) THEN 'en'
                        WHEN de_s = GREATEST(en_s, de_s, fr_s, es_s) THEN 'de'
                        WHEN fr_s = GREATEST(en_s, de_s, fr_s, es_s) THEN 'fr'
                        ELSE 'es' END AS pred_lang
            FROM sc
        """,
        "q_doc_sample_hash": """
            SELECT doc_id,
                   (doc_id * 2654435761) % 4294967296 % 100
                       AS sample_bucket
            FROM documents
            WHERE (doc_id * 2654435761) % 4294967296 % 100 < 10
        """,
        "q_doc_sample_stratified": """
            WITH lang AS (
            WITH p AS (
                SELECT doc_id, ' ' || lower(text) || ' ' AS s FROM documents
            ), sc AS (
                SELECT doc_id,
                  (length(s)-length(replace(s,' the ','')))/5
                + (length(s)-length(replace(s,' and ','')))/5
                + (length(s)-length(replace(s,' of ','')))/4
                + (length(s)-length(replace(s,' ing ','')))/5 AS en_s,
                  (length(s)-length(replace(s,' der ','')))/5
                + (length(s)-length(replace(s,' und ','')))/5
                + (length(s)-length(replace(s,' die ','')))/5
                + (length(s)-length(replace(s,' sch','')))/4 AS de_s,
                  (length(s)-length(replace(s,' le ','')))/4
                + (length(s)-length(replace(s,' les ','')))/5
                + (length(s)-length(replace(s,' de ','')))/4
                + (length(s)-length(replace(s,' une ','')))/5 AS fr_s,
                  (length(s)-length(replace(s,' el ','')))/4
                + (length(s)-length(replace(s,' los ','')))/5
                + (length(s)-length(replace(s,' que ','')))/5
                + (length(s)-length(replace(s,' una ','')))/5 AS es_s
                FROM p
            )
            SELECT doc_id,
                   CASE WHEN GREATEST(en_s, de_s, fr_s, es_s) = 0 THEN 'und'
                        WHEN en_s = GREATEST(en_s, de_s, fr_s, es_s) THEN 'en'
                        WHEN de_s = GREATEST(en_s, de_s, fr_s, es_s) THEN 'de'
                        WHEN fr_s = GREATEST(en_s, de_s, fr_s, es_s) THEN 'fr'
                        ELSE 'es' END AS pred_lang
            FROM sc
        ),
            ranked AS (
                SELECT doc_id, pred_lang,
                       ROW_NUMBER() OVER (
                           PARTITION BY pred_lang
                           ORDER BY (doc_id * 2654435761) % 4294967296,
                                    doc_id) AS rn,
                       COUNT(*) OVER (PARTITION BY pred_lang) AS cnt
                FROM lang
            )
            SELECT doc_id, pred_lang FROM ranked
            WHERE rn <= (cnt + 4) // 5
        """,
        "q_doc_quality": """
            SELECT doc_id,
                   CAST(length(text) - length(regexp_replace(text, '[.!?]', '', 'g')) AS BIGINT) AS n_punct,
                   CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS BIGINT) AS n_upper,
                   CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit
            FROM documents
        """,
        "q_doc_chunks": """
            WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS toks,
                       CAST(array_length(string_split(text, ' '))
                            AS BIGINT) AS n
                FROM documents
            ), w AS (
                SELECT doc_id, toks, n,
                       unnest(range(0, (n - 1) // 48 + 1)) AS i
                FROM t
            )
            SELECT doc_id,
                   CAST(i AS BIGINT) AS chunk_idx,
                   CAST(i * 48 AS BIGINT) AS start_tok,
                   CAST(LEAST(64, n - i * 48) AS BIGINT) AS n_tokens,
                   toks[CAST(i * 48 + 1 AS BIGINT)] AS first_tok,
                   toks[CAST(i * 48
                        + LEAST(64, n - i * 48) AS BIGINT)] AS last_tok
            FROM w
            ORDER BY doc_id, chunk_idx
        """,
        "q_order_gaps": """
            SELECT o_orderkey,
                   CAST(COALESCE(
                       (epoch(o_orderdate) // 86400)
                       - LAG(epoch(o_orderdate) // 86400) OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey),
                       -1) AS BIGINT) AS gap_days
            FROM orders
            ORDER BY o_orderkey
        """,
        "q_epoch_shuffle_head": """
            SELECT CAST(row_number() OVER (
                       ORDER BY ((doc_id % 2147483648) * 1103515245
                                 + 7) % 2147483648,
                                doc_id) - 1 AS BIGINT) AS epoch_pos,
                   doc_id,
                   CAST(((doc_id % 2147483648) * 1103515245 + 7)
                        % 2147483648 AS BIGINT) AS shuffle_key
            FROM documents
            ORDER BY epoch_pos
            LIMIT 100
        """,
        "q_doc_lm_fluency": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t,
                       CAST(array_length(string_split(text, ' '))
                            AS BIGINT) AS n
                FROM documents
            ), grams AS (
                SELECT doc_id,
                       t[CAST(i + 1 AS BIGINT)] AS w1,
                       t[CAST(i + 2 AS BIGINT)] AS w2
                FROM (SELECT doc_id, t, unnest(range(0, n - 1)) AS i
                      FROM toks)
            ), c2 AS (
                SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
                FROM grams GROUP BY w1, w2
            ), c1 AS (
                SELECT w1, CAST(sum(c2) AS BIGINT) AS c1
                FROM c2 GROUP BY w1
            ), v AS (
                SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
                FROM (SELECT unnest(t) AS w FROM toks)
            )
            SELECT g.doc_id,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   CAST(sum((1000 * (c2.c2 + 1)) // (c1.c1 + v.v))
                        AS BIGINT) AS fluency_milli
            FROM grams g
            JOIN c2 ON g.w1 = c2.w1 AND g.w2 = c2.w2
            JOIN c1 ON g.w1 = c1.w1
            CROSS JOIN v
            GROUP BY g.doc_id
            ORDER BY doc_id
        """,
        "q_doc_bm25": """
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text),
                                                 '[a-z0-9]+')) AS t
                FROM documents),
            dl AS (
                SELECT d.doc_id, COUNT(tok.t) AS dl
                FROM documents d LEFT JOIN tok ON d.doc_id = tok.doc_id
                GROUP BY d.doc_id),
            stats AS (
                SELECT COUNT(*) AS n_docs, SUM(dl) AS s,
                       SUM(dl) // COUNT(*) AS a
                FROM dl),
            tf AS (
                SELECT doc_id, t AS term, COUNT(*) AS tf
                FROM tok
                WHERE t IN ('spark', 'window', 'hash', 'merge')
                GROUP BY doc_id, t),
            df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
            scored AS (
                SELECT tf.term, tf.doc_id, tf.tf, dl.dl,
                       (22 * s.a * (s.n_docs - df.df + 1) * 1000 * tf.tf)
                       // (10 * s.a * tf.tf + 3 * s.a + 9 * dl.dl)
                           AS score_milli
                FROM tf
                JOIN dl ON tf.doc_id = dl.doc_id
                JOIN df ON tf.term = df.term
                CROSS JOIN stats s)
            SELECT term,
                   CAST(row_number() OVER (
                       PARTITION BY term
                       ORDER BY score_milli DESC, doc_id) AS BIGINT) AS rnk,
                   doc_id,
                   CAST(tf AS BIGINT) AS tf,
                   CAST(dl AS BIGINT) AS dl,
                   CAST(score_milli AS BIGINT) AS score_milli
            FROM scored
            QUALIFY rnk <= 10
            ORDER BY term, rnk
        """,
        "q_curation_pipeline": """
            WITH RECURSIVE
            tok0 AS (
                SELECT doc_id, UNNEST(string_split(text, ' ')) AS t
                FROM documents),
            s AS (
                SELECT doc_id,
                       1000 * COUNT(DISTINCT t) // COUNT(*) AS score
                FROM tok0 GROUP BY doc_id),
            thr AS (SELECT quantile_disc(score, 0.75) AS thr FROM s),
            q1 AS (
                SELECT d.doc_id, d.text
                FROM documents d JOIN s ON d.doc_id = s.doc_id, thr
                WHERE s.score >= thr.thr),
            dd AS (SELECT MIN(doc_id) AS doc_id FROM q1 GROUP BY text),
            q2 AS (SELECT q1.doc_id, q1.text
                   FROM q1 JOIN dd ON q1.doc_id = dd.doc_id),
            t2 AS (
                SELECT doc_id, string_split(text, ' ') AS tk,
                       CAST(array_length(string_split(text, ' '))
                            AS BIGINT) AS n
                FROM q2),
            w AS (
                SELECT doc_id, tk,
                       unnest(range(0, GREATEST(0, n - 7))) AS i
                FROM t2),
            g AS (
                SELECT DISTINCT doc_id,
                       array_to_string(tk[CAST(i + 1 AS BIGINT):
                                          CAST(i + 8 AS BIGINT)], ' ')
                           AS gram
                FROM w),
            dgr AS (SELECT gram FROM g GROUP BY gram
                    HAVING COUNT(*) >= 2),
            per AS (
                SELECT g.doc_id, COUNT(*) AS n_spans,
                       COUNT(dgr.gram) AS n_dup
                FROM g LEFT JOIN dgr ON g.gram = dgr.gram
                GROUP BY g.doc_id),
            q3 AS (
                SELECT t2.doc_id,
                       CAST(LEAST(t2.n, 2048) AS BIGINT) AS seq_len,
                       t2.doc_id % 16 AS shard
                FROM t2 LEFT JOIN per ON t2.doc_id = per.doc_id
                WHERE 2 * COALESCE(per.n_dup, 0)
                      <= COALESCE(per.n_spans, 0)),
            b AS (
                SELECT doc_id, shard, seq_len,
                       row_number() OVER (PARTITION BY shard
                                          ORDER BY doc_id) AS rn
                FROM q3),
            p AS (
                SELECT shard, rn, doc_id, seq_len,
                       CAST(0 AS BIGINT) AS pack_id,
                       CAST(0 AS BIGINT) AS pack_off
                FROM b WHERE rn = 1
                UNION ALL
                SELECT b.shard, b.rn, b.doc_id, b.seq_len,
                       CASE WHEN p.pack_off + p.seq_len + b.seq_len
                                 <= 2048
                            THEN p.pack_id ELSE p.pack_id + 1 END,
                       CASE WHEN p.pack_off + p.seq_len + b.seq_len
                                 <= 2048
                            THEN p.pack_off + p.seq_len
                            ELSE CAST(0 AS BIGINT) END
                FROM p JOIN b ON b.shard = p.shard AND b.rn = p.rn + 1)
            SELECT doc_id, CAST(shard AS BIGINT) AS shard, seq_len,
                   pack_id, pack_off
            FROM p ORDER BY doc_id
        """,
        "q_doc_quality_filter": """
            WITH tok AS (
                SELECT doc_id, UNNEST(string_split(text, ' ')) AS t
                FROM documents),
            s AS (
                SELECT doc_id,
                       1000 * COUNT(DISTINCT t) // COUNT(*) AS score
                FROM tok GROUP BY doc_id),
            t AS (SELECT quantile_disc(score, 0.75) AS thr FROM s)
            SELECT s.doc_id, s.score
            FROM s, t WHERE s.score >= t.thr
            ORDER BY s.doc_id
        """,
        "q_vocab_topk": """
            WITH tok AS (
                SELECT unnest(regexp_extract_all(lower(text),
                                                 '[a-z0-9]+')) AS term
                FROM documents),
            c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM tok GROUP BY term)
            SELECT CAST(row_number() OVER (
                       ORDER BY cnt DESC, term) AS BIGINT) AS rnk,
                   term, cnt
            FROM c
            QUALIFY rnk <= 100
            ORDER BY rnk
        """,
        "q_doc_dup_spans": """
            WITH t AS (
                SELECT doc_id, string_split(text, ' ') AS tk,
                       CAST(array_length(string_split(text, ' '))
                            AS BIGINT) AS n
                FROM documents),
            w AS (
                SELECT doc_id, tk,
                       unnest(range(0, GREATEST(0, n - 7))) AS i
                FROM t),
            g AS (
                SELECT DISTINCT doc_id,
                       array_to_string(tk[CAST(i + 1 AS BIGINT):
                                          CAST(i + 8 AS BIGINT)], ' ')
                           AS gram
                FROM w),
            d AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
            per AS (
                SELECT g.doc_id,
                       COUNT(*) AS n_spans,
                       COUNT(d.gram) AS n_dup_spans
                FROM g LEFT JOIN d ON g.gram = d.gram
                GROUP BY g.doc_id)
            SELECT t.doc_id,
                   CAST(COALESCE(per.n_spans, 0) AS BIGINT) AS n_spans,
                   CAST(COALESCE(per.n_dup_spans, 0) AS BIGINT)
                       AS n_dup_spans
            FROM t LEFT JOIN per ON t.doc_id = per.doc_id
            ORDER BY t.doc_id
        """,
        "q_customer_order_dist": """
            SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS custdist
            FROM (
                SELECT c.c_custkey,
                       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
                FROM customer c
                LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                GROUP BY c.c_custkey)
            GROUP BY n_orders
            ORDER BY n_orders
        """,
        "q_source_mix": """
            WITH f AS (
                SELECT doc_id, source,
                       CAST(array_length(string_split(text, ' '))
                            AS BIGINT) AS n_tokens,
                       CAST(replace(source, 'src', '') AS BIGINT) % 4 + 1
                           AS w
                FROM documents),
            tot AS (
                SELECT source, ANY_VALUE(w) AS w,
                       SUM(n_tokens) AS tok_total, COUNT(*) AS n_docs
                FROM f GROUP BY source),
            g AS (
                SELECT SUM(w) AS w_total, SUM(tok_total) // 2 AS t_budget
                FROM tot),
            r AS (
                SELECT source, w, tok_total, n_docs,
                       LEAST(1000, (1000 * g.t_budget * w)
                             // (g.w_total * tok_total)) AS keep_permille
                FROM tot CROSS JOIN g),
            k AS (
                SELECT f.source, COUNT(*) AS n_kept,
                       SUM(f.n_tokens) AS tokens_kept
                FROM f JOIN r ON f.source = r.source
                WHERE (f.doc_id * 2654435761) % 4294967296 % 1000
                      < r.keep_permille
                GROUP BY f.source)
            SELECT r.source,
                   CAST(r.w AS BIGINT) AS w,
                   CAST(r.tok_total AS BIGINT) AS tok_total,
                   CAST(r.n_docs AS BIGINT) AS n_docs,
                   CAST(r.keep_permille AS BIGINT) AS keep_permille,
                   CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
                   CAST(COALESCE(k.tokens_kept, 0) AS BIGINT)
                       AS tokens_kept
            FROM r LEFT JOIN k ON r.source = k.source
            ORDER BY r.source
        """,
        "q_pack_sequences": """
            WITH RECURSIVE t AS (
                SELECT doc_id, doc_id % 16 AS shard,
                       LEAST(CAST(array_length(string_split(text, ' '))
                                  AS BIGINT), 2048) AS seq_len,
                       row_number() OVER (PARTITION BY doc_id % 16
                                          ORDER BY doc_id) AS rn
                FROM documents),
            p AS (
                SELECT shard, rn, doc_id, seq_len,
                       CAST(0 AS BIGINT) AS pack_id,
                       CAST(0 AS BIGINT) AS pack_off
                FROM t WHERE rn = 1
                UNION ALL
                SELECT t.shard, t.rn, t.doc_id, t.seq_len,
                       CASE WHEN p.pack_off + p.seq_len + t.seq_len <= 2048
                            THEN p.pack_id ELSE p.pack_id + 1 END,
                       CASE WHEN p.pack_off + p.seq_len + t.seq_len <= 2048
                            THEN p.pack_off + p.seq_len
                            ELSE CAST(0 AS BIGINT) END
                FROM p JOIN t ON t.shard = p.shard AND t.rn = p.rn + 1)
            SELECT doc_id, CAST(shard AS BIGINT) AS shard, seq_len,
                   pack_id, pack_off
            FROM p ORDER BY doc_id
        """,
        "q_doc_fingerprint": """
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS toks,
                       trim(text) = '' AS empty
                FROM documents
            ), w AS (
                SELECT doc_id, toks,
                       unnest(range(0, GREATEST(1, array_length(toks) - 7)))
                           AS i
                FROM t WHERE NOT empty
            ), h AS (
                SELECT doc_id,
                       MIN(md5_number_upper(
                           array_to_string(toks[i + 1:i + 8], ' '))) AS m
                FROM w GROUP BY doc_id
            )
            SELECT doc_id,
                   CAST(CASE WHEN m >= 9223372036854775808
                        THEN m - 18446744073709551616
                        ELSE m END AS BIGINT) AS fingerprint
            FROM h
            UNION ALL
            SELECT doc_id, 0 AS fingerprint FROM t WHERE empty
        """,
        "q_simhash": """
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS toks,
                       trim(text) = '' AS empty
                FROM documents
            ), tok AS (
                SELECT doc_id, unnest(toks) AS tk FROM t WHERE NOT empty
            ), b AS (
                SELECT doc_id, md5_number_upper(tk) AS hv,
                       unnest(range(0, 64)) AS k
                FROM tok
            ), acc AS (
                SELECT doc_id, k,
                       SUM(CASE WHEN (hv >> CAST(k AS INTEGER)) & 1 = 1
                           THEN 1 ELSE -1 END) AS a
                FROM b GROUP BY doc_id, k
            ), v AS (
                SELECT doc_id,
                       SUM(CASE WHEN a > 0
                           THEN CAST(1 AS HUGEINT) << CAST(k AS INTEGER)
                           ELSE 0 END) AS val
                FROM acc GROUP BY doc_id
            )
            SELECT doc_id,
                   CAST(CASE WHEN val >= CAST(9223372036854775808 AS HUGEINT)
                        THEN val - CAST(18446744073709551616 AS HUGEINT)
                        ELSE val END AS BIGINT) AS simhash
            FROM v
            UNION ALL
            SELECT doc_id, 0 AS simhash FROM t WHERE empty
        """,
        "q_doc_minhash": """
            -- MinHash signatures: md5-based 31-bit shingle hashes through
            -- the stage's 64 fixed permutations (seed 7), min per perm
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\\s+') AS toks,
                       trim(text) = '' AS empty
                FROM documents
            ), sh AS (
                SELECT doc_id,
                       CASE WHEN array_length(toks) < 5
                            THEN array_to_string(toks, ' ')
                            ELSE array_to_string(
                                toks[i + 1:i + 5], ' ') END AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(range(0, GREATEST(1, array_length(toks) - 4)))
                                 AS i
                      FROM t WHERE NOT empty)
            ), hv AS (
                SELECT doc_id,
                       CAST(md5_number_upper(shingle) & 2147483647 AS BIGINT)
                           AS h
                FROM sh
            ), perms(k, a, b) AS (VALUES (0, 2029167940, 2132991552), (1, 1342382292, 25327476), (2, 1469265226, 208719315), (3, 1926751965, 413180457), (4, 1241873584, 2080950717), (5, 1665772334, 1486127662), (6, 1790251936, 1893744462), (7, 483628758, 430799658), (8, 119253155, 1548284816), (9, 644602188, 793573183), (10, 612176794, 1050150559), (11, 1875941738, 8019223), (12, 1959843383, 1326161203), (13, 11307155, 1782513925), (14, 1073283950, 1425262065), (15, 1763574598, 331702645), (16, 282266799, 1146331533), (17, 1711693563, 574665130), (18, 255728785, 2072097652), (19, 1004882659, 1890498904), (20, 1753345571, 399930127), (21, 650757181, 1094767427), (22, 733587778, 2018102210), (23, 597914449, 1819241300), (24, 1545052023, 1520252679), (25, 547328271, 1373782154), (26, 2126996168, 90439481), (27, 955794088, 1592940979), (28, 1026816911, 1016862180), (29, 1083509135, 196485315), (30, 1251001414, 525027445), (31, 1188626512, 1162097506), (32, 1094029749, 1560763481), (33, 2137820579, 1090432573), (34, 1734444720, 1316294024), (35, 1702228508, 1871187062), (36, 1503827931, 1473219433), (37, 1336119720, 775808658), (38, 732347575, 1381360663), (39, 2123775744, 1284590501), (40, 1001222388, 232416243), (41, 462371909, 127241932), (42, 1814811279, 1417675531), (43, 344052723, 832432953), (44, 1841358261, 1284902936), (45, 1315418783, 693715270), (46, 246345230, 484582549), (47, 94364744, 322551461), (48, 955111941, 819442989), (49, 76622815, 1753072728), (50, 303992515, 861136854), (51, 1105715321, 814854448), (52, 2083627518, 1235630862), (53, 1001169815, 2101845076), (54, 1736125123, 842335582), (55, 1969602794, 1266997512), (56, 1768373431, 943789710), (57, 1351253091, 1299348410), (58, 947894554, 957152603), (59, 1104059238, 1370087223), (60, 571810498, 1175000481), (61, 1067027577, 1452665836), (62, 814704260, 2054636806), (63, 531534248, 323814804)
            ), m AS (
                SELECT doc_id, k, MIN((a * h + b) % 2147483647) AS v
                FROM hv CROSS JOIN perms GROUP BY doc_id, k
            )
            SELECT doc_id, array_to_string(list(v ORDER BY k), ',') AS sig
            FROM m GROUP BY doc_id
            UNION ALL
            SELECT doc_id, array_to_string(list_value(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0), ',') AS sig
            FROM t WHERE empty
        """,
        "q_minhash_bands": "WITH " + _MINHASH_CTES + """
            SELECT DISTINCT min_doc, max_doc FROM buckets
            ORDER BY min_doc, max_doc
        """,
        # near-dup clustering: the LSH candidate pairs (same CTE chain)
        # closed into connected components by a recursive transitive
        # reachability CTE; cluster_id = min doc_id reachable
        "q_neardup_clusters": "WITH RECURSIVE " + _MINHASH_CTES + """,
            cand AS (SELECT DISTINCT min_doc, max_doc FROM buckets),
            edges AS (SELECT min_doc AS s, max_doc AS d FROM cand
                      UNION SELECT max_doc, min_doc FROM cand),
            reach(id, lbl) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id
            )
            SELECT id AS doc_id, MIN(lbl) AS cluster_id
            FROM reach GROUP BY id ORDER BY doc_id
        """,
        "q_cluster_capped_sample": "WITH RECURSIVE " + _MINHASH_CTES + """,
            cand AS (SELECT DISTINCT min_doc, max_doc FROM buckets),
            edges AS (SELECT min_doc AS s, max_doc AS d FROM cand
                      UNION SELECT max_doc, min_doc FROM cand),
            reach(id, lbl) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id
            ),
            lab AS (SELECT id AS doc_id, MIN(lbl) AS cluster_id
                    FROM reach GROUP BY id)
            SELECT cluster_id, rnk, doc_id FROM (
                SELECT cluster_id, doc_id,
                       CAST(row_number() OVER (PARTITION BY cluster_id
                            ORDER BY doc_id) AS BIGINT) AS rnk
                FROM lab) t
            WHERE rnk <= 2
            ORDER BY cluster_id, rnk
        """,
        "q_jaccard_verify": """
            -- LSH candidates verified by exact 5-gram jaccard, all in SQL
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\\s+') AS toks
                FROM documents WHERE trim(text) != ''
            ), sh AS (
                SELECT doc_id,
                       CASE WHEN array_length(toks) < 5
                            THEN array_to_string(toks, ' ')
                            ELSE array_to_string(toks[i + 1:i + 5], ' ') END
                           AS shingle
                FROM (SELECT doc_id, toks,
                             unnest(range(0, GREATEST(1, array_length(toks) - 4)))
                                 AS i
                      FROM t)
            ), sh_d AS (
                SELECT DISTINCT doc_id, shingle FROM sh
            ), hv AS (
                SELECT doc_id,
                       CAST(md5_number_upper(shingle) & 2147483647 AS BIGINT)
                           AS h
                FROM sh
            ), perms(k, a, b) AS (VALUES (0, 2029167940, 2132991552), (1, 1342382292, 25327476), (2, 1469265226, 208719315), (3, 1926751965, 413180457), (4, 1241873584, 2080950717), (5, 1665772334, 1486127662), (6, 1790251936, 1893744462), (7, 483628758, 430799658), (8, 119253155, 1548284816), (9, 644602188, 793573183), (10, 612176794, 1050150559), (11, 1875941738, 8019223), (12, 1959843383, 1326161203), (13, 11307155, 1782513925), (14, 1073283950, 1425262065), (15, 1763574598, 331702645), (16, 282266799, 1146331533), (17, 1711693563, 574665130), (18, 255728785, 2072097652), (19, 1004882659, 1890498904), (20, 1753345571, 399930127), (21, 650757181, 1094767427), (22, 733587778, 2018102210), (23, 597914449, 1819241300), (24, 1545052023, 1520252679), (25, 547328271, 1373782154), (26, 2126996168, 90439481), (27, 955794088, 1592940979), (28, 1026816911, 1016862180), (29, 1083509135, 196485315), (30, 1251001414, 525027445), (31, 1188626512, 1162097506), (32, 1094029749, 1560763481), (33, 2137820579, 1090432573), (34, 1734444720, 1316294024), (35, 1702228508, 1871187062), (36, 1503827931, 1473219433), (37, 1336119720, 775808658), (38, 732347575, 1381360663), (39, 2123775744, 1284590501), (40, 1001222388, 232416243), (41, 462371909, 127241932), (42, 1814811279, 1417675531), (43, 344052723, 832432953), (44, 1841358261, 1284902936), (45, 1315418783, 693715270), (46, 246345230, 484582549), (47, 94364744, 322551461), (48, 955111941, 819442989), (49, 76622815, 1753072728), (50, 303992515, 861136854), (51, 1105715321, 814854448), (52, 2083627518, 1235630862), (53, 1001169815, 2101845076), (54, 1736125123, 842335582), (55, 1969602794, 1266997512), (56, 1768373431, 943789710), (57, 1351253091, 1299348410), (58, 947894554, 957152603), (59, 1104059238, 1370087223), (60, 571810498, 1175000481), (61, 1067027577, 1452665836), (62, 814704260, 2054636806), (63, 531534248, 323814804)
            ), m AS (
                SELECT doc_id, k, MIN((a * h + b) % 2147483647) AS v
                FROM hv CROSS JOIN perms GROUP BY doc_id, k
            ), band AS (
                SELECT doc_id, CAST(k // 4 AS INTEGER) AS bnd,
                       list(v ORDER BY k) AS vs
                FROM m GROUP BY doc_id, k // 4
            ), keys AS (
                SELECT doc_id, """ + _band_key_expr() + """ AS band_key
                FROM band
            ), cand AS (
                SELECT DISTINCT MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
                FROM keys GROUP BY band_key
                HAVING COUNT(*) > 1 AND MIN(doc_id) != MAX(doc_id)
            ), sizes AS (
                SELECT doc_id, COUNT(*) AS n FROM sh_d GROUP BY doc_id
            ), inter AS (
                SELECT c.min_doc, c.max_doc, COUNT(*) AS common
                FROM cand c
                JOIN sh_d x ON x.doc_id = c.min_doc
                JOIN sh_d y ON y.doc_id = c.max_doc AND y.shingle = x.shingle
                GROUP BY c.min_doc, c.max_doc
            )
            SELECT c.min_doc, c.max_doc,
                   CAST(ROUND(1000.0 * COALESCE(i.common, 0)
                        / (sa.n + sb.n - COALESCE(i.common, 0))) AS BIGINT)
                       AS jaccard_e3
            FROM cand c
            JOIN sizes sa ON sa.doc_id = c.min_doc
            JOIN sizes sb ON sb.doc_id = c.max_doc
            LEFT JOIN inter i ON i.min_doc = c.min_doc
                             AND i.max_doc = c.max_doc
            WHERE CAST(ROUND(1000.0 * COALESCE(i.common, 0)
                  / (sa.n + sb.n - COALESCE(i.common, 0))) AS BIGINT) >= 300
            ORDER BY c.min_doc, c.max_doc
        """,
        "q_ann_cosine_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qe
                FROM embeddings WHERE vec_id < 8
            ), scored AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]),
                           CAST(q.qe AS DOUBLE[])) AS score
                FROM embeddings e CROSS JOIN q
            )
            SELECT query_id, vec_id,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score DESC, vec_id) AS BIGINT) AS rank
            FROM scored
            QUALIFY rank <= 5
        """,
        "q_embedding_neardup": "WITH " + _neardup_ctes() + """
            SELECT id_a, id_b,
                   CAST(ROUND(sim * 1000) AS BIGINT) AS sim_e3
            FROM pairs WHERE sim > 0.4
            ORDER BY id_a, id_b
        """,
        # semantic dedup end to end: the near-dup pairs (same CTE
        # chain) closed into connected components by a recursive
        # transitive-reachability CTE; cluster_id = min vec_id reachable
        "q_embedding_neardup_clusters": "WITH RECURSIVE "
        + _neardup_ctes() + """,
            cand AS (SELECT id_a, id_b FROM pairs WHERE sim > 0.4),
            edges AS (SELECT id_a AS s, id_b AS d FROM cand
                      UNION SELECT id_b, id_a FROM cand),
            reach(id, lbl) AS (
                SELECT vec_id, vec_id FROM embeddings
                UNION
                SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id
            )
            SELECT id AS vec_id, MIN(lbl) AS cluster_id
            FROM reach GROUP BY id ORDER BY vec_id
        """,
        "q_kmeans_embeddings": _kmeans_sql(),
        "q_ann_ivf_topk": f"""
            -- IVF ANN: coarse-quantize to the literal seed-13 unit
            -- centroids, probe the 4 closest lists per query, cosine
            -- top-5 within the probed lists only
            WITH {_ivf_cents_cte()},
            n AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings
            ), assign AS (
                SELECT vec_id, cid FROM (
                    SELECT n.vec_id, c.cid,
                           row_number() OVER (PARTITION BY n.vec_id
                               ORDER BY list_cosine_similarity(n.e, c.cv)
                                   DESC, c.cid) AS rn
                    FROM n CROSS JOIN cents c) WHERE rn = 1
            ), q AS (
                SELECT vec_id AS query_id, e AS qe FROM n WHERE vec_id < 8
            ), probes AS (
                SELECT query_id, cid FROM (
                    SELECT q.query_id, c.cid,
                           row_number() OVER (PARTITION BY q.query_id
                               ORDER BY list_cosine_similarity(q.qe, c.cv)
                                   DESC, c.cid) AS rn
                    FROM q CROSS JOIN cents c) WHERE rn <= 4
            ), cand AS (
                SELECT q.query_id, n.vec_id,
                       list_cosine_similarity(n.e, q.qe) AS score
                FROM q JOIN probes p ON p.query_id = q.query_id
                     JOIN assign a ON a.cid = p.cid
                     JOIN n ON n.vec_id = a.vec_id
            )
            SELECT query_id, vec_id,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score DESC, vec_id) AS BIGINT) AS rank
            FROM cand
            QUALIFY rank <= 5
            ORDER BY query_id, rank
        """,
        "q_ann_lsh_buckets": f"""
            WITH {_planes_cte()},
            n AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings
            ), b AS (
                SELECT n.vec_id,
                       CAST(SUM(CASE WHEN list_dot_product(n.e, p.pv) > 0
                            THEN 1 << p.pid ELSE 0 END) AS BIGINT) AS bucket
                FROM n CROSS JOIN planes p GROUP BY n.vec_id
            )
            SELECT bucket, COUNT(*) AS members,
                   MIN(vec_id) AS min_vec, MAX(vec_id) AS max_vec
            FROM b GROUP BY bucket ORDER BY bucket
        """,
        "q_embedding_quantize": """
            WITH n AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings
            ), -- dim bound comes from the data, not a hardcoded 64,
            -- so a fixture-generator dim change cannot silently check
            -- a prefix of dimensions (ADVICE r4)
            pos(i) AS (SELECT unnest(
                range(1, (SELECT len(e) FROM n LIMIT 1) + 1))),
            mm AS (
                SELECT pos.i, MIN(n.e[pos.i]) AS mn, MAX(n.e[pos.i]) AS mx
                FROM n CROSS JOIN pos GROUP BY pos.i
            ), codes AS (
                SELECT n.vec_id,
                       CASE WHEN mm.mx > mm.mn
                            THEN CAST(FLOOR((n.e[mm.i] - mm.mn) * 255.0
                                            / (mm.mx - mm.mn)) AS BIGINT)
                            ELSE 0 END AS q
                FROM n CROSS JOIN mm
            )
            SELECT vec_id,
                   CAST(SUM(q) AS BIGINT) AS code_sum,
                   CAST(MIN(q) AS BIGINT) AS code_min,
                   CAST(MAX(q) AS BIGINT) AS code_max
            FROM codes GROUP BY vec_id ORDER BY vec_id
        """,
        "q_rect_intersect_area": """
            WITH r AS (
                SELECT p_partkey,
                       (p_partkey * 37) % 4096 AS ax0,
                       (p_partkey * 91) % 4096 AS ay0,
                       (p_partkey * 37) % 4096 + p_size * 3 + 5 AS ax1,
                       (p_partkey * 91) % 4096 + p_size * 2 + 7 AS ay1,
                       (p_partkey * 53 + 17) % 4096 AS bx0,
                       (p_partkey * 29 + 101) % 4096 AS by0,
                       (p_partkey * 53 + 17) % 4096 + p_size * 2 + 9 AS bx1,
                       (p_partkey * 29 + 101) % 4096 + p_size * 3 + 4 AS by1
                FROM part
            )
            SELECT p_partkey,
                   2 * GREATEST(0, LEAST(ax1, bx1) - GREATEST(ax0, bx0))
                     * GREATEST(0, LEAST(ay1, by1) - GREATEST(ay0, by0))
                     AS inter_area2
            FROM r
        """,
        "q_rect_relate": """
            WITH r AS (
                SELECT p_partkey,
                       (p_partkey * 37) % 4096 AS ax0,
                       (p_partkey * 91) % 4096 AS ay0,
                       (p_partkey * 37) % 4096 + p_size * 3 + 5 AS ax1,
                       (p_partkey * 91) % 4096 + p_size * 2 + 7 AS ay1,
                       (p_partkey * 53 + 17) % 4096 AS bx0,
                       (p_partkey * 29 + 101) % 4096 AS by0,
                       (p_partkey * 53 + 17) % 4096 + p_size * 2 + 9 AS bx1,
                       (p_partkey * 29 + 101) % 4096 + p_size * 3 + 4 AS by1
                FROM part
            )
            SELECT p_partkey,
                   CAST(ax0 <= bx1 AND bx0 <= ax1 AND ay0 <= by1 AND by0 <= ay1
                        AS BIGINT) AS r_intersects,
                   CAST(ax0 < bx1 AND bx0 < ax1 AND ay0 < by1 AND by0 < ay1
                        AS BIGINT) AS r_interiors,
                   CAST((ax0 <= bx1 AND bx0 <= ax1 AND ay0 <= by1 AND by0 <= ay1)
                        AND NOT (ax0 < bx1 AND bx0 < ax1 AND ay0 < by1 AND by0 < ay1)
                        AS BIGINT) AS r_touches,
                   CAST(bx0 <= ax0 AND ax1 <= bx1 AND by0 <= ay0 AND ay1 <= by1
                        AS BIGINT) AS r_within
            FROM r
        """,
        "q_clip_segments": """
            WITH r AS (
                SELECT p_partkey,
                       (p_partkey * 37) % 4096 AS ax0,
                       (p_partkey * 37) % 4096 + p_size * 3 + 5 AS ax1,
                       (p_partkey * 11) % 4096 AS lx0,
                       (p_partkey * 11) % 4096 + 500 AS lx1
                FROM part
            )
            SELECT p_partkey,
                   GREATEST(0, LEAST(ax1, lx1) - GREATEST(ax0, lx0)) AS inside_len,
                   500 - GREATEST(0, LEAST(ax1, lx1) - GREATEST(ax0, lx0)) AS outside_len,
                   CAST(GREATEST(0, LEAST(ax1, lx1) - GREATEST(ax0, lx0)) > 0
                        AS BIGINT) AS n_inside
            FROM r
        """,
        "q_dissolve_area": """
            WITH r AS (
                SELECT (p_partkey * 37) % 1024 AS x0,
                       (p_partkey * 91) % 1024 AS y0,
                       (p_partkey * 37) % 1024 + p_size // 8 + 3 AS x1,
                       (p_partkey * 91) % 1024 + p_size // 8 + 2 AS y1
                FROM part
            ), xs AS (
                SELECT y0, y1, unnest(range(x0, x1)) AS cx FROM r
            ), cells AS (
                SELECT cx, unnest(range(y0, y1)) AS cy FROM xs
            )
            SELECT 2 * COUNT(*) AS union_area2
            FROM (SELECT DISTINCT cx, cy FROM cells)
        """,
        "q_tiled_overlay": """
            -- distributed tiled overlay: union (distinct covered unit
            -- cells) and xor (odd-covered cells) of the derived rects
            WITH r AS (
                SELECT p_partkey % 4 AS scene,
                       (p_partkey * 29) % 2048 AS x0,
                       (p_partkey * 67) % 2048 AS y0,
                       (p_partkey * 29) % 2048 + p_size * 2 + 5 AS x1,
                       (p_partkey * 67) % 2048 + p_size + 9 AS y1
                FROM part
            ), xs AS (
                SELECT scene, y0, y1, unnest(range(x0, x1)) AS cx FROM r
            ), cells AS (
                SELECT scene, cx, unnest(range(y0, y1)) AS cy FROM xs
            ), cov AS (
                SELECT scene, cx, cy, COUNT(*) AS n
                FROM cells GROUP BY scene, cx, cy
            )
            SELECT scene,
                   2 * COUNT(*) AS union_area2,
                   2 * COUNT(*) FILTER (WHERE n % 2 = 1) AS xor_area2
            FROM cov GROUP BY scene ORDER BY scene
        """,
        "q_ref_workloads": """
            -- closed-form invariants of the distributed reference perf
            -- workloads (ref_workloads.py): counts and net doubled
            -- areas derive from the generator grids; wind_mill's
            -- per-cell 3200 is the generator constant pinned by the
            -- whole-scene kernel parity test
            SELECT workload, CAST(n AS BIGINT) AS n,
                   CAST(polygons AS BIGINT) AS polygons,
                   CAST(area2 AS BIGINT) AS area2
            FROM (VALUES
                ('nested_squares', 96, 96, 64 * 96 * 96 + 32 * 96),
                ('not_overlap', 24, 24 * 24 + 23 * 23,
                 200 * (24 * 24 + 23 * 23)),
                ('wind_mill', 8, 8 * 8, 8 * 8 * 3200),
                ('windows', 24, 24 * 24, 600 * 24 * 24)
            ) AS t(workload, n, polygons, area2)
            ORDER BY workload
        """,
        "q_giant_pip": """
            -- the comb polygon's winding formula in closed form:
            -- base bottom (+1, py>0), top chain (-1, py>2, px%8 in gaps),
            -- tooth tops (-1, py>h(k), px%8 in the tooth), h(k)=5+(k%5)
            WITH p AS (
                SELECT (event_id * 131) % 16000 AS px,
                       (event_id * 17) % 12 AS py
                FROM events
            )
            SELECT CAST(COUNT(*) FILTER (WHERE py > 0
                AND NOT (py > 2 AND (px % 8 < 2 OR px % 8 >= 6))
                AND NOT (px % 8 >= 2 AND px % 8 < 6
                         AND py > 5 + ((px // 8) % 5))) AS BIGINT)
                AS n_inside
            FROM p
        """,
        "q_pip_count": """
            WITH r AS (
                SELECT p_partkey,
                       (p_partkey * 37) % 4096 AS x0,
                       (p_partkey * 91) % 4096 AS y0,
                       (p_partkey * 37) % 4096 + p_size * 3 + 5 AS x1,
                       (p_partkey * 91) % 4096 + p_size * 2 + 7 AS y1
                FROM part WHERE p_partkey % 17 = 0
            ), p AS (
                SELECT (event_id * 7) % 4096 AS px,
                       (event_id * 13) % 4096 AS py
                FROM events
            )
            -- half-open boundary convention of the winding-number kernel:
            -- a point on the left or top edge is inside, right/bottom out
            SELECT r.p_partkey,
                   CAST(COUNT(*) FILTER (
                       WHERE p.px >= r.x0 AND p.px < r.x1
                         AND p.py > r.y0 AND p.py <= r.y1) AS BIGINT) AS n_points
            FROM r CROSS JOIN p
            GROUP BY r.p_partkey
        """,
        "q_knn_centers": """
            WITH c AS (
                SELECT p_partkey AS center_id,
                       ((p_partkey * 37) % 4096
                        + (p_partkey * 37) % 4096 + p_size * 3 + 5) // 2 AS cx,
                       ((p_partkey * 91) % 4096
                        + (p_partkey * 91) % 4096 + p_size * 2 + 7) // 2 AS cy
                FROM part
            ), q AS (
                SELECT event_id AS query_id,
                       (event_id * 7) % 4096 AS qx,
                       (event_id * 13) % 4096 AS qy
                FROM events WHERE event_id <= 50
            )
            SELECT query_id, center_id,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY (cx - qx) * (cx - qx) + (cy - qy) * (cy - qy),
                                center_id) AS BIGINT) AS rank
            FROM c CROSS JOIN q
            QUALIFY rank <= 5
        """,
        "q_event_asof_order": """
            -- as-of join: most recent order per customer at event time;
            -- ties on the date resolve to the largest orderkey
            SELECT event_id, o_orderkey, total_cents
            FROM (
                SELECT e.event_id, o.o_orderkey,
                       CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                           AS total_cents,
                       row_number() OVER (
                           PARTITION BY e.event_id
                           ORDER BY o.o_orderdate DESC,
                                    o.o_orderkey DESC) AS rn
                FROM events e
                JOIN orders o
                  ON o.o_custkey = e.user_id %
                     (SELECT MAX(o_custkey) + 1 FROM orders)
                 AND o.o_orderdate <= e.ts
            ) WHERE rn = 1
            ORDER BY event_id
        """,
        "q_events_distinct_users": """
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        # KMV sketch replay: the multiplicative hash is a bijection mod
        # 2^64, so DISTINCT user_id -> DISTINCT hashes; the estimator is
        # exact integer floor division in HUGEINT (stages/sketch.py
        # mix64 / kmv_distinct use the identical constants).
        "q_events_kmv_distinct": """
            WITH h AS (
                SELECT DISTINCT
                       (CAST(user_id AS HUGEINT) * 11400714819323198485)
                       % 18446744073709551616 AS hv
                FROM events
            ), r AS (
                SELECT hv, row_number() OVER (ORDER BY hv) AS rn,
                       count(*) OVER () AS nd
                FROM h
            )
            SELECT CAST(64 AS BIGINT) AS k,
                   CAST(LEAST(nd, 64) AS BIGINT) AS n_kept,
                   CAST(CASE WHEN hv >= 9223372036854775808
                             THEN hv - 18446744073709551616
                             ELSE hv END AS BIGINT) AS kth_hash,
                   CAST(CASE WHEN nd < 64 THEN nd
                             ELSE (63 * 18446744073709551616::HUGEINT)
                                  // hv END AS BIGINT) AS est_distinct
            FROM r WHERE rn = LEAST(nd, 64)
        """,
        # the Misra-Gries pass only PRUNES candidates (no false
        # negatives above N/(m+1) < phi*N) and the second pass is an
        # exact count, so the oracle is the plain exact-threshold query
        # with the same ceil(phi*N) integer arithmetic.
        "q_events_heavy_users": """
            WITH tot AS (SELECT count(*) AS n FROM events),
                 g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY user_id)
            SELECT g.user_id, g.n FROM g, tot t
            WHERE g.n >= (8 * t.n + 999) // 1000
            ORDER BY g.user_id
        """,
        # the Bloom prefilter is a superset pass whose false positives
        # are removed by the exact hash semi-join, so the oracle is the
        # plain exact join aggregate.
        "q_lineitem_bloom_revenue": """
            SELECT l_returnflag,
                   CAST(ROUND(SUM(l_extendedprice * (1 - l_discount))
                              * 100) AS BIGINT) AS revenue_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderpriority = '1-URGENT'
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "q_doc_tfidf_terms": """
            WITH toks AS (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text),
                              '[a-z0-9]+')) AS term
                FROM documents
            ), tf AS (
                SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
                FROM toks GROUP BY doc_id, term
            ), df AS (
                SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                FROM tf GROUP BY term
            )
            SELECT doc_id, rnk, term, score FROM (
                SELECT doc_id, term,
                       CAST((tf * 1000000) // df AS BIGINT) AS score,
                       CAST(row_number() OVER (
                           PARTITION BY doc_id
                           ORDER BY (tf * 1000000) // df DESC, term)
                           AS BIGINT) AS rnk
                FROM tf JOIN df USING (term)) t
            WHERE rnk <= 3
            ORDER BY doc_id, rnk
        """,
        "q_customers_no_urgent": """
            SELECT c_custkey,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
            FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_orderpriority = '1-URGENT')
            ORDER BY c_custkey
        """,
        "q_part_value_range": """
            -- range join: events counted into each part's value bracket
            SELECT p.p_partkey, COUNT(*) AS n_events
            FROM part p JOIN events e
              ON e.value >= p.p_size * 2.0
             AND e.value <  p.p_size * 2.0 + 30.0
            GROUP BY p.p_partkey
            ORDER BY p.p_partkey
        """,
        # multimodal round-trip oracles: expected values recomputed
        # directly from the deterministic pixel generator (no encode,
        # no Ray) and embedded as literals — verifies the whole
        # encode -> parquet -> actor-pool-decode pipeline
        "q_image_decode_stats": _image_decode_stats_oracle(),
        "q_zonal_stats": _zonal_stats_oracle(),
        "q_image_psnr": _image_psnr_oracle(),
        "q_image_embed_topk": _image_embed_topk_oracle(),
        "q_image_phash_neardup": _image_phash_neardup_oracle(),
        "q_image_caption_roundtrip": _image_caption_oracle(),
        # raster scanlines: exact-rational winding recompute with
        # kernel-spec crossing rounding (snap-hazard images fall back
        # to the clip kernel; see media.scanline_oracle_rows)
        "q_raster_scanlines": _raster_scanlines_oracle(),
        # flagship tiles: closed-form tile/pair/footprint recompute +
        # kernel-bound booleans (r2 VERDICT next-round #8)
        "q_flagship_tiles": _flagship_tiles_oracle(),
        # fixture corpus: frozen VALUES of the canonical variant's
        # per-(case, rule) shape/ring/vertex counts + exact area2;
        # ground truth is the pytest golden-fixture gate, regenerated
        # by tools/gen_fixture_oracle.py (r3 VERDICT next-round #6)
        "q_overlay_fixture_corpus": _fixture_corpus_oracle(),
    }


def _raster_scanlines_oracle() -> str:
    from ioverlay_ray.pipelines.media import scanline_oracle_rows
    vals = ",\n".join(f"({p}, {r}, {c})"
                      for p, r, c in scanline_oracle_rows(256))
    return f"""
        SELECT CAST(pair_id AS BIGINT) AS pair_id,
               CAST(covered_rows AS BIGINT) AS covered_rows,
               CAST(covered_len2 AS BIGINT) AS covered_len2
        FROM (VALUES {vals})
        AS t(pair_id, covered_rows, covered_len2)
        ORDER BY pair_id
    """


def _image_phash_neardup_oracle() -> str:
    """Perceptual-hash dedup oracle: phash values come from the
    generator (decode is not SQL-expressible) but the PIPELINE — 4 x
    16-bit banding via arithmetic shift+mask (two's complement matches
    the numpy uint64 view), same-band candidate join, popcount-of-xor
    Hamming verify, distinct — is reproduced entirely in SQL."""
    from ioverlay_ray.pipelines.media import phash_oracle_rows
    vals = ",\n".join(f"({i}, {p})" for i, p in phash_oracle_rows(240))
    return f"""
        WITH imgs(idx, ph) AS (VALUES {vals}),
        bands AS (
            SELECT idx, ph, b.b AS band,
                   (ph >> (16 * b.b)) & 65535 AS bval
            FROM imgs CROSS JOIN (SELECT unnest(range(4)) AS b) b
        ),
        cand AS (
            SELECT DISTINCT a.idx AS id_a, c.idx AS id_b,
                   a.ph AS pa, c.ph AS pb
            FROM bands a JOIN bands c
              ON a.band = c.band AND a.bval = c.bval AND a.idx < c.idx
        )
        SELECT id_a, id_b,
               CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(pa, pb)) <= 6
        ORDER BY id_a, id_b
    """


def _image_caption_oracle() -> str:
    from ioverlay_ray.pipelines.media import caption_oracle_rows
    vals = ",\n".join(f"('{i}', {d})" for i, d in caption_oracle_rows(256))
    return f"""
        SELECT image_id, CAST(caption_md5 AS BIGINT) AS caption_md5
        FROM (VALUES {vals}) AS t(image_id, caption_md5)
        ORDER BY image_id
    """


def _image_psnr_oracle() -> str:
    from ioverlay_ray.pipelines.media import psnr_oracle_rows
    vals = ",\n".join(f"('{i}', {n}, {s}, {m}, {o})"
                      for i, n, s, m, o in psnr_oracle_rows(256))
    return f"""
        SELECT image_id,
               CAST(npix AS BIGINT) AS npix,
               CAST(sse AS BIGINT) AS sse,
               CAST(psnr_mdb AS BIGINT) AS psnr_mdb,
               CAST(psnr_ok AS BIGINT) AS psnr_ok
        FROM (VALUES {vals})
        AS t(image_id, npix, sse, psnr_mdb, psnr_ok)
        ORDER BY image_id
    """


def _zonal_stats_oracle() -> str:
    from ioverlay_ray.pipelines.media import zonal_oracle_rows
    vals = ",\n".join(
        f"('{i}', {n}, {r}, {g}, {b})"
        for i, n, r, g, b in zonal_oracle_rows(256))
    return f"""
        SELECT image_id,
               CAST(zone_px AS BIGINT) AS zone_px,
               CAST(sum_r AS BIGINT) AS sum_r,
               CAST(sum_g AS BIGINT) AS sum_g,
               CAST(sum_b AS BIGINT) AS sum_b
        FROM (VALUES {vals})
        AS t(image_id, zone_px, sum_r, sum_g, sum_b)
        ORDER BY image_id
    """


def _image_decode_stats_oracle() -> str:
    from ioverlay_ray.pipelines.media import decode_stats_oracle_rows
    vals = ",\n".join(
        f"('{i}', {r}, {g}, {b}, {s}, {p})"
        for i, r, g, b, s, p in decode_stats_oracle_rows(256))
    return f"""
        SELECT image_id,
               CAST(mean_r AS BIGINT) AS mean_r,
               CAST(mean_g AS BIGINT) AS mean_g,
               CAST(mean_b AS BIGINT) AS mean_b,
               CAST(std AS BIGINT) AS std,
               CAST(phash_decoded AS BIGINT) AS phash_decoded
        FROM (VALUES {vals})
        AS t(image_id, mean_r, mean_g, mean_b, std, phash_decoded)
        ORDER BY image_id
    """


def _image_embed_topk_oracle() -> str:
    from ioverlay_ray.pipelines.media import embed_topk_oracle_rows
    vals = ",\n".join(f"({q}, {r}, {v})"
                      for q, r, v in embed_topk_oracle_rows(256))
    return f"""
        SELECT CAST(query_id AS BIGINT) AS query_id,
               CAST(vec_id AS BIGINT) AS vec_id,
               CAST(rank AS BIGINT) AS rank
        FROM (VALUES {vals}) AS t(query_id, rank, vec_id)
        ORDER BY query_id, rank
    """
