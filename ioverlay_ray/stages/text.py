"""Text-analysis stages for the documents table.

Vectorized per-batch (pandas str / numpy) transforms: token counting,
quality features, language-ID heuristic, rolling-hash fingerprinting.
All deterministic; the SQL-expressible ones have DuckDB oracles in
__ray_entry__.oracle_sql.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

_PUNCT_RE = re.compile(r"[^.!?]")
# BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space
_SUBTOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
_UPPER_RE = re.compile(r"[^A-Z]")
_DIGIT_RE = re.compile(r"[^0-9]")

# crude n-gram language profiles (deterministic heuristic)
_LANG_MARKERS = {
    "en": (" the ", " and ", " of ", " ing "),
    "de": (" der ", " und ", " die ", " sch"),
    "fr": (" le ", " les ", " de ", " une "),
    "es": (" el ", " los ", " que ", " una "),
}


def token_stats(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens (split on single space, empties counted — matches
    DuckDB string_split semantics), n_chars."""
    texts = batch.column("text").to_pylist()
    n_tokens = [len(t.split(" ")) for t in texts]
    n_chars = [len(t) for t in texts]
    n_subtokens = [len(_SUBTOKEN_RE.findall(t)) for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_chars": pa.array(n_chars, pa.int64()),
        "n_subtokens": pa.array(n_subtokens, pa.int64()),
    })


def repetition_stats(batch: pa.Table) -> pa.Table:
    """Token-repetition features per document (the C4/RefinedWeb-style
    repetition filter a training-data pipeline applies before mixing):
    total tokens, distinct tokens, and the most-frequent token's count
    — ``top_count / n_tokens`` is the repetition ratio a downstream
    filter thresholds. Single-space tokenization matches DuckDB
    string_split so the SQL oracle reproduces the values exactly."""
    from collections import Counter
    texts = batch.column("text").to_pylist()
    n_tokens = []
    n_distinct = []
    top_count = []
    for t in texts:
        c = Counter(t.split(" "))
        n_tokens.append(sum(c.values()))
        n_distinct.append(len(c))
        top_count.append(max(c.values()) if c else 0)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_distinct": pa.array(n_distinct, pa.int64()),
        "top_count": pa.array(top_count, pa.int64()),
    })


def quality_features(batch: pa.Table) -> pa.Table:
    """ASCII punctuation / uppercase / digit counts per document."""
    texts = batch.column("text").to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_punct": pa.array([len(_PUNCT_RE.sub("", t)) for t in texts],
                            pa.int64()),
        "n_upper": pa.array([len(_UPPER_RE.sub("", t)) for t in texts],
                            pa.int64()),
        "n_digit": pa.array([len(_DIGIT_RE.sub("", t)) for t in texts],
                            pa.int64()),
    })


def lang_id(batch: pa.Table) -> pa.Table:
    """Marker-n-gram language scoring; deterministic argmax with 'und'
    (undetermined) fallback when no marker hits."""
    texts = batch.column("text").to_pylist()
    langs = []
    for t in texts:
        padded = f" {t.lower()} "
        best, best_score = "und", 0
        for lang, markers in _LANG_MARKERS.items():
            score = sum(padded.count(m) for m in markers)
            if score > best_score:
                best, best_score = lang, score
        langs.append(best)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "pred_lang": pa.array(langs, pa.string()),
    })


def fingerprint(batch: pa.Table) -> pa.Table:
    """64-bit document fingerprint: md5-based rolling hash over 8-token
    windows, min-combined (deterministic)."""
    texts = batch.column("text").to_pylist()
    fps = []
    for t in texts:
        toks = t.split()
        if not toks:
            fps.append(0)
            continue
        best = (1 << 64) - 1
        for i in range(0, max(1, len(toks) - 7)):
            window = " ".join(toks[i:i + 8]).encode()
            # little-endian to match DuckDB's md5_number_upper oracle
            h = int.from_bytes(hashlib.md5(window).digest()[:8], "little")
            if h < best:
                best = h
        fps.append(best - (1 << 64) if best >= (1 << 63) else best)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fingerprint": pa.array(fps, pa.int64()),
    })


_TERM_RE = re.compile(r"[a-z0-9]+")


def tfidf_term_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, term, tf) rows — one per distinct term per document
    (lowercase alphanumeric runs; DuckDB regexp_extract_all parity)."""
    from collections import Counter
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    d, t, c = [], [], []
    for i, x in zip(ids, texts):
        for term, n in Counter(_TERM_RE.findall(x.lower())).items():
            d.append(i)
            t.append(term)
            c.append(n)
    return pa.table({
        "doc_id": pa.array(d, pa.int64()),
        "term": pa.array(t, pa.string()),
        "tf": pa.array(c, pa.int64()),
    })


def bigram_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, w1, w2, tf) per-document bigram counts over the
    single-space token stream (DuckDB string_split parity, empties
    kept). The map-side combiner of the bigram-LM trainer: one row per
    DISTINCT bigram per document, so the count exchange ships combined
    partials, never one row per token."""
    from collections import Counter
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    d, a, b, c = [], [], [], []
    for i, x in zip(ids, texts):
        toks = x.split(" ")
        for (w1, w2), n in Counter(zip(toks, toks[1:])).items():
            d.append(i)
            a.append(w1)
            b.append(w2)
            c.append(n)
    return pa.table({
        "doc_id": pa.array(d, pa.int64()),
        "w1": pa.array(a, pa.string()),
        "w2": pa.array(b, pa.string()),
        "tf": pa.array(c, pa.int64()),
    })


def distinct_token_rows(batch: pa.Table) -> pa.Table:
    """One row per distinct single-space token in the batch (map-side
    dedup before the vocabulary-size exchange)."""
    s: set = set()
    for x in batch.column("text").to_pylist():
        s.update(x.split(" "))
    return pa.table({"w": pa.array(sorted(s), pa.string())})


def chunk_windows(batch: pa.Table, window: int = 64,
                  stride: int = 48) -> pa.Table:
    """Context-window chunking for training-sequence preparation: split
    each document's single-space token stream into windows of
    ``window`` tokens advancing by ``stride`` (overlapping when
    stride < window), one output row per chunk. Emits (doc_id,
    chunk_idx, start_tok, n_tokens, first_tok, last_tok) — enough for the
    DuckDB generate_series + list-index oracle to reproduce every row
    exactly. Shuffle-free flat map; chunk geometry is computed with
    numpy over the flattened token buffer (no per-chunk Python loop).

    Chunk starts are s = 0, stride, 2*stride, ... while s < n_tokens,
    so every token is covered and a document always yields >= 1 chunk
    (``"".split(" ") == [""]`` — one empty token, matching DuckDB
    string_split semantics)."""
    import numpy as np
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    texts = batch.column("text").to_pylist()
    tok_lists = [t.split(" ") for t in texts]
    n = np.array([len(t) for t in tok_lists], dtype=np.int64)
    flat = np.array([tok for toks in tok_lists for tok in toks],
                    dtype=object)
    offsets = np.zeros(len(n) + 1, dtype=np.int64)
    np.cumsum(n, out=offsets[1:])
    counts = (n - 1) // stride + 1
    total = int(counts.sum())
    doc_idx = np.repeat(np.arange(len(n), dtype=np.int64), counts)
    first_of_doc = np.zeros(len(n) + 1, dtype=np.int64)
    np.cumsum(counts, out=first_of_doc[1:])
    chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(
        first_of_doc[:-1], counts)
    start = chunk_idx * stride
    n_chunk = np.minimum(window, n[doc_idx] - start)
    first_tok = flat[offsets[doc_idx] + start]
    last_tok = flat[offsets[doc_idx] + start + n_chunk - 1]
    return pa.table({
        "doc_id": pa.array(ids[doc_idx], pa.int64()),
        "chunk_idx": pa.array(chunk_idx, pa.int64()),
        "start_tok": pa.array(start, pa.int64()),
        "n_tokens": pa.array(n_chunk, pa.int64()),
        "first_tok": pa.array(list(first_tok), pa.string()),
        "last_tok": pa.array(list(last_tok), pa.string()),
    })


BM25_TERMS = ("spark", "window", "hash", "merge")


def bm25_features(batch: pa.Table, terms=BM25_TERMS) -> pa.Table:
    """Narrow per-doc BM25 feature rows: document length (lowercase
    alphanumeric-run tokens, same tokenizer as tfidf_term_rows) plus
    the term frequency of each query term — the one full-text scan a
    BM25 ranking needs; everything downstream operates on this narrow
    int table instead of re-reading the corpus."""
    from collections import Counter
    texts = batch.column("text").to_pylist()
    dl = []
    tfs = {t: [] for t in terms}
    for x in texts:
        c = Counter(_TERM_RE.findall(x.lower()))
        dl.append(sum(c.values()))
        for t in terms:
            tfs[t].append(c.get(t, 0))
    cols = {"doc_id": batch.column("doc_id"),
            "dl": pa.array(dl, pa.int64())}
    for t in terms:
        cols[f"tf_{t}"] = pa.array(tfs[t], pa.int64())
    return pa.table(cols)


def pack_greedy(seq_len: "np.ndarray", capacity: int):
    """Greedy sequential packing of seq_len[i] tokens into packs of
    ``capacity``: pack boundaries via O(#packs) searchsorted probes on
    the running cumsum (no per-row Python loop). Returns (pack_id,
    pack_off) arrays. Every seq_len must be <= capacity (enforced —
    a longer entry would otherwise loop forever)."""
    import numpy as np
    n = len(seq_len)
    if n and int(np.max(seq_len)) > capacity:
        raise ValueError(
            f"pack_greedy: seq_len {int(np.max(seq_len))} exceeds "
            f"capacity {capacity}; clamp (np.minimum) or split first")
    cs = np.cumsum(seq_len, dtype=np.int64)
    pack_id = np.empty(n, dtype=np.int64)
    pack_off = np.empty(n, dtype=np.int64)
    start = 0
    pid = 0
    base = 0
    while start < n:
        end = int(np.searchsorted(cs, base + capacity, side="right"))
        pack_id[start:end] = pid
        pack_off[start:end] = cs[start:end] - seq_len[start:end] - base
        base = cs[end - 1]
        start = end
        pid += 1
    return pack_id, pack_off


def space_token_counts(texts) -> "np.ndarray":
    """len(t.split(' ')) per text — THE single-space tokenization
    contract every SQL string_split oracle reproduces (empties
    counted). All pipelines needing a token count share this one
    definition so the oracle semantics can never drift per-query."""
    import numpy as np
    return np.array([len(t.split(" ")) for t in texts], dtype=np.int64)
