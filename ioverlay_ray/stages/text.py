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
_SUBTOKEN_PAT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_SUBTOKEN_RE = re.compile(_SUBTOKEN_PAT)
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
    DuckDB string_split semantics), n_chars.

    Fully pyarrow.compute — no per-row Python. n_tokens = spaces + 1
    (identical to len(t.split(" ")) for every string incl. empty);
    count_substring / count_substring_regex are non-overlapping like
    str.count / re.findall (equality pinned by
    tests/test_text_vectorized.py)."""
    import pyarrow.compute as pc
    texts = batch.column("text")
    n_tokens = pc.add(pc.count_substring(texts, " "), 1)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pc.cast(n_tokens, pa.int64()),
        "n_chars": pc.cast(pc.utf8_length(texts), pa.int64()),
        "n_subtokens": pc.cast(
            pc.count_substring_regex(texts, _SUBTOKEN_PAT), pa.int64()),
    })


def repetition_stats(batch: pa.Table) -> pa.Table:
    """Token-repetition features per document (the C4/RefinedWeb-style
    repetition filter a training-data pipeline applies before mixing):
    total tokens, distinct tokens, and the most-frequent token's count
    — ``top_count / n_tokens`` is the repetition ratio a downstream
    filter thresholds. Single-space tokenization matches DuckDB
    string_split so the SQL oracle reproduces the values exactly.

    Vectorized: Arrow split_pattern + dictionary_encode give per-token
    integer codes in C++; per-(doc, code) counts fall out of one
    np.unique over a combined int64 key and a maximum.reduceat — no
    per-row Counter."""
    import numpy as np
    import pyarrow.compute as pc
    texts = batch.column("text")
    n = len(texts)
    toks = pc.split_pattern(texts, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets, np.int64)
    enc = pc.dictionary_encode(toks.values)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices, np.int64)
    V = np.int64(len(enc.dictionary)) or np.int64(1)
    per_doc = np.diff(offs)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), per_doc)
    # every doc has >= 1 token ("".split(" ") == [""]) so n*V stays
    # well inside int64 at any batch size x batch vocabulary
    uk, counts = np.unique(doc_idx * V + codes, return_counts=True)
    uk_doc = uk // V
    n_distinct = np.bincount(uk_doc, minlength=n)
    starts = np.flatnonzero(np.r_[True, uk_doc[1:] != uk_doc[:-1]])
    top_count = np.zeros(n, np.int64)
    if len(uk):
        top_count[uk_doc[starts]] = np.maximum.reduceat(counts, starts)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(per_doc, pa.int64()),
        "n_distinct": pa.array(n_distinct.astype(np.int64), pa.int64()),
        "top_count": pa.array(top_count, pa.int64()),
    })


def quality_features(batch: pa.Table) -> pa.Table:
    """ASCII punctuation / uppercase / digit counts per document —
    single-char-class regex counts in Arrow (equal to the old
    delete-the-complement-and-measure form, without materializing
    stripped copies of every text)."""
    import pyarrow.compute as pc
    texts = batch.column("text")

    def cnt(pat: str):
        return pc.cast(pc.count_substring_regex(texts, pat), pa.int64())

    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_punct": cnt(r"[.!?]"),
        "n_upper": cnt(r"[A-Z]"),
        "n_digit": cnt(r"[0-9]"),
    })


def _lang_id_row(t: str) -> str:
    """Reference per-row scorer (str.count non-overlapping semantics) —
    the exact spec; used for the rare rows the vectorized fast path
    cannot prove equivalent (texts containing double spaces)."""
    padded = f" {t.lower()} "
    best, best_score = "und", 0
    for lang, markers in _LANG_MARKERS.items():
        score = sum(padded.count(m) for m in markers)
        if score > best_score:
            best, best_score = lang, score
    return best


def lang_id(batch: pa.Table) -> pa.Table:
    """Marker-n-gram language scoring; deterministic argmax with 'und'
    (undetermined) fallback when no marker hits.

    Vectorized on the token stream: for single-space-separated text,
    a non-overlapping count of marker ``" X "`` equals the number of
    tokens == X minus floor(r/2) per maximal run of r consecutive X
    tokens (adjacent matches share a space, so str.count keeps every
    other one), and the one no-trailing-space marker (" sch") counts
    tokens with that prefix (matches are >= pattern-length apart, never
    overlapping). Rows containing a double space — where the
    token<->substring equivalence breaks — route to the exact per-row
    scorer (none in real corpora). Winner = FIRST language in
    _LANG_MARKERS order among ties (np.argmax first-max == the old
    strictly-greater update loop). Equality with the reference form is
    pinned by tests/test_text_vectorized.py incl. adversarial runs."""
    import numpy as np
    import pyarrow.compute as pc
    texts = batch.column("text")
    n = len(texts)
    low = pc.utf8_lower(texts)
    toks = pc.split_pattern(low, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets, np.int64)
    enc = pc.dictionary_encode(toks.values)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices, np.int64)
    dic = enc.dictionary
    row_of_tok = np.repeat(np.arange(n, dtype=np.int64),
                           np.diff(offs))
    scores = np.zeros((n, len(_LANG_MARKERS)), np.int64)
    dic_idx = {v: i for i, v in enumerate(dic.to_pylist())}
    for li, markers in enumerate(_LANG_MARKERS.values()):
        for m in markers:
            if m.endswith(" "):
                code = dic_idx.get(m[1:-1], -1)
                if code < 0:
                    continue
                hits = np.flatnonzero(codes == code)
                per_row = np.bincount(row_of_tok[hits], minlength=n)
                # run correction: r consecutive equal marker tokens
                # yield only ceil(r/2) non-overlapping substring hits
                if len(hits) > 1:
                    brk = np.r_[True,
                                (np.diff(hits) != 1) |
                                (row_of_tok[hits[1:]] !=
                                 row_of_tok[hits[:-1]])]
                    starts = np.flatnonzero(brk)
                    lens = np.diff(np.r_[starts, len(hits)])
                    corr = lens // 2
                    if corr.any():
                        np.subtract.at(per_row,
                                       row_of_tok[hits[starts]], corr)
                scores[:, li] += per_row
            else:
                # prefix marker (" sch"): token startswith; matches are
                # >= len(pattern) apart so never overlap
                pref_codes = np.flatnonzero(
                    np.asarray(pc.starts_with(dic, m[1:])))
                if not len(pref_codes):
                    continue
                hits = np.isin(codes, pref_codes)
                scores[:, li] += np.bincount(row_of_tok[hits],
                                             minlength=n)
    names = np.array(list(_LANG_MARKERS), dtype=object)
    langs = np.where(scores.max(axis=1) > 0,
                     names[scores.argmax(axis=1)], "und")
    # exact path for rows where tokenization != substring counting
    weird = np.asarray(pc.greater(pc.count_substring(texts, "  "), 0))
    if weird.any():
        raw = texts.to_pylist()
        for i in np.flatnonzero(weird):
            langs[i] = _lang_id_row(raw[i])
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "pred_lang": pa.array(langs.tolist(), pa.string()),
    })


def _fingerprint_row(t: str) -> int:
    """Reference per-row fingerprint (whitespace split, md5 window min)
    — the exact spec; used for rows the fast path can't prove
    equivalent (non-ASCII or irregular whitespace)."""
    toks = t.split()
    if not toks:
        return 0
    best = (1 << 64) - 1
    for i in range(0, max(1, len(toks) - 7)):
        window = " ".join(toks[i:i + 8]).encode()
        # little-endian to match DuckDB's md5_number_upper oracle
        h = int.from_bytes(hashlib.md5(window).digest()[:8], "little")
        if h < best:
            best = h
    return best - (1 << 64) if best >= (1 << 63) else best


def fingerprint(batch: pa.Table) -> pa.Table:
    """64-bit document fingerprint: md5-based rolling hash over 8-token
    windows, min-combined (deterministic).

    The md5 calls are irreducible (the DuckDB md5_number_upper oracle
    replays them bit-for-bit; a numpy lane-parallel MD5 measured SLOWER
    than hashlib's C loop), but everything around them vectorizes: for
    single-space-separated ASCII rows every window ``" ".join(
    toks[i:i+8])`` is a byte SLICE of the original text, so window
    boundaries come from one Arrow split + cumsum and the loop is just
    md5-over-memoryview with no join/encode allocations; per-doc mins
    fall out of one minimum.reduceat. Rows where split() != split(" ")
    could differ (double/leading/trailing spaces, tabs, non-ASCII)
    route to the exact per-row form. Parity pinned by
    tests/test_text_vectorized.py."""
    import numpy as np
    import pyarrow.compute as pc
    texts = batch.column("text")
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    # fast-path precondition: ASCII and strictly single-space separated
    ascii_ok = np.asarray(pc.equal(pc.utf8_length(texts),
                                   pc.binary_length(texts)))
    clean = ascii_ok & \
        ~np.asarray(pc.match_substring_regex(
            texts, r"(^ )|( $)|(  )|[\t\n\x0b\x0c\r]")) & \
        np.asarray(pc.greater(pc.binary_length(texts), 0))
    fps = np.zeros(n, np.uint64)
    if clean.any():
        toks = pc.split_pattern(texts, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        toffs = np.asarray(toks.offsets, np.int64)
        tok_lens = np.asarray(
            pc.binary_length(toks.values), np.int64)
        ntok = np.diff(toffs)
        # byte start of each token inside the ORIGINAL text buffer:
        # row text start + sum of (len+1) of preceding tokens
        odt = np.int64 if pa.types.is_large_string(texts.type) \
            else np.int32
        text_offs = np.frombuffer(texts.buffers()[1], odt)[
            texts.offset: texts.offset + n + 1].astype(np.int64)
        within = np.concatenate([[0], np.cumsum(tok_lens + 1)])[:-1]
        row_of_tok = np.repeat(np.arange(n, dtype=np.int64), ntok)
        within = within - np.repeat(within[toffs[:-1]], ntok)
        g_start = np.repeat(text_offs[:-1], ntok) + within
        g_end = g_start + tok_lens
        # windows per clean row: i in [0, max(1, ntok-7))
        nwin_all = np.maximum(1, ntok - 7)
        nwin = np.where(clean, nwin_all, 0)
        total = int(nwin.sum())
        if total:
            win_row = np.repeat(np.arange(n, dtype=np.int64), nwin)
            win_i = np.arange(total, dtype=np.int64) - \
                np.repeat(np.concatenate([[0], np.cumsum(nwin)])[:-1],
                          nwin)
            first_tok = toffs[win_row] + win_i
            last_tok = np.minimum(first_tok + 7,
                                  toffs[win_row] + ntok[win_row] - 1)
            ws = g_start[first_tok]
            we = g_end[last_tok]
            mv = memoryview(texts.buffers()[2])
            dig = bytearray(total * 8)
            md5 = hashlib.md5
            k = 0
            for s, e in zip(ws.tolist(), we.tolist()):
                dig[k:k + 8] = md5(mv[s:e]).digest()[:8]
                k += 8
            hvals = np.frombuffer(bytes(dig), "<u8")
            starts = np.concatenate([[0], np.cumsum(nwin)])[:-1]
            mins = np.minimum.reduceat(hvals, starts[nwin > 0])
            fps[nwin > 0] = mins
    if not clean.all():
        raw = texts.to_pylist()
        for i in np.flatnonzero(~clean):
            fps[i] = np.uint64(_fingerprint_row(raw[i]) % (1 << 64))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fingerprint": pa.array(fps.view(np.int64), pa.int64()),
    })


_TERM_RE = re.compile(r"[a-z0-9]+")


def tfidf_term_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, term, tf) rows — one per distinct term per document
    (lowercase alphanumeric runs; DuckDB regexp_extract_all parity).

    Vectorized: findall of ``[a-z0-9]+`` == regex-split on the
    complement with empties dropped; per-(doc, term) counts from one
    lexsort-free np.unique over a combined int64 key (row index x
    batch vocabulary, both bounded by batch size — no overflow).
    Equality pinned by tests/test_text_vectorized.py."""
    import numpy as np
    import pyarrow.compute as pc
    ids = np.asarray(batch.column("doc_id"), np.int64)
    n = len(ids)
    parts = pc.split_pattern_regex(
        pc.utf8_lower(batch.column("text")), "[^a-z0-9]+")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    offs = np.asarray(parts.offsets, np.int64)
    flat = parts.values
    row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    keep = np.asarray(pc.greater(pc.binary_length(flat), 0))
    flat = flat.filter(pa.array(keep))
    row_of = row_of[keep]
    if not len(row_of):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "term": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64())})
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices, np.int64)
    V = np.int64(len(enc.dictionary))
    uk, tf = np.unique(row_of * V + codes, return_counts=True)
    return pa.table({
        "doc_id": pa.array(ids[uk // V], pa.int64()),
        "term": enc.dictionary.take(pa.array(uk % V)),
        "tf": pa.array(tf.astype(np.int64), pa.int64()),
    })


def bigram_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, w1, w2, tf) per-document bigram counts over the
    single-space token stream (DuckDB string_split parity, empties
    kept). The map-side combiner of the bigram-LM trainer: one row per
    DISTINCT bigram per document, so the count exchange ships combined
    partials, never one row per token.

    Vectorized: Arrow split + dictionary_encode give token codes; the
    (doc, c1, c2) triples group through one lexsort (no combined-key
    multiply, so no overflow at any vocabulary size). Equality pinned
    by tests/test_text_vectorized.py."""
    import numpy as np
    import pyarrow.compute as pc
    ids = np.asarray(batch.column("doc_id"), np.int64)
    n = len(ids)
    toks = pc.split_pattern(batch.column("text"), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets, np.int64)
    enc = pc.dictionary_encode(toks.values)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = np.asarray(enc.indices, np.int64)
    row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    V = np.int64(len(enc.dictionary))
    if len(codes) < 2 or V == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64())})
    if (np.int64(n) * V * V) < (1 << 62):
        # one combined int64 key (d, c1, c2) — a single sort in
        # np.unique instead of a 3-key lexsort; downcast to int32 when
        # the key range allows (halves the sort cost)
        key = (row_of[:-1] * V + codes[:-1]) * V + codes[1:]
        # drop cross-row pairs (last token of row r with first of r+1,
        # i.e. pair index offs[r+1]-1 for every interior row boundary)
        key = np.delete(key, offs[1:-1] - 1)
        if len(key) and key[-1] < (1 << 31) and n * V * V < (1 << 31):
            key = key.astype(np.int32)
        uk, tf = np.unique(key, return_counts=True)
        uk = uk.astype(np.int64)
        d_out = uk // (V * V)
        c1_out = (uk // V) % V
        c2_out = uk % V
    else:
        # degenerate vocabulary x batch size: overflow-safe lexsort
        same = row_of[:-1] == row_of[1:]
        d = row_of[:-1][same]
        c1 = codes[:-1][same]
        c2 = codes[1:][same]
        order = np.lexsort((c2, c1, d))
        d, c1, c2 = d[order], c1[order], c2[order]
        brk = np.r_[True, (d[1:] != d[:-1]) | (c1[1:] != c1[:-1]) |
                    (c2[1:] != c2[:-1])]
        starts = np.flatnonzero(brk)
        tf = np.diff(np.r_[starts, len(d)])
        d_out, c1_out, c2_out = d[starts], c1[starts], c2[starts]
    if not len(tf):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64())})
    return pa.table({
        "doc_id": pa.array(ids[d_out], pa.int64()),
        "w1": enc.dictionary.take(pa.array(c1_out)),
        "w2": enc.dictionary.take(pa.array(c2_out)),
        "tf": pa.array(tf.astype(np.int64), pa.int64()),
    })


def distinct_token_rows(batch: pa.Table) -> pa.Table:
    """One row per distinct single-space token in the batch (map-side
    dedup before the vocabulary-size exchange). Arrow split + unique;
    sorted for determinism like the old set/sorted form."""
    import pyarrow.compute as pc
    toks = pc.split_pattern(batch.column("text"), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    u = pc.unique(toks.values)
    return pa.table({"w": u.take(pc.array_sort_indices(u))})


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
