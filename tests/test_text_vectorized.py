"""Equality pins for the r5 pyarrow.compute vectorization of the text
scan (stages/text.py): every vectorized stage must equal the original
per-row Python form byte-for-byte — on the real corpus AND on
adversarial strings (empty, all-spaces, overlapping markers, unicode).
The SQL oracles gate end-to-end too; this pins the kernels directly so
a semantics drift is caught at the function, not the hash."""

import re
from collections import Counter

import pyarrow as pa
import pytest

from ioverlay_ray.stages import text as T

SF = "/root/testdata/sf0.001"

ADVERSARIAL = [
    "",
    " ",
    "   ",
    "the the the",
    " the the the ",
    "ing ing ing ing",
    "a.b!c?d..!!??",
    "ABC123abc  ,;: x9Y",
    "der und die sch le les de une el los que una",
    "tab\tand\nnewline mixed",
    "unicode éèê café 中文 text",
    "x" * 500,
    ("word " * 100).strip(),
]


def _corpus_batch():
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    return t


def _adv_batch():
    return pa.table({
        "doc_id": pa.array(range(len(ADVERSARIAL)), pa.int64()),
        "text": pa.array(ADVERSARIAL, pa.string()),
    })


# ---- original per-row reference forms (pre-r5), kept verbatim ----

def _ref_token_stats(batch):
    texts = batch.column("text").to_pylist()
    return [(len(t.split(" ")), len(t),
             len(T._SUBTOKEN_RE.findall(t))) for t in texts]


def _ref_repetition(batch):
    out = []
    for t in batch.column("text").to_pylist():
        c = Counter(t.split(" "))
        out.append((sum(c.values()), len(c),
                    max(c.values()) if c else 0))
    return out


_PUNCT_RE = re.compile(r"[^.!?]")
_UPPER_RE = re.compile(r"[^A-Z]")
_DIGIT_RE = re.compile(r"[^0-9]")


def _ref_quality(batch):
    texts = batch.column("text").to_pylist()
    return [(len(_PUNCT_RE.sub("", t)), len(_UPPER_RE.sub("", t)),
             len(_DIGIT_RE.sub("", t))) for t in texts]


def _ref_lang(batch):
    out = []
    for t in batch.column("text").to_pylist():
        padded = f" {t.lower()} "
        best, best_score = "und", 0
        for lang, markers in T._LANG_MARKERS.items():
            score = sum(padded.count(m) for m in markers)
            if score > best_score:
                best, best_score = lang, score
        out.append(best)
    return out


def _ref_distinct_tokens(batch):
    s = set()
    for x in batch.column("text").to_pylist():
        s.update(x.split(" "))
    return sorted(s)


@pytest.mark.parametrize("mk", [_corpus_batch, _adv_batch])
def test_token_stats_parity(mk):
    b = mk()
    got = T.token_stats(b)
    exp = _ref_token_stats(b)
    rows = list(zip(got.column("n_tokens").to_pylist(),
                    got.column("n_chars").to_pylist(),
                    got.column("n_subtokens").to_pylist()))
    assert rows == exp


@pytest.mark.parametrize("mk", [_corpus_batch, _adv_batch])
def test_repetition_parity(mk):
    b = mk()
    got = T.repetition_stats(b)
    exp = _ref_repetition(b)
    rows = list(zip(got.column("n_tokens").to_pylist(),
                    got.column("n_distinct").to_pylist(),
                    got.column("top_count").to_pylist()))
    assert rows == exp


@pytest.mark.parametrize("mk", [_corpus_batch, _adv_batch])
def test_quality_parity(mk):
    b = mk()
    got = T.quality_features(b)
    exp = _ref_quality(b)
    rows = list(zip(got.column("n_punct").to_pylist(),
                    got.column("n_upper").to_pylist(),
                    got.column("n_digit").to_pylist()))
    assert rows == exp


@pytest.mark.parametrize("mk", [_corpus_batch, _adv_batch])
def test_lang_parity(mk):
    b = mk()
    got = T.lang_id(b).column("pred_lang").to_pylist()
    assert got == _ref_lang(b)


@pytest.mark.parametrize("mk", [_corpus_batch, _adv_batch])
def test_distinct_tokens_parity(mk):
    b = mk()
    got = T.distinct_token_rows(b).column("w").to_pylist()
    assert got == _ref_distinct_tokens(b)


def _ref_tfidf_rows(batch):
    from collections import Counter
    import re
    TERM = re.compile(r"[a-z0-9]+")
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    rows = []
    for i, x in zip(ids, texts):
        for term, n in Counter(TERM.findall(x.lower())).items():
            rows.append((i, term, n))
    return sorted(rows)


def _ref_bigram_rows(batch):
    from collections import Counter
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    rows = []
    for i, x in zip(ids, texts):
        toks = x.split(" ")
        for (w1, w2), n in Counter(zip(toks, toks[1:])).items():
            rows.append((i, w1, w2, n))
    return sorted(rows)


@pytest.mark.parametrize("mk", [_corpus_batch, _adv_batch])
def test_tfidf_rows_parity(mk):
    b = mk()
    got = T.tfidf_term_rows(b)
    rows = sorted(zip(got.column("doc_id").to_pylist(),
                      got.column("term").to_pylist(),
                      got.column("tf").to_pylist()))
    assert rows == _ref_tfidf_rows(b)


@pytest.mark.parametrize("mk", [_corpus_batch, _adv_batch])
def test_bigram_rows_parity(mk):
    b = mk()
    got = T.bigram_rows(b)
    rows = sorted(zip(got.column("doc_id").to_pylist(),
                      got.column("w1").to_pylist(),
                      got.column("w2").to_pylist(),
                      got.column("tf").to_pylist()))
    assert rows == _ref_bigram_rows(b)


def _ref_fingerprint(batch):
    import hashlib
    out = []
    for t in batch.column("text").to_pylist():
        toks = t.split()
        if not toks:
            out.append(0)
            continue
        best = (1 << 64) - 1
        for i in range(0, max(1, len(toks) - 7)):
            window = " ".join(toks[i:i + 8]).encode()
            h = int.from_bytes(hashlib.md5(window).digest()[:8],
                               "little")
            if h < best:
                best = h
        out.append(best - (1 << 64) if best >= (1 << 63) else best)
    return out


@pytest.mark.parametrize("mk", [_corpus_batch, _adv_batch])
def test_fingerprint_parity(mk):
    b = mk()
    got = T.fingerprint(b).column("fingerprint").to_pylist()
    assert got == _ref_fingerprint(b)
