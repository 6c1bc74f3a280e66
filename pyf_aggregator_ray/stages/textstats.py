"""Text-analysis stages over the ``documents`` table: language-ID,
quality scoring, token counting, document fingerprinting.

The reference's analog is its per-document scoring/enrichment family —
health-score subscores with exact thresholds
(``/root/reference/src/pyf/aggregator/plugins/health_score.py:78-311``)
and word-count style scalar functions (``health_score.py:8-12``). Each
stage here is a vectorized ``map_batches`` batch function whose semantics
are mirrored exactly by a DuckDB oracle (see pipelines/textpipes.py).

All math is float64 with formulas written identically in Python and SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.rounding import round6
from ..functions.tokenizer import doc_lengths, tokenize_column

# ASCII stopword lists per language (deterministic heuristic language-ID;
# the prediction rule, not linguistic accuracy, is what the oracle checks)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "es": ("el", "la", "los", "de", "y", "que", "un"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
    "zh": ("de", "shi", "le", "bu", "wo"),
}

ALL_STOPWORDS = frozenset(w for ws in STOPWORDS.values() for w in ws)


def _exploded_tokens(batch: pa.Table) -> tuple[pd.DataFrame, np.ndarray, pa.ListArray]:
    """(exploded df [doc_id, term], doc_ids array, token lists)."""
    toks = tokenize_column(batch["text"])
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    parent = toks.value_parent_indices().to_numpy(zero_copy_only=False)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    df = pd.DataFrame({"doc_id": ids[parent], "term": flat})
    return df, ids, toks


def langid_pred(exploded: pd.DataFrame, ids: np.ndarray) -> list[str]:
    """Language prediction from an exploded (doc_id, term) frame — shared
    by langid_batch and the composed curation pipeline so the rule can't
    drift between them."""
    sw = pd.DataFrame(
        [(lang, w) for lang, ws in STOPWORDS.items() for w in ws],
        columns=["cand", "term"],
    )
    hits = exploded.merge(sw, on="term")
    if len(hits):
        counts = (
            hits.groupby(["doc_id", "cand"]).size().reset_index(name="c")
        )
        counts = counts.sort_values(
            ["doc_id", "c", "cand"], ascending=[True, False, True]
        )
        best = counts.drop_duplicates("doc_id")[["doc_id", "cand"]]
        pred = dict(zip(best["doc_id"], best["cand"]))
    else:
        pred = {}
    return [pred.get(i, "unknown") for i in ids]


def langid_batch(batch: pa.Table) -> pa.Table:
    """Predict language by stopword hits: for each doc count tokens in
    each language's stopword list; predict the language with the highest
    count (ties -> lexicographically smallest language); no hits ->
    'unknown'."""
    exploded, ids, _ = _exploded_tokens(batch)
    out = langid_pred(exploded, ids)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "lang_pred": pa.array(out, type=pa.string()),
        }
    )


def token_count_batch(batch: pa.Table) -> pa.Table:
    exploded, ids, toks = _exploded_tokens(batch)
    n_tokens = doc_lengths(toks).to_numpy(zero_copy_only=False)
    nuniq = exploded.groupby("doc_id")["term"].nunique() if len(exploded) else {}
    n_unique = [int(nuniq.get(i, 0)) for i in ids]
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "n_unique_tokens": pa.array(n_unique, type=pa.int64()),
        }
    )


def quality_features(
    exploded: pd.DataFrame, ids: np.ndarray, toks, texts: list
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(n_chars, n_tokens, ratio, score) — shared by quality_batch and
    the composed curation pipeline so the formula can't drift."""
    n_tokens = doc_lengths(toks).to_numpy(zero_copy_only=False).astype(np.float64)
    n_chars = np.array([len(t or "") for t in texts], dtype=np.float64)
    if len(exploded):
        sw_hits = (
            exploded[exploded["term"].isin(ALL_STOPWORDS)]
            .groupby("doc_id")
            .size()
        )
    else:
        sw_hits = pd.Series(dtype=np.int64)
    hits = np.array([float(sw_hits.get(i, 0)) for i in ids])
    ratio = np.divide(hits, n_tokens, out=np.zeros_like(hits), where=n_tokens > 0)
    score = (
        np.minimum(1.0, n_tokens / 200.0) * 0.4
        + np.minimum(1.0, n_chars / 500.0) * 0.3
        + ratio * 0.3
    )
    return n_chars, n_tokens, ratio, score


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality features + a composite score in [0, 1]:

        quality = least(1, n_tokens/200)*0.4 + least(1, n_chars/500)*0.3
                  + stopword_ratio*0.3          (round6)

    stopword_ratio = tokens in ANY language's stopword list / n_tokens
    (0 for empty docs). Mirrored in SQL by QUALITY_SQL.
    """
    exploded, ids, toks = _exploded_tokens(batch)
    texts = batch["text"].to_pylist()
    n_chars, n_tokens, ratio, score = quality_features(exploded, ids, toks, texts)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_chars": pa.array(n_chars.astype(np.int64)),
            "n_tokens": pa.array(n_tokens.astype(np.int64)),
            "stopword_ratio": pa.array(round6(ratio)),
            "quality": pa.array(round6(score)),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprint = lexicographic min of md5(token) over the
    doc's tokens (a 1-permutation MinHash — order-invariant, content
    sensitive); empty docs -> ''. SQL mirror: min(md5(term))."""
    import hashlib

    exploded, ids, _ = _exploded_tokens(batch)
    if len(exploded):
        h = exploded.assign(
            h=[hashlib.md5(t.encode()).hexdigest() for t in exploded["term"]]
        )
        mins = h.groupby("doc_id")["h"].min()
    else:
        mins = pd.Series(dtype=object)
    out = [mins.get(i, "") for i in ids]
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "fingerprint": pa.array(out, type=pa.string()),
        }
    )
