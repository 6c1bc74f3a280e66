"""Text-analysis stages vs straightforward per-doc recomputes."""

import re

import numpy as np
import pyarrow as pa

from pyf_aggregator_ray.functions.rounding import round6
from pyf_aggregator_ray.stages import textstats as ts

DOCS = pa.table(
    {
        "doc_id": pa.array(range(6), type=pa.int64()),
        "text": pa.array(
            [
                "the cat and the dog",  # en-heavy
                "der hund und die katze ist",  # de-heavy
                "",  # empty -> unknown
                "xyzzy plugh",  # no stopwords -> unknown
                "le chat et la le les",  # fr
                "de de de",  # tie: 'de' is in de(0), es(1), zh(0) lists
            ]
        ),
    }
)


def test_langid():
    out = ts.langid_batch(DOCS)
    assert out["lang_pred"].to_pylist() == ["en", "de", "unknown", "unknown", "fr", "es"]
    # the tie case: 'de' belongs to the es and zh stopword lists (not de!)
    # -> counts equal -> lexicographically smallest language wins ('es')
    langs_with_de = sorted(l for l, ws in ts.STOPWORDS.items() if "de" in ws)
    assert out["lang_pred"].to_pylist()[5] == langs_with_de[0]


def test_token_count():
    out = ts.token_count_batch(DOCS)
    assert out["n_tokens"].to_pylist() == [5, 6, 0, 2, 6, 3]
    assert out["n_unique_tokens"].to_pylist() == [4, 6, 0, 2, 5, 1]


def test_quality():
    out = ts.quality_batch(DOCS)
    token_re = re.compile("[a-z0-9]+")
    for i, text in enumerate(DOCS["text"].to_pylist()):
        toks = token_re.findall(text.lower())
        n_tok, n_chars = len(toks), len(text)
        ratio = (
            sum(t in ts.ALL_STOPWORDS for t in toks) / n_tok if n_tok else 0.0
        )
        exp = round6(
            min(1.0, n_tok / 200.0) * 0.4 + min(1.0, n_chars / 500.0) * 0.3 + ratio * 0.3
        )
        assert out["quality"][i].as_py() == exp
        assert out["stopword_ratio"][i].as_py() == round6(ratio)


def test_fingerprint_order_invariant():
    import hashlib

    a = ts.fingerprint_batch(
        pa.table({"doc_id": pa.array([0], type=pa.int64()), "text": ["b a c"]})
    )
    b = ts.fingerprint_batch(
        pa.table({"doc_id": pa.array([0], type=pa.int64()), "text": ["c b a"]})
    )
    assert a["fingerprint"].to_pylist() == b["fingerprint"].to_pylist()
    exp = min(hashlib.md5(w.encode()).hexdigest() for w in "abc")
    assert a["fingerprint"][0].as_py() == exp
    empty = ts.fingerprint_batch(
        pa.table({"doc_id": pa.array([0], type=pa.int64()), "text": [""]})
    )
    assert empty["fingerprint"][0].as_py() == ""
