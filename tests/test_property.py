"""Property-based round-trips (hypothesis) for the codec and tokenizer —
the north rule's 'compression round-trips' under adversarial inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pyf_aggregator_ray.functions.varint import (
    decode_varint,
    delta_decode,
    delta_encode,
    encode_varint,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_varint_round_trip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=300, unique=True
    )
)
def test_delta_gap_round_trip(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=300))
def test_tokenizer_three_way_agreement(text):
    """Arrow RE2, Python re, and DuckDB RE2 tokenize identically."""
    import re

    import duckdb
    import pyarrow as pa

    from pyf_aggregator_ray.functions.tokenizer import tokenize_column

    arrow_toks = tokenize_column(pa.array([text])).to_pylist()[0]
    py_toks = re.findall("[a-z0-9]+", text.lower())
    assert arrow_toks == py_toks
    con = duckdb.connect()
    (duck_toks,) = con.execute(
        "SELECT regexp_extract_all(lower(?), '[a-z0-9]+')", [text]
    ).fetchone()
    # case-folding of exotic unicode may differ between Python and utf8proc;
    # restrict the assertion to the tokens' join (documents are code/text)
    if text.isascii():
        assert duck_toks == py_toks


@given(st.text(max_size=400))
def test_renderer_emits_wellformed_blocks(text):
    """Any input renders (md/rst/txt) to block HTML the splitter can
    re-parse without raising; heading shift never leaves h1 behind."""
    from pyf_aggregator_ray.functions import rendering as rd
    from pyf_aggregator_ray.functions.transforms import split_description_html

    for ct in ("text/markdown", "text/x-rst", "text/plain", None):
        html = rd.shift_headings(rd.render_description(text, ct))
        assert "<h1>" not in html
        fields = split_description_html(html)
        assert set(fields) == {"title", "first_chapter", "main_content", "changelog"}
        for v in fields.values():
            assert isinstance(v, str)


@given(
    st.dictionaries(
        st.sampled_from(
            ["version", "description", "author", "maintainers", "keywords",
             "repository", "homepage", "dependencies", "bugs", "deprecated",
             "license"]
        ),
        st.one_of(
            st.text(max_size=30),
            st.booleans(),
            st.lists(st.text(max_size=10), max_size=3),
            st.dictionaries(st.text(max_size=8), st.text(max_size=10), max_size=3),
        ),
        max_size=6,
    )
)
def test_npm_transform_total_on_messy_json(version_data):
    """The npm transform must not raise on heterogeneous registry JSON
    and always emits the unified field set with correct types."""
    from pyf_aggregator_ray.sources.npm import _UNIFIED_SCHEMA, npm_transform_doc

    doc = npm_transform_doc("@s/p", "1.0.0", "2024-01-01T00:00:00Z", version_data, "r")
    assert set(doc) == set(_UNIFIED_SCHEMA.names)
    assert isinstance(doc["keywords"], list)
    assert isinstance(doc["requires_dist"], list)
    assert isinstance(doc["yanked"], bool)
    assert doc["registry"] == "npm" and doc["npm_scope"] == "s"


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.text("ab", min_size=0, max_size=12)),
        max_size=40,
    )
)
def test_split_description_fields_partition_markdown(rows):
    """Markdown-native splitter: the four fields never lose body lines —
    every non-heading line of the input appears in some field."""
    from pyf_aggregator_ray.functions.transforms import split_description

    md = "\n".join(
        ("#" * (1 + lvl % 3) + " h" + str(lvl)) if lvl % 7 == 0 else txt
        for lvl, txt in rows
    )
    fields = split_description(md, "")
    joined = "\n".join(fields.values())
    for lvl, txt in rows:
        if lvl % 7 != 0 and txt.strip() and "[" not in txt and "!" not in txt:
            assert txt.strip() in joined or txt in joined


@given(
    st.lists(
        st.lists(st.sampled_from(["a", "bb", "ccc", "dd", "e1", "hot"]),
                 min_size=0, max_size=20),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_encode_merge_round_trip_matches_naive(token_lists, salt_range):
    """Postings encode + shard merge (pure functions, no Ray) reproduce a
    naive inverted index for arbitrary corpora and salting widths."""
    from collections import Counter, defaultdict

    import pyarrow as pa

    from pyf_aggregator_ray.stages.postings import (
        decode_posting_row,
        encode_partition,
        merge_partition,
    )

    # token rows (term, doc_id, tf, dl) with doc-range salts
    rows = {"term": [], "doc_id": [], "tf": [], "dl": [], "salt": []}
    naive = defaultdict(list)
    for doc_id, toks in enumerate(token_lists):
        dl = len(toks)
        for term, tf in sorted(Counter(toks).items()):
            rows["term"].append(term)
            rows["doc_id"].append(doc_id)
            rows["tf"].append(tf)
            rows["dl"].append(dl)
            rows["salt"].append(doc_id // salt_range)
            naive[term].append((doc_id, tf, dl))
    if not rows["term"]:
        return
    tbl = pa.table(
        {
            "term": pa.array(rows["term"], type=pa.string()),
            "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
            "tf": pa.array(rows["tf"], type=pa.int64()),
            "dl": pa.array(rows["dl"], type=pa.int64()),
            "salt": pa.array(rows["salt"], type=pa.int64()),
        }
    )
    # split the corpus into two arbitrary encode blocks, then merge all
    # shard rows — the full build's partial+final shape in miniature
    half = tbl.num_rows // 2
    shards = pa.concat_tables(
        [encode_partition(tbl.slice(0, half)), encode_partition(tbl.slice(half))]
    )
    merged = merge_partition(shards)
    got = {}
    for i in range(merged.num_rows):
        row = {c: merged[c][i].as_py() for c in merged.column_names}
        ids, tfs, dls = decode_posting_row(row)
        got[row["term"]] = (list(ids), list(tfs), list(dls), row["df"], row["cf"])
    assert set(got) == set(naive)
    for term, postings in naive.items():
        ids, tfs, dls, df, cf = got[term]
        assert ids == [p[0] for p in postings], term
        assert tfs == [p[1] for p in postings], term
        assert dls == [p[2] for p in postings], term
        assert df == len(postings) and cf == sum(p[1] for p in postings)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 9999),  # major
            st.integers(0, 9999),  # minor
            st.integers(0, 9),     # bugfix (single digit per the grammar)
            st.integers(0, 4),     # release kind
            st.integers(0, 9999),  # prerelease number
        ),
        min_size=2,
        max_size=30,
    )
)
def test_version_sortable_order_matches_semantic_order(specs):
    """Lexicographic order of version_sortable strings equals semantic
    order (stable above every prerelease; dev < alpha < beta < rc;
    numeric fields compared numerically) for arbitrary versions."""
    from pyf_aggregator_ray.functions.versions import version_sortable

    kinds = ["", "dev", "a", "b", "rc"]
    rank = {"": (1, 0), "dev": (0, 0), "a": (0, 1), "b": (0, 2), "rc": (0, 3)}
    versions, keys = [], []
    for maj, mi, bu, k, pre in specs:
        kind = kinds[k]
        versions.append(f"{maj}.{mi}.{bu}" + (f"{kind}{pre}" if kind else ""))
        stable, prank = rank[kind]
        keys.append((stable, maj, mi, bu, prank, pre if not stable else 0))
    sortables = [version_sortable(v) for v in versions]
    by_sortable = sorted(range(len(versions)), key=lambda i: (sortables[i], i))
    by_key = sorted(range(len(versions)), key=lambda i: (keys[i], i))
    assert [keys[i] for i in by_sortable] == [keys[i] for i in by_key]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["import", "def", "x1", "y2", "zlongterm"]),
            st.integers(min_value=0, max_value=3000),
            st.integers(min_value=1, max_value=9),
            st.integers(min_value=1, max_value=40),
        ),
        min_size=1,
        max_size=300,
    ),
    st.integers(min_value=1, max_value=500),
)
def test_shard_split_round_trip_property(rows, width):
    """Random posting tables split at ANY shard width reproduce the
    original per-term (ids, tfs, dls) exactly, with every slice's ids in
    its shard — the invariant the doc-id-sharded query path rests on."""
    import pyarrow as pa

    from pyf_aggregator_ray.pipelines.shardquery import split_posting_batch
    from pyf_aggregator_ray.stages.postings import (
        decode_posting_batch,
        encode_partition,
        merge_partition,
    )

    # dedupe (term, doc) pairs (tokenizer emits one row per distinct pair)
    seen = {}
    for term, doc, tf, dl in rows:
        seen[(term, doc)] = (tf, dl)
    t = pa.table(
        {
            "term": pa.array([k[0] for k in seen], pa.string()),
            "doc_id": pa.array([k[1] for k in seen], pa.int64()),
            "tf": pa.array([v[0] for v in seen.values()], pa.int64()),
            "dl": pa.array([v[1] for v in seen.values()], pa.int64()),
            "salt": pa.array([0] * len(seen), pa.int64()),
        }
    )
    merged = merge_partition(encode_partition(t))
    split = split_posting_batch(merged, width)
    cs, ids_s, tfs_s, dls_s = decode_posting_batch(split)
    es = np.cumsum(cs)
    ss = es - cs
    got: dict[str, list] = {}
    for i, (term, shard) in enumerate(
        zip(split["term"].to_pylist(), split["shard"].to_pylist())
    ):
        seg = ids_s[ss[i]:es[i]]
        assert (seg // width == shard).all()
        got.setdefault(term, []).append(
            (shard, seg, tfs_s[ss[i]:es[i]], dls_s[ss[i]:es[i]])
        )
    c0, i0, t0, d0 = decode_posting_batch(merged)
    e0 = np.cumsum(c0)
    s0 = e0 - c0
    for j, term in enumerate(merged["term"].to_pylist()):
        parts = sorted(got[term], key=lambda r: r[0])
        assert np.array_equal(
            np.concatenate([p[1] for p in parts]), i0[s0[j]:e0[j]]
        )
        assert np.array_equal(
            np.concatenate([p[2] for p in parts]), t0[s0[j]:e0[j]]
        )
        assert np.array_equal(
            np.concatenate([p[3] for p in parts]), d0[s0[j]:e0[j]]
        )


# ---------------------------------------------------------------------------
# round-5 surfaces
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(
            [
                "upload_timestamp", "docs_url", "description", "project_urls",
                "maintainer", "author", "license", "classifiers", "keywords",
                "registry", "github_stars", "github_updated",
                "github_open_issues", "first_chapter", "main_content",
            ]
        ),
        st.one_of(
            st.none(),
            st.integers(min_value=-(2**40), max_value=2**40),
            st.text(max_size=60),
            st.lists(st.text(max_size=15), max_size=5),
            st.dictionaries(st.text(max_size=10), st.text(max_size=30), max_size=3),
            st.booleans(),
        ),
        max_size=8,
    )
)
def test_enhanced_health_report_total_and_bounded(doc):
    """enhanced_health_report is TOTAL on messy docs and its score is
    always an int in [0, 100]; conditional keys appear only with their
    bonus; breakdown category points stay within their lattices."""
    from pyf_aggregator_ray.functions.transforms import enhanced_health_report

    result = enhanced_health_report(doc, 1_755_000_000)
    score = result["health_score"]
    assert isinstance(score, int) and 0 <= score <= 100
    bd = result["health_score_breakdown"]
    assert 0 <= bd["recency"]["points"] <= 40
    assert 0 <= bd["documentation"]["points"] <= 30
    assert 0 <= bd["metadata"]["points"] <= 30
    for key in ("github_stars_bonus", "github_activity_bonus",
                "github_issue_bonus", "github_bonus_total"):
        if key in bd:
            assert bd[key] > 0


@settings(max_examples=200, deadline=None)
@given(
    st.text(min_size=1, max_size=40),
    st.one_of(st.none(), st.text(min_size=1, max_size=15)),
    st.sampled_from(["new", "update", "release"]),
    st.integers(min_value=1, max_value=10**6),
)
def test_dedup_store_never_double_queues_within_ttl(pkg, rel, feed, ttl):
    """Within one TTL window the same (pkg, rel, feed) marks fresh
    exactly once; different release ids never collide on update feeds."""
    from pyf_aggregator_ray.pipelines.tasks import (
        SeenStore,
        dedup_key,
        is_package_recently_queued,
    )

    store = SeenStore()
    first = is_package_recently_queued(pkg, rel, feed, ttl=ttl, store=store)
    second = is_package_recently_queued(pkg, rel, feed, ttl=ttl, store=store)
    assert first is False and second is True
    if feed != "new" and rel:
        other = rel + "x"
        assert dedup_key(pkg, other, feed) != dedup_key(pkg, rel, feed)
        assert (
            is_package_recently_queued(pkg, other, feed, ttl=ttl, store=store)
            is False
        )


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),  # upload_timestamp
            st.one_of(
                st.none(),
                st.sampled_from(
                    [
                        "https://github.com/a/r",
                        "https://github.com/b/r2",
                        "https://github.com/orgs/bad",  # reserved -> malformed
                        "https://example.com/nope",  # not github-shaped
                        "git@github.com:c/r3.git",
                    ]
                ),
            ),
        ),
        min_size=1,
        max_size=6,
    ),
    st.sets(st.sampled_from(["a/r", "b/r2", "c/r3"]), max_size=3),
)
def test_resolve_fallback_invariants(versions, known):
    """resolve_repo_with_fallback is total; a resolved identifier is
    always valid AND known; not_found implies the newest version had a
    valid identifier none of whose known alternatives existed."""
    from pyf_aggregator_ray.functions.transforms import extract_repo_identifier
    from pyf_aggregator_ray.pipelines.problems import resolve_repo_with_fallback

    docs = [
        {"name": "p", "upload_timestamp": ts, "home_page": url}
        for ts, url in versions
    ]
    res = resolve_repo_with_fallback(docs, known.__contains__)
    if res["resolved"]:
        ident = res["repo_identifier"]
        assert ident in known
        assert extract_repo_identifier(f"https://github.com/{ident}") == ident
    else:
        assert res["reason"] in ("no_repo_url", "malformed_identifier", "not_found")
        if res["reason"] == "not_found":
            assert res["repo_identifier"] is not None
