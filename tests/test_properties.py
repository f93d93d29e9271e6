"""Property-based tests: Spark operators vs tiny pure-Python models
on hypothesis-generated inputs. Few examples (each round-trips a
Spark job), but they cover shapes hand-picked vectors miss —
duplicate timestamps, single-key bursts, empty-ish streams.
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from rstreams_spark.operators import table, windows

EPOCH = dt.datetime(2024, 1, 1)

events = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),            # key
        st.integers(min_value=0, max_value=50),  # second offset
        st.integers(min_value=-5, max_value=5),  # value
    ),
    min_size=1,
    max_size=25,
)

SLOW = settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(
        [
            Row(key=k, ts=EPOCH + dt.timedelta(seconds=s), seq=i, v=v)
            for i, (k, s, v) in enumerate(rows)
        ]
    )


@given(rows=events)
@SLOW
def test_tumbling_window_totals_conserved(spark, rows):
    """Every row lands in exactly one tumbling window: per-key counts
    and sums across windows equal the input totals."""
    got = windows.tumbling_window(
        _df(spark, rows), "key", "ts", "7 seconds",
        F.count("*").alias("n"), F.sum("v").alias("s"),
    ).collect()
    for key in {k for k, _, _ in rows}:
        mine = [(s, v) for k, s, v in rows if k == key]
        assert sum(r["n"] for r in got if r["key"] == key) == len(mine)
        assert sum(r["s"] for r in got if r["key"] == key) == sum(v for _, v in mine)
    # window membership: every window's rows actually fall inside it
    for r in got:
        assert (r["window_end"] - r["window_start"]).total_seconds() == 7


@given(rows=events)
@SLOW
def test_latest_per_key_matches_python_model(spark, rows):
    got = table.latest_per_key(
        _df(spark, rows), "key", "ts", ["v"], tiebreakers=["seq"]
    ).collect()
    model = {}
    for i, (k, s, v) in enumerate(rows):
        best = model.get(k)
        if best is None or (s, i) > best[0]:
            model[k] = ((s, i), v)
    assert {r["key"]: r["v"] for r in got} == {k: v for k, (_, v) in model.items()}


@given(rows=events, lag=st.integers(min_value=1, max_value=4))
@SLOW
def test_lag_window_matches_python_model(spark, rows, lag):
    got = windows.lag_window(
        _df(spark, rows), "key", "ts", lag, ["v"], tiebreakers=["seq"]
    ).collect()
    # model: per key, rows sorted by (ts, seq); sliding windows of `lag`
    per_key = {}
    for i, (k, s, v) in enumerate(rows):
        per_key.setdefault(k, []).append((s, i, v))
    expected = []
    for k, items in per_key.items():
        items.sort()
        for j in range(lag - 1, len(items)):
            expected.append((k, tuple(v for _, _, v in items[j - lag + 1 : j + 1])))
    assert sorted(
        (r["key"], tuple(x["v"] for x in r["values"])) for r in got
    ) == sorted(expected)


edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=15),
        st.integers(min_value=0, max_value=15),
    ),
    min_size=1,
    max_size=20,
)


@given(edges=edge_lists)
@SLOW
def test_connected_components_matches_union_find(spark, edges):
    """Distributed min-label propagation == classic union-find on
    arbitrary random graphs (self-loops, multi-edges, chains)."""
    from rstreams_spark.functions.dedup import connected_components

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}

    df = spark.createDataFrame([Row(id1=a, id2=b) for a, b in edges])
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    assert got == want


@given(edges=edge_lists)
@SLOW
def test_connected_components_star_matches_union_find(spark, edges):
    """Alternating large-star/small-star == union-find on the same
    arbitrary graphs (self-loops, multi-edges, chains)."""
    from rstreams_spark.functions.dedup import connected_components_star

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    df = spark.createDataFrame([Row(id1=a, id2=b) for a, b in edges])
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(df).collect()
    }
    assert got == want


@given(edges=edge_lists)
@SLOW
def test_connected_components_hybrid_matches_union_find(spark, edges):
    """Two-phase hybrid (local union-find contraction + min-label
    skeleton) == union-find on the same arbitrary graphs; tiny
    label_rounds forces the contraction path to exercise both
    phases."""
    from rstreams_spark.functions.dedup import connected_components_hybrid

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    df = spark.createDataFrame([Row(id1=a, id2=b) for a, b in edges])
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components_hybrid(df, label_rounds=1).collect()
    }
    assert got == want


vectors = st.lists(
    st.lists(
        st.floats(
            min_value=-100.0, max_value=100.0,
            allow_nan=False, allow_infinity=False, width=32,
        ),
        min_size=4, max_size=4,
    ),
    min_size=1, max_size=8,
)


@given(vecs=vectors)
@SLOW
def test_embedding_quantize_error_bound(spark, vecs):
    """Dequantized values stay within scale/2 of the original (the
    half-up rounding bound), and q stays in [-127, 127]."""
    from rstreams_spark.queries.dedupq import QUANT_MAX

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in enumerate(vecs)]
    )
    amax = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    d = df.withColumn("__amax", amax).withColumn(
        "scale", F.col("__amax") / F.lit(float(QUANT_MAX))
    )
    ex = d.select(
        "vec_id", "scale", "__amax",
        F.posexplode("embedding").alias("idx", "val"),
    )
    q = F.when(F.col("__amax") == 0, F.lit(0)).otherwise(
        F.floor(F.col("val").cast("double") / F.col("scale") + F.lit(0.5))
    )
    rows = ex.select(
        "scale", F.col("val").cast("double").alias("val"), q.alias("q")
    ).collect()
    for r in rows:
        assert -QUANT_MAX <= r["q"] <= QUANT_MAX
        err_bound = (r["scale"] or 0.0) / 2 + 1e-12
        assert abs(r["q"] * r["scale"] - r["val"]) <= err_bound


@given(rows=events)
@SLOW
def test_global_ordinal_matches_sorted_position(spark, rows):
    """The distributed global ordinal equals each row's position in
    the totally sorted sequence, for arbitrary duplicate-timestamp
    bursts (seq breaks all ties)."""
    from rstreams_spark.operators import stateless

    got = {
        r["seq"]: r["__ord"]
        for r in stateless.ordinal(_df(spark, rows), ["ts", "seq"]).collect()
    }
    order = sorted(
        range(len(rows)), key=lambda i: (EPOCH + dt.timedelta(seconds=rows[i][1]), i)
    )
    expect = {seq: pos for pos, seq in enumerate(order)}
    assert got == expect


@given(rows=events, size=st.integers(min_value=1, max_value=4),
       gap=st.integers(min_value=1, max_value=20))
@SLOW
def test_chunk_timeout_matches_sequential_model(spark, rows, size, gap):
    """Distributed global chunks_timeout equals the sequential
    definition for arbitrary (size, gap) and duplicate timestamps."""
    from rstreams_spark.operators import stateless

    got = {
        r["seq"]: (r["__session"], r["__chunk"])
        for r in stateless.chunk_timeout(
            _df(spark, rows), size, gap, "ts", order_by=["ts", "seq"]
        ).collect()
    }
    order = sorted(
        range(len(rows)), key=lambda i: (rows[i][1], i)
    )
    expect, sess, pos, last = {}, 0, 0, None
    for i in order:
        s = rows[i][1]
        if last is not None and s - last > gap:
            sess, pos = sess + 1, 0
        expect[i] = (sess, pos // size)
        pos += 1
        last = s
    assert got == expect


# --- span_dedup vs a sequential model -------------------------------

_SPAN_BLOCKS = [[f"b{b}t{i}" for i in range(16)] for b in range(4)]

span_docs = st.lists(
    st.tuples(
        st.lists(st.integers(0, 3), min_size=1, max_size=3),  # block ids
        st.integers(0, 5),                                    # tail length
    ),
    min_size=1,
    max_size=6,
)


def _span_model(docs: dict):
    """Sequential reference: first (doc_id, idx) occurrence of each
    span text survives; documents reassemble from kept spans."""
    spans = []
    for did in sorted(docs):
        toks = docs[did]
        for i in range(0, len(toks), 16):
            chunk = toks[i : i + 16]
            spans.append((did, i // 16, " ".join(chunk), len(chunk)))
    first: dict = {}
    for did, idx, text, _n in spans:  # (doc, idx) ascending = key order
        first.setdefault(text, (did, idx))
    out: dict = {}
    for did, idx, text, n in spans:
        kept = first[text] == (did, idx)
        e = out.setdefault(did, [0, 0, 0, []])
        e[0] += 1
        if kept:
            e[2] += n
            e[3].append((idx, text))
        else:
            e[1] += 1
    return {
        did: (ns, nd, tk, " ".join(t for _, t in sorted(sp)))
        for did, (ns, nd, tk, sp) in out.items()
    }


@given(docs=span_docs)
@SLOW
def test_span_dedup_matches_sequential_model(spark, tmp_path, docs):
    """Cross-doc duplicate 16-token spans keep exactly their first
    (doc_id, span_idx) occurrence; counts, kept-token totals and the
    reassembled text match a sequential Python walk."""
    from test_functions import _write_docs

    from rstreams_spark.queries.textq import span_dedup

    token_docs = {}
    for did, (block_ids, tail) in enumerate(docs, start=1):
        toks = [t for b in block_ids for t in _SPAN_BLOCKS[b]]
        toks += [f"x{did}u{j}" for j in range(tail)]
        token_docs[did] = toks
    # tmp_path is shared across hypothesis examples (suppressed
    # health check); each example overwrites documents.parquet
    sf = _write_docs(tmp_path, [" ".join(v) for v in token_docs.values()])
    got = {
        r["doc_id"]: (
            r["n_spans"], r["n_dup_spans"], r["n_tokens_kept"], r["dedup_text"]
        )
        for r in span_dedup(spark, sf).collect()
    }
    assert got == _span_model(token_docs)


@given(
    w=st.integers(min_value=0, max_value=4000),
    h=st.integers(min_value=0, max_value=4000),
    ts=st.integers(min_value=1, max_value=1_000_000),
    dur=st.integers(min_value=0, max_value=10_000_000),
    nf=st.integers(min_value=0, max_value=500),
)
@settings(max_examples=40, deadline=None)
def test_video_container_roundtrip(w, h, ts, dur, nf):
    """build→probe is the identity on every parameter combination,
    and the closed-form byte sizes the DuckDB oracle relies on hold
    exactly (no Spark session needed — pure container logic)."""
    from rstreams_spark.functions.videohdr import (
        AVI_FIXED_BYTES, MP4_FIXED_BYTES, build_avi, build_mp4, probe_video,
    )

    p = build_mp4(w, h, ts, dur, nf)
    assert probe_video(p) == ("mp4", w, h, ts, dur, nf)
    assert len(p) == MP4_FIXED_BYTES + 4 * nf
    # truncating anywhere must never raise (malformed-input contract)
    for cut in (0, 7, 8, len(p) // 2, len(p) - 1):
        probe_video(p[:cut])

    us = max(1, dur)
    a = build_avi(w, h, us, nf)
    assert probe_video(a) == ("avi", w, h, 1_000_000, us * nf, nf)
    assert len(a) == AVI_FIXED_BYTES
    for cut in (0, 11, 12, len(a) // 2, len(a) - 1):
        probe_video(a[:cut])


@given(
    docs=st.lists(
        st.tuples(st.integers(min_value=0, max_value=50),  # doc_id base
                  st.sampled_from(["a", "b", "c"]),        # source
                  st.integers(min_value=0, max_value=40)), # n_tokens
        min_size=1, max_size=30, unique_by=lambda t: t[0],
    ),
    budget=st.integers(min_value=1, max_value=200),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_budget_sample_model_on_random_corpora(spark, docs, budget):
    """The greedy-prefix window formulation equals a sequential model
    on arbitrary corpora — including zero-token docs (which never
    consume budget but survive while budget remains) and sources far
    under/over budget."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from rstreams_spark.functions.text import hash64
    from rstreams_spark.queries.textq import BUDGET_SALT, budget_prefix

    df = spark.createDataFrame(
        [Row(doc_id=i, source=s, n_tokens=n) for i, s, n in docs]
    )
    # the PRODUCTION helper under test — not an inline re-derivation
    # (an inline copy would keep passing if the catalog formulation
    # drifted)
    got = {
        r["doc_id"]: r["cum_before"]
        for r in budget_prefix(df, budget).collect()
    }
    hashes = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id",
            hash64(F.col("doc_id").cast("string"), salt=BUDGET_SALT).alias("h"),
        ).collect()
    }
    want = {}
    per_src: dict = {}
    for i, s, n in docs:
        per_src.setdefault(s, []).append((i, n))
    for s, rows in per_src.items():
        cum = 0
        for i, n in sorted(rows, key=lambda x: (hashes[x[0]], x[0])):
            if cum < budget:
                want[i] = cum
            cum += n
    assert got == want


emb_sets = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # bucket
        st.lists(
            st.floats(
                min_value=-8, max_value=8,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=3, max_size=3,
        ),
    ),
    min_size=2, max_size=12,
)


@given(vecs=emb_sets)
@SLOW
def test_np_pairs_property_matches_jvm(spark, vecs):
    """The grouped numpy pair kernel emits the EXACT pair set with
    bit-equal cosine doubles as the JVM self-join on arbitrary
    finite embeddings and bucket layouts — singleton buckets, equal
    vectors (cosine exactly 1.0), near-orthogonal pairs straddling
    the threshold. Zero-norm vectors are excluded: both paths
    reject them loudly (covered by the dedicated edge test)."""
    from hypothesis import assume

    from rstreams_spark.functions import similarity

    # exclude on the computed NORM, not the elements: a subnormal
    # like 2.2e-309 is nonzero but its square underflows to 0.0,
    # giving a zero norm from nonzero elements (hypothesis found
    # exactly this — ANSI divide-by-zero in the JVM twin)
    assume(all(sum(x * x for x in v) > 0.0 for _, v in vecs))
    df = spark.createDataFrame(
        [(i, list(v), b) for i, (b, v) in enumerate(vecs)],
        "vec_id bigint, embedding array<double>, bucket int",
    )
    jvm = {
        (r["id1"], r["id2"], r["cosine"])
        for r in similarity.cosine_pairs(df, 0.5, bucket_col="bucket").collect()
    }
    np_ = {
        (r["id1"], r["id2"], r["cosine"])
        for r in similarity.cosine_pairs_np(df, 0.5, bucket_col="bucket").collect()
    }
    assert jvm == np_


corpus_texts = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=24),
    min_size=1, max_size=12,
)


@given(train=corpus_texts, evald=corpus_texts)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bloom_gate_property_no_false_negatives(spark, train, evald):
    """On arbitrary tiny corpora the Bloom-probed gate drops a
    SUPERSET of the exact InSet gate's drops (a Bloom filter has no
    false negatives), and at the default sizing the tiny gram sets
    here produce zero false positives — keep-sets match exactly."""
    from pyspark.sql import Row
    from rstreams_spark.streaming.curation import (
        eval_gram_bloom, eval_gram_hashes,
        stream_decontaminate_ngrams_bloom,
        stream_decontaminate_ngrams_native,
    )

    tdf = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(train)]
    )
    edf = spark.createDataFrame(
        [Row(doc_id=-1 - i, text=t) for i, t in enumerate(evald)]
    )
    n = 2
    exact_kept = {
        r["doc_id"]
        for r in stream_decontaminate_ngrams_native(
            tdf, eval_gram_hashes(spark, edf, n=n)
        ).collect()
    }
    bloom_kept = {
        r["doc_id"]
        for r in stream_decontaminate_ngrams_bloom(
            tdf, eval_gram_bloom(spark, edf, n=n)
        ).collect()
    }
    assert bloom_kept <= exact_kept  # never a false negative
    # NOTE: no equality assert — false positives are only
    # probabilistically absent (the fixture test bounds FPR on
    # realistic data; random corpora at the m=1024 floor can fill
    # the filter enough to over-drop occasionally, by design)


@given(
    st.binary(max_size=96),
    st.sampled_from([
        b"", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"GIF89a", b"BM",
        b"RIFF", b"fLaC", b"\x00\x00\x00\x18ftypisom",
    ]),
)
@settings(max_examples=300, deadline=None)
def test_container_probes_never_raise_on_garbage(tail, magic):
    """A 100 TB corpus contains truncated and corrupt payloads; the
    pure-Python container header probes must classify or decline
    (None / stub), never raise — a raising probe inside mapInPandas
    kills the whole pass for one bad file. Fuzzes random bytes and
    valid magics glued to garbage, including truncations."""
    from rstreams_spark.functions.audiohdr import probe_audio
    from rstreams_spark.functions.imagehdr import probe_image
    from rstreams_spark.functions.videohdr import probe_video

    for payload in (magic + tail, (magic + tail)[: len(magic) // 2], tail):
        probe_image(payload)
        probe_audio(payload)
        probe_video(payload)
