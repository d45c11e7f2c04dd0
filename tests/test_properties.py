"""Property-based differential tests (hypothesis) — a layer the
reference lacks entirely (SURVEY.md §5: no property/randomized
testing). Each property runs a few random examples against a pandas
oracle; example counts stay small because every example is a Spark
job."""

from __future__ import annotations

import pandas as pd
import pytest

pytestmark = pytest.mark.heavy
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from sif_spark.operators.asof import asof_join
from sif_spark.operators.dedup import exact_dedup

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@st.composite
def asof_data(draw):
    n_left = draw(st.integers(1, 12))
    n_right = draw(st.integers(0, 12))
    keys = st.integers(0, 2)
    # distinct timestamps avoid tie-ambiguity between two RIGHT rows
    # (standard asof leaves that unspecified); left-right equal ts is
    # covered deterministically in test_operators.
    times = draw(
        st.lists(
            st.integers(0, 10_000), min_size=n_left + n_right,
            max_size=n_left + n_right, unique=True,
        )
    )
    left = [(draw(keys), times[i]) for i in range(n_left)]
    right = [(draw(keys), times[n_left + i]) for i in range(n_right)]
    return left, right


@given(asof_data())
@settings(**SETTINGS)
def test_asof_join_matches_pandas(spark, data):
    left_rows, right_rows = data
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)], "k int, t long, lid int"
    ).withColumn("ts", F.timestamp_seconds("t")).drop("t")
    right = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(right_rows)] or [(0, -1, -1)],
        "k int, t long, rid int",
    ).withColumn("ts", F.timestamp_seconds("t")).drop("t")

    got = {
        r["lid"]: r["rid"]
        for r in asof_join(left, right, on=["k"], left_time="ts", right_time="ts",
                           right_cols=["rid"]).collect()
    }

    lp = pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(left_rows)],
                      columns=["k", "t", "lid"]).sort_values("t")
    rp = pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(right_rows)] or [(0, -1, -1)],
                      columns=["k", "t", "rid"]).sort_values("t")
    merged = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    want = {
        int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
        for row in merged.itertuples()
    }
    assert got == want

    # hot_key_bucket mode must agree with the plain mode on the same
    # random data (timestamps span multiple minute-buckets, so random
    # examples exercise cross-bucket carry-in and empty buckets)
    hot = {
        r["lid"]: r["rid"]
        for r in asof_join(left, right, on=["k"], left_time="ts", right_time="ts",
                           right_cols=["rid"], hot_key_bucket="minute").collect()
    }
    assert hot == want


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=12),
        min_size=1, max_size=15,
    )
)
@settings(**SETTINGS)
def test_exact_dedup_properties(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = exact_dedup(df, "text", "doc_id").collect()
    ids = [r["doc_id"] for r in out]
    # survivors are a subset of inputs, no duplicates among survivors
    assert set(ids) <= set(range(len(texts)))
    assert len(ids) == len(set(ids))
    # one survivor per normalized text; survivor is the min id
    norm = lambda s: " ".join(s.lower().split())  # noqa: E731
    groups: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        groups.setdefault(norm(t), []).append(i)
    assert sorted(ids) == sorted(min(g) for g in groups.values())
    # idempotence
    again = exact_dedup(
        df.join(spark.createDataFrame([(i,) for i in ids], "doc_id long"), "doc_id"),
        "text", "doc_id",
    ).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(ids)


@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(-100, 100)),
             min_size=1, max_size=30)
)
@settings(**SETTINGS)
def test_reduce_matches_pandas(spark, rows):
    from sif_spark.frame import SifFrame

    df = spark.createDataFrame(rows, "k int, v int")
    got = {
        r["k"]: (r["s"], r["n"])
        for r in SifFrame(df)
        .reduce(["k"], F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    want = {
        int(k): (int(g["v"].sum()), len(g)) for k, g in pdf.groupby("k")
    }
    assert got == want


def test_map_rows_bisection_drops_exactly_bad_rows(spark):
    """Bisection salvage must keep exactly the non-raising rows, for
    bad-row patterns that stress the recursion (none, all, dense,
    sparse, boundaries)."""
    import pandas as pd

    from sif_spark.frame import SifFrame

    n = 257  # odd, spans several bisection levels
    patterns = {
        "none": set(),
        "all": set(range(n)),
        "first_last": {0, n - 1},
        "dense": set(range(0, n, 2)),
        "sparse": {3, 97, 200},
    }
    df = spark.range(n).toDF("id")
    for name, bad in patterns.items():
        bad_list = sorted(bad)

        def fn(pdf: pd.DataFrame, _bad=frozenset(bad)) -> pd.DataFrame:
            if pdf["id"].isin(_bad).any():
                raise ValueError("bad row")
            return pdf

        out = SifFrame(df).map_rows(fn, "id long", ignore_row_errors=True)
        got = sorted(r["id"] for r in out.df.collect())
        want = sorted(set(range(n)) - bad)
        assert got == want, (name, bad_list[:5])


def test_ntile_distributed_edge_sizes(spark):
    """Distributed ntile equals window ntile for edge row counts:
    fewer rows than tiles, exact multiples, and ±1 off multiples."""
    from pyspark.sql import Window, functions as F

    from sif_spark.operators.ranking import ntile_distributed

    for n_rows, k in [(3, 7), (7, 7), (8, 7), (6, 7), (100, 4), (101, 4), (99, 4)]:
        df = spark.range(n_rows).withColumn("v", (F.col("id") * 13) % 29)
        order = [F.col("v"), F.col("id")]
        want = {
            (r["id"], r["t"])
            for r in df.withColumn("t", F.ntile(k).over(Window.orderBy(*order))).collect()
        }
        got = {
            (r["id"], r["t"])
            for r in ntile_distributed(df, k, order, tile_col="t").collect()
        }
        assert got == want, (n_rows, k)


@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_near_dup_clusters_matches_union_find_property(spark, edges):
    """Random small graphs: BOTH tiers — the driver union-find
    (default for small edge sets since r6) and the distributed
    min-label propagation (forced via driver_max_edges=None) — must
    equal the reference union-find, and therefore each other. Chains,
    cycles, parallel edges, and disconnected components all emerge
    from the random edge lists."""
    from sif_spark.operators.dedup import near_dup_clusters

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    from conftest import union_find_clusters

    want = union_find_clusters(edges)
    got_driver = {
        r["doc_id"]: r["cluster_id"] for r in near_dup_clusters(pairs).collect()
    }
    got_dist = {
        r["doc_id"]: r["cluster_id"]
        for r in near_dup_clusters(pairs, driver_max_edges=None).collect()
    }
    assert got_driver == want
    assert got_dist == want


@given(
    st.lists(  # (doc_id implicit by index, n_tokens per chunk stream)
        st.lists(st.integers(1, 40), min_size=1, max_size=6),
        min_size=1,
        max_size=10,
    ),
    st.integers(16, 64),
)
@settings(**SETTINGS)
def test_pack_sequences_matches_greedy_replay(spark, docs, target):
    """Offset packing must equal a sequential greedy replay of each
    bucket's (doc, idx)-ordered stream, for random chunk sizes and
    targets, on any partitioning."""
    from sif_spark.operators.text import pack_sequences

    rows = [
        (d, i, n) for d, sizes in enumerate(docs) for i, n in enumerate(sizes)
    ]
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx int, n_tokens long")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["bucket"], r["bin_id"], r["bin_offset"])
        for r in pack_sequences(
            df.repartition(3), target_tokens=target, buckets=4
        ).collect()
    }
    # sequential replay
    import hashlib

    def bucket_of(doc):
        return int(hashlib.md5(str(doc).encode()).hexdigest()[:15], 16) % 4

    cum = {}
    for d, sizes in sorted(enumerate(docs)):
        b = bucket_of(d)
        for i, n in enumerate(sizes):
            prev = cum.get(b, 0)
            assert got[(d, i)] == (b, prev // target, prev - (prev // target) * target)
            cum[b] = prev + n


@given(
    st.lists(st.sampled_from(["a b c d e", "c d e f g", "x y z w v", "p q r s t"]),
             min_size=1, max_size=6),
    st.lists(st.sampled_from(["a b c d e", "x y z w v", "m n o p q"]),
             min_size=1, max_size=3),
)
@settings(**SETTINGS)
def test_decontaminate_matches_brute_force(spark, corpus_texts, bench_texts):
    """Flagged ids and hit counts must equal a brute-force set
    intersection of distinct 3-gram shingles."""
    from sif_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame(
        list(enumerate(corpus_texts)), "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(bench_texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(corpus, bench, k=3).collect()
    }

    def grams(t):
        w = t.split()
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    bench_set = set().union(*(grams(t) for t in bench_texts))
    want = {
        i: len(grams(t) & bench_set)
        for i, t in enumerate(corpus_texts)
        if grams(t) & bench_set
    }
    assert got == want


@st.composite
def line_corpus(draw):
    n_docs = draw(st.integers(1, 8))
    vocab = ["aa", "bb", "cc", "dd"]
    docs = []
    for i in range(n_docs):
        n_lines = draw(st.integers(0, 5))
        lines = [
            " ".join(
                draw(
                    st.lists(st.sampled_from(vocab), min_size=1, max_size=3)
                )
            )
            for _ in range(n_lines)
        ]
        docs.append((i, "\n".join(lines)))
    return docs


@given(line_corpus())
@settings(**SETTINGS)
def test_line_dedup_first_matches_reference(spark, docs):
    """line_dedup(mode='first') vs a driver-side reference: keep each
    distinct line's lowest (doc, pos) occurrence, reassemble in pos
    order, keep every doc (empty text when all lines removed)."""
    from sif_spark.operators.dedup import line_dedup

    seen: set[str] = set()
    want: dict[int, list[str]] = {}
    for did, text in sorted(docs):
        kept = []
        for line in text.split("\n"):
            if line and line not in seen:
                seen.add(line)
                kept.append(line)
        want[did] = kept

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert set(got) == set(want)
    for did, kept in want.items():
        assert got[did]["text"] == "\n".join(kept)
        assert got[did]["n_kept"] == len(kept)


@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(1, 10_000_000),
        min_size=1,
        max_size=4,
    ),
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(0, 9),
        min_size=1,
        max_size=4,
    ),
)
@settings(max_examples=50, deadline=None)
def test_mix_rates_invariants(totals, weights):
    """Pure-driver properties of the mixture solver: rates bounded by
    resolution; the default budget never asks any stratum for more
    than it has (no rate would exceed resolution even WITHOUT the
    clamp); rates scale monotonically with the budget."""
    from sif_spark.operators.text import mix_rates

    res = 10_000
    budget, rates = mix_rates(totals, weights, resolution=res)
    w_sum = sum(weights.values())
    for g, r in rates.items():
        assert 0 <= r <= res
        # unclamped rate at the default budget stays within resolution
        assert budget * weights[g] * res // (w_sum * totals[g]) <= res
    if rates:
        _, half = mix_rates(totals, weights, budget // 2, resolution=res)
        assert all(half[g] <= rates[g] for g in half)


@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 255),
    gray=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_ppm_roundtrip_property(h, w, seed, gray):
    """encode→decode is an exact identity for every shape, including
    1-pixel and single-row/column images."""
    import numpy as np

    from sif_spark.operators import multimodal as mm

    shape = (h, w) if gray else (h, w, 3)
    img = ((seed + np.arange(int(np.prod(shape)))) % 256).astype(np.uint8).reshape(shape)
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(img)), img)


@given(h=st.integers(1, 12), w=st.integers(1, 12), seed=st.integers(0, 255))
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip_property(h, w, seed):
    """Exact identity across every width mod 4 (row padding 0-3 bytes)
    — the class of off-by-one a BMP reader typically gets wrong."""
    import numpy as np

    from sif_spark.operators import multimodal as mm

    img = ((seed + np.arange(h * w * 3)) % 256).astype(np.uint8).reshape(h, w, 3)
    assert np.array_equal(mm.decode_bmp(mm.encode_bmp(img)), img)


@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 255),
    channels=st.sampled_from([1, 2, 3, 4]),
    filter_type=st.sampled_from([0, 1, 2, 3, 4, "mixed"]),
)
@settings(max_examples=80, deadline=None)
def test_png_roundtrip_property(h, w, seed, channels, filter_type):
    """encode→decode identity across every (color type, scanline
    filter) pair — gray/gray+alpha/RGB/RGBA × None/Sub/Up/Average/
    Paeth/mixed — including 1-pixel and single-row/column shapes where
    the left/up filter neighbors are entirely out of bounds. This is
    the class of bug a PNG unfilter typically has: wrong bpp offset in
    Sub/Paeth, signed overflow in Average, missing zero rows at the
    image edge."""
    import numpy as np

    from sif_spark.operators import multimodal as mm

    shape = (h, w) if channels == 1 else (h, w, channels)
    img = ((seed + 7 * np.arange(int(np.prod(shape)))) % 256).astype(np.uint8).reshape(shape)
    blob = mm.encode_png(img, filter_type=filter_type)
    out = mm.decode_png(blob)
    assert out.shape == img.shape
    assert np.array_equal(out, img)
    # the sniffed dispatch must route PNG blobs to the same decoder
    assert np.array_equal(mm.media_decoder(blob), img)


@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    ncolors=st.sampled_from([2, 3, 5, 16, 100, 256]),
    seed=st.integers(0, 2**31 - 1),
    interlace=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_gif_roundtrip_property(h, w, ncolors, seed, interlace):
    """encode→decode identity across palette sizes (2 → 256 colors,
    i.e. every LZW starting code width), both interlace modes, and
    1-pixel / single-row/column shapes. The LZW variable-width
    synchronization (the decoder's one-entry lag / 'early change'
    bump) is exactly the class of bug this sweeps for — a width
    desync produces garbage indices, never an off-by-one."""
    import numpy as np

    from sif_spark.operators import multimodal as mm

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, ncolors, size=(h, w))]
    blob = mm.encode_gif(img, interlace=interlace)
    out = mm.decode_gif(blob)
    assert out.shape == img.shape
    assert np.array_equal(out, img)
    assert np.array_equal(mm.media_decoder(blob), img)


@given(
    samples=st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
    channels=st.integers(1, 4),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(samples, channels):
    import numpy as np

    from sif_spark.operators import multimodal as mm

    n = (len(samples) // channels) or 1
    pcm = np.resize(np.asarray(samples, dtype=np.int16), (n, channels))
    decoded = mm.decode_wav(mm.encode_wav(pcm))
    assert decoded.shape == (n, channels)
    back = np.rint(decoded.astype(np.float64) * 32768.0).astype(np.int16)
    assert np.array_equal(back, pcm)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=12).map(
            lambda ws: " ".join(f"w{c}" for c in ws)
        ),
        min_size=2,
        max_size=12,
    ),
    max_hamming=st.integers(2, 12),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_simhash_banding_finds_all_pairs_property(spark, docs, max_hamming):
    """Pigeonhole guarantee: with h+1 bands, the banded candidate join
    must find EVERY pair at Hamming distance ≤ h — identical to the
    brute-force all-pairs XOR popcount (recall exactly 1.0, and the
    verify step makes precision exactly 1.0 too)."""
    from sif_spark.operators.dedup import simhash, simhash_near_dup_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(df, "text", "doc_id").collect()}
    # mask: signatures are SIGNED 64-bit longs; Python's XOR on
    # negative ints is infinite-precision sign-magnitude, not the
    # two's-complement popcount bit_count(xor) computes
    want = {
        (a, b)
        for a in sigs
        for b in sigs
        if a < b
        and bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= max_hamming
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_dup_pairs(
            df, "text", "doc_id", max_hamming=max_hamming
        ).collect()
    }
    assert got == want


@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    seed=st.integers(0, 255),
    rgb=st.booleans(),
    big_endian=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_tiff_roundtrip_property(h, w, seed, rgb, big_endian):
    """encode→decode identity for gray/RGB × II/MM byte orders across
    degenerate shapes — the MM path sweeps the IFD inline-value
    justification handling."""
    import numpy as np

    from sif_spark.operators import multimodal as mm

    shape = (h, w, 3) if rgb else (h, w)
    img = ((seed + 11 * np.arange(int(np.prod(shape)))) % 256).astype(np.uint8).reshape(shape)
    blob = mm.encode_tiff(img, byte_order=">" if big_endian else "<")
    out = mm.decode_tiff(blob)
    assert out.shape == img.shape
    assert np.array_equal(out, img)
    assert np.array_equal(mm.media_decoder(blob), img)


@st.composite
def span_corpus(draw):
    """Tiny-vocab corpora where shared k-grams actually occur."""
    vocab = ["x", "y", "z"]
    n_docs = draw(st.integers(2, 4))
    return [
        (
            i,
            " ".join(
                draw(st.lists(st.sampled_from(vocab), min_size=0, max_size=10))
            ),
        )
        for i in range(n_docs)
    ]


@given(span_corpus())
@settings(**SETTINGS)
def test_span_dedup_matches_reference(spark, docs):
    """span_dedup vs a driver-side reference: a position is removed
    iff a k-gram starting within the previous k positions occurs in
    >= 2 distinct docs; every doc survives (empty text when fully
    covered); docs shorter than k are never touched."""
    from sif_spark.operators.dedup import span_dedup

    K = 3
    from collections import defaultdict

    toks = {d: t.split() for d, t in docs}
    gram_docs: dict[tuple, set] = defaultdict(set)
    for d, ts in toks.items():
        for p in range(len(ts) - K + 1):
            gram_docs[tuple(ts[p : p + K])].add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    want = {}
    for d, ts in toks.items():
        cov = [False] * len(ts)
        for p in range(len(ts) - K + 1):
            if tuple(ts[p : p + K]) in dup:
                cov[p : p + K] = [True] * K
        kept = [t for t, c in zip(ts, cov) if not c]
        want[d] = (" ".join(kept), len(ts), len(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in span_dedup(df, k=K).collect()}
    assert set(got) == set(want)
    for d, (text, n_tokens, n_kept) in want.items():
        assert got[d]["text"] == text, (d, docs)
        assert got[d]["n_tokens"] == n_tokens
        assert got[d]["n_kept"] == n_kept


@st.composite
def avro_frames(draw):
    """Random (spark schema, pandas frame) across the vectorized
    codec's whole kind space, nulls and empty arrays included."""
    import datetime as _dt
    from decimal import Decimal

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    n = draw(st.integers(0, 40))
    kinds = draw(
        st.lists(
            st.sampled_from(
                ["long", "int", "string", "double", "float", "boolean",
                 "bytes", "ts", "date", "dec", "afloat", "along"]
            ),
            min_size=1, max_size=6,
        )
    )
    cols, fields = {}, []
    for ci, kind in enumerate(kinds):
        name = f"c{ci}"
        nullable = draw(st.booleans()) and kind not in ("afloat", "along")
        nulls = (
            [draw(st.booleans()) for _ in range(n)] if nullable else [False] * n
        )

        def mk(i):
            if kind == "long":
                return draw(st.integers(-(2**63), 2**63 - 1))
            if kind == "int":
                return draw(st.integers(-(2**31), 2**31 - 1))
            if kind == "string":
                return draw(st.text(max_size=8))
            if kind == "double":
                return draw(st.floats(allow_nan=False, width=64))
            if kind == "float":
                return np.float32(draw(st.floats(allow_nan=False, width=32)))
            if kind == "boolean":
                return draw(st.booleans())
            if kind == "bytes":
                return bytes(draw(st.binary(max_size=6)))
            if kind == "ts":
                return _dt.datetime(2000, 1, 1) + _dt.timedelta(
                    microseconds=draw(st.integers(0, 10**15))
                )
            if kind == "date":
                return _dt.date(1970, 1, 1) + _dt.timedelta(
                    days=draw(st.integers(-10_000, 30_000))
                )
            if kind == "dec":
                return Decimal(draw(st.integers(-10**10, 10**10))) / 100
            if kind == "afloat":
                return np.array(
                    [draw(st.floats(allow_nan=False, width=32))
                     for _ in range(draw(st.integers(0, 4)))],
                    np.float32,
                )
            return [draw(st.integers(-(2**62), 2**62))
                    for _ in range(draw(st.integers(0, 4)))]

        cols[name] = pd.Series(
            [None if nulls[i] else mk(i) for i in range(n)], dtype=object
        )
        spark_t = {
            "long": T.LongType(), "int": T.IntegerType(),
            "string": T.StringType(), "double": T.DoubleType(),
            "float": T.FloatType(), "boolean": T.BooleanType(),
            "bytes": T.BinaryType(), "ts": T.TimestampType(),
            "date": T.DateType(), "dec": T.DecimalType(14, 2),
            "afloat": T.ArrayType(T.FloatType()),
            "along": T.ArrayType(T.LongType()),
        }[kind]
        fields.append(T.StructField(name, spark_t, nullable))
    return T.StructType(fields), pd.DataFrame(cols) if cols else pd.DataFrame()


@given(avro_frames(), st.sampled_from(["null", "deflate"]))
@settings(**{**SETTINGS, "max_examples": 60})  # no Spark in the loop
def test_avro_vectorized_codec_differential(data, codec):
    """For ANY frame in the kind space: the vectorized writer is
    byte-identical to the per-row reference writer, and the vectorized
    decode materializes the same values the sequential decoder yields."""
    import numpy as np

    from sif_spark.sources.avro import (
        _materialize_col,
        _normalize,
        _pandas_rows,
        avro_schema_for,
        parse_ocf,
        parse_ocf_columns,
        write_ocf,
        write_ocf_pandas,
    )

    schema, pdf = data
    sj = avro_schema_for(schema)
    ref = write_ocf(sj, _pandas_rows(pdf), codec, block_rows=16)
    vec = write_ocf_pandas(sj, pdf, codec, block_rows=16)
    assert ref == vec
    import json as _json

    kinds = [_normalize(f["type"])[0] for f in _json.loads(sj)["fields"]]
    _, rows = parse_ocf(vec)
    _, fcols, nn = parse_ocf_columns(vec)
    assert nn == len(rows) == len(pdf)
    for j, kind in enumerate(kinds):
        col = _materialize_col(kind, *fcols[j], nn)
        for c, s in zip(col, (r[j] for r in rows)):
            if s is None:
                # null floats surface as NaN (NaN→null at the Arrow
                # boundary — same contract as the sequential path) and
                # null timestamps as NaT
                is_nan = isinstance(c, (float, np.floating)) and np.isnan(c)
                is_nat = (
                    isinstance(c, np.datetime64) and np.isnat(c)
                )
                assert c is None or is_nan or is_nat, (kind, c)
            elif kind == "timestamp-micros":
                import pandas as pd

                assert pd.Timestamp(c).to_pydatetime() == s
            elif kind in ("double", "float"):
                assert c == np.array(s, np.float64 if kind == "double" else np.float32)
            elif kind.startswith("array:"):
                assert [x for x in c] == [
                    np.float32(x) if kind == "array:float" else x for x in s
                ]
            else:
                assert c == s, (kind, c, s)
