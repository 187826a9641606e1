"""Property-based tests (hypothesis): distribution-free invariants the
example-based suites can't sweep.

Each property runs a tiny Spark job per example, so ``max_examples`` is
kept small; hypothesis still shrinks failures to minimal cases. Spark
re-derivations (one job per example) dominate runtime — keep data sizes
two-digit.
"""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).parent))
from xxhash_ref import to_signed, xxh64_str  # noqa: E402

from nadeefiler_spark.operators.bloomjoin import bloom_semi_join
from nadeefiler_spark.operators.heavy import heavy_hitters
from nadeefiler_spark.operators.sessions import sessionize

PROP = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=-(2**62), max_value=2**62)


@PROP
@given(
    big=st.lists(keys, min_size=1, max_size=40),
    small=st.lists(keys, min_size=0, max_size=20),
    n_bits_log2=st.integers(min_value=6, max_value=12),
)
def test_bloom_semi_join_equals_exact_even_at_high_fpp(
    spark, big, small, n_bits_log2
):
    """Exactness must hold for ANY key sets and ANY (undersized) filter:
    a 64-bit bloom forced onto 40 keys is almost all false positives,
    and the verify join must still strip every one of them."""
    b = spark.createDataFrame([(i, k) for i, k in enumerate(big)], "i int, k long")
    s = spark.createDataFrame([(k,) for k in small] or [(0,)], "sk long").limit(
        len(small)
    )
    got = sorted(r["i"] for r in bloom_semi_join(b, s, "k", "sk", n_bits=2**n_bits_log2).collect())
    want = sorted(i for i, k in enumerate(big) if k in set(small))
    assert got == want


@PROP
@given(
    values=st.lists(st.integers(min_value=0, max_value=9), min_size=1, max_size=60),
    inv_phi=st.integers(min_value=1, max_value=20),
    n_parts=st.integers(min_value=1, max_value=6),
)
def test_heavy_hitters_equal_brute_force(spark, values, inv_phi, n_parts):
    """heavy_hitters == groupBy+HAVING for any distribution, threshold,
    and physical partitioning (the pigeonhole bound is distribution-
    free, so repartitioning must never change the answer)."""
    df = spark.createDataFrame([(v,) for v in values], "v long").repartition(n_parts)
    got = [(r["value"], r["cnt"]) for r in heavy_hitters(df, "v", inv_phi).collect()]
    n = len(values)
    counts: dict[int, int] = {}
    for v in values:
        counts[v] = counts.get(v, 0) + 1
    want = sorted(
        ((v, c) for v, c in counts.items() if c * inv_phi > n),
        key=lambda t: (-t[1], t[0]),
    )
    assert got == want


def _sessions_model(events, gap_s):
    """Pure-Python sessionize: per user, sorted by (ts, eid)."""
    out = {}
    by_user: dict[int, list] = {}
    for eid, (u, ts) in enumerate(events):
        by_user.setdefault(u, []).append((ts, eid))
    for u, evs in by_user.items():
        evs.sort()
        idx, prev = 0, None
        for ts, eid in evs:
            if prev is None or ts - prev > gap_s:
                idx += 1
            out[eid] = idx
            prev = ts
    return out


@PROP
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # user
            st.integers(min_value=0, max_value=10_000),  # epoch seconds
        ),
        min_size=1,
        max_size=50,
    ),
    gap_s=st.integers(min_value=1, max_value=2000),
)
def test_sessionize_equals_python_model(spark, events, gap_s):
    """Gap-based session indices match an O(n) reference for any event
    stream, including timestamp ties (tiebreak column pins order; ties
    produce gap 0 either way so indices agree with the model)."""
    rows = [(eid, u, ts) for eid, (u, ts) in enumerate(events)]
    df = spark.createDataFrame(rows, "eid long, u long, ts_s long").select(
        "eid", "u", F.timestamp_seconds("ts_s").alias("ts")
    )
    got = {
        r["eid"]: r["session_idx"]
        for r in sessionize(df, "u", "ts", gap_s=gap_s, tiebreak_col="eid").collect()
    }
    assert got == _sessions_model(events, gap_s)


@PROP
@given(st.lists(st.text(max_size=30), min_size=1, max_size=25))
def test_xxhash_ref_matches_spark_for_arbitrary_strings(spark, texts):
    """The clean-room pure-Python xxhash64 twin (which pins the
    no-oracle MinHash/SimHash pipelines) agrees with Spark's builtin on
    arbitrary unicode — not just the fixed twin corpora."""
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r["h"] for r in df.select(F.xxhash64("t").alias("h")).collect()]
    want = [to_signed(xxh64_str(t, seed=42)) for t in texts]
    assert got == want


# --- header probe fuzz -------------------------------------------------------

blobs = st.binary(min_size=0, max_size=120)
# bias generation toward the parse-relevant prefixes so magic-matched
# paths (including invalid-UTF8 NDF1 tags) are actually explored
magic_blobs = st.one_of(
    blobs,
    st.tuples(
        st.sampled_from([b"RIFF", b"NDF1", b"fLaC", b"OggS", b"ID3", b"\x00"]),
        blobs,
    ).map(lambda t: t[0] + t[1]),
)


@PROP
@given(bs=st.lists(magic_blobs, min_size=1, max_size=25))
def test_header_probe_never_raises_and_verdicts_are_sound(spark, bs):
    """ANY byte string must probe without raising (the ANSI-strict
    decode() crash class), and a NULL finding may only ever be produced
    by a structurally consistent fixed-layout container."""
    from nadeefiler_spark.operators.headerprobe import header_findings

    df = spark.createDataFrame(
        [(str(i), b, 16000, 100, "flac") for i, b in enumerate(bs)],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string",
    )
    rows = header_findings(df).collect()
    assert len(rows) == len(bs)
    for r in rows:
        if r["hdr_finding"] is None:
            # probe vouched: parse succeeded, length consistent, rate sane
            assert r["hdr_ok"] is True
            assert r["hdr_len_ok"] is True
            assert r["hdr_sr_hz"] is not None and r["hdr_sr_hz"] > 0
        if r["hdr_ok"]:
            blob = bs[int(r["clip_id"])]
            assert blob[:4] in (b"RIFF", b"NDF1")


@PROP
@given(
    raw=st.binary(min_size=4, max_size=24),
    pos=st.integers(min_value=1, max_value=8),
)
def test_le_u32_matches_struct_unpack(spark, raw, pos):
    """Byte-for-byte twin of the hex/conv little-endian parse against
    Python's struct.unpack at every offset, including short-blob NULLs."""
    import struct

    from nadeefiler_spark.operators.headerprobe import le_u32

    df = spark.createDataFrame([(raw,)], "b binary")
    got = df.select(le_u32(F.col("b"), pos).alias("v")).first()["v"]
    if len(raw) >= pos + 3:
        assert got == struct.unpack_from("<I", raw, pos - 1)[0]
    else:
        assert got is None
