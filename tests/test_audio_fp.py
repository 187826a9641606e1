"""Audio content fingerprint dedup (operators/audio_fp.py).

Twin strategy: an independent pure-pandas recompute of the fingerprint
pipeline (decode via the audio codec layer, Haitsma–Kalker bits via a
test-local numpy reimplementation that shares no code with the
operator's kernel) must produce the same dup-group sets as the Spark
path — the same exact-equality discipline as tests/test_hash_twins.py.
"""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from nadeefiler_spark import audio, datagen
from nadeefiler_spark.operators import audio_fp


def _twin_fp(pcm: np.ndarray, sr_hz: int) -> int:
    """Test-local reimplementation of the spectral-envelope hash:
    explicit per-band loop sums (no prefix-sum trick), no shared
    helpers — must agree bit-for-bit with the operator's kernel."""
    x = np.asarray(pcm, dtype=np.float32)
    if len(x) < 128:
        x = np.concatenate([x, np.zeros(128 - len(x), dtype=np.float32)])
    mag2 = np.abs(np.fft.rfft(x)) ** 2
    hi = min(sr_hz / 2.0, 4000.0)
    edges_hz = np.geomspace(60.0, hi, 66)
    bin_of = lambda h: int(np.clip(np.int64(h / (sr_hz / len(x))), 1, len(mag2) - 1))
    e = []
    for b in range(65):
        lo_i, hi_i = bin_of(edges_hz[b]), bin_of(edges_hz[b + 1])
        lo_i, hi_i = min(lo_i, hi_i), max(lo_i, hi_i)
        # float64 accumulation to match the kernel's prefix-sum dtype
        e.append(float(np.sum(mag2[lo_i:hi_i], dtype=np.float64)))
    bits = [int(e[b] > e[b + 1]) for b in range(64)]
    v = 0
    for bit in bits:
        v = (v << 1) | bit
    return v - (1 << 64) if v >= (1 << 63) else v


def _mini_clips(spark):
    """Handcrafted corpus: cross-codec content dups + distinct clips."""
    pcm_a = audio.render_pcm("content-A", 16000, 500)
    pcm_b = audio.render_pcm("content-B", 16000, 500)
    rows = [
        ("a-wav", audio.encode(pcm_a, 16000, "pcm_s16le")),
        ("a-flac", audio.encode(pcm_a, 16000, "flac")),   # same PCM, new container
        ("a-opus", audio.encode(pcm_a, 16000, "opus")),
        ("b-wav", audio.encode(pcm_b, 16000, "pcm_s16le")),
        ("junk", b"\x00not audio"),
    ]
    return spark.createDataFrame(rows, "clip_id string, bytes binary")


def test_cross_codec_groups_and_errors(spark):
    groups = audio_fp.audio_content_dup_groups(_mini_clips(spark)).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["clip_ids"] == ["a-flac", "a-opus", "a-wav"]
    assert g["keeper_id"] == "a-flac" and g["n_clips"] == 3
    # byte-hash dedup CANNOT see these: all blobs are distinct bytes
    n_byte_dups = (
        _mini_clips(spark).groupBy(F.md5("bytes")).count().where("count > 1").count()
    )
    assert n_byte_dups == 0
    errs = audio_fp.audio_fingerprints(_mini_clips(spark)).where(
        F.col("fp_error").isNotNull()
    ).collect()
    assert [e["id"] for e in errs] == ["junk"]


def test_near_pairs_pigeonhole(spark):
    # near path must find all exact-content pairs at hamming 0
    pairs = audio_fp.audio_near_dup_pairs(_mini_clips(spark), max_hamming=3)
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in pairs.collect()}
    assert got == {
        ("a-flac", "a-opus", 0),
        ("a-flac", "a-wav", 0),
        ("a-opus", "a-wav", 0),
    }


def test_near_pairs_noise_variant(spark):
    """A noise-floor variant (same recording, audible noise added) is NOT
    byte- or fp-identical but must surface as a near pair within the
    pigeonhole bound — the case exact dedup is structurally blind to."""
    pcm = audio.render_pcm("clip-N", 16000, 600)
    rng = np.random.default_rng(3)
    noisy = np.clip(
        pcm.astype(np.float32) + rng.normal(0, 80, len(pcm)).astype(np.float32),
        -32768, 32767,
    ).astype(np.int16)
    rows = [
        ("orig", audio.encode(pcm, 16000, "pcm_s16le")),
        ("noisy", audio.encode(noisy, 16000, "flac")),
        ("other", audio.encode(audio.render_pcm("clip-M", 16000, 600), 16000, "pcm_s16le")),
    ]
    df = spark.createDataFrame(rows, "clip_id string, bytes binary")
    # not exact-identical content
    assert audio_fp.audio_content_dup_groups(df).count() == 0
    pairs = {
        (r["id_a"], r["id_b"])
        for r in audio_fp.audio_near_dup_pairs(df, max_hamming=3).collect()
    }
    assert pairs == {("noisy", "orig")}


def test_datagen_twin_pairset(spark, tiny_cfg):
    """Full-pipeline twin: Spark dup groups == pure-pandas recompute on
    the same generated clips (decode shared, bit kernel independent)."""
    clips = datagen.clips_df(spark, tiny_cfg)
    spark_groups = {
        tuple(r["clip_ids"])
        for r in audio_fp.audio_content_dup_groups(clips).collect()
    }
    pdf = clips.select("clip_id", "bytes").toPandas()
    by_fp: dict[int, list[str]] = {}
    for cid, blob in zip(pdf["clip_id"], pdf["bytes"]):
        try:
            _c, sr, pcm = audio.decode(bytes(blob))
        except Exception:
            continue
        by_fp.setdefault(_twin_fp(pcm, int(sr)), []).append(cid)
    twin_groups = {tuple(sorted(v)) for v in by_fp.values() if len(v) > 1}
    assert spark_groups == twin_groups
    # datagen plants exact duplicates (row_spec i%211==1) — they MUST be found
    assert len(spark_groups) >= 1
    # and nothing else: datagen's only content dups are exact copies, so
    # every group must hold identical decoded PCM (no false positives —
    # the time-delta scheme this kernel replaced failed exactly here)
    pcm_by_id = {}
    for cid, blob in zip(pdf["clip_id"], pdf["bytes"]):
        try:
            _c, _sr, p = audio.decode(bytes(blob))
            pcm_by_id[cid] = p
        except Exception:
            pass
    for grp in spark_groups:
        ref = pcm_by_id[grp[0]]
        for cid in grp[1:]:
            assert np.array_equal(pcm_by_id[cid], ref), grp
    # and the operator's own kernel agrees bit-for-bit with the twin
    pcm = audio.render_pcm("bitcheck", 8000, 300)
    assert audio_fp.pcm_fingerprint64(pcm, 8000) == _twin_fp(pcm, 8000)


def test_fp_distinct_for_distinct_content():
    fps = {
        audio_fp.pcm_fingerprint64(audio.render_pcm(f"c{i}", 16000, 400), 16000)
        for i in range(64)
    }
    assert len(fps) == 64


def test_short_clip_padding():
    # clips shorter than the 128-sample FFT floor must not crash
    v = audio_fp.pcm_fingerprint64(np.array([5, -3], dtype=np.int16), 8000)
    assert isinstance(v, int)


def test_fused_decode_facts_fp(spark, tiny_cfg):
    """decode_facts(with_fp=True) must carry the identical fingerprints
    the standalone operator computes, and the facts-based dup groups
    must equal the operator's (the decode-once fusion contract)."""
    from nadeefiler_spark.rules.audio_rules import decode_facts

    clips = datagen.clips_df(spark, tiny_cfg)
    facts = decode_facts(clips, with_snr=False, with_fp=True)
    fused = {r["clip_id"]: r["fp"] for r in facts.select("clip_id", "fp").collect()}
    direct = {
        r["id"]: r["fp"]
        for r in audio_fp.audio_fingerprints(clips).collect()
    }
    assert fused == direct
    a = {
        tuple(r["clip_ids"])
        for r in audio_fp.dup_groups_from_facts(facts).collect()
    }
    b = {
        tuple(r["clip_ids"])
        for r in audio_fp.audio_content_dup_groups(clips).collect()
    }
    assert a == b and len(a) >= 1


def test_engine_content_dedup_stage(spark, tiny_cfg, clips_dir, tmp_path_factory):
    """Engine cascade stage: content_dups table + manifest lineage +
    global-recompute resume semantics."""
    from nadeefiler_spark.engine import ValidationEngine

    out = str(tmp_path_factory.mktemp("engine_cd"))
    eng = ValidationEngine(spark, out, rules=[])
    clips = spark.read.parquet(f"{clips_dir}/clips")

    v = eng.run_content_dedup(clips, run_id="cd1").toPandas()
    assert set(v["stage"]) == {"content_dedup"}
    groups = eng.content_dups().toPandas()
    direct = audio_fp.audio_content_dup_groups(clips).toPandas()
    assert sorted(map(tuple, groups["clip_ids"])) == sorted(
        map(tuple, direct["clip_ids"])
    )
    # lineage: per-part n_violations == clips implicated in a dup group
    implicated = sum(len(g) for g in groups["clip_ids"])
    assert int(v["n_violations"].sum()) == implicated > 0

    # resume with no new partitions: a no-op (no new manifest rows)
    eng.run_content_dedup(clips, run_id="cd2")
    m = eng.manifest().toPandas()
    assert set(m[m["stage"] == "content_dedup"]["run_id"]) == {"cd1"}

    # a NEW partition triggers a full global recompute: plant a cross-
    # partition re-encode of an existing clip in a fresh partition
    row = clips.where("part = 'pcm_s16le'").limit(1).collect()[0]
    from nadeefiler_spark import audio

    _c, sr, pcm = audio.decode(bytes(row["bytes"]))
    reenc = audio.encode(pcm, sr, "flac")
    extra_row = row.asDict()
    extra_row.update(
        clip_id=row["clip_id"] + "-re", bytes=bytearray(reenc),
        codec="flac", part="newpart",
    )
    extra = spark.createDataFrame(
        [tuple(extra_row[f.name] for f in clips.schema.fields)], clips.schema
    )
    eng.run_content_dedup(clips.unionByName(extra), run_id="cd3")
    groups2 = eng.content_dups().toPandas()
    joined = {
        tuple(g) for g in groups2["clip_ids"]
        if row["clip_id"] in g and row["clip_id"] + "-re" in g
    }
    assert joined, "cross-partition re-encode must join its original's group"
    m3 = eng.manifest().toPandas()
    cd3 = m3[(m3["stage"] == "content_dedup") & (m3["run_id"] == "cd3")]
    assert set(cd3["part"]) == {"newpart"}


def test_near_pairs_wider_recall_knob(spark):
    """n_chunks=8 guarantees recall through hamming 7 — catches a
    heavier perturbation the default 4-chunk blocking may miss."""
    pcm = audio.render_pcm("clip-N", 16000, 600)
    rng = np.random.default_rng(3)
    noisy = np.clip(
        pcm.astype(np.float32) + rng.normal(0, 150, len(pcm)).astype(np.float32),
        -32768, 32767,
    ).astype(np.int16)  # measured hamming 7 vs the original
    df = spark.createDataFrame(
        [("orig", audio.encode(pcm, 16000, "pcm_s16le")),
         ("noisy", audio.encode(noisy, 16000, "flac"))],
        "clip_id string, bytes binary",
    )
    pairs = audio_fp.audio_near_dup_pairs(df, max_hamming=7, n_chunks=8)
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in pairs.collect()}
    assert got == {("noisy", "orig", 7)}
    with pytest.raises(ValueError, match="pigeonhole"):
        audio_fp.audio_near_dup_pairs(df, max_hamming=4, n_chunks=4)


def test_incremental_clip_admission_all_tiers(spark):
    """Every disposition planted with a certain outcome; near tier's
    hamming is pre-verified against the pure fingerprint kernel so the
    assertion cannot drift with the perturbation constant."""
    pcm_a = audio.render_pcm("content-A", 16000, 500)
    pcm_b = audio.render_pcm("content-B", 16000, 500)
    pcm_c = audio.render_pcm("content-C", 16000, 500)
    rng = np.random.default_rng(123)
    noise = (rng.standard_normal(len(pcm_a)) * 50).astype(np.int16)
    pcm_a2 = np.clip(
        pcm_a.astype(np.int32) + noise, -32768, 32767
    ).astype(np.int16)
    h_expect = bin(
        (audio_fp.pcm_fingerprint64(pcm_a2, 16000)
         ^ audio_fp.pcm_fingerprint64(pcm_a, 16000)) & (2**64 - 1)
    ).count("1")
    assert 1 <= h_expect <= 3  # test precondition, not the assertion

    wav_a = audio.encode(pcm_a, 16000, "pcm_s16le")
    wav_c = audio.encode(pcm_c, 16000, "pcm_s16le")
    corpus = spark.createDataFrame(
        [("c1", wav_a), ("c2", audio.encode(pcm_b, 16000, "flac"))],
        "clip_id string, bytes binary",
    )
    batch = spark.createDataFrame(
        [
            ("n1", wav_a),                                # exact_corpus -> c1
            ("n2", audio.encode(pcm_b, 16000, "opus")),   # content_corpus -> c2
            ("n3", audio.encode(pcm_a2, 16000, "flac")),  # near_corpus -> c1
            ("n4", wav_c),                                # accept (keeper)
            ("n5", wav_c),                                # exact_batch -> n4
            ("n6", b"\x00not audio"),                     # undecodable
        ],
        "clip_id string, bytes binary",
    )
    got = {
        r["id"]: (r["disposition"], r["match_id"], r["hamming"])
        for r in audio_fp.incremental_clip_admission(corpus, batch).collect()
    }
    assert got == {
        "n1": ("exact_corpus", "c1", 0),
        "n2": ("content_corpus", "c2", 0),
        "n3": ("near_corpus", "c1", h_expect),
        "n4": ("accept", None, None),
        "n5": ("exact_batch", "n4", 0),
        "n6": ("undecodable", None, None),
    }


def test_incremental_clip_admission_corpus_fps_index(spark):
    """Passing the maintained (id, fp) index must skip corpus decode and
    produce identical dispositions."""
    pcm_a = audio.render_pcm("content-A", 16000, 500)
    corpus = spark.createDataFrame(
        [("c1", audio.encode(pcm_a, 16000, "pcm_s16le"))],
        "clip_id string, bytes binary",
    )
    batch = spark.createDataFrame(
        [("n1", audio.encode(pcm_a, 16000, "opus"))],
        "clip_id string, bytes binary",
    )
    idx = audio_fp.audio_fingerprints(corpus).select("id", "fp")
    # corpus bytes deliberately poisoned: if the index path re-decoded
    # the corpus this would classify differently / error
    poisoned = corpus.select(
        "clip_id", F.lit(b"\x00junk").alias("bytes")
    )
    got = audio_fp.incremental_clip_admission(
        poisoned, batch, corpus_fps=idx
    ).collect()
    assert [(r["disposition"], r["match_id"]) for r in got] == [
        ("content_corpus", "c1")
    ]


def test_engine_admission_stage(spark, tiny_cfg, clips_dir, tmp_path_factory):
    """Engine cascade stage: admissions table partitioned by delivery,
    manifest lineage, per-batch resume idempotency."""
    from nadeefiler_spark.engine import ValidationEngine

    out = str(tmp_path_factory.mktemp("engine_adm"))
    eng = ValidationEngine(spark, out, rules=[])
    clips = spark.read.parquet(f"{clips_dir}/clips")

    row = clips.limit(1).collect()[0]
    pcm_new = audio.render_pcm("admission-new", 16000, 120)
    batch = spark.createDataFrame(
        [
            ("adm-copy", bytes(row["bytes"])),          # exact_corpus
            ("adm-new", audio.encode(pcm_new, 16000, "flac")),  # accept
        ],
        "clip_id string, bytes binary",
    )
    v = eng.run_admission(clips, batch, batch_id="b1", run_id="a1").toPandas()
    assert set(v["stage"]) == {"admission"} and list(v["part"]) == ["b1"]
    assert int(v["n_rows"].sum()) == 2 and int(v["n_violations"].sum()) == 1
    adm = eng.admissions().toPandas()
    got = dict(zip(adm["id"], adm["disposition"]))
    assert got == {"adm-copy": "exact_corpus", "adm-new": "accept"}
    assert set(adm["part"]) == {"b1"}

    # same batch id resumes as a no-op; a new id runs and appends its rows
    assert eng.run_admission(clips, batch, batch_id="b1", run_id="a2").isEmpty()
    m = eng.manifest().toPandas()
    assert set(m[m["stage"] == "admission"]["run_id"]) == {"a1"}
    eng.run_admission(clips, batch, batch_id="b2", run_id="a3")
    adm2 = eng.admissions().toPandas()
    assert sorted(set(adm2["part"])) == ["b1", "b2"] and len(adm2) == 4


def test_engine_fp_index_stage(spark, tiny_cfg, clips_dir, tmp_path_factory):
    """fp_index builds per-partition, resumes incrementally, and matches
    the direct fingerprint pass."""
    from nadeefiler_spark.engine import ValidationEngine

    out = str(tmp_path_factory.mktemp("engine_fpi"))
    eng = ValidationEngine(spark, out, rules=[])
    clips = spark.read.parquet(f"{clips_dir}/clips")
    parts = sorted(r[0] for r in clips.select("part").distinct().collect())
    first = clips.where(F.col("part") == parts[0])

    eng.run_fp_index(first, run_id="i1")
    idx1 = eng.fp_index().toPandas()
    direct = audio_fp.audio_fingerprints(first).toPandas()
    assert dict(zip(idx1["clip_id"], idx1["fp"])) == dict(
        zip(direct["id"], direct["fp"])
    )

    # full corpus: only the remaining partitions are decoded/indexed
    eng.run_fp_index(clips, run_id="i2")
    m = eng.fp_index().toPandas()
    assert len(m) == clips.count()
    mf = eng.manifest().where(F.col("stage") == "fp_index").toPandas()
    runs = dict(zip(mf["part"], mf["run_id"]))
    assert runs[parts[0]] == "i1"  # not redone
    assert all(runs[p] == "i2" for p in parts[1:])

    # resume with nothing new: no-op
    eng.run_fp_index(clips, run_id="i3")
    assert "i3" not in set(
        eng.manifest().where(F.col("stage") == "fp_index").toPandas()["run_id"]
    )


def test_admission_uses_fp_index_when_complete(spark, tiny_cfg, clips_dir,
                                               tmp_path_factory):
    """With a complete fp_index, run_admission must not decode corpus
    bytes: poisoned corpus blobs still content-match via the index."""
    from nadeefiler_spark.engine import ValidationEngine

    out = str(tmp_path_factory.mktemp("engine_fpi_adm"))
    eng = ValidationEngine(spark, out, rules=[])
    clips = spark.read.parquet(f"{clips_dir}/clips")
    eng.run_fp_index(clips, run_id="i1")

    row = clips.limit(1).collect()[0]
    _c, sr, pcm = audio.decode(bytes(row["bytes"]))
    batch = spark.createDataFrame(
        [("re-enc", audio.encode(pcm, int(sr), "opus"))],
        "clip_id string, bytes binary",
    )
    poisoned = clips.withColumn(
        "bytes", F.lit(b"\x00poisoned").cast("binary")
    )
    eng.run_admission(poisoned, batch, batch_id="bp", run_id="ap")
    adm = eng.admissions().toPandas()
    assert list(adm["disposition"]) == ["content_corpus"]
    assert list(adm["match_id"]) == [row["clip_id"]]
