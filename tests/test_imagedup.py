"""Image dHash near-dup: hash invariances, banding losslessness vs
brute force, gate-tier conformance, and planted-twin recall."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from search_engine_core_ray.functions.codecs import decode_png, encode_png
from search_engine_core_ray.stages.imagedup import (
    dhash64,
    gray_u8,
    hamming_pairs,
    image_near_dupes,
    synth_image_pairs_table,
)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_dhash_monotone_intensity_invariance():
    rng = np.random.RandomState(3)
    tiles = rng.randint(0, 240, size=(4, 5, 3)).astype(np.uint8)
    img = np.kron(tiles, np.ones((8, 10, 1), dtype=np.uint8))
    h0 = dhash64(img)
    # global brightness shift and linear scale preserve every comparison
    assert dhash64(np.clip(img.astype(np.int64) + 15, 0, 255).astype(np.uint8)) == h0
    assert dhash64((img.astype(np.int64) * 9 // 10).astype(np.uint8)) == h0
    # structural change (transpose) must move the hash far
    assert _ham(h0, dhash64(img.transpose(1, 0, 2))) > 10


def test_dhash_handles_small_and_gray_images():
    rng = np.random.RandomState(4)
    tiny = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)  # w < 9 cols
    assert 0 <= dhash64(tiny) < 2**64
    gray = rng.randint(0, 256, size=(16, 20), dtype=np.uint8)
    assert gray_u8(gray).shape == (16, 20)
    assert 0 <= dhash64(gray[:, :, None]) < 2**64


def test_planted_twins_within_threshold():
    t = synth_image_pairs_table(24, seed=7)
    hs = {
        i: dhash64(decode_png(p))
        for i, p in zip(t.column("media_id").to_pylist(),
                        t.column("payload").to_pylist())
    }
    for i in range(24):
        assert _ham(hs[3 * i], hs[3 * i + 1]) <= 8, i
    # hard negatives sit far from their base
    negs = [(3 * i, 3 * i + 2) for i in range(24) if 3 * i + 2 in hs]
    assert negs and all(_ham(hs[a], hs[b]) > 8 for a, b in negs)


def test_banding_equals_brute_force_both_gate_tiers(ray_session):
    import ray.data

    t = synth_image_pairs_table(12, seed=21)
    hs = {
        i: dhash64(decode_png(p))
        for i, p in zip(t.column("media_id").to_pylist(),
                        t.column("payload").to_pylist())
    }
    want = sorted(
        (a, b, _ham(hs[a], hs[b]))
        for a, b in itertools.combinations(sorted(hs), 2)
        if _ham(hs[a], hs[b]) <= 8
    )
    sigs = pa.table(
        {"media_id": pa.array(sorted(hs), pa.int64()),
         "dhash": pa.array(
             np.asarray([np.uint64(hs[i]) for i in sorted(hs)]).view(np.int64),
             pa.int64())}
    )
    for gate in ({}, {"broadcast_limit": 0}):
        ds = ray.data.from_arrow(sigs).repartition(3).materialize()
        got = hamming_pairs(ds, "media_id", "dhash", 8, **gate).to_pandas()
        got_rows = sorted(zip(got["a"], got["b"], got["hamming"]))
        assert got_rows == want, gate


def test_image_near_dupes_end_to_end(ray_session):
    import ray.data

    ds = ray.data.from_arrow(synth_image_pairs_table(12, seed=7)).repartition(3)
    out = image_near_dupes(ds, max_hamming=8).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    twins = {(3 * i, 3 * i + 1) for i in range(12)}
    assert twins <= pairs  # every planted twin recovered
    assert (out["hamming"] <= 8).all()


# ---------------------------------------------------------------- audio


def test_audio_fp_gain_invariance_and_structure_sensitivity():
    from search_engine_core_ray.functions.codecs import decode_wav
    from search_engine_core_ray.stages.imagedup import (
        audio_fp64,
        synth_audio_pairs_table,
    )

    t = synth_audio_pairs_table(6, seed=13)
    p0 = t.column("payload").to_pylist()[0]
    samples, _ = decode_wav(p0)
    h0 = audio_fp64(samples)
    # pure gain change: hamming 0 (monotone invariance)
    assert audio_fp64((samples.astype(np.int64) // 2).astype(np.int16)) == h0
    # structural change (reversed in time): far away
    assert _ham(h0, audio_fp64(samples[::-1])) > 10


def test_audio_near_dupes_end_to_end(ray_session):
    import ray.data

    from search_engine_core_ray.stages.imagedup import (
        audio_near_dupes,
        synth_audio_pairs_table,
    )

    ds = ray.data.from_arrow(synth_audio_pairs_table(24, seed=13)).repartition(4)
    out = audio_near_dupes(ds, max_hamming=6).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    twins = {(3 * i, 3 * i + 1) for i in range(24)}
    assert pairs == twins  # all twins, zero false positives (seed 13)
