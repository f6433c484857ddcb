"""Perceptual near-duplicate detection for binary media columns:
image dHash and audio envelope hash + shared pigeonhole pairing.

The multimodal column story (schema, decode actors, batch sizing) lives
in stages/multimodal.py; this module adds the DEDUP operator a training
-data pipeline runs over an image corpus: a 64-bit difference hash
(dHash — row-adjacent brightness comparisons on a 9x8 integer
downsample; the standard perceptual-hash family baseline) and
near-duplicate pair generation by the same pigeonhole chunk banding
the text SimHash operator uses (stages/dedup.py simhash_near_dupes:
any pair within hamming <= k agrees on one of k+1 signature chunks).

Everything is exact integer arithmetic — luma via (299R+587G+114B)//1000,
block means via floor division — so the hash is bit-reproducible across
platforms; PNG decode is the repo's own stdlib codec
(functions/codecs.decode_png).

100-TB shape: dHash is an actor-pool map stage (payloads never
shuffle); the pair exchange is 24 B/row (media_id, chunk, value)
through a hash self-join; signature attach for the popcount verify is
16 B/row and threshold-gated — identical scaling story to
simhash_near_dupes, verified there.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import polars as pl

from ..functions.codecs import decode_png, encode_png

DHASH_GRID = (8, 9)  # rows x cols of the brightness grid -> 8x8 = 64 bits


def gray_u8(img: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 -> integer luma (ITU-R 601 weights, floor)."""
    if img.ndim == 2:
        return img.astype(np.int64)
    if img.shape[2] == 1:
        return img[:, :, 0].astype(np.int64)
    rgb = img[:, :, :3].astype(np.int64)
    return (299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) // 1000


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash: 9x8 integer block-mean grid, bit =
    cell brighter than its right neighbour, row-major MSB-first."""
    g = gray_u8(img)
    h, w = g.shape
    rows, cols = DHASH_GRID
    grid = np.empty((rows, cols), dtype=np.int64)
    for i in range(rows):
        lo_r = i * h // rows
        hi_r = max(lo_r + 1, (i + 1) * h // rows)
        for j in range(cols):
            lo_c = j * w // cols
            hi_c = max(lo_c + 1, (j + 1) * w // cols)
            block = g[lo_r:hi_r, lo_c:hi_c]
            grid[i, j] = int(block.sum()) // block.size
    bits = (grid[:, 1:] > grid[:, :-1]).astype(np.uint64).ravel()
    out = np.uint64(0)
    for b in bits:
        out = (out << np.uint64(1)) | b
    return int(out)


class ImageDHash:
    """Actor-pool ``map_batches`` stage: PNG payload -> (media_id,
    dhash int64) — decode + hash stay on the worker, payload bytes
    never leave it."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        hashes = []
        for p in batch.column("payload").to_pylist():
            hashes.append(np.int64(np.uint64(dhash64(decode_png(p)))))
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()),
             "dhash": pa.array(np.asarray(hashes, np.int64), pa.int64())}
        )


def hamming_pairs(
    sigs,
    id_col: str,
    sig_col: str,
    max_hamming: int,
    num_partitions: int = 8,
    **gate_kwargs,
):
    """Generic 64-bit-signature near-dup pairs (a, b, hamming), a < b —
    the pigeonhole chunk machinery of stages/dedup.py
    simhash_near_dupes, parameterized over the signature column so the
    image dHash (and any future 64-bit perceptual hash) shares it.

    ``sigs`` must be a materialized Dataset (it feeds both the chunk
    explode and the verify attach).
    """
    import ray.data

    from ..functions.joins import gated_lookup
    from .shuffle import AUTO_THRESHOLD, sorted_distinct

    n_chunks = max_hamming + 1
    base = 64 // n_chunks
    widths = [base + (1 if i < 64 % n_chunks else 0) for i in range(n_chunks)]
    offsets = [sum(widths[:i]) for i in range(n_chunks)]

    def chunk_rows(b: pa.Table) -> pa.Table:
        u = np.asarray(b.column(sig_col).to_pylist(), dtype=np.int64).view(np.uint64)
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        outs = []
        for c, (off, w) in enumerate(zip(offsets, widths)):
            v = ((u >> np.uint64(off)) & np.uint64((1 << w) - 1)).astype(np.int64)
            outs.append(
                pa.table(
                    {"id": pa.array(ids, pa.int64()),
                     "c": pa.array(np.full(len(ids), c, np.int64)),
                     "v": pa.array(v, pa.int64())}
                )
            )
        return pa.concat_tables(outs)

    chunks = sigs.map_batches(chunk_rows, batch_format="pyarrow")

    def _side(name):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table(
                {"c": b.column("c"), "v": b.column("v"), name: b.column("id")}
            )

        return fn

    pairs = (
        chunks.map_batches(_side("a"), batch_format="pyarrow")
        .join(
            chunks.map_batches(_side("b"), batch_format="pyarrow"),
            join_type="inner",
            num_partitions=num_partitions,
            on=("c", "v"),
        )
        .repartition(num_partitions)  # merge schema-less empty partitions
        .map_batches(
            lambda b: b.filter(pc.less(b.column("a"), b.column("b"))).select(
                ["a", "b"]
            ),
            batch_format="pyarrow",
        )
    )
    uniq = sorted_distinct(pairs, ["a", "b"], auto_threshold=AUTO_THRESHOLD).materialize()
    empty = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "hamming": pa.array([], pa.int64())}
    )
    if uniq.count() == 0:
        return ray.data.from_arrow(empty)

    mode, side = gated_lookup(sigs, id_col, [sig_col], **gate_kwargs)

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        if mode == "broadcast":
            import ray as _ray

            lut = pl.from_arrow(_ray.get(side))
            t = (
                pl.from_arrow(b)
                .join(lut.rename({id_col: "a", sig_col: "ha"}), on="a")
                .join(lut.rename({id_col: "b", sig_col: "hb"}), on="b")
                .to_arrow()
            )
        else:
            t = b  # already attached by the joins below
        ua = np.asarray(t.column("ha").to_pylist(), dtype=np.int64).view(np.uint64)
        ub = np.asarray(t.column("hb").to_pylist(), dtype=np.int64).view(np.uint64)
        x = ua ^ ub
        ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(
            axis=1
        ).astype(np.int64)
        keep = ham <= max_hamming
        return pa.table(
            {"a": t.column("a").filter(pa.array(keep)),
             "b": t.column("b").filter(pa.array(keep)),
             "hamming": pa.array(ham[keep], pa.int64())}
        )

    if mode == "broadcast":
        return uniq.map_batches(verify, batch_format="pyarrow").repartition(
            num_partitions
        )

    att_a = side.map_batches(
        lambda b: pa.table({"a": b.column(id_col), "ha": b.column(sig_col)}),
        batch_format="pyarrow",
    )
    att_b = side.map_batches(
        lambda b: pa.table({"b": b.column(id_col), "hb": b.column(sig_col)}),
        batch_format="pyarrow",
    )
    attached = (
        uniq.join(att_a, join_type="inner", num_partitions=num_partitions, on=("a",))
        .repartition(num_partitions)  # merge schema-less empty partitions
        .join(att_b, join_type="inner", num_partitions=num_partitions, on=("b",))
    )
    return attached.map_batches(verify, batch_format="pyarrow").repartition(
        num_partitions
    )


def image_near_dupes(media, max_hamming: int = 6, num_partitions: int = 8, **gate_kwargs):
    """media(media_id, payload PNG) -> (a, b, hamming) perceptual
    near-dup pairs at dHash hamming <= max_hamming."""
    sigs = media.map_batches(
        ImageDHash, batch_format="pyarrow", batch_size=64, concurrency=(1, 8)
    ).materialize()
    return hamming_pairs(
        sigs, "media_id", "dhash", max_hamming,
        num_partitions=num_partitions, **gate_kwargs,
    )


def synth_image_pairs_table(n_base: int = 24, seed: int = 7) -> pa.Table:
    """Deterministic image corpus WITH planted near-duplicates: each
    base gradient+texture PNG is followed by a brightness-shifted twin
    (a true near-dup: same structure, small dHash distance) and every
    third base also gets an unrelated re-randomized image (a hard
    negative).  media_id = 3*i (base), 3*i+1 (twin), 3*i+2 (negative,
    when present)."""
    rng = np.random.RandomState(seed)
    ids, payloads = [], []
    for i in range(n_base):
        w = int(rng.randint(24, 48))
        h = int(rng.randint(24, 48))
        # coarse random tile texture: per-image structure with real
        # contrast (a plain gradient would dHash identically for every
        # image — the brightness comparisons only see monotonicity)
        tiles = rng.randint(0, 256, size=(4, 5, 3)).astype(np.uint8)
        base = np.kron(tiles, np.ones((8, 10, 1), dtype=np.uint8))[:h, :w, :]
        ids.append(3 * i)
        payloads.append(encode_png(base))
        # twin: 1px recrop + brightness shift — the classic near-dup
        # transform pair.  dHash is INVARIANT to monotone intensity
        # maps (comparisons only), so the brightness shift alone would
        # give hamming 0; the recrop moves grid-cell boundaries
        # slightly and flips only near-tie comparisons.
        twin = np.clip(
            base[1 : h - 1, 1 : w - 1, :].astype(np.int64) + 6, 0, 255
        ).astype(np.uint8)
        ids.append(3 * i + 1)
        payloads.append(encode_png(twin))
        if i % 3 == 0:
            neg_tiles = rng.randint(0, 256, size=(4, 5, 3)).astype(np.uint8)
            neg = np.kron(neg_tiles, np.ones((8, 10, 1), dtype=np.uint8))[:h, :w, :]
            ids.append(3 * i + 2)
            payloads.append(encode_png(neg))
    return pa.table(
        {"media_id": pa.array(ids, pa.int64()),
         "payload": pa.array(payloads, pa.binary())}
    )


# ---------------------------------------------------------------- audio

AUDIO_FP_WINDOWS = 65  # 64 adjacent-energy comparisons -> 64 bits


def audio_fp64(samples: np.ndarray) -> int:
    """64-bit audio fingerprint: mono-mix int64 absolute-energy over
    65 equal windows, bit = window louder than its predecessor —
    the dHash idea on the time axis.  Exact integer arithmetic, and
    (like dHash) invariant to any monotone amplitude map (gain
    changes), sensitive to structural/timing changes."""
    if samples.ndim == 2:
        mono = samples.astype(np.int64).sum(axis=1) // samples.shape[1]
    else:
        mono = samples.astype(np.int64)
    n = len(mono)
    w = AUDIO_FP_WINDOWS
    energy = np.empty(w, dtype=np.int64)
    a = np.abs(mono)
    for i in range(w):
        lo = i * n // w
        hi = max(lo + 1, (i + 1) * n // w)
        energy[i] = int(a[lo:hi].sum()) // (hi - lo)
    bits = (energy[1:] > energy[:-1]).astype(np.uint64)
    out = np.uint64(0)
    for b in bits:
        out = (out << np.uint64(1)) | b
    return int(out)


class AudioFingerprint:
    """Actor-pool ``map_batches`` stage: WAV payload -> (media_id,
    afp int64)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.codecs import decode_wav

        ids = batch.column("media_id").to_pylist()
        fps = []
        for p in batch.column("payload").to_pylist():
            samples, _rate = decode_wav(p)
            fps.append(np.int64(np.uint64(audio_fp64(samples))))
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()),
             "afp": pa.array(np.asarray(fps, np.int64), pa.int64())}
        )


def audio_near_dupes(media, max_hamming: int = 6, num_partitions: int = 8, **gate_kwargs):
    """media(media_id, payload WAV) -> (a, b, hamming) near-dup pairs
    at envelope-hash hamming <= max_hamming — same pigeonhole pair
    machinery as the image path."""
    sigs = media.map_batches(
        AudioFingerprint, batch_format="pyarrow", batch_size=64, concurrency=(1, 8)
    ).materialize()
    return hamming_pairs(
        sigs, "media_id", "afp", max_hamming,
        num_partitions=num_partitions, **gate_kwargs,
    )


def synth_audio_pairs_table(n_base: int = 24, seed: int = 13) -> pa.Table:
    """Deterministic WAV corpus with planted near-duplicates: each base
    clip (random piecewise-amplitude sine mix — real envelope
    structure) gets a gain-scaled + slightly-trimmed twin; every third
    base also gets an unrelated re-randomized clip."""
    from ..functions.codecs import encode_wav

    rng = np.random.RandomState(seed)
    ids, payloads = [], []
    rate = 8000

    def clip() -> np.ndarray:
        dur = int(rng.randint(60, 200)) * rate // 1000
        t = np.arange(dur)
        freq = float(rng.randint(100, 1200))
        sig = np.sin(2 * np.pi * freq * t / rate)
        # piecewise random amplitude: the envelope the hash sees
        env = np.repeat(rng.uniform(0.1, 1.0, size=16), dur // 16 + 1)[:dur]
        return (sig * env * 20000).astype(np.int16).reshape(-1, 1)

    for i in range(n_base):
        base = clip()
        ids.append(3 * i)
        payloads.append(encode_wav(base, rate))
        # twin: 0.8x gain + low-amplitude dither.  The envelope hash is
        # invariant to gain (monotone map), so the dither is what can
        # flip bits — and only where adjacent windows are near-ties.
        # (A time TRIM is deliberately NOT a twin here: shifting window
        # boundaries under a piecewise envelope legitimately moves the
        # hash far — envelope hashing is gain-robust, not shift-robust.)
        dither = rng.randint(-60, 61, size=base.shape)
        twin = np.clip(
            base.astype(np.int64) * 8 // 10 + dither, -32768, 32767
        ).astype(np.int16)
        ids.append(3 * i + 1)
        payloads.append(encode_wav(twin, rate))
        if i % 3 == 0:
            ids.append(3 * i + 2)
            payloads.append(encode_wav(clip(), rate))
    return pa.table(
        {"media_id": pa.array(ids, pa.int64()),
         "payload": pa.array(payloads, pa.binary())}
    )
