"""Brute-force property tests for the part-7 operators: the catalog
oracle gate proves cross-engine identity on the fixture corpus; these
prove the SEMANTICS against an independent O(n^2)/O(n log n) Python
reference on small seeded inputs with shapes the fixture lacks
(ties, same-timestamp events, chains of every length, skewed hash
groups)."""

import hashlib
import random

import pyarrow as pa


def _events_ds(ray, rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "ts": pa.array([r[2] for r in rows],
                               pa.timestamp("us")),
            }
        )
    )


def test_funnel_steps_matches_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from search_engine_core_ray.pipelines.catalog import (
        QUERIES,
        _FUNNEL_STEP_US,
    )

    rng = random.Random(7)
    kinds = ["signup", "view", "purchase", "click"]
    rows = []
    for _ in range(400):
        rows.append(
            (
                rng.randrange(12),
                rng.choice(kinds),
                rng.randrange(0, 4 * 24 * 3600) * 1_000_000,
            )
        )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows], pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        ),
        d / "events.parquet",
    )

    # brute force
    per_user: dict = {}
    for uid, kind, us in rows:
        per_user.setdefault(uid, []).append((kind, us))
    expect = {}
    for uid, evs in per_user.items():
        s1 = min((us for k, us in evs if k == "signup"), default=None)
        if s1 is None:
            continue
        s2 = min(
            (us for k, us in evs
             if k == "view" and s1 < us <= s1 + _FUNNEL_STEP_US),
            default=None,
        )
        s3 = None
        if s2 is not None:
            s3 = min(
                (us for k, us in evs
                 if k == "purchase" and s2 < us <= s2 + _FUNNEL_STEP_US),
                default=None,
            )
        expect[uid] = (
            s1,
            -1 if s2 is None else s2,
            -1 if s3 is None else s3,
            1 + (s2 is not None) + (s3 is not None),
        )

    got = {
        r["user_id"]: (r["s1_us"], r["s2_us"], r["s3_us"],
                       r["steps_completed"])
        for r in QUERIES["funnel_steps"](str(d)).take_all()
    }
    assert got == expect


def test_retention_cohorts_matches_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from search_engine_core_ray.pipelines.catalog import QUERIES

    rng = random.Random(11)
    rows = []
    for _ in range(300):
        rows.append(
            (rng.randrange(15),
             rng.randrange(0, 40 * 24 * 3600) * 1_000_000)
        )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array([""] * len(rows), pa.string()),
            }
        ),
        d / "events.parquet",
    )

    DAY = 86_400_000_000
    act = {(uid, (us // DAY + 3) // 7) for uid, us in rows}
    cohort = {}
    for uid, wk in act:
        cohort[uid] = min(wk, cohort.get(uid, wk))
    expect: dict = {}
    for uid, wk in act:
        key = (cohort[uid], wk - cohort[uid])
        expect[key] = expect.get(key, 0) + 1

    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in QUERIES["retention_cohorts"](str(d)).take_all()
    }
    assert got == expect


def test_cross_source_dupes_matches_bruteforce(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from search_engine_core_ray.pipelines.catalog import QUERIES

    rng = random.Random(13)
    texts = [f"content {i}" for i in range(6)]
    rows = []
    for i in range(120):
        # doc_id NOT divisible by 11 so the in-query dirt never fires
        # and the brute force below sees the same texts
        rows.append((1 + i * 11 + (i % 10 == 0), rng.choice(texts),
                     f"s{rng.randrange(5)}"))
    d = tmp_path / "sf"
    d.mkdir()
    ids = []
    seen = set()
    for did, _, _ in rows:
        while did in seen:
            did += 1
            if did % 11 == 0:
                did += 1
        seen.add(did)
        ids.append(did)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
                "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )

    per_hash: dict = {}
    for (_, text, src), did in zip(rows, ids):
        h = hashlib.md5(text.encode()).hexdigest()
        per_hash.setdefault(h, set()).add(src)
    expect: dict = {}
    for srcs in per_hash.values():
        ss = sorted(srcs)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                k = (ss[i], ss[j])
                expect[k] = expect.get(k, 0) + 1

    got = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in QUERIES["cross_source_dupes"](str(d)).take_all()
    }
    assert got == expect
