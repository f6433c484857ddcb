"""prededup_pages: the narrow-pass LWW dedup that never shuffles page
payloads. Must keep exactly lww_dedup's survivor set (max (warc_ts, url)
per normalized URL) and fall back honestly on unsplittable input."""

import datetime

import pyarrow as pa
import pytest

import ray.data

from search_engine_core_ray.stages.profile import prededup_pages

_TS = datetime.datetime(2024, 1, 1)


def _pages(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array(
                    [_TS + datetime.timedelta(seconds=r[1]) for r in rows],
                    pa.timestamp("us"),
                ),
                "html": pa.array([b"<html></html>"] * len(rows), pa.binary()),
            }
        )
    )


def test_prededup_drops_superseded_rows(ray_session):
    ds = _pages(
        [
            ("https://a.com/x", 0),
            ("https://a.com/x", 5),          # re-crawl: survivor
            ("https://a.com/x#frag", 3),     # same normalized URL, loses
            ("https://b.com/y", 1),          # unique: passes untouched
        ]
    )
    out, clean = prededup_pages(ds)
    assert clean
    rows = sorted(
        (r["url"], (r["warc_ts"] - _TS).total_seconds()) for r in out.take_all()
    )
    assert rows == [("https://a.com/x", 5.0), ("https://b.com/y", 1.0)]


def test_prededup_no_duplicates_is_identity(ray_session):
    ds = _pages([("https://a.com/1", 0), ("https://a.com/2", 1)])
    out, clean = prededup_pages(ds)
    assert clean
    assert out.count() == 2


def test_prededup_tied_winner_falls_back(ray_session):
    # two rows with IDENTICAL (url, warc_ts): digests collide, the
    # filter cannot split them -> must refuse (clean=False, input as-is)
    ds = _pages([("https://a.com/x", 7), ("https://a.com/x", 7)])
    out, clean = prededup_pages(ds)
    assert not clean
    assert out.count() == 2


def test_prededup_loser_set_cap_falls_back(ray_session):
    ds = _pages([("https://a.com/x", i) for i in range(10)])
    out, clean = prededup_pages(ds, max_broadcast=3)
    assert not clean
    assert out.count() == 10


def test_prededup_matches_lww_dedup_on_synth(ray_session):
    from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table

    pages = synth_pages_table(SynthConfig(n_docs=150, seed=9, recrawl_frac=0.3))
    ds = ray.data.from_arrow(pages)
    out, clean = prededup_pages(ds)
    assert clean
    from search_engine_core_ray.functions.urls import normalize_url

    # survivor set must equal the LWW rule applied directly
    expected = {}
    for r in pages.to_pylist():
        nu = normalize_url(r["url"])
        key = (r["warc_ts"], r["url"])
        if nu not in expected or key > expected[nu]:
            expected[nu] = key
    got = {(r["warc_ts"], r["url"]) for r in out.take_all()}
    assert got == set(expected.values())


def test_build_falls_back_on_tied_winners(ray_session, tmp_path_factory):
    """Exact (url, warc_ts) ties make the broadcast filter unsplittable:
    the narrow pre-pass detects them up front (clean=False) and
    build_index takes the payload-shuffle lww_dedup branch — docstore
    still one row per normalized URL."""
    import pyarrow.parquet as pq

    from search_engine_core_ray.index.build import build_index
    from search_engine_core_ray.query.engine import SearchEngine

    rows = {
        "url": ["https://a.com/x", "https://a.com/x", "https://b.com/y"],
        "warc_ts": [_TS, _TS, _TS + datetime.timedelta(seconds=1)],
        "html": [b"<html><body><p>one</p></body></html>",
                 b"<html><body><p>two</p></body></html>",
                 b"<html><body><p>other</p></body></html>"],
        "lang": ["en", "en", "en"],
    }
    t = pa.table({
        "url": pa.array(rows["url"], pa.string()),
        "warc_ts": pa.array(rows["warc_ts"], pa.timestamp("us")),
        "html": pa.array(rows["html"], pa.binary()),
        "text": pa.array(["one ", "two ", "other "], pa.string()),
        "lang": pa.array(rows["lang"], pa.string()),
    })
    idx = str(tmp_path_factory.mktemp("tie_idx"))
    r = build_index(ray.data.from_arrow(t), idx, lineage="tie", num_shards=2)
    assert r.stats.total_docs == 2  # one survivor per normalized URL
    eng = SearchEngine(idx)
    assert len(eng.doc_ids) == 2
    assert len(set(eng.urls.tolist())) == 2


def test_prededup_null_ts_rows_not_conflated(ray_session):
    """Null warc_ts must not collapse digests: two DIFFERENT urls with
    null ts are distinct rows — dropping one url's loser must never
    drop the other url (regression for the concat-str null-propagation
    bug)."""
    t = pa.table(
        {
            "url": pa.array(
                ["https://a.com/x", "https://a.com/x", "https://b.com/y"],
                pa.string(),
            ),
            "warc_ts": pa.array([None, _TS, None], pa.timestamp("us")),
            "html": pa.array([b"<p>1</p>", b"<p>2</p>", b"<p>3</p>"], pa.binary()),
        }
    )
    ds = ray.data.from_arrow(t)
    out, clean = prededup_pages(ds)
    assert clean
    rows = sorted((r["url"], r["warc_ts"]) for r in out.take_all())
    # a.com/x keeps its non-null (newer) crawl; b.com/y SURVIVES
    assert rows == [("https://a.com/x", _TS), ("https://b.com/y", None)]


def _pages_table(rows):
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array(
                [_TS + datetime.timedelta(seconds=r[1]) for r in rows],
                pa.timestamp("us"),
            ),
            "html": pa.array([b"<html></html>"] * len(rows), pa.binary()),
        }
    )


class TestPlainTaskNarrowPass:
    """The plain-task narrow pass (narrow_paths=...) must compute the
    SAME loser set / mode as the Ray Data twin on every input shape."""

    def _write(self, tmp_path, rows, n_files=3):
        import pyarrow.parquet as pq

        t = _pages_table(rows)
        paths = []
        step = max(1, -(-t.num_rows // n_files))
        for i in range(0, t.num_rows, step):
            p = str(tmp_path / f"part-{i}.parquet")
            pq.write_table(t.slice(i, step), p)
            paths.append(p)
        return paths

    def _both(self, tmp_path, rows, **kw):
        from search_engine_core_ray.stages.profile import (
            _compute_losers_impl,
            _compute_losers_tasks,
        )

        paths = self._write(tmp_path, rows)
        ds = ray.data.read_parquet(paths, columns=["url", "warc_ts"])
        ref = _compute_losers_impl(ds, kw.get("max_broadcast", 2_000_000), 8)
        got = _compute_losers_tasks(paths, kw.get("max_broadcast", 2_000_000), 8)
        return ref, got

    def test_matches_ray_data_with_dups(self, ray_session, tmp_path):
        rows = [("https://a.com/x", 0), ("https://a.com/x", 5),
                ("https://a.com/x#frag", 3), ("https://b.com/y", 1),
                ("https://c.com/z", 2), ("https://c.com/z", 9)]
        (m1, s1), (m2, s2) = self._both(tmp_path, rows)
        assert m1 == m2 == "filter"
        assert s1 == s2 and len(s1) == 3

    def test_matches_no_dups(self, ray_session, tmp_path):
        rows = [("https://a.com/1", 0), ("https://a.com/2", 1)]
        (m1, _), (m2, _) = self._both(tmp_path, rows)
        assert m1 == m2 == "none"

    def test_tied_winner_falls_back(self, ray_session, tmp_path):
        rows = [("https://a.com/x", 7), ("https://a.com/x", 7)]
        (m1, _), (m2, _) = self._both(tmp_path, rows)
        assert m1 == m2 == "fallback"

    def test_broadcast_cap_falls_back(self, ray_session, tmp_path):
        rows = [(f"https://a.com/x", i) for i in range(10)]  # 9 losers
        (m1, _), (m2, _) = self._both(tmp_path, rows, max_broadcast=4)
        assert m1 == m2 == "fallback"

    def test_build_via_narrow_paths_end_to_end(self, ray_session, tmp_path):
        """build_index(narrow_paths=...) equals the narrow_ds build."""
        from search_engine_core_ray.corpus.synth import (
            SynthConfig,
            synth_pages_table,
        )
        from search_engine_core_ray.index.build import build_index
        from search_engine_core_ray.query.engine import SearchEngine
        import pyarrow.parquet as pq

        pages = synth_pages_table(SynthConfig(n_docs=120, seed=11))
        pdir = tmp_path / "pages"
        pdir.mkdir()
        pq.write_table(pages.slice(0, 60), str(pdir / "a.parquet"))
        pq.write_table(pages.slice(60), str(pdir / "b.parquet"))
        import glob as _glob

        paths = sorted(_glob.glob(str(pdir / "*.parquet")))
        idx1 = str(tmp_path / "idx_tasks")
        idx2 = str(tmp_path / "idx_ds")
        src = ray.data.read_parquet(paths)
        build_index(src, idx1, lineage="np", num_shards=4, narrow_paths=paths)
        build_index(
            ray.data.read_parquet(paths), idx2, lineage="np", num_shards=4,
            narrow_pages_ds=ray.data.read_parquet(
                paths, columns=["url", "warc_ts"]
            ),
        )
        e1, e2 = SearchEngine(idx1), SearchEngine(idx2)
        assert e1.N == e2.N
        assert sorted(e1.doc_ids.tolist()) == sorted(e2.doc_ids.tolist())
        for q in ["machine", "data OR search"]:
            assert e1.rank(q, 10) == e2.rank(q, 10)


class TestLoudFailures:
    """Silent-skip hazards must raise instead (round-3 review findings)."""

    def test_empty_narrow_paths_raises(self, ray_session):
        import pyarrow as pa
        import ray.data
        from search_engine_core_ray.stages.profile import prededup_pages

        ds = ray.data.from_arrow(
            pa.table({"url": ["https://a.com/x"],
                      "warc_ts": pa.array([1], pa.int64())})
        )
        with pytest.raises(ValueError, match="empty list"):
            prededup_pages(ds, narrow_paths=[])

    def test_split_runs_block_rejects_out_of_grid_keys(self):
        import pyarrow as pa
        from search_engine_core_ray.index.build import _split_runs_block

        t = pa.table({
            "shard": pa.array([0, 5], pa.int32()),   # 5 >= num_shards
            "bucket": pa.array([0, 0], pa.int32()),
            "payload": pa.array([b"x", b"y"], pa.binary()),
        })
        with pytest.raises(ValueError, match="outside the exchange"):
            _split_runs_block(t, num_shards=4, n_buckets=2)
