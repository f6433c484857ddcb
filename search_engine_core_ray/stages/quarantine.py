"""Poison-pill quarantine for map_batches kernels.

At 100-TB scale a handful of pathological rows (mis-encoded HTML,
truncated binary payloads, adversarial markup) WILL reach every kernel,
and one uncaught exception kills a multi-hour Ray job.  The reference
engine survives these per-request (one crawl result fails, the crawler
logs and moves on — src/crawler/Crawler.cpp failure handling); a batch
engine needs the same property per ROW, not per batch.

:func:`make_quarantined` wraps any map_batches kernel (plain function
or stateful actor-pool class) with contain-and-continue semantics:

- healthy batches pay ZERO overhead (one try around the normal call);
- a failing batch is bisected recursively — O(bad_rows * log(batch))
  kernel invocations — isolating the exact poisoned rows;
- poisoned rows are appended as Parquet to ``quarantine_dir``
  (key column, error repr, stage name, one file per actor per flush —
  the same resumable many-small-files layout the index sinks use),
  and the healthy remainder flows on;
- a batch where EVERY row fails and no prior batch ever succeeded
  re-raises: that is a systemic kernel/schema bug, not a poison pill
  (documented contract — silently quarantining 100% of the corpus
  would be the worse failure mode).

The wrapper preserves actor-pool semantics: the inner kernel class is
constructed once per actor in ``__init__``, and the output schema from
the first successful call is cached so an all-poisoned LATER batch can
still emit a typed empty table.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def make_quarantined(
    kernel,
    quarantine_dir: str,
    *,
    key_col: str = "url",
    stage_name: str | None = None,
):
    """Return a map_batches-ready callable CLASS wrapping ``kernel``
    (a batch function, or a kernel class constructed per actor) with
    row-level poison-pill quarantine.  Use exactly like the kernel:

        ds.map_batches(make_quarantined(HtmlExtract, "/out/_quarantine"),
                       batch_format="pyarrow", concurrency=(1, 8))
    """
    name = stage_name or getattr(kernel, "__name__", "stage")

    class QuarantinedKernel:
        def __init__(self):
            self.inner = kernel() if isinstance(kernel, type) else kernel
            self.out_schema: pa.Schema | None = None
            self.flush_id = 0

        def _run(self, batch: pa.Table):
            """-> (list[ok_table], list[(key, error_repr)])."""
            try:
                out = self.inner(batch)
                self.out_schema = out.schema
                return [out], []
            except Exception as e:  # noqa: BLE001 — contain ANY row poison
                if batch.num_rows <= 1:
                    keys = batch.column(key_col).to_pylist() if key_col in batch.column_names else [None]
                    return [], [(keys[0], repr(e))]
                mid = batch.num_rows // 2
                l_ok, l_bad = self._run(batch.slice(0, mid))
                r_ok, r_bad = self._run(batch.slice(mid))
                return l_ok + r_ok, l_bad + r_bad

        def _flush(self, bad: list):
            os.makedirs(quarantine_dir, exist_ok=True)
            t = pa.table(
                {
                    "key": pa.array([k for k, _ in bad], pa.string()),
                    "error": pa.array([e for _, e in bad], pa.string()),
                    "stage": pa.array([name] * len(bad), pa.string()),
                }
            )
            path = os.path.join(
                quarantine_dir, f"q-{os.getpid()}-{id(self)}-{self.flush_id}.parquet"
            )
            self.flush_id += 1
            pq.write_table(t, path)

        def __call__(self, batch: pa.Table) -> pa.Table:
            try:
                out = self.inner(batch)  # fast path: zero overhead
                self.out_schema = out.schema
                return out
            except Exception:  # noqa: BLE001
                pass
            ok, bad = self._run(batch)
            if bad:
                self._flush(bad)
            if ok:
                return pa.concat_tables(ok, promote_options="default")
            if self.out_schema is not None:
                return self.out_schema.empty_table()
            # every row failed and nothing ever succeeded on this
            # actor: systemic bug, not poison — fail loudly
            raise RuntimeError(
                f"quarantine[{name}]: entire batch failed with no prior "
                f"successful batch — first error: {bad[0][1] if bad else '?'}"
            )

    QuarantinedKernel.__name__ = f"Quarantined({name})"
    return QuarantinedKernel
