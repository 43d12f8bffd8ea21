"""Versioned materialized counts relation with CAS publish — the
incremental-index pattern shared by the streaming span-flag store
(`dedup.SpanFlagTracker`) and the streaming BPE word-count store
(`tokenizer.BpeWordTracker`): per-batch counts sum-merge into a
parquet relation published as ``v{N}`` directories, so long-running
ingest loops keep their derived artifacts (flags, tokenizer fits)
fresh without re-scanning the landed corpus.

Publication is atomic: each fold writes ``v{N+1}`` under a tmp name and
renames it into place, so a concurrent reader sees v{N} or v{N+1},
never a torn directory. Concurrency is optimistic-retry with the CAS
discipline: publish to base+1 OF THE VERSION MERGED — reading "latest"
and publishing to "next free" separately would let a racer's version
land in between and be silently skipped over (its counts lost from
every later head even though no rename ever failed). On a lost race
the merge RE-RUNS against the newly-landed head — a batch's counts
must never be dropped (ADVICE r6). Per-fold cost is O(distinct keys in
the relation); at 100 TB, partition the counts by a key-hash bucket
and keep a bucket→version manifest so a fold rewrites only the buckets
the batch touched (Delta-style) — the relation shape and merge are
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class VersionedCountsTracker:
    """Base: subclasses set ``key_cols``/``agg_col`` and implement
    ``_batch_counts(df, **kw) -> DataFrame`` (one row per key with the
    batch's additive count in ``agg_col``)."""

    key_cols: tuple = ()
    agg_col: str = "n"

    def __init__(self, spark, path: str):
        import os

        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _versions(self) -> list[int]:
        import os

        return sorted(
            int(name[1:])
            for name in os.listdir(self.path)
            if name.startswith("v") and name[1:].isdigit()
        )

    def counts(self) -> DataFrame | None:
        vs = self._versions()
        if not vs:
            return None
        return self.spark.read.parquet(f"{self.path}/v{vs[-1]}")

    def _batch_counts(self, df: DataFrame, **kw) -> DataFrame:
        raise NotImplementedError

    def fold(self, df: DataFrame, **kw) -> None:
        """Merge one batch's counts into the materialized relation and
        publish the next version (see module docstring for the race
        discipline). The batch relation is localCheckpointed once, so
        retries re-run only the tiny merge-aggregate, not the batch
        pass."""
        self.fold_counts(self._batch_counts(df, **kw))

    def fold_counts(self, counts: DataFrame) -> None:
        """Merge a PRE-COMPUTED batch-counts relation (one row per key,
        additive ``agg_col``) — the path for callers that already built
        the counts for their own use (a drift gate that histograms the
        batch to score it should not histogram it again to fold it)."""
        import os
        import shutil
        import uuid

        batch = counts.localCheckpoint(eager=False)
        for _ in range(16):
            vs = self._versions()
            base = vs[-1] if vs else 0
            prev = (
                self.spark.read.parquet(f"{self.path}/v{base}")
                if base
                else None
            )
            merged = (
                batch
                if prev is None
                else prev.unionByName(batch)
                .groupBy(*self.key_cols)
                .agg(F.sum(self.agg_col).alias(self.agg_col))
            )
            tmp = f"{self.path}/_tmp-{uuid.uuid4().hex}"
            merged.write.mode("overwrite").parquet(tmp)
            try:
                os.rename(tmp, f"{self.path}/v{base + 1}")
                return
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)
        raise IOError(
            f"{type(self).__name__}.fold: lost 16 consecutive publish races"
        )

    # the initial landed corpus seeds the store through the same merge
    seed = fold
