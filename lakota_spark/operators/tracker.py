"""Versioned materialized counts relation with CAS publish — the
incremental-index pattern shared by the streaming span-flag store
(`dedup.SpanFlagTracker`), the streaming BPE word-count store
(`tokenizer.BpeWordTracker`) and the drift reference histogram
(`drift.ScoreHistTracker`): per-batch counts sum-merge into a
parquet relation published as versioned manifests, so long-running
ingest loops keep their derived artifacts (flags, tokenizer fits,
PSI references) fresh without re-scanning the landed corpus.

Layout (the Delta-style bucketed manifest — the 100 TB shape):

- counts live in KEY-HASH BUCKET dirs ``b{K}/{tag}/`` (parquet); a
  fold rewrites ONLY the buckets its batch touched, never the full
  relation, so per-fold cost is O(batch keys + touched-bucket rows),
  not O(all keys ever seen).
- each version is a DIRECTORY ``v{N}/`` holding ``manifest.json``
  mapping bucket -> its current data dir. Untouched buckets carry
  their previous dirs forward by reference — zero copy.

Publication is atomic: ``v{N+1}`` is built under a tmp name and
renamed into place; ``os.rename`` onto an existing non-empty dir
fails, which IS the CAS. Concurrency is optimistic-retry with the CAS
discipline: publish to base+1 OF THE VERSION MERGED — reading "latest"
and publishing to "next free" separately would let a racer's version
land in between and be silently skipped over (its counts lost from
every later head even though no rename ever failed). On a lost race
the merge RE-RUNS against the newly-landed head (its freshly-written
bucket dirs are deleted by the loser itself) — a batch's counts must
never be dropped (ADVICE r6).

Old versions are GC'd after each successful publish: manifests older
than ``keep_versions`` are removed together with bucket dirs no kept
manifest references — the store's file count is bounded by
``n_buckets x keep_versions``, not by fold count.

Paths are driver-local filesystem (os/json/rename): these stores back
single-writer foreachBatch loops on the driver. For mem/HTTP/S3
artifact surfaces use the fsio-backed model persistence
(`classifier.save_quality_model`) — routing the tracker through fsio
is possible (the verbs exist) but unneeded until a tracker must live
behind an object store.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class VersionedCountsTracker:
    """Base: subclasses set ``key_cols``/``agg_col`` and implement
    ``_batch_counts(df, **kw) -> DataFrame`` (one row per key with the
    batch's additive count in ``agg_col``)."""

    key_cols: tuple = ()
    agg_col: str = "n"
    n_buckets: int = 16
    keep_versions: int = 2

    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- version / manifest plumbing ------------------------------------

    def _versions(self) -> list[int]:
        return sorted(
            int(name[1:])
            for name in os.listdir(self.path)
            if name.startswith("v") and name[1:].isdigit()
        )

    def _manifest(self, version: int) -> dict:
        """bucket(str) -> relative data dir for ``v{version}``."""
        with open(f"{self.path}/v{version}/manifest.json") as fh:
            return json.load(fh)

    def _bucket_col(self):
        """Key-hash bucket — a pure function of the key columns, so a
        key's bucket is recomputable anywhere (engine-reproducible
        md5-derived hash32, same discipline as the BM25 index)."""
        from lakota_spark.functions import hash32

        key = F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in self.key_cols]
        )
        return F.pmod(hash32(key), F.lit(self.n_buckets)).cast("int")

    def counts(self) -> DataFrame | None:
        """The current head relation (union of every bucket's dir at its
        manifest-pinned version); None before the first fold."""
        vs = self._versions()
        if not vs:
            return None
        man = self._manifest(vs[-1])
        if not man:
            return None
        paths = [f"{self.path}/{rel}" for rel in sorted(set(man.values()))]
        return self.spark.read.parquet(*paths)

    def _batch_counts(self, df: DataFrame, **kw) -> DataFrame:
        raise NotImplementedError

    # -- fold -----------------------------------------------------------

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
        batch to score it should not histogram it again to fold it).

        Only the buckets the batch touches are rewritten; the touched
        set is one bounded collect (≤ n_buckets ints)."""
        batch = counts.withColumn(
            "_bucket", self._bucket_col()
        ).localCheckpoint(eager=False)
        touched = sorted(
            r["_bucket"]
            for r in batch.select("_bucket").distinct().collect()
        )
        if not touched:
            return  # empty batch: nothing to merge, publish nothing
        for _ in range(16):
            vs = self._versions()
            base = vs[-1] if vs else 0
            man = self._manifest(base) if base else {}
            prev_paths = [
                f"{self.path}/{man[str(k)]}"
                for k in touched
                if str(k) in man
            ]
            if prev_paths:
                prev = self.spark.read.parquet(*prev_paths).withColumn(
                    "_bucket", self._bucket_col()
                )
                merged = (
                    prev.unionByName(batch)
                    .groupBy(*self.key_cols)
                    .agg(F.sum(self.agg_col).alias(self.agg_col))
                    .withColumn("_bucket", self._bucket_col())
                )
            else:
                merged = batch
            # one write job: partitionBy splits the touched buckets into
            # their own subdirs, each renamed to a content-unique tag so
            # a racing fold's identically-numbered attempt can't collide
            scratch = f"{self.path}/_tmp-{uuid.uuid4().hex}"
            (
                merged.repartition(len(touched), "_bucket")
                .write.partitionBy("_bucket")
                .parquet(scratch)
            )
            new_refs: dict[str, str] = {}
            for k in touched:
                src = f"{scratch}/_bucket={k}"
                if not os.path.isdir(src):
                    continue  # merge emptied this bucket (can't happen
                    # with additive counts, but stay safe)
                tag = uuid.uuid4().hex[:12]
                os.makedirs(f"{self.path}/b{k}", exist_ok=True)
                dst_rel = f"b{k}/{tag}"
                os.rename(src, f"{self.path}/{dst_rel}")
                new_refs[str(k)] = dst_rel
            shutil.rmtree(scratch, ignore_errors=True)
            tmp = f"{self.path}/_tmp-man-{uuid.uuid4().hex}"
            os.makedirs(tmp)
            with open(f"{tmp}/manifest.json", "w") as fh:
                json.dump({**man, **new_refs}, fh, sort_keys=True)
            try:
                os.rename(tmp, f"{self.path}/v{base + 1}")
            except OSError:
                # lost the CAS: drop THIS attempt's bucket dirs and
                # re-merge against the newly-landed head
                shutil.rmtree(tmp, ignore_errors=True)
                for rel in new_refs.values():
                    shutil.rmtree(
                        f"{self.path}/{rel}", ignore_errors=True
                    )
                continue
            self._gc(base + 1)
            return
        raise IOError(
            f"{type(self).__name__}.fold: lost 16 consecutive publish races"
        )

    # the initial landed corpus seeds the store through the same merge
    seed = fold

    # -- GC -------------------------------------------------------------

    def _gc(self, head: int) -> None:
        """Drop manifests older than ``keep_versions`` behind ``head``
        and every bucket dir no kept manifest references. Best-effort:
        a GC crash leaves orphans for the next fold's GC, never a
        dangling reference."""
        vs = self._versions()
        old = [v for v in vs if v <= head - self.keep_versions]
        if not old:
            return
        kept_refs: set[str] = set()
        for v in vs:
            if v > head - self.keep_versions:
                try:
                    kept_refs |= set(self._manifest(v).values())
                except OSError:
                    pass
        for v in old:
            try:
                refs = set(self._manifest(v).values())
            except OSError:
                refs = set()
            for rel in refs - kept_refs:
                shutil.rmtree(f"{self.path}/{rel}", ignore_errors=True)
            shutil.rmtree(f"{self.path}/v{v}", ignore_errors=True)
