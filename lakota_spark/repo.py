"""Repo: a storage root holding a registry of collections.

The reference stores its registry as a KV-series in its own format
(`lakota/repo.py:115-130`); here the catalog is a directory of small JSON
files — the same role (label → schema + metadata) with object-store-
friendly access (one LIST + small GETs). Maintenance: two-phase GC
(`lakota/repo.py:339-413`), push/pull replication (`lakota/repo.py:259-301`),
CSV/Parquet import/export (`lakota/repo.py:415-499`).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import SparkSession

from lakota_spark.changelog import hexts, hexts_to_epoch
from lakota_spark.collection import Collection
from lakota_spark.commit import Snapshot
from lakota_spark.schema import Schema

REGISTRY_DIR = ".registry"
TRASH_SUFFIX = ".trash-"


class Repo:
    def __init__(self, root: str, spark: SparkSession | None = None):
        if root.startswith("file://"):
            root = root[len("file://"):]
        self.root = os.path.abspath(root)
        if spark is None:
            from lakota_spark.session import get_spark

            spark = get_spark()
        self.spark = spark
        os.makedirs(os.path.join(self.root, REGISTRY_DIR), exist_ok=True)

    # ------------------------------------------------------------ registry

    def _reg_path(self, label: str) -> str:
        return os.path.join(self.root, REGISTRY_DIR, f"{label}.json")

    def create_collection(
        self, schema: Schema, label: str, meta: dict | None = None
    ) -> Collection:
        path = self._reg_path(label)
        if os.path.exists(path):
            existing = self.collection(label)
            if existing.schema != schema:
                raise ValueError(f"collection {label!r} exists with another schema")
            return existing  # double-create is a no-op (`lakota/repo.py`)
        entry = {"schema": schema.to_dict(), "meta": meta or {}, "ts": time.time()}
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as fh:
            json.dump(entry, fh)
        os.replace(tmp, path)
        return Collection(self, label, schema)

    def collection(self, label: str) -> Collection:
        path = self._reg_path(label)
        if not os.path.exists(path):
            raise KeyError(f"no collection {label!r}")
        with open(path) as fh:
            entry = json.load(fh)
        return Collection(self, label, Schema.from_dict(entry["schema"]))

    def __truediv__(self, label: str) -> Collection:
        return self.collection(label)

    def ls(self) -> list[str]:
        reg = os.path.join(self.root, REGISTRY_DIR)
        return sorted(
            f[: -len(".json")] for f in os.listdir(reg) if f.endswith(".json")
        )

    def delete_collection(self, label: str) -> None:
        path = self._reg_path(label)
        if os.path.exists(path):
            os.remove(path)
        croot = os.path.join(self.root, label)
        if os.path.isdir(croot):
            shutil.rmtree(croot)

    def rename_collection(self, old: str, new: str) -> None:
        os.replace(self._reg_path(old), self._reg_path(new))
        old_root = os.path.join(self.root, old)
        if os.path.isdir(old_root):
            os.replace(old_root, os.path.join(self.root, new))

    # ---------------------------------------------------------------- gc

    def gc(self, timeout: float = 0.0) -> dict:
        """Two-phase GC (`lakota/repo.py:339-413`): segment dirs referenced
        by NO revision of a collection are soft-deleted (renamed with a
        hextime trash suffix); trash older than ``timeout`` seconds is
        hard-deleted. Re-referencing resurrects soft-deleted dirs."""
        stats = {"soft": 0, "hard": 0, "resurrected": 0}
        now = time.time()
        for label in self.ls():
            coll = self.collection(label)
            referenced: set[str] = set()
            for rev in coll.changelog.revisions():
                snap = Snapshot.from_payload(rev.read(), coll.schema)
                referenced |= snap.paths()
            seg_dir = coll.segments_dir
            if not os.path.isdir(seg_dir):
                continue
            for name in os.listdir(seg_dir):
                full = os.path.join(seg_dir, name)
                if TRASH_SUFFIX in name:
                    base, _, stamp = name.partition(TRASH_SUFFIX)
                    if base in referenced and not os.path.exists(
                        os.path.join(seg_dir, base)
                    ):
                        os.replace(full, os.path.join(seg_dir, base))
                        stats["resurrected"] += 1
                    elif now - hexts_to_epoch(stamp) >= timeout:
                        shutil.rmtree(full)
                        stats["hard"] += 1
                elif name.startswith("_tmp-"):
                    continue  # in-flight write
                elif name not in referenced:
                    os.replace(full, full + TRASH_SUFFIX + hexts(now))
                    stats["soft"] += 1
        return stats

    # --------------------------------------------------------- replication

    def pull(self, other: "Repo", labels: list[str] | None = None) -> None:
        """Copy registry entries, revisions and missing segment dirs
        (`lakota/repo.py:259-301`)."""
        for label in labels or other.ls():
            src = other.collection(label)
            if label not in self.ls():
                self.create_collection(src.schema, label)
            self.collection(label).pull(src)

    def push(self, other: "Repo", labels: list[str] | None = None) -> None:
        other.pull(self, labels)

    # ------------------------------------------------------ import/export

    def import_parquet(self, collection: str, series: str, path: str) -> None:
        coll = self.collection(collection)
        df = self.spark.read.parquet(path)
        coll.series(series).write(df)

    def import_csv(self, collection: str, series: str, path: str) -> None:
        coll = self.collection(collection)
        df = (
            self.spark.read.option("header", "true")
            .schema(coll.schema.struct_type())
            .csv(path)
        )
        coll.series(series).write(df)

    def export_collection(self, collection: str, out_dir: str, fmt: str = "parquet") -> None:
        """Dump every series + `_schema.json` (`lakota/repo.py:463-499`)."""
        coll = self.collection(collection)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "_schema.json"), "w") as fh:
            json.dump(coll.schema.to_dict(), fh)
        for label in coll.ls():
            df = coll.series(label).frame()
            target = os.path.join(out_dir, label)
            if fmt == "parquet":
                df.write.mode("overwrite").parquet(f"file://{target}")
            else:
                df.write.mode("overwrite").option("header", "true").csv(
                    f"file://{target}"
                )
