"""Repo: a storage root holding a registry of collections.

The reference stores its registry as a KV-series in its own format
(`lakota/repo.py:115-130`); here the catalog is a directory of small JSON
files — the same role (label → schema + metadata) with object-store-
friendly access (one LIST + small GETs) over any `fsio.FS` backend:
``Repo("/local/path")``, ``Repo("s3://bucket/prefix")``, etc. Maintenance:
two-phase GC (`lakota/repo.py:339-413`), push/pull replication
(`lakota/repo.py:259-301`), CSV/Parquet import/export
(`lakota/repo.py:415-499`).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import SparkSession

from lakota_spark.changelog import hexts, hexts_to_epoch, staging_epoch
from lakota_spark.collection import Collection
from lakota_spark.commit import Snapshot, payload_paths
from lakota_spark.fsio import open_fs
from lakota_spark.schema import Schema

REGISTRY_DIR = ".registry"
TRASH_MARK = ".trash-"


class Repo:
    def __init__(self, root: str | None = None, spark: SparkSession | None = None):
        from lakota_spark.fsio import BaseFS

        if root is None:
            # reference parity: `Repo()` is an ephemeral in-memory repo
            # (`lakota/repo.py` defaults to a memory pod)
            import uuid

            root = f"memory://repo-{uuid.uuid4().hex}"
        self.fs = root if isinstance(root, BaseFS) else open_fs(root)
        self.root = self.fs.local_path() or self.fs.uri
        # LAZY: metadata operations (registry, changelog, snapshots) are
        # pure fsio — no session needed. The lakota data source's
        # planner workers open Repos with NO active SparkSession; a
        # session is resolved only when a data-path method asks for it.
        self._spark = spark
        self.fs.makedirs(REGISTRY_DIR)

    @property
    def spark(self) -> SparkSession:
        if self._spark is None:
            from lakota_spark.session import get_spark

            self._spark = get_spark()
        return self._spark

    # ------------------------------------------------------------ registry

    @staticmethod
    def _storage_prefix(label: str, namespace: str = "collection") -> str:
        # non-default namespaces (reference: "archive") store under a
        # mangled prefix so an archived copy never collides with the live
        # collection of the same label
        return label if namespace == "collection" else f"{namespace}~{label}"

    def _reg_rel(self, label: str, namespace: str = "collection") -> str:
        return f"{REGISTRY_DIR}/{self._storage_prefix(label, namespace)}.json"

    def _tomb_rel(self, label: str, namespace: str = "collection") -> str:
        # deletion marker: lets replicas distinguish "deleted here" from
        # "never seen here" when registries reconcile (LWW, see merge)
        return f"{REGISTRY_DIR}/{self._storage_prefix(label, namespace)}.tomb"

    def create_collection(
        self,
        schema: Schema,
        label: str,
        meta: dict | None = None,
        namespace: str = "collection",
        raise_if_exists: bool = False,
    ) -> Collection:
        """Register a collection. Labels are stripped; empty/whitespace-only
        labels are invalid (`lakota/repo.py:188-191`). The reference raises
        on double-create by default (`raise_if_exists=True`); here the
        default is the idempotent no-op because the demo/ingest paths call
        it repeatedly — pass ``raise_if_exists=True`` for reference parity."""
        label = label.strip()
        if not label:
            raise ValueError(f"Invalid label: {label!r}")
        # '~' is the namespace separator in registry filenames: a label (or
        # namespace) containing it would be classified under the wrong
        # namespace by ls()/gc/pull and become invisible
        if "~" in label or "~" in namespace:
            raise ValueError(
                f"Invalid label/namespace (reserved '~'): {label!r}"
            )
        rel = self._reg_rel(label, namespace)
        if self.fs.exists(rel):
            if raise_if_exists:
                raise ValueError(
                    f"Collection with label '{label}' already exists"
                )
            existing = self.collection(label, namespace)
            if existing.schema != schema:
                raise ValueError(f"collection {label!r} exists with another schema")
            return existing  # double-create is a no-op (`lakota/repo.py`)
        entry = {"schema": schema.to_dict(), "meta": meta or {}, "ts": time.time()}
        self.fs.write_bytes_atomic(rel, json.dumps(entry).encode())
        # re-creating after a delete: the create is the newest registry
        # event, so the tombstone must not outlive it (LWW, see merge)
        tomb = self._tomb_rel(label, namespace)
        if self.fs.exists(tomb):
            self.fs.remove_file(tomb)
        return Collection(
            self, label, schema, prefix=self._storage_prefix(label, namespace)
        )

    def collection(
        self, label: str, namespace: str = "collection"
    ) -> Collection:
        rel = self._reg_rel(label, namespace)
        if not self.fs.exists(rel):
            raise KeyError(f"no collection {label!r}")
        entry = json.loads(self.fs.read_bytes(rel))
        return Collection(
            self,
            label,
            Schema.from_dict(entry["schema"]),
            prefix=self._storage_prefix(label, namespace),
        )

    def __truediv__(self, label: str) -> Collection:
        return self.collection(label)

    def reify(self, label: str, entry: dict) -> Collection:
        """Build a Collection from a registry row without re-reading it
        (reference `Repo.reify`, `lakota/repo.py:222-224`)."""
        return Collection(
            self,
            label,
            Schema.from_dict(entry["schema"]),
            prefix=self._storage_prefix(label),
        )

    def ls(self, namespace: str = "collection") -> list[str]:
        out = []
        for f in self.fs.ls(REGISTRY_DIR):
            if not f.endswith(".json"):
                continue
            name = f[: -len(".json")]
            ns, sep, rest = name.partition("~")
            if namespace == "collection" and not sep:
                out.append(name)
            elif sep and ns == namespace:
                out.append(rest)
        return sorted(out)

    def search(self, label: str | None = None, namespace: str = "collection"):
        """Iterate collections, optionally restricted to one label
        (`lakota/repo.py:138-147`)."""
        for name in self.ls(namespace):
            if label is None or name == label:
                yield self.collection(name, namespace)

    def __iter__(self):
        return self.search()

    def archive(self, label: str) -> Collection:
        """Snapshot a collection into the archive namespace
        (`lakota/repo.py:227-232`): same label, separate storage prefix;
        revisions + referenced segments replicate via pull (idempotent —
        re-archiving only copies what's new, by content address)."""
        src = self.collection(label)
        dst = self.create_collection(src.schema, label, namespace="archive")
        dst.pull(src)
        return dst

    def delete_collection(
        self, label: str, namespace: str = "collection"
    ) -> None:
        # tombstone first: once the entry is gone a replica can no longer
        # tell deletion from never-created, and pull would resurrect it
        self.fs.write_bytes_atomic(
            self._tomb_rel(label, namespace),
            json.dumps({"ts": time.time()}).encode(),
        )
        self.fs.remove_file(self._reg_rel(label, namespace))
        self.fs.remove_tree(self._storage_prefix(label, namespace))

    def rename_collection(self, old: str, new: str) -> None:
        # rename = delete(old) + create(new) as registry events: the moved
        # entry gets a fresh ts (the rename IS its creation) and the old
        # label gets a tombstone so replicas drop it on reconcile
        entry = json.loads(self.fs.read_bytes(self._reg_rel(old)))
        entry["ts"] = time.time()
        self.fs.write_bytes_atomic(
            self._reg_rel(new), json.dumps(entry).encode()
        )
        self.fs.write_bytes_atomic(
            self._tomb_rel(old), json.dumps({"ts": entry["ts"]}).encode()
        )
        self.fs.remove_file(self._reg_rel(old))
        if self.fs.exists(old):
            self.fs.move(old, new)

    # reference API names (`lakota/repo.py`: delete/rename/refresh) —
    # lets reference user code run unchanged
    delete = delete_collection
    rename = rename_collection

    def refresh(self) -> None:
        """No-op for parity: nothing is cached driver-side — registry and
        changelog reads always hit the FS (`Repo.refresh`)."""

    def register_views(
        self,
        collection: str | None = None,
        before=None,
        prefix: str = "",
    ) -> list[str]:
        """Register every series as a Spark SQL temp view named
        ``[prefix]{collection}_{label}`` (non-identifier characters
        become ``_``) and return the view names — the idiomatic-Spark
        capability the reference cannot offer: the whole repo becomes
        `spark.sql`-queryable, joins between series/collections
        included. Views are LAZY (each is an unsorted `Series.frame`
        plan, so pruning/pushdown engage per query) and pinned to the
        snapshot semantics of frame(): pass ``before=`` for a
        time-travel view of everything.

        Scale note: registering is pure metadata (no jobs run); each
        query pays only its own pruned scan."""
        import re as _re

        names = []
        seen: dict[str, str] = {}
        labels = [collection] if collection is not None else self.ls()
        for cname in labels:
            coll = self.collection(cname)
            for label in coll.ls():
                view = _re.sub(
                    r"\W", "_", f"{prefix}{cname}_{label}"
                )
                # ADVICE r9: \W-mangling can collide distinct series
                # (collection 'a-b' label 'c' vs 'a' label 'b_c' both
                # mangle to a_b_c) — createOrReplaceTempView would then
                # silently keep the LAST one and repo.sql reads the
                # wrong series. Fail loudly instead.
                if view in seen:
                    raise ValueError(
                        f"view name collision: {cname}/{label} and "
                        f"{seen[view]} both mangle to {view!r}; "
                        "disambiguate with prefix= or rename the series"
                    )
                seen[view] = f"{cname}/{label}"
                coll.series(label).frame(
                    before=before, sort=False
                ).createOrReplaceTempView(view)
                names.append(view)
        return names

    def sql(self, query: str, **register_kwargs):
        """Convenience: `register_views` + `spark.sql(query)`."""
        self.register_views(**register_kwargs)
        return self.spark.sql(query)

    def export_collections(
        self, out_dir: str, collections: list[str] | None = None,
        fmt: str = "parquet",
    ) -> None:
        """Export every (or the named) collections, one subdir each
        (`lakota/repo.py:463-478`)."""
        for label in collections or self.ls():
            self.export_collection(label, f"{out_dir}/{label}", fmt=fmt)

    def import_collections(
        self, src_dir: str, fmt: str = "parquet"
    ) -> list[str]:
        """Inverse of :meth:`export_collections` (`lakota/repo.py:500-530`):
        each subdir holding a `_schema.json` becomes a collection, every
        data subdir inside it a series. Returns imported labels."""
        import os

        imported = []
        for label in sorted(os.listdir(src_dir)):
            cdir = os.path.join(src_dir, label)
            schema_file = os.path.join(cdir, "_schema.json")
            if not os.path.isfile(schema_file):
                continue
            with open(schema_file) as fh:
                schema = Schema.from_dict(json.load(fh))
            self.create_collection(schema, label)
            for series_label in sorted(os.listdir(cdir)):
                sdir = os.path.join(cdir, series_label)
                if not os.path.isdir(sdir):
                    continue
                self.import_series(
                    label, series_label, f"file://{sdir}", fmt=fmt
                )
            imported.append(label)
        return imported

    # ---------------------------------------------------------------- gc

    def gc(
        self,
        timeout: float = 600.0,
        staging_timeout: float | None = None,
    ) -> dict:
        """Two-phase GC (`lakota/repo.py:339-413`): segment dirs referenced
        by NO revision of a collection are soft-deleted (renamed with a
        hextime trash suffix); trash older than ``timeout`` seconds is
        hard-deleted. Re-referencing resurrects soft-deleted dirs.

        Ordering matters under concurrent writes: segments are written
        BEFORE the revision that references them, so the segment dir is
        listed FIRST and the changelog scanned after — a segment finalized
        mid-GC is then either absent from the listing (skipped) or its
        commit is already visible in the later revision scan. The non-zero
        default grace period (reference: 600 s) covers the remaining
        window: a writer's segment is at worst soft-deleted and
        resurrected, never hard-deleted before its commit lands.

        ``_tmp-`` STAGING dirs (in-flight writes — a crashed writer's
        leftovers would otherwise leak forever) are hard-deleted only
        past ``staging_timeout``, which defaults to ``max(timeout,
        6 h)``: staging has no soft-delete/resurrect safety net, and a
        long-running distributed ingest legitimately holds staging dirs
        from task write until job commit — far longer than the trash
        grace. Lower it only when no write can possibly be in flight.
        """
        if staging_timeout is None:
            staging_timeout = max(timeout, 6 * 3600.0)
        stats = {"soft": 0, "hard": 0, "resurrected": 0}
        now = time.time()
        colls = [
            self.collection(label, ns)
            for ns in ("collection", "archive")
            for label in self.ls(ns)
        ]
        for coll in colls:
            listing = self.fs.ls(coll.seg_prefix)
            referenced: set[str] = set()
            for rev in coll.changelog.revisions():
                referenced |= payload_paths(rev.read())
            for name in listing:
                rel = f"{coll.seg_prefix}/{name}"
                if TRASH_MARK in name:
                    base, _, stamp = name.partition(TRASH_MARK)
                    if base in referenced and not self.fs.exists(
                        f"{coll.seg_prefix}/{base}"
                    ):
                        self.fs.move(rel, f"{coll.seg_prefix}/{base}")
                        stats["resurrected"] += 1
                    elif now - hexts_to_epoch(stamp) >= timeout:
                        self.fs.remove_tree(rel)
                        stats["hard"] += 1
                elif name.startswith("_tmp-"):
                    # in-flight staging dir: age out crashed writers'
                    # leftovers past the (long) staging grace, parsed
                    # via the shared `changelog.staging_epoch`;
                    # unparsable names (older layout) stay untouched
                    born = staging_epoch(name)
                    if born is not None and now - born >= staging_timeout:
                        self.fs.remove_tree(rel)
                        stats["hard"] += 1
                    continue
                elif name not in referenced:
                    self.fs.move(rel, rel + TRASH_MARK + hexts(now))
                    stats["soft"] += 1
        return stats

    # --------------------------------------------------------- replication

    def _registry_state(self) -> dict[str, dict]:
        """Registry as {prefixed-name: {"entry": ..., "tomb": ...}}."""
        state: dict[str, dict] = {}
        for f in self.fs.ls(REGISTRY_DIR):
            for suffix, key in ((".json", "entry"), (".tomb", "tomb")):
                if f.endswith(suffix):
                    name = f[: -len(suffix)]
                    payload = json.loads(
                        self.fs.read_bytes(f"{REGISTRY_DIR}/{f}")
                    )
                    state.setdefault(name, {})[key] = payload
        return state

    def merge_registry(self, other: "Repo") -> dict:
        """Reconcile this registry with another replica's — the flat-JSON
        equivalent of the reference's `Repo.merge` (`lakota/repo.py:303`),
        where the registry is itself a versioned series and concurrent
        collection creates/deletes merge at the repo level.

        Last-writer-wins per label over BOTH replicas' events: the newest
        of (create ts, tombstone ts) decides whether the label is alive;
        a tie keeps it alive (never drop data on ambiguity). Between two
        live entries the newer meta wins, but their schemas must agree —
        divergent schemas under one label raise, mirroring the
        reference's "incompatible meta-info" on pull. Only SELF mutates;
        run it from both ends (or push+pull) for convergence. Storage
        trees of merge-deleted labels are left for gc-style cleanup —
        only an explicit local delete removes data.

        Wall-clock ts drives the LWW decision (as does the reference's
        hextime revision naming); replicas with skewed clocks resolve in
        skew order, never losing both sides.
        """
        stats = {"created": 0, "updated": 0, "deleted": 0, "tombstoned": 0}
        mine, theirs = self._registry_state(), other._registry_state()
        for name in sorted(set(mine) | set(theirs)):
            lo, rm = mine.get(name, {}), theirs.get(name, {})
            entries = [e for e in (lo.get("entry"), rm.get("entry")) if e]
            tombs = [t for t in (lo.get("tomb"), rm.get("tomb")) if t]
            # ties on ts break on serialized content so BOTH replicas pick
            # the same winner regardless of which side held which event
            key = lambda e: (e.get("ts", 0.0), json.dumps(e, sort_keys=True))
            entry = max(entries, key=key) if entries else None
            tomb = max(tombs, key=key) if tombs else None
            alive = entry is not None and (
                tomb is None or entry.get("ts", 0.0) >= tomb.get("ts", 0.0)
            )
            rel = f"{REGISTRY_DIR}/{name}.json"
            tomb_rel = f"{REGISTRY_DIR}/{name}.tomb"
            if alive:
                if lo.get("entry") != entry:
                    if (
                        lo.get("entry")
                        and lo["entry"]["schema"] != entry["schema"]
                    ):
                        raise ValueError(
                            f"collection {name!r}: divergent schemas "
                            f"across replicas — resolve manually"
                        )
                    self.fs.write_bytes_atomic(
                        rel, json.dumps(entry).encode()
                    )
                    stats["created" if not lo.get("entry") else "updated"] += 1
                if lo.get("tomb"):
                    self.fs.remove_file(tomb_rel)
            else:
                if lo.get("tomb") != tomb and tomb is not None:
                    self.fs.write_bytes_atomic(
                        tomb_rel, json.dumps(tomb).encode()
                    )
                    stats["tombstoned"] += 1
                if lo.get("entry"):
                    self.fs.remove_file(rel)
                    stats["deleted"] += 1
        return stats

    # reference API name: `Repo.merge` (`lakota/repo.py:303-309`)
    merge = merge_registry

    def pull(
        self,
        other: "Repo",
        labels: list[str] | None = None,
        shallow: bool = False,
    ) -> None:
        """Reconcile registries, then copy revisions and missing segment
        dirs (`lakota/repo.py:259-301`) — across any pair of backends.
        Covers every namespace (collection + archive). ``shallow``
        replicates only each collection's leaf snapshot (no history;
        best into a fresh remote)."""
        self.merge_registry(other)
        for ns in ("collection", "archive"):
            ns_labels = labels if ns == "collection" else None
            for label in ns_labels or other.ls(ns):
                if label not in self.ls(ns):
                    # tombstoned during reconcile (their entry was stale)
                    # or explicitly-requested missing label
                    if label not in other.ls(ns):
                        raise KeyError(f"no collection {label!r} to pull")
                    continue
                self.collection(label, ns).pull(
                    other.collection(label, ns), shallow=shallow
                )

    def push(
        self,
        other: "Repo",
        labels: list[str] | None = None,
        shallow: bool = False,
    ) -> None:
        other.pull(self, labels, shallow=shallow)

    # ------------------------------------------------------ import/export

    #: supported interchange formats: parquet/orc are self-describing
    #: columnar; csv/jsonl read with the collection's declared schema
    #: (jsonl = one JSON object per line, the standard corpus format)
    IO_FORMATS = ("parquet", "orc", "csv", "jsonl")

    def _read_fmt(self, fmt: str, path: str, schema) -> "DataFrame":
        r = self.spark.read
        if fmt == "parquet":
            return r.parquet(path)
        if fmt == "orc":
            return r.orc(path)
        if fmt == "csv":
            return r.option("header", "true").schema(schema).csv(path)
        if fmt == "jsonl":
            # FAILFAST: with a user-supplied schema the default PERMISSIVE
            # mode turns malformed lines (e.g. a pretty-printed JSON array
            # mistakenly imported as jsonl) into silent all-null rows —
            # corrupt data must error, not land
            return r.schema(schema).option("mode", "FAILFAST").json(path)
        raise ValueError(f"unknown format {fmt!r}; use one of {self.IO_FORMATS}")

    @staticmethod
    def _write_fmt(df, fmt: str, path: str) -> None:
        w = df.write.mode("overwrite")
        if fmt == "parquet":
            w.parquet(path)
        elif fmt == "orc":
            w.orc(path)
        elif fmt == "csv":
            w.option("header", "true").csv(path)
        elif fmt == "jsonl":
            w.json(path)
        else:
            raise ValueError(
                f"unknown format {fmt!r}; use one of {Repo.IO_FORMATS}"
            )

    def import_series(
        self, collection: str, series: str, path: str, fmt: str = "parquet"
    ) -> None:
        """Ingest one series from an interchange file tree."""
        coll = self.collection(collection)
        df = self._read_fmt(fmt, path, coll.schema.struct_type())
        coll.series(series).write(df)

    def import_parquet(self, collection: str, series: str, path: str) -> None:
        self.import_series(collection, series, path, "parquet")

    def import_csv(self, collection: str, series: str, path: str) -> None:
        self.import_series(collection, series, path, "csv")

    def import_jsonl(self, collection: str, series: str, path: str) -> None:
        self.import_series(collection, series, path, "jsonl")

    def import_orc(self, collection: str, series: str, path: str) -> None:
        self.import_series(collection, series, path, "orc")

    def export_collection(self, collection: str, out_dir: str, fmt: str = "parquet") -> None:
        """Dump every series + `_schema.json` (`lakota/repo.py:463-499`)."""
        import os

        coll = self.collection(collection)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "_schema.json"), "w") as fh:
            json.dump(coll.schema.to_dict(), fh)
        for label in coll.ls():
            df = coll.series(label).frame()
            target = os.path.join(out_dir, label)
            self._write_fmt(df, fmt, f"file://{target}")
