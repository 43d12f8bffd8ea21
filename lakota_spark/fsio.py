"""Filesystem abstraction for engine *metadata* and segment management.

The reference ships four custom blob stores (file/memory/S3/HTTP PODs,
`lakota/pod.py`); Spark already reads/writes segment data over any Hadoop
filesystem, so the only thing needing an abstraction here is the small-file
metadata traffic (commit log, registry, content-address renames, GC).
pyarrow.fs provides local/S3/GCS/HDFS under one API — `Repo("s3://bucket/
path")` works wherever pyarrow + the matching Spark Hadoop connector do.

Atomicity notes (object stores): local uses write-temp + atomic move; S3
PUTs are atomic per object but `move` is copy+delete. The engine's naming
discipline makes that safe — revision files and segment dirs are
content-addressed, so a racing duplicate write produces the same name with
the same bytes (the reference's SKIP-WRITE idempotence,
`lakota/pod.py:201-204`).
"""

from __future__ import annotations

import os
import posixpath

_SPARK_SCHEME = {"s3": "s3a"}  # pyarrow scheme -> hadoop connector scheme


class FS:
    """Rooted filesystem view: all paths are relative to the repo root."""

    def __init__(self, root_uri: str):
        from pyarrow import fs as pafs

        if "://" not in root_uri:
            root_uri = "file://" + os.path.abspath(root_uri)
        self.uri = root_uri.rstrip("/")
        self.scheme = self.uri.split("://", 1)[0]
        self.fs, self.root = pafs.FileSystem.from_uri(self.uri)
        self.is_local = self.scheme == "file"
        # schemes Spark's Hadoop layer can scan directly (distributed IO);
        # others (e.g. an HTTP repo) route segment bytes through pyarrow
        self.spark_readable = self.scheme in {
            "file", "s3", "s3a", "gs", "hdfs", "abfs", "wasbs"
        }

    # -- path helpers ------------------------------------------------------

    def full(self, *parts: str) -> str:
        return posixpath.join(self.root, *[p for p in parts if p])

    def spark_uri(self, *parts: str) -> str:
        scheme = _SPARK_SCHEME.get(self.scheme, self.scheme)
        return f"{scheme}://{self.full(*parts)}"

    def local_path(self, *parts: str) -> str | None:
        return self.full(*parts) if self.is_local else None

    # -- small-file IO -----------------------------------------------------

    def ls(self, rel: str) -> list[str]:
        from pyarrow import fs as pafs

        sel = pafs.FileSelector(self.full(rel), allow_not_found=True)
        return sorted(
            posixpath.basename(info.path) for info in self.fs.get_file_info(sel)
        )

    def read_bytes(self, rel: str) -> bytes:
        with self.fs.open_input_stream(self.full(rel)) as fh:
            return fh.read()

    def write_bytes_atomic(self, rel: str, data: bytes) -> None:
        """Atomic-enough publish: temp + move on local FS; direct PUT on
        object stores (a PUT is atomic; names are content-addressed)."""
        path = self.full(rel)
        self.makedirs(posixpath.dirname(rel))
        if self.is_local:
            tmp = f"{path}.tmp{os.getpid()}"
            with self.fs.open_output_stream(tmp) as fh:
                fh.write(data)
            self.fs.move(tmp, path)
        else:
            with self.fs.open_output_stream(path) as fh:
                fh.write(data)

    # -- tree ops ----------------------------------------------------------

    def exists(self, rel: str) -> bool:
        from pyarrow import fs as pafs

        info = self.fs.get_file_info(self.full(rel))
        return info.type != pafs.FileType.NotFound

    def makedirs(self, rel: str) -> None:
        if rel:
            self.fs.create_dir(self.full(rel), recursive=True)

    def remove_file(self, rel: str) -> None:
        try:
            self.fs.delete_file(self.full(rel))
        except FileNotFoundError:
            pass

    def remove_tree(self, rel: str) -> None:
        try:
            self.fs.delete_dir(self.full(rel))
        except FileNotFoundError:
            pass

    def move(self, rel_src: str, rel_dst: str) -> None:
        """Rename (file or dir). Local: atomic; object stores: copy+delete
        (safe here per the content-addressing discipline above)."""
        self.fs.move(self.full(rel_src), self.full(rel_dst))

    def copy_tree(self, rel_src: str, rel_dst: str, other: "FS | None" = None) -> None:
        """Copy a directory tree, possibly across filesystems (pull/push)."""
        src_fs = (other or self).fs
        src_root = (other or self).full(rel_src)
        from pyarrow import fs as pafs

        sel = pafs.FileSelector(src_root, recursive=True, allow_not_found=True)
        self.makedirs(rel_dst)
        for info in src_fs.get_file_info(sel):
            sub = posixpath.relpath(info.path, src_root)
            if info.type == pafs.FileType.Directory:
                self.makedirs(posixpath.join(rel_dst, sub))
            elif info.type == pafs.FileType.File:
                with src_fs.open_input_stream(info.path) as src:
                    data = src.read()
                self.write_bytes_atomic(posixpath.join(rel_dst, sub), data)

    def file_sizes(self, rel: str) -> dict[str, int]:
        from pyarrow import fs as pafs

        sel = pafs.FileSelector(self.full(rel), allow_not_found=True)
        return {
            posixpath.basename(i.path): i.size
            for i in self.fs.get_file_info(sel)
            if i.type == pafs.FileType.File
        }

    def files_sha1(self, rel_files: list[str], spark=None) -> list[str]:
        """Per-file sha1 hex digests, in ``rel_files`` order.

        With a SparkSession (and a Hadoop-readable scheme) the hashes run
        as a DISTRIBUTED job — `binaryFile` scan + JVM-side `F.sha1` —
        so no data bytes ever flow through the driver; only the 40-char
        digests are collected. Without one (or on a non-Hadoop backend,
        e.g. an HTTP repo) it falls back to streaming reads, which is
        acceptable for the metadata-scale paths that use it. Both paths
        produce IDENTICAL digests, so content addresses agree across
        backends (push/pull dedup relies on this).
        """
        if spark is not None and self.spark_readable:
            from pyspark.sql import functions as F

            rows = (
                spark.read.format("binaryFile")
                .load([self.spark_uri(rel) for rel in rel_files])
                .select("path", F.sha1("content").alias("sha"))
                .collect()
            )
            by_base = {posixpath.basename(r.path): r.sha for r in rows}
            return [by_base[posixpath.basename(rel)] for rel in rel_files]
        import hashlib

        out = []
        for rel in rel_files:
            h = hashlib.sha1()  # noqa: S324 - content address
            with self.fs.open_input_stream(self.full(rel)) as fh:
                while chunk := fh.read(1 << 20):
                    h.update(chunk)
            out.append(h.hexdigest())
        return out

    @staticmethod
    def combine_sha1(per_file: list[str]) -> str:
        """Deterministic segment digest: sha1 over the ordered per-file
        digests (a Merkle-style combine — order matters, bytes don't
        re-flow)."""
        import hashlib

        return hashlib.sha1("".join(per_file).encode()).hexdigest()  # noqa: S324
