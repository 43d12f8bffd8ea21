"""Git-style changelog: a DAG of revision files over any filesystem.

Reproduces the reference's changelog *semantics* (`lakota/changelog.py`):

- Revision files named ``{parent}.{child}`` with ``child =
  {hextime}-{sha1(payload)}`` — content-addressed, so two writers racing
  with identical payloads converge on one file (idempotent commits,
  double-write no-op) and distinct payloads create sibling leaves that a
  later ``merge`` reconciles. Root sentinel parent is ``phi``.
- Leaf resolution = depth-first walk ordered by child id (hextime prefix
  gives a deterministic total order → "newest branch wins"); a merge
  commit exists as one file per parent and linearizes after ALL parents.
- Time travel: ``before=`` picks the last revision strictly older than a
  timestamp.

Storage is a directory of small JSON files on any `fsio.FS` backend
(local/S3/GCS/HDFS) — one LIST + K small GETs, exactly the reference's
I/O shape (`lakota/commit.py:56-79`). At 100 TB the *data* lives in
Parquet segments; this log stays tiny because each revision stores
segment metadata only.
"""

from __future__ import annotations

import hashlib
import json
import posixpath
import time

from lakota_spark.fsio import FS

PHI = "phi"  # root sentinel (`lakota/changelog.py:10-12`)

#: Checkpoint cadence of the fmt-3 delta log: a full-snapshot checkpoint
#: every N commits bounds cold-read resolution to N-1 small delta reads
#: (Delta-Lake-style log compaction). Appends in between serialize only
#: their own segments — O(new) instead of O(table) per commit, which is
#: what keeps fragmented-append workloads linear at millions of segments.
#:
#: The cadence is ADAPTIVE: a fixed every-K cadence still pays O(table)
#: every K commits — amortized O(table/K) per append, i.e. linear growth
#: again at large segment counts. Scaling the cadence with the table
#: (one checkpoint per SEGS_PER_CKPT new table-segments' worth of
#: commits, capped at CHECKPOINT_MAX so a cold reader never replays an
#: unbounded delta chain) makes the amortized checkpoint bytes per
#: commit CONSTANT: O(N) payload / (N/SEGS_PER_CKPT) commits =
#: O(SEGS_PER_CKPT). Resolution is cadence-agnostic (walk to the
#: nearest checkpoint, whatever the spacing).
import os as _os

CHECKPOINT_EVERY = int(_os.environ.get("LAKOTA_SPARK_CKPT_EVERY", "32"))
CHECKPOINT_MAX = int(_os.environ.get("LAKOTA_SPARK_CKPT_MAX", "512"))
SEGS_PER_CKPT = 16


def checkpoint_cadence(n_segments: int) -> int:
    """Commits between checkpoints for a table of ``n_segments``."""
    return max(
        CHECKPOINT_EVERY, min(CHECKPOINT_MAX, n_segments // SEGS_PER_CKPT)
    )


def hexts(ts: float | None = None) -> str:
    """Sortable hex timestamp prefix (millisecond resolution)."""
    return format(int((time.time() if ts is None else ts) * 1000), "013x")


def hexts_to_epoch(h: str) -> float:
    return int(h, 16) / 1000.0


class Revision:
    __slots__ = ("parent", "child", "fs", "rel", "basename")

    def __init__(
        self, parent: str, child: str, fs: FS, rel: str, basename: str | None = None
    ):
        self.parent = parent
        self.child = child
        self.fs = fs
        self.rel = rel
        # stored, not derived: basename is touched O(N) times per log()
        # call (the listing-set cache key), which made posixpath.basename
        # a measurable cost across a fragmented-append run
        self.basename = (
            basename if basename is not None else posixpath.basename(rel)
        )

    @property
    def epoch(self) -> float:
        return hexts_to_epoch(self.child.split("-", 1)[0])

    #: parsed-payload memo keyed by child id. Sound because revisions are
    #: content-addressed (the child id embeds the payload sha1, verified
    #: on first read) and immutable once written. Kills the per-write
    #: re-read+re-parse of the head snapshot — the dominant commit cost
    #: on fragmented-append workloads, where it grows with the segment
    #: table (O(N²) across N appends without the memo). Consumers treat
    #: payloads as read-only (from_payload/merge only read keys).
    _PAYLOADS: "dict[str, dict]" = {}
    #: must exceed CHECKPOINT_MAX so a cold delta-chain resolution never
    #: thrashes its own working set; full-history scans (gc/digests)
    #: stream through and evict FIFO, which is fine — their hot key is
    #: whatever they read next, not what they read before
    _PAYLOADS_MAX = 600

    def read(self) -> dict:
        cached = Revision._PAYLOADS.get(self.child)
        if cached is not None:
            return cached
        raw = self.fs.read_bytes(self.rel)
        digest = hashlib.sha1(raw).hexdigest()  # noqa: S324 - integrity only
        want = self.child.split("-", 1)[1]
        if digest != want:
            # torn concurrent write — retry once (`lakota/changelog.py:174-187`)
            raw = self.fs.read_bytes(self.rel)
            if hashlib.sha1(raw).hexdigest() != want:  # noqa: S324
                raise IOError(f"corrupt revision {self.rel}")
        payload = json.loads(raw)
        if len(Revision._PAYLOADS) >= Revision._PAYLOADS_MAX:
            # FIFO eviction is enough: the hot key is always the head
            Revision._PAYLOADS.pop(next(iter(Revision._PAYLOADS)))
        Revision._PAYLOADS[self.child] = payload
        return payload

    def __repr__(self) -> str:
        return f"<Revision {self.parent[:8]}..{self.child[:20]}>"


class Changelog:
    def __init__(self, fs: FS, prefix: str):
        self.fs = fs
        self.prefix = prefix
        # (frozenset of basenames, linearized log) — see log(). The
        # directory is still listed on every call (external writers must
        # be seen); the cache only skips re-LINEARIZING an unchanged or
        # purely-appended DAG, which is O(N) python work per commit.
        self._log_cache: tuple[frozenset, list[Revision]] | None = None
        # filename → Revision memo: revisions are immutable once written,
        # so re-listing a directory must not re-CONSTRUCT N objects per
        # call (O(N²) across an append run — measured as ~30% of the
        # fragmented-append commit cost). Deleted files (trim/squash)
        # just stop being returned; the memo is size-bounded below.
        self._rev_cache: dict[str, Revision] = {}

    # -- listing / ordering ------------------------------------------------

    def revisions(self) -> list[Revision]:
        revs = []
        cache = self._rev_cache
        for fn in self.fs.ls(self.prefix, sort=False):
            if not fn.endswith(".json") or ".tmp" in fn:
                continue
            rev = cache.get(fn)
            if rev is None:
                name = fn[: -len(".json")]
                parent, _, child = name.partition(".")
                if not child:
                    continue
                rev = Revision(
                    parent, child, self.fs, f"{self.prefix}/{fn}", fn
                )
                cache[fn] = rev
            revs.append(rev)
        if len(cache) > 2 * len(revs) + 64:
            # trim/squash removed many files — drop stale entries
            self._rev_cache = {r.basename: r for r in revs}
        return revs

    def log(self, before: float | None = None) -> list[Revision]:
        """Depth-first, child-id-ordered linearization from the root
        (`lakota/changelog.py:91-122`). The LAST entry is the winning leaf.

        The head-path (``before=None``) result is cached keyed by the
        exact set of revision files: an unchanged listing returns the
        cached list, and the sequential-append case (new revisions that
        form a single-child chain off the cached winning leaf — the bulk
        write-loop shape) extends it in O(new). Any other change —
        deletions (trim/squash), branching, merge files — recomputes.

        CONTRACT: on a cache hit the CACHED list object itself is
        returned — callers must not mutate it (reverse, slice-assign,
        append), or they poison every later log()/leaf() call. All
        current callers only read/index; copying here would tax the hot
        leaf() path for nothing.
        """
        revs = self.revisions()
        if before is not None:
            return self._linearize([r for r in revs if r.epoch < before])
        names = frozenset(r.basename for r in revs)
        cached = self._log_cache
        if cached is not None and cached[0] == names:
            return cached[1]
        if cached is not None and cached[1] and names > cached[0]:
            extended = self._extend_chain(
                cached[1], [r for r in revs if r.basename not in cached[0]]
            )
            if extended is not None:
                self._log_cache = (names, extended)
                return extended
        out = self._linearize(revs)
        self._log_cache = (names, out)
        return out

    @staticmethod
    def _extend_chain(
        old: list[Revision], added: list[Revision]
    ) -> list[Revision] | None:
        """``old + chain`` when the added revisions are one linear chain
        rooted at the old winning leaf (the deepest DFS node, so a full
        relinearization would place them exactly there); None otherwise."""
        by_parent: dict[str, list[Revision]] = {}
        for r in added:
            by_parent.setdefault(r.parent, []).append(r)
        out = list(old)
        tail = out[-1].child
        for _ in range(len(added)):
            nxt = by_parent.pop(tail, None)
            if nxt is None or len(nxt) != 1:
                return None  # branch, merge file, or detached rev
            out.append(nxt[0])
            tail = nxt[0].child
        return out if not by_parent else None

    @staticmethod
    def _linearize(revs: list[Revision]) -> list[Revision]:
        children: dict[str, list[Revision]] = {}
        for r in revs:
            children.setdefault(r.parent, []).append(r)
        for sibs in children.values():
            sibs.sort(key=lambda r: r.child)
        # A merge commit exists as one FILE PER PARENT (same child id). It
        # must linearize AFTER every parent's subtree, so emit a node only
        # when its LAST incoming edge is traversed — otherwise the DFS
        # would surface it before the sibling branch and the wrong head
        # would win leaf resolution.
        n_edges: dict[str, int] = {}
        for r in revs:
            n_edges[r.child] = n_edges.get(r.child, 0) + 1
        out: list[Revision] = []
        seen_edges: dict[str, int] = {}

        def walk(parent: str) -> None:
            for rev in children.get(parent, ()):  # ordered: oldest branch first
                seen_edges[rev.child] = seen_edges.get(rev.child, 0) + 1
                if seen_edges[rev.child] < n_edges[rev.child]:
                    continue  # wait for the merge node's remaining parents
                out.append(rev)
                walk(rev.child)

        walk(PHI)
        return out

    def leaf(self, before: float | None = None) -> Revision | None:
        log = self.log(before)
        return log[-1] if log else None

    def leaves(self) -> list[Revision]:
        """All heads (revisions that are nobody's parent) — branch tips."""
        revs = self.revisions()
        parents = {r.parent for r in revs}
        heads = {r.child: r for r in revs if r.child not in parents}
        return sorted(heads.values(), key=lambda r: r.child)

    # -- committing --------------------------------------------------------

    def commit(
        self,
        payload: dict,
        parents: list[str] | None = None,
        force: bool = False,
        known_changed: bool = False,
    ) -> Revision | None:
        """Append a revision. Returns None when the payload is identical to
        the (first) parent's — double-write no-op (`lakota/changelog.py:49-57`).

        ``known_changed=True`` skips the no-op head compare (one extra
        directory listing + an O(payload) serialization) — pass it only
        when the caller already proved the table changed, as
        ``Collection._commit`` does via its signature check.

        Atomicity: content-addressed names make racing identical commits
        collide harmlessly on any backend (local rename / object-store PUT).
        """
        parents = parents or [PHI]
        raw = json.dumps(payload, sort_keys=True, separators=(",", ":")).encode()
        sha = hashlib.sha1(raw).hexdigest()  # noqa: S324 - content address
        if not force and not known_changed and parents[0] != PHI:
            head = next(
                (r for r in self.revisions() if r.child == parents[0]), None
            )
            if head is not None:
                head_payload = head.read()
                if (
                    json.dumps(
                        head_payload, sort_keys=True, separators=(",", ":")
                    ).encode()
                    == raw
                ):
                    return None
        child = f"{hexts()}-{sha}"
        # Multi-parent commits (merge) write ONE FILE PER PARENT with the
        # same child id — every head gains a descendant, so `leaves()`
        # collapses to the merge commit (reference changelog naming scheme).
        rel = None
        for parent in parents:
            rel = f"{self.prefix}/{parent}.{child}.json"
            self.fs.write_bytes_atomic(rel, raw)
        # Seed the payload memo with the object we just serialized: the
        # next commit reads its parent's payload (ckpt_dist / no-op
        # compare), and in the sequential-append case that parent is
        # exactly this revision. Sound: `raw` was produced from `payload`
        # with the same canonical dumps a later read would parse, and
        # serialize_bound emits JSON-stable lists (no tuples survive).
        if len(Revision._PAYLOADS) >= Revision._PAYLOADS_MAX:
            Revision._PAYLOADS.pop(next(iter(Revision._PAYLOADS)))
        Revision._PAYLOADS[child] = payload
        return Revision(parents[0], child, self.fs, rel)

    def pull(self, other: "Changelog") -> int:
        """Copy revision files missing locally (`lakota/changelog.py:124-137`)."""
        have = {r.basename for r in self.revisions()}
        n = 0
        for r in other.revisions():
            if r.basename not in have:
                self.fs.write_bytes_atomic(
                    f"{self.prefix}/{r.basename}", other.fs.read_bytes(r.rel)
                )
                n += 1
        return n
